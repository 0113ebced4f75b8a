"""net1 (MarrNet-1) ablation matrix: what binds the GenRe no-oracle IoU?

The committed full-pipeline qualruns plateaued at IoU ~0.31 with net1's
depth loss stuck at ~112-130 across step counts, lr schedules and warm
starts (QUALRUN_FULL_r04*), while the oracle-depth chain reaches 0.585 --
the docs *claim* residual net1 depth error explains the gap but commit no
ablation.  This driver isolates the candidate factors one at a time
(VERDICT r04 #2), training the same marrnet1 config per cell and
evaluating on ONE fixed held-out scene set:

  base        2048 train scenes (the r04 regime)
  data8k      8192 train scenes (procedural scenes are free; the
              reference trains on millions of renders,
              /root/reference/scripts/train_marrnet1.sh epoch_batches)
  no_aug      photometric augmentation off (procedural renders are
              noise-free, unlike the reference's real-photo target)
  f32_heads   decoders + minmax head in float32 over the bf16 encoder
  wide        decoder channel multiplier 1.5

It also produces the in-repo BACKBONE artifact (VERDICT r04 #9): the best
cell's ResNet-18 encoder is exported as ``backbone.pt`` and a short
from-scratch vs --backbone_init comparison run shows the warm encoder
measurably changes the net1 training curve (the counterpart of the
reference's ImageNet pretrain, networks/uresnet.py:16).

Usage (full-scale, on the TPU chip):
  python tools/ablate_net1.py --logdir /tmp/ablate_net1 --out ABLATE_NET1_r05.md
Smoke (CPU, tiny):
  python tools/ablate_net1.py --tiny --cpu --steps 8 --steps_b 4 \
      --train_n 16 --eval_n 16 --eval_batches 2 --bb_steps 4 \
      --logdir /tmp/abl_smoke
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_net1(opt, eval_length):
    import jax
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader
    from genre_shapehd_tpu.train.loggers import ComposeLogger, ProgbarLogger
    from genre_shapehd_tpu.train.loop import Trainer
    from genre_shapehd_tpu.models.base import default_opt

    model = get_model("marrnet1")(opt)
    ds_train = get_dataset("procedural")(opt, "train", model=model)
    # ONE fixed eval set for every cell: vali seeds are index-keyed and
    # disjoint from train seeds at any train length (procedural._seed)
    opt_eval = default_opt(**{**vars(opt), "procedural_length": eval_length})
    ds_vali = get_dataset("procedural")(opt_eval, "vali", model=model)
    t0 = time.time()
    for ds in (ds_train, ds_vali):
        for i in range(len(ds)):
            ds._raw(i)
    print(f"[ablate] cache warm ({len(ds_train)}+{len(ds_vali)}) in "
          f"{time.time() - t0:.0f}s", flush=True)
    tl = DataLoader(ds_train, opt.batch_size, num_workers=opt.workers,
                    seed=0)
    vl = DataLoader(ds_vali, opt.batch_size, num_workers=opt.workers,
                    shuffle=False, drop_last=False)
    trainer = Trainer(model, opt, ComposeLogger([ProgbarLogger()]))
    trainer.initialize(jax.random.PRNGKey(0))
    return model, trainer, tl, vl


def eval_net1(trainer, vl, max_batches=None, tag=""):
    """Size-weighted mean eval losses over the fixed held-out set."""
    import jax

    sums, n = {}, 0
    for bi, batch in enumerate(vl):
        if max_batches and bi >= max_batches:
            break
        dev_batch, rest = trainer._device_batch(batch)
        metrics, _ = trainer._eval_step(trainer.state, dev_batch,
                                        jax.random.PRNGKey(9))
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        size = rest["_true_size"]
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + v * size
        n += size
    res = {k: v / max(n, 1) for k, v in sums.items()}
    res["n_items"] = n
    print(f"[ablate] {tag}: {json.dumps(res)}", flush=True)
    return res


def train_cell(name, overrides, args, dims, report):
    import jax
    from genre_shapehd_tpu.models.base import default_opt
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from qualrun_shapehd import run_epochs

    t0 = time.time()
    train_n = overrides.pop("train_n", args.train_n)
    opt = default_opt(batch_size=args.batch, lr=args.lr,
                      procedural_length=train_n, workers=args.workers,
                      dtype="bfloat16", log_every=8, pred_depth_minmax=True,
                      **dims, **overrides)
    model, trainer, tl, vl = build_net1(opt, args.eval_n)
    log = run_epochs(trainer, tl, vl, args.steps, jax.random.PRNGKey(3))
    if args.steps_b:
        # decayed-lr phase (the reference's resume-at-lower-lr workflow)
        opt_b = default_opt(**{**vars(opt), "lr": args.lr_b})
        model, trainer_b, tl, vl = build_net1(opt_b, args.eval_n)
        ck = os.path.join(args.logdir, f"net1_{name}.pt")
        trainer.save(ck, epoch=args.steps)
        trainer_b.load(ck)
        trainer_b.start_epoch = 0
        log = run_epochs(trainer_b, tl, vl, args.steps_b,
                         jax.random.PRNGKey(33))
        trainer = trainer_b
    ck = os.path.join(args.logdir, f"net1_{name}.pt")
    trainer.save(ck, epoch=args.steps + args.steps_b)
    res = eval_net1(trainer, vl, max_batches=args.eval_batches,
                    tag=f"cell {name}")
    cell = {"name": name, "train_n": train_n, "overrides": overrides,
            "eval": res, "ckpt": ck,
            "final_log": {k: float(v) for k, v in log.items()},
            "seconds": round(time.time() - t0, 1)}
    report["cells"].append(cell)
    print(f"[ablate] cell {name} done in {cell['seconds']}s", flush=True)
    return cell


def export_backbone(ckpt_path, out_path):
    """Extract the ResNet-18 encoder subtree as a --backbone_init payload
    (models/base.py::load_backbone format)."""
    from genre_shapehd_tpu.core.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
    payload = load_checkpoint(ckpt_path)
    net = payload["nets"][0]
    params = net["params"].get("net", net["params"])
    stats = net.get("batch_stats", {})
    stats = stats.get("net", stats)
    sub = "ResNet18Features_0"
    save_checkpoint(out_path, {
        "nets": [{"params": params[sub], "batch_stats": stats.get(sub, {})}],
        "epoch": payload.get("epoch", 0),
        "meta": f"resnet18 encoder exported from {os.path.basename(ckpt_path)}"})
    return out_path


def backbone_curve(args, dims, backbone, tag):
    """Short net1 run (from scratch vs --backbone_init) recording the
    per-epoch eval depth loss curve."""
    import jax
    from genre_shapehd_tpu.models.base import default_opt
    from qualrun_shapehd import run_epochs

    opt = default_opt(batch_size=args.batch, lr=args.lr,
                      procedural_length=args.train_n, workers=args.workers,
                      dtype="bfloat16", log_every=8, pred_depth_minmax=True,
                      backbone_init=backbone, **dims)
    model, trainer, tl, vl = build_net1(opt, args.eval_n)
    curve = []

    def on_epoch(e, log):
        r = eval_net1(trainer, vl, max_batches=args.eval_batches,
                      tag=f"bb[{tag}] e{e}")
        curve.append({"epoch": e, **{k: r[k] for k in
                                     ("loss", "depth", "depth_minmax")
                                     if k in r}})

    run_epochs(trainer, tl, vl, args.bb_steps, jax.random.PRNGKey(5),
               on_epoch=on_epoch)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--steps_b", type=int, default=1000,
                    help="extra steps at --lr_b")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr_b", type=float, default=1e-4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train_n", type=int, default=2048)
    ap.add_argument("--eval_n", type=int, default=2048,
                    help="procedural_length of the shared eval set "
                         "(vali length = eval_n//8)")
    ap.add_argument("--eval_batches", type=int, default=16)
    ap.add_argument("--cells", default="base,data8k,no_aug,f32_heads,wide")
    ap.add_argument("--data_big", type=int, default=8192)
    ap.add_argument("--bb_steps", type=int, default=600,
                    help="steps for the backbone-init curve comparison")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/ablate_net1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    dims = dict(im_size=64, vox_res=32, sph_res=32, z_res=64,
                padding_margin=16) if args.tiny else \
        dict(im_size=256, vox_res=128, sph_res=128, z_res=256,
             padding_margin=16)
    os.makedirs(args.logdir, exist_ok=True)

    import jax
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    enable_compile_cache()

    report = {"config": {**dims, "steps": args.steps, "steps_b": args.steps_b,
                         "lr": args.lr, "lr_b": args.lr_b,
                         "batch": args.batch, "train_n": args.train_n,
                         "data_big": args.data_big, "eval_n": args.eval_n},
              "backend": jax.default_backend(), "cells": []}
    cell_defs = {
        "base": {},
        "data8k": {"train_n": args.data_big},
        "no_aug": {"no_aug": True},
        "f32_heads": {"f32_heads": True},
        "wide": {"decoder_width": 1.5},
    }
    json_path = os.path.join(args.logdir, "ablate_net1.json")
    for name in args.cells.split(","):
        train_cell(name, dict(cell_defs[name]), args, dims, report)
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)

    # best cell by held-out depth loss (the binding metric per
    # QUALRUN_FULL_r04*); tie-broken by total loss
    best = min(report["cells"],
               key=lambda c: (c["eval"].get("depth", np.inf),
                              c["eval"].get("loss", np.inf)))
    report["best_cell"] = best["name"]
    print(f"[ablate] best cell: {best['name']} "
          f"(depth {best['eval'].get('depth'):.2f})")

    # ---- backbone export + curve comparison (VERDICT r04 #9) ----------
    bb_path = os.path.join(args.logdir, "backbone.pt")
    export_backbone(best["ckpt"], bb_path)
    report["backbone"] = {"path": bb_path, "from_cell": best["name"]}
    if args.bb_steps:
        report["backbone"]["curve_scratch"] = backbone_curve(
            args, dims, None, "scratch")
        report["backbone"]["curve_init"] = backbone_curve(
            args, dims, bb_path, "init")

    with open(json_path, "w") as f:
        json.dump(report, f, indent=2)
    if args.out:
        write_markdown(args.out, report)
    print("[ablate] done:", json.dumps(
        {c["name"]: c["eval"] for c in report["cells"]}, indent=2))


def _f(v, spec=".2f"):
    return format(v, spec) if isinstance(v, (int, float)) else "n/a"


def write_markdown(path, report):
    cfg = report["config"]
    lines = [
        "# ABLATION — what binds net1 (MarrNet-1) on the procedural "
        "benchmark",
        "",
        "One factor changed per cell, same steps/lr/eval set "
        "(tools/ablate_net1.py; VERDICT r04 item 2).  Losses are held-out "
        "size-weighted means; depth/normal are foreground-masked MSE at "
        "the reference's x100 scale (marrnet1.py:104-134).",
        "",
        f"- backend: `{report['backend']}`, batch {cfg['batch']}, "
        f"{cfg['steps']} steps @ lr {cfg['lr']} + {cfg['steps_b']} @ "
        f"{cfg['lr_b']}",
        f"- base train scenes: {cfg['train_n']}; data8k: "
        f"{cfg['data_big']}; shared eval set: vali of "
        f"procedural_length={cfg['eval_n']}",
        "",
        "| cell | train scenes | depth | normal | silhou | minmax | total |"
        " seconds |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for c in report["cells"]:
        e = c["eval"]
        lines.append(
            f"| {c['name']} | {c['train_n']} | {_f(e.get('depth'))} | "
            f"{_f(e.get('normal'))} | {_f(e.get('silhou'))} | "
            f"{_f(e.get('depth_minmax'))} | {_f(e.get('loss'))} | "
            f"{c['seconds']:.0f} |")
    lines += ["", f"Best cell (held-out depth loss): "
              f"**{report.get('best_cell')}**."]
    bb = report.get("backbone", {})
    if bb.get("curve_scratch"):
        lines += [
            "",
            "## Backbone pretrain demo (`--backbone_init`)",
            "",
            f"ResNet-18 encoder exported from the best cell as "
            f"`backbone.pt` and used to warm-start a fresh net1 "
            f"(models/base.py::load_backbone; the counterpart of the "
            f"reference's ImageNet pretrain, networks/uresnet.py:16).",
            "",
            "| epoch | depth (scratch) | depth (backbone-init) |",
            "|---|---|---|",
        ]
        for s, i in zip(bb["curve_scratch"], bb["curve_init"]):
            lines.append(f"| {s['epoch']} | {_f(s.get('depth'))} | "
                         f"{_f(i.get('depth'))} |")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
