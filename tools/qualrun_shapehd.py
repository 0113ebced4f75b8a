"""Reconstruction-quality benchmark for the MarrNet-2 / ShapeHD family.

Complements tools/qualrun.py (which proves the GenRe geometry chain):
this driver runs the reference's OTHER training workflow
(scripts/train_marrnet2.sh -> scripts/train_wgangp.sh ->
scripts/finetune_shapehd.sh, /root/reference/README.md:136-156) on the
procedural analytic dataset and reports held-out solid-voxel IoU and
Chamfer distance against an untrained baseline:

  stage A  marrnet2 (--canon_sup): GT 2.5D sketches -> 128^3 voxels
           (/root/reference/models/marrnet2.py)
  stage B  wgangp: 3D-WGAN-GP shape prior on canonical voxels
           (/root/reference/models/wgangp.py), with a critic-separation
           probe (D(real) vs D(G(z)) vs D(marrnet2 output)) every few
           epochs -- the committed evidence that the prior itself works
  stage C  shapehd: finetune the stage-A net with the frozen stage-B
           critic as a perceptual loss (/root/reference/models/shapehd.py
           :67-79).  The critic weight sweep accepts plain floats, the
           reference default 1e-3 (scripts/finetune_shapehd.sh:28), 0 as
           a continued-supervision control, and ``auto:R`` which anchors
           the critic's arbitrary Wasserstein scale by choosing w so the
           gan/sup gradient-norm ratio at stage-C start equals R.
           Per-epoch held-out IoU is tracked and the best-IoU state is
           kept (the reference keeps best.pt on eval loss,
           loggers.py:274-297; eval loss here contains the gameable
           critic term, so IoU -- the procedural benchmark's luxury --
           is the honest selector).

Unlike the GenRe qualrun (surface-shell IoU, the training target of
genre_full_model.py:93-95), MarrNet-2/ShapeHD are supervised on SOLID
occupancy grids (marrnet2.py:81-85), so IoU here is against the solid GT.

Usage (full-scale, on the TPU chip):
  python tools/qualrun_shapehd.py --logdir /tmp/qualshd --out QUALRUN_SHAPEHD_r05.md
Smoke (CPU, tiny):
  python tools/qualrun_shapehd.py --tiny --cpu --steps_m2 40 --steps_gan 20 \
      --steps_shd 20 --train_n 32 --logdir /tmp/qshd
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7)


def _rows(x, true_n):
    """Undo shard_batch's uniform-repetition padding (mesh.py:85-114).

    Padding interleaves ``np.repeat(x, r, axis=0)``; the first ``true_n``
    rows of a padded batch are NOT the original samples, every r-th row
    is."""
    x = np.asarray(x)
    r = max(x.shape[0] // true_n, 1)
    return x[::r][:true_n]


def build(net, opt):
    import jax
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader
    from genre_shapehd_tpu.train.loggers import ComposeLogger, ProgbarLogger
    from genre_shapehd_tpu.train.loop import Trainer

    model = get_model(net)(opt)
    ds_train = get_dataset("procedural")(opt, "train", model=model)
    ds_vali = get_dataset("procedural")(opt, "vali", model=model)
    # warm the (process-wide, stage-shared) raw-sample cache up front so
    # loader threads never race heavy numpy generation against device steps
    t0 = time.time()
    for ds in (ds_train, ds_vali):
        for i in range(len(ds)):
            ds._raw(i)
    print(f"[qualshd] cache warm ({len(ds_train)}+{len(ds_vali)} scenes) "
          f"in {time.time() - t0:.0f}s", flush=True)
    tl = DataLoader(ds_train, opt.batch_size, num_workers=opt.workers,
                    seed=0)
    vl = DataLoader(ds_vali, opt.batch_size, num_workers=opt.workers,
                    shuffle=False, drop_last=False)
    trainer = Trainer(model, opt, ComposeLogger([ProgbarLogger()]))
    trainer.initialize(jax.random.PRNGKey(0))
    return model, trainer, tl, vl


def run_epochs(trainer, tl, vl, steps, rng, eval_batches=2, on_epoch=None):
    """Explicit epoch loop (Trainer.fit unrolled) so callers can probe
    between epochs."""
    from genre_shapehd_tpu.data.loader import InfiniteLoader

    spe = min(100, steps)
    epochs = max(steps // spe, 1)
    trainer.logger.set_params({
        "epoch": epochs, "steps_per_epoch": spe,
        "steps_per_eval": eval_batches, "metrics": trainer.model.metrics})
    trainer.logger.on_train_begin()
    it = InfiniteLoader(tl)
    last = {}
    for e in range(1, epochs + 1):
        last = trainer.train_epoch_pair(e, it, vl, spe, eval_batches, rng)
        if on_epoch is not None:
            on_epoch(e, last)
    trainer.logger.on_train_end()
    return last


def eval_quality(model, trainer, vl, voxel_key, max_batches=None, tag="",
                 with_chamfer=True, quiet=False):
    """Held-out solid-voxel IoU (pred>th vs GT occupancy) and Chamfer
    distance (tools/eval_chamfer.py protocol)."""
    import jax

    if with_chamfer:
        from tools.eval_chamfer import chamfer_between_voxels

    inter = {t: 0.0 for t in THRESHOLDS}
    union = {t: 0.0 for t in THRESHOLDS}
    chamfers = []
    realism, realism_noft = [], []
    n_items = 0
    examples = []
    for bi, batch in enumerate(vl):
        if max_batches and bi >= max_batches:
            break
        dev_batch, rest = trainer._device_batch(batch)
        metrics, pred = trainer._eval_step(trainer.state, dev_batch,
                                           jax.random.PRNGKey(9))
        jax.block_until_ready((metrics, pred))
        true_n = rest["_true_size"]
        if isinstance(pred, dict):          # shapehd returns a dict
            # critic scores = the finetune's realism objective
            if "is_real" in pred:
                realism += list(_rows(
                    np.asarray(pred["is_real"], np.float32), true_n)
                    .reshape(-1))
            if "is_real_noft" in pred:
                realism_noft += list(_rows(
                    np.asarray(pred["is_real_noft"], np.float32), true_n)
                    .reshape(-1))
            pred = pred.get("pred_voxel", pred.get("voxel"))
        logits = _rows(pred, true_n).astype(np.float32)
        gt_solid = np.asarray(batch[voxel_key])[:true_n] > 0.5
        prob = 1.0 / (1.0 + np.exp(-logits))
        for i in range(true_n):
            for t in THRESHOLDS:
                p = prob[i] > t
                inter[t] += float((p & gt_solid[i]).sum())
                union[t] += float((p | gt_solid[i]).sum())
            if with_chamfer and n_items < 16:
                chamfers.append(chamfer_between_voxels(
                    logits[i], gt_solid[i].astype(np.float32), th=0.25,
                    use_sigmoid=True, n_points=1024, seed=i))
            if len(examples) < 4:
                examples.append((logits[i], gt_solid[i]))
            n_items += 1
    iou = {t: inter[t] / max(union[t], 1.0) for t in THRESHOLDS}
    res = {
        "n_items": n_items,
        "iou_0.5": iou[0.5],
        "iou_best": max(iou.values()),
        "iou_best_th": max(iou, key=iou.get),
        "iou_by_th": iou,
        "chamfer_mean": float(np.mean(chamfers)) if chamfers else None,
        "chamfer_n": len(chamfers),
    }
    if realism:
        res["critic_score"] = float(np.mean(realism))
    if realism_noft:
        res["critic_score_noft"] = float(np.mean(realism_noft))
    if not quiet:
        print(f"[qualshd] {tag}: "
              f"{json.dumps({k: v for k, v in res.items() if k != 'iou_by_th'})}",
              flush=True)
    return res, examples


def probe_grad_split(model, trainer, loader):
    """L2 norms of the supervised vs GAN gradients w.r.t. the finetuned
    net at stage-C start -- quantifies how strongly the critic term steers
    the Adam update direction relative to the BCE anchor.  The gan norm is
    reported both at the model's current w_gan_loss and per unit weight
    (for deriving an anchored w)."""
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.train.loop import decompress_batch

    batch = next(iter(loader))
    dev_batch, _ = trainer._device_batch(batch)
    state = trainer.state

    def part(net_params, which):
        params = dict(state.params)
        params["net"] = net_params
        db = decompress_batch(dev_batch)   # wire-compressed -> f32 (ADVICE r04)
        pred, _ = model._forward_all(params, state.batch_stats, db, True)
        sup = model.bce_with_logits(pred["voxel"].astype(jnp.float32),
                                    db[model.voxel_key])
        gan = -jnp.mean(pred["is_real"])   # per unit w_gan_loss
        return sup if which == "sup" else gan

    @jax.jit
    def norms(params):
        out = {}
        for which in ("sup", "gan"):
            g = jax.grad(lambda p: part(p, which))(params)
            out[which] = jnp.sqrt(sum(
                jnp.vdot(x, x).real for x in jax.tree.leaves(g)))
        return out

    res = jax.device_get(norms(state.params["net"]))
    out = {f"grad_norm_{k}": float(v) for k, v in res.items()}
    out["grad_norm_gan_unit"] = out["grad_norm_gan"]
    out["grad_norm_gan"] *= model.w_gan_loss
    out["gan_over_sup"] = out["grad_norm_gan"] / max(out["grad_norm_sup"],
                                                     1e-30)
    out["gan_over_sup_unit"] = out["grad_norm_gan_unit"] / max(
        out["grad_norm_sup"], 1e-30)
    return out


def critic_separation(model_b, trainer_b, real_vox, m2_prob, rng_seed=11):
    """Critic scores on real voxels, fresh G(z) samples, and cached
    marrnet2 outputs -- the prior's separation evidence
    (wgangp.py:166-181 uses only -D(G(z)) as eval)."""
    import jax
    import jax.numpy as jnp

    p = trainer_b.state.params
    bs = trainer_b.state.batch_stats

    def d(x):
        return np.asarray(model_b._d_apply(
            p["net_d"], jnp.asarray(np.asarray(x, np.float32))))

    z = jax.random.normal(jax.random.PRNGKey(rng_seed),
                          (real_vox.shape[0], model_b.nz))
    gen, _ = model_b._generate(p["net_g"], bs["net_g"], z)
    gen = np.asarray(gen, np.float32)
    return {"d_real": float(np.mean(d(real_vox))),
            "d_gz": float(np.mean(d(gen))),
            "d_m2": float(np.mean(d(m2_prob)))}, gen


def snapshot_state(trainer):
    import jax
    return jax.device_get(trainer.state)


def restore_state(trainer, host_state):
    from genre_shapehd_tpu.parallel import mesh as pmesh
    trainer.state = pmesh.replicate_state(host_state, trainer.mesh)


def dump_examples(examples, outdir, tag, already_prob=False):
    os.makedirs(outdir, exist_ok=True)
    for i, (logits, gt_solid) in enumerate(examples):
        payload = {"pred_logits": logits.astype(np.float16)}
        if gt_solid is not None:
            payload["gt_solid"] = gt_solid.astype(np.uint8)
        np.savez_compressed(os.path.join(outdir, f"{tag}_{i}.npz"),
                            **payload)
        try:
            from genre_shapehd_tpu.viz.mcubes import marching_cubes
            from genre_shapehd_tpu.viz.visualizer import write_obj
            prob = logits.astype(np.float32) if already_prob else \
                1.0 / (1.0 + np.exp(-logits.astype(np.float32)))
            packs = [(f"{tag}_{i}_pred", prob, 0.25)]
            if gt_solid is not None:
                packs.append((f"{tag}_{i}_gt",
                              gt_solid.astype(np.float32), 0.5))
            for name, vol, th in packs:
                verts, faces = marching_cubes(vol, th)
                if len(faces):
                    write_obj(os.path.join(outdir, name + ".obj"),
                              verts, faces)
        except Exception as e:              # viz is best-effort
            print(f"[qualshd] obj dump skipped: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_m2", type=int, default=3000,
                    help="marrnet2 pretrain steps (stage A)")
    ap.add_argument("--steps_gan", type=int, default=6000,
                    help="wgangp prior steps (stage B)")
    ap.add_argument("--steps_shd", type=int, default=1000,
                    help="shapehd finetune steps (stage C)")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="stage-A lr (train_marrnet2.sh)")
    ap.add_argument("--lr_gan", type=float, default=1e-4,
                    help="stage-B lr (train_wgangp.sh)")
    ap.add_argument("--lr_shd", type=float, default=1e-4,
                    help="stage-C lr (finetune_shapehd.sh uses 1e-3; 1e-4 "
                         "is gentler for a 1000-step finetune)")
    ap.add_argument("--w_gan_loss", type=str, default="auto:0.25,0,1e-3",
                    help="critic-weight sweep for stage C: floats, 0 "
                         "(continued-supervision control), or auto:R "
                         "(anchor gan/sup grad ratio to R).  First value "
                         "is primary")
    ap.add_argument("--gan_d_iter", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train_n", type=int, default=512,
                    help="unique procedural training scenes")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/qualshd")
    ap.add_argument("--out", default=None, help="markdown report path")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny resolutions for CPU smoke testing")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU platform")
    ap.add_argument("--eval_batches", type=int, default=None)
    ap.add_argument("--traj_batches", type=int, default=4,
                    help="eval batches for the per-epoch stage-C IoU probe")
    ap.add_argument("--sep_every", type=int, default=5,
                    help="stage-B epochs between critic-separation probes")
    ap.add_argument("--skip_m2", action="store_true",
                    help="reuse <logdir>/marrnet2.pt")
    ap.add_argument("--skip_gan", action="store_true",
                    help="reuse <logdir>/wgangp.pt")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from genre_shapehd_tpu.models.base import default_opt

    dims = dict(im_size=64, vox_res=32, sph_res=32, z_res=64,
                padding_margin=16) if args.tiny else \
        dict(im_size=256, vox_res=128, sph_res=128, z_res=256,
             padding_margin=16)
    common = dict(batch_size=args.batch, procedural_length=args.train_n,
                  workers=args.workers, dtype="bfloat16", log_every=8,
                  **dims)
    os.makedirs(args.logdir, exist_ok=True)
    report = {"config": {**common, "steps_m2": args.steps_m2,
                         "steps_gan": args.steps_gan,
                         "steps_shd": args.steps_shd, "lr": args.lr,
                         "lr_gan": args.lr_gan, "lr_shd": args.lr_shd,
                         "w_gan_loss": args.w_gan_loss,
                         "gan_d_iter": args.gan_d_iter}}

    import jax
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    report["backend"] = jax.default_backend()

    # --------------------------- stage A: marrnet2 (train_marrnet2.sh)
    ckpt_m2 = os.path.join(args.logdir, "marrnet2.pt")
    opt_a = default_opt(**common, lr=args.lr, canon_sup=True)
    model_a, trainer_a, tl_a, vl_a = build("marrnet2", opt_a)
    base_res, base_ex = eval_quality(model_a, trainer_a, vl_a,
                                     model_a.voxel_key,
                                     max_batches=args.eval_batches,
                                     tag="untrained")
    report["untrained"] = base_res
    if args.skip_m2 and os.path.exists(ckpt_m2):
        trainer_a.load(ckpt_m2)
        trainer_a.start_epoch = 0
        report["stageA"] = {"reused": ckpt_m2}
        print(f"[qualshd] stageA reused: {ckpt_m2}")
    else:
        t0 = time.time()
        log_a = run_epochs(trainer_a, tl_a, vl_a, args.steps_m2,
                           jax.random.PRNGKey(3))
        trainer_a.save(ckpt_m2, epoch=args.steps_m2)
        report["stageA"] = {
            "final_log": {k: float(v) for k, v in log_a.items()},
            "seconds": round(time.time() - t0, 1)}
        print(f"[qualshd] stageA done in {report['stageA']['seconds']}s: "
              f"{log_a}")
    m2_res, m2_ex = eval_quality(model_a, trainer_a, vl_a,
                                 model_a.voxel_key,
                                 max_batches=args.eval_batches,
                                 tag="marrnet2")
    report["marrnet2"] = m2_res

    # cached probe inputs for the stage-B critic-separation trajectory:
    # one batch of real solids + the stage-A net's sigmoid outputs on them
    sep_real = np.stack([gt.astype(np.float32)
                         for _, gt in m2_ex[:4]])
    sep_m2 = np.stack([1.0 / (1.0 + np.exp(-lg.astype(np.float32)))
                       for lg, _ in m2_ex[:4]])

    # ----------------------------- stage B: wgangp (train_wgangp.sh)
    ckpt_gan = os.path.join(args.logdir, "wgangp.pt")
    opt_b = default_opt(**common, lr=args.lr_gan, canon_voxel=True,
                        gan_d_iter=args.gan_d_iter)
    model_b, trainer_b, tl_b, vl_b = build("wgangp", opt_b)
    sep_traj = []
    if args.skip_gan and os.path.exists(ckpt_gan):
        trainer_b.load(ckpt_gan)
        trainer_b.start_epoch = 0
        report["stageB"] = {"reused": ckpt_gan}
        print(f"[qualshd] stageB reused: {ckpt_gan}")
    else:
        t0 = time.time()

        def on_epoch_b(e, log):
            if e % max(args.sep_every, 1) == 0:
                sep, _ = critic_separation(model_b, trainer_b, sep_real,
                                           sep_m2)
                sep_traj.append({"epoch": e, "step": e * min(100, args.steps_gan),
                                 **sep})
                print(f"[qualshd] stageB sep e{e}: {json.dumps(sep)}",
                      flush=True)

        log_b = run_epochs(trainer_b, tl_b, vl_b, args.steps_gan,
                           jax.random.PRNGKey(4), on_epoch=on_epoch_b)
        trainer_b.save(ckpt_gan, epoch=args.steps_gan)
        report["stageB"] = {
            "final_log": {k: float(v) for k, v in log_b.items()},
            "seconds": round(time.time() - t0, 1)}
        print(f"[qualshd] stageB done in {report['stageB']['seconds']}s: "
              f"{log_b}")
    sep_final, gz_samples = critic_separation(model_b, trainer_b, sep_real,
                                              sep_m2, rng_seed=12)
    sep_traj.append({"epoch": -1, "step": args.steps_gan, **sep_final})
    report["critic_separation"] = sep_traj
    print(f"[qualshd] stageB final separation: {json.dumps(sep_final)}")
    dump_examples([(g, None) for g in gz_samples[:3]],
                  os.path.join(args.logdir, "examples"), "prior_gz",
                  already_prob=True)

    json_path = os.path.join(args.logdir, "qualrun_shapehd.json")
    with open(json_path, "w") as f:                # incremental: A+B done
        json.dump(report, f, indent=2)

    # ------------------------ stage C: shapehd (finetune_shapehd.sh)
    # comma list sweeps the critic weight; first value is the primary run
    shd_ex = None
    for wi, wtok in enumerate(str(args.w_gan_loss).split(",")):
        t0 = time.time()
        auto_ratio = None
        if wtok.startswith("auto"):
            auto_ratio = float(wtok.split(":")[1]) if ":" in wtok else 0.25
            w = 1.0                        # placeholder; anchored below
        else:
            w = float(wtok)
        opt_c = default_opt(**common, lr=args.lr_shd, canon_sup=True,
                            marrnet2=ckpt_m2, gan=ckpt_gan, w_gan_loss=w)
        model_c, trainer_c, tl_c, vl_c = build("shapehd", opt_c)
        probe = probe_grad_split(model_c, trainer_c, tl_c)
        if auto_ratio is not None:
            # anchor the critic's arbitrary Wasserstein scale: pick w so
            # the gan gradient is auto_ratio of the BCE anchor's at start
            w = auto_ratio / max(probe["gan_over_sup_unit"], 1e-30)
            model_c.w_gan_loss = w         # before any step is traced
            probe["grad_norm_gan"] = probe["grad_norm_gan_unit"] * w
            probe["gan_over_sup"] = auto_ratio
        wname = f"{w:g}" if auto_ratio is None else f"auto{auto_ratio:g}"
        print(f"[qualshd] stageC w={w:g} ({wtok}) grad split: "
              f"{json.dumps(probe)}", flush=True)

        traj = []
        best = {"iou": -1.0, "state": None, "epoch": 0}

        def on_epoch_c(e, log):
            r, _ = eval_quality(model_c, trainer_c, vl_c,
                                model_c.voxel_key,
                                max_batches=args.traj_batches,
                                with_chamfer=False, quiet=True)
            row = {"epoch": e, "iou_0.5": r["iou_0.5"],
                   "critic_score": r.get("critic_score"),
                   "critic_score_noft": r.get("critic_score_noft"),
                   "sup": float(log.get("sup", float("nan")))}
            traj.append(row)
            print(f"[qualshd] stageC w={w:g} e{e}: {json.dumps(row)}",
                  flush=True)
            if r["iou_0.5"] > best["iou"]:
                best.update(iou=r["iou_0.5"], state=snapshot_state(trainer_c),
                            epoch=e)

        log_c = run_epochs(trainer_c, tl_c, vl_c, args.steps_shd,
                           jax.random.PRNGKey(5), on_epoch=on_epoch_c)
        if best["state"] is not None:
            restore_state(trainer_c, best["state"])
        ckpt_c = os.path.join(args.logdir, f"shapehd_w{wname}.pt")
        trainer_c.save(ckpt_c, epoch=args.steps_shd)
        if wi == 0:                        # canonical name for test_shapehd.sh
            trainer_c.save(os.path.join(args.logdir, "shapehd.pt"),
                           epoch=args.steps_shd)
        stage = {"w_gan_loss": w, "w_token": wtok, "grad_split": probe,
                 "best_epoch": best["epoch"], "trajectory": traj,
                 "final_log": {k: float(v) for k, v in log_c.items()},
                 "seconds": round(time.time() - t0, 1)}
        print(f"[qualshd] stageC w={w:g} done in {stage['seconds']}s "
              f"(best IoU epoch {best['epoch']}): {log_c}")
        res, ex = eval_quality(model_c, trainer_c, vl_c, model_c.voxel_key,
                               max_batches=args.eval_batches,
                               tag=f"shapehd_w{wname}")
        if wi == 0:
            report["stageC"], report["shapehd"], shd_ex = stage, res, ex
        report.setdefault("shapehd_sweep", []).append({**stage, **res})
        with open(json_path, "w") as f:            # incremental per variant
            json.dump(report, f, indent=2)

    dump_examples(shd_ex, os.path.join(args.logdir, "examples"), "shapehd")
    dump_examples(m2_ex[:2], os.path.join(args.logdir, "examples"),
                  "marrnet2")
    dump_examples(base_ex[:1], os.path.join(args.logdir, "examples"),
                  "untrained")

    with open(json_path, "w") as f:
        json.dump(report, f, indent=2)
    if args.out:
        write_markdown(args.out, report)
    print("[qualshd] report:", json.dumps(
        {k: report[k] for k in ("untrained", "marrnet2", "shapehd")},
        indent=2))


def _fmt(v, spec=".4f", na="n/a"):
    return format(v, spec) if isinstance(v, (int, float)) and v == v else na


def write_markdown(path, report):
    u, m, s = report["untrained"], report["marrnet2"], report["shapehd"]
    cfg = report["config"]
    lines = [
        "# QUALRUN — MarrNet-2 / ShapeHD reconstruction quality on the "
        "procedural benchmark",
        "",
        "The reference's second training workflow (train_marrnet2.sh -> "
        "train_wgangp.sh -> finetune_shapehd.sh, /root/reference/README.md"
        ":136-156) on analytic scenes "
        "(`genre_shapehd_tpu/data/procedural.py`), complementing the GenRe "
        "qualruns: MarrNet-2 maps GT 2.5D sketches to 128^3 voxels "
        "(marrnet2.py), a 3D-WGAN-GP learns the canonical shape prior "
        "(wgangp.py), and ShapeHD finetunes MarrNet-2 with the frozen "
        "critic as a perceptual loss (shapehd.py:67-79).",
        "",
        f"- backend: `{report['backend']}`, dtype bfloat16, "
        f"batch {cfg['batch_size']}",
        f"- resolutions: voxel {cfg['vox_res']}^3, image {cfg['im_size']}^2",
        f"- stage A (marrnet2): {cfg['steps_m2']} steps @ lr {cfg['lr']}, "
        + (f"{report['stageA']['seconds']}s, final "
           f"{json.dumps(report['stageA']['final_log'])}"
           if "seconds" in report["stageA"]
           else f"reused {report['stageA']['reused']}"),
        f"- stage B (wgangp): {cfg['steps_gan']} steps @ lr "
        f"{cfg['lr_gan']}, "
        + (f"{report['stageB']['seconds']}s, final "
           f"{json.dumps(report['stageB']['final_log'])}"
           if "seconds" in report["stageB"]
           else f"reused {report['stageB']['reused']}"),
        f"- stage C (shapehd): {cfg['steps_shd']} steps @ lr "
        f"{cfg['lr_shd']}, w_gan_loss {cfg['w_gan_loss']}, "
        f"{report['stageC']['seconds']}s, best-IoU state kept "
        f"(epoch {report['stageC'].get('best_epoch')}), final "
        f"{json.dumps(report['stageC']['final_log'])}",
        f"- held-out scenes: {s['n_items']} (disjoint seed range from "
        f"{cfg['procedural_length']} train scenes)",
        "",
        "## Results (held-out, solid-voxel IoU)",
        "",
        "| metric | untrained | marrnet2 | shapehd |",
        "|---|---|---|---|",
        f"| IoU @0.5 | {u['iou_0.5']:.4f} | {m['iou_0.5']:.4f} | "
        f"{s['iou_0.5']:.4f} |",
        f"| IoU @best th | {u['iou_best']:.4f} (th {u['iou_best_th']}) | "
        f"{m['iou_best']:.4f} (th {m['iou_best_th']}) | "
        f"{s['iou_best']:.4f} (th {s['iou_best_th']}) |",
        f"| Chamfer distance (mean of {s['chamfer_n']}) | "
        f"{_fmt(u['chamfer_mean'])} | {_fmt(m['chamfer_mean'])} | "
        f"{_fmt(s['chamfer_mean'])} |",
    ]
    if "critic_score" in s or "critic_score_noft" in s:
        lines.append(
            f"| critic score (realism, higher=better) | — | "
            f"{_fmt(s.get('critic_score_noft'), '.1f')} "
            f"(frozen stage-A net) | {_fmt(s.get('critic_score'), '.1f')} |")
    sep = report.get("critic_separation", [])
    if sep:
        lines += [
            "",
            "## Critic separation during stage B (prior-quality evidence)",
            "",
            "Critic scores on one held-out batch: real solids, fresh G(z) "
            "samples, the frozen stage-A net's outputs.  A healthy prior "
            "ranks real > marrnet2 > G(z) early and narrows real-vs-G(z) "
            "as G improves; `examples/prior_gz_*.obj` are G(z) sample "
            "meshes.",
            "",
            "| step | D(real) | D(G(z)) | D(marrnet2(x)) |",
            "|---|---|---|---|",
        ]
        for row in sep:
            tag = f"{row['step']}" + (" (final)" if row["epoch"] < 0 else "")
            lines.append(f"| {tag} | {row['d_real']:.1f} | "
                         f"{row['d_gz']:.1f} | {row['d_m2']:.1f} |")
    sweep = report.get("shapehd_sweep", [])
    if sweep:
        lines += [
            "",
            "## Stage-C critic-weight sweep",
            "",
            "`auto:R` anchors the critic's arbitrary Wasserstein scale: w "
            "is chosen so the gan/sup gradient-norm ratio at stage-C start "
            "is R.  w=0 is the continued-supervision control (same extra "
            "steps, no critic).  Each variant keeps its best-IoU epoch.",
            "",
            "| w_gan_loss | grad gan/sup at start | best epoch | IoU @0.5 "
            "| IoU @best th | Chamfer | critic score |",
            "|---|---|---|---|---|---|---|",
        ]
        for sw in sweep:
            lines.append(
                f"| {sw.get('w_token', sw['w_gan_loss'])} "
                f"(={sw['w_gan_loss']:.2g}) | "
                f"{sw['grad_split']['gan_over_sup']:.2f} | "
                f"{sw.get('best_epoch')} | "
                f"{sw['iou_0.5']:.4f} | {sw['iou_best']:.4f} "
                f"(th {sw['iou_best_th']}) | {_fmt(sw['chamfer_mean'])} | "
                f"{_fmt(sw.get('critic_score'), '.1f')} |")
        prim = sweep[0]
        if prim.get("trajectory"):
            lines += [
                "",
                "### Primary-variant stage-C trajectory (held-out IoU / "
                "critic score per 100-step epoch)",
                "",
                "| epoch | IoU @0.5 | critic(ft) | critic(frozen) | sup "
                "loss |",
                "|---|---|---|---|---|",
            ]
            for row in prim["trajectory"]:
                lines.append(
                    f"| {row['epoch']} | {row['iou_0.5']:.4f} | "
                    f"{_fmt(row.get('critic_score'), '.1f')} | "
                    f"{_fmt(row.get('critic_score_noft'), '.1f')} | "
                    f"{_fmt(row.get('sup'))} |")
    lines += [
        "",
        "IoU is against the SOLID GT occupancy grid (the MarrNet-2/ShapeHD "
        "supervision target, marrnet2.py:81-85), unlike the GenRe qualruns' "
        "surface-shell IoU — the two families' numbers are not directly "
        "comparable.  Chamfer follows the in-repo protocol "
        "(tools/eval_chamfer.py): marching-cubes surfaces, 1024 "
        "area-weighted samples, bidirectional `nndistance_score`.",
        "",
        "Artifacts: `qualrun_shapehd.json`, `examples/*.npz`, "
        "`examples/*.obj` in the run logdir.",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
