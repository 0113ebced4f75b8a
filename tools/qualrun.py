"""Reconstruction-quality benchmark on the procedural shape dataset.

Proves the GenRe geometry chain (cam_bp -> spherical render -> inpaint ->
spherical bp -> 3D U-Net refine) carries shape signal end-to-end: trains
the reference's staged pipeline (train_inpaint.sh -> train_full_genre.sh,
/root/reference/README.md:136-156) with oracle GT depth inputs
(--gt_depth_input) on analytic scenes, then reports held-out surface-IoU
and Chamfer distance against an untrained baseline.

Usage (full-scale, on the TPU chip):
  python tools/qualrun.py --logdir /tmp/qualrun --out QUALRUN_r03.md
Smoke (CPU, tiny):
  python tools/qualrun.py --tiny --steps1 4 --steps2 4 --logdir /tmp/q
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(net, opt):
    import jax
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader
    from genre_shapehd_tpu.train.loggers import ComposeLogger, ProgbarLogger
    from genre_shapehd_tpu.train.loop import Trainer

    model = get_model(net)(opt)
    ds_train = get_dataset("procedural")(opt, "train", model=model)
    ds_vali = get_dataset("procedural")(opt, "vali", model=model)
    # generate every scene once up front: heavy numpy in loader threads
    # concurrent with device steps starves XLA:CPU's 40s collective
    # rendezvous on few-core hosts, and on TPU it skews the first epoch
    t0 = time.time()
    for ds in (ds_train, ds_vali):
        for i in range(len(ds)):
            ds._raw(i)
    print(f"[qualrun] cache warm ({len(ds_train)}+{len(ds_vali)} scenes) "
          f"in {time.time() - t0:.0f}s", flush=True)
    tl = DataLoader(ds_train, opt.batch_size, num_workers=opt.workers,
                    seed=0)
    vl = DataLoader(ds_vali, opt.batch_size, num_workers=opt.workers,
                    shuffle=False, drop_last=False)
    trainer = Trainer(model, opt, ComposeLogger([ProgbarLogger()]))
    trainer.initialize(jax.random.PRNGKey(0))
    return model, trainer, tl, vl


def eval_quality(model, trainer, vl, max_batches=None, tag=""):
    """Held-out metrics: surface IoU (pred>0.5 vs GT erosion shell),
    best-threshold IoU, and Chamfer distance (the reference's headline
    metric, README.md:104-117) via tools/eval_chamfer.py."""
    import jax
    from genre_shapehd_tpu.ops.voxel import surface_from_solid_np
    from tools.eval_chamfer import chamfer_between_voxels

    inter = {t: 0.0 for t in THRESHOLDS}
    union = {t: 0.0 for t in THRESHOLDS}
    chamfers = []
    n_items = 0
    examples = []
    for bi, batch in enumerate(vl):
        if max_batches and bi >= max_batches:
            break
        dev_batch, rest = trainer._device_batch(batch)
        metrics, pred = trainer._eval_step(trainer.state, dev_batch,
                                           jax.random.PRNGKey(9))
        # drain the program before the next launch (CPU collective-overlap
        # hazard, see Trainer._serialize_steps)
        jax.block_until_ready((metrics, pred))
        true_n = rest["_true_size"]
        logits = np.asarray(pred["pred_voxel"])[:true_n].astype(np.float32)
        gt_solid = np.asarray(batch["voxel"])[:true_n]
        prob = 1.0 / (1.0 + np.exp(-logits))
        for i in range(true_n):
            shell = surface_from_solid_np(gt_solid[i]) > 0.5
            for t in THRESHOLDS:
                p = prob[i] > t
                inter[t] += float((p & shell).sum())
                union[t] += float((p | shell).sum())
            if n_items < 16:          # chamfer is host-side marching cubes
                chamfers.append(chamfer_between_voxels(
                    logits[i], shell.astype(np.float32), th=0.25,
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
    print(f"[qualrun] {tag}: {json.dumps({k: v for k, v in res.items() if k != 'iou_by_th'})}")
    return res, examples


THRESHOLDS = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7)


def probe_joint_grad_split(model, trainer, loader):
    """Under --joint2: L2 norms of the voxel-loss vs (weighted) 2.5D-loss
    gradients into net1 at stage-2 start -- the trained-regime evidence
    that --joint_w25d balances the two supervision families
    (tests/test_joint_finetune.py pins the flow; this pins the
    magnitudes)."""
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.train.loop import decompress_batch

    batch = next(iter(loader))
    dev_batch, _ = trainer._device_batch(batch)
    state = trainer.state

    def part(net_params, which):
        db = decompress_batch(dev_batch)
        pred, _ = model._forward(net_params, state.batch_stats["net"],
                                 db, True)
        full, parts = model.compute_loss(pred, db)
        vox = parts["voxel_loss"] + parts["surface_loss"]
        return vox if which == "vox" else full - vox

    @jax.jit
    def norms(params):
        out = {}
        for which in ("vox", "25d"):
            g = jax.grad(lambda p: part(p, which))(params)
            g1 = g["depth_and_inpaint"]["net1"]
            out[which] = jnp.sqrt(sum(
                jnp.vdot(x, x).real for x in jax.tree.leaves(g1)))
        return out

    res = jax.device_get(norms(state.params["net"]))
    out = {f"net1_grad_norm_{k}": float(v) for k, v in res.items()}
    out["vox_over_25d"] = (out["net1_grad_norm_vox"]
                           / max(out["net1_grad_norm_25d"], 1e-30))
    return out


def dump_examples(examples, outdir, tag):
    from genre_shapehd_tpu.ops.voxel import surface_from_solid_np
    os.makedirs(outdir, exist_ok=True)
    for i, (logits, gt_solid) in enumerate(examples):
        np.savez_compressed(
            os.path.join(outdir, f"{tag}_{i}.npz"),
            pred_logits=logits.astype(np.float16),
            gt_solid=gt_solid.astype(np.uint8))
        try:
            from genre_shapehd_tpu.viz.mcubes import marching_cubes
            from genre_shapehd_tpu.viz.visualizer import write_obj
            prob = 1.0 / (1.0 + np.exp(-logits.astype(np.float32)))
            for name, vol, th in ((f"{tag}_{i}_pred", prob, 0.25),
                                  (f"{tag}_{i}_gt",
                                   surface_from_solid_np(gt_solid), 0.5)):
                verts, faces = marching_cubes(vol, th)
                if len(faces):
                    write_obj(os.path.join(outdir, name + ".obj"),
                              verts, faces)
        except Exception as e:       # viz is best-effort
            print(f"[qualrun] obj dump skipped: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps0", type=int, default=2000,
                    help="net1 (2.5D prediction) pretrain steps "
                         "(--full_pipeline only)")
    ap.add_argument("--steps0b", type=int, default=0,
                    help="extra net1 steps at --lr_b (staged lr decay, the "
                         "manual restart-at-lower-lr workflow the "
                         "reference's resume+--lr flags support)")
    ap.add_argument("--steps1", type=int, default=1500,
                    help="inpainting pretrain steps (stage 1)")
    ap.add_argument("--steps2", type=int, default=4000,
                    help="full-genre refine steps (stage 2)")
    ap.add_argument("--steps2b", type=int, default=0,
                    help="extra refine steps at --lr_b after stage 2")
    ap.add_argument("--lr_b", type=float, default=None,
                    help="decayed lr for the *b phases (default lr/10)")
    ap.add_argument("--init0", default=None,
                    help="warm-start stage 0 from an existing net1 "
                         "checkpoint (continued training at --lr0; the "
                         "reference's resume-at-lower-lr workflow, "
                         "train.py:144-171 + --lr)")
    ap.add_argument("--lr0", type=float, default=None,
                    help="stage-0 phase-a lr override (default --lr)")
    ap.add_argument("--lr0b", type=float, default=None,
                    help="stage-0 phase-b lr override (default --lr_b)")
    ap.add_argument("--init2", default=None,
                    help="warm-start stage 2 from an existing full-genre "
                         "checkpoint (continued refine training, or joint "
                         "end-to-end fine-tuning with --joint2)")
    ap.add_argument("--joint2", action="store_true",
                    help="stage 2 trains the WHOLE chain end to end "
                         "(--joint_train: no stop_gradient on net1, voxel "
                         "loss gradients flow through cam_bp -> render -> "
                         "inpaint -> spherical bp into net1 -- possible "
                         "here because the spherical renderer is "
                         "differentiable, unlike the reference's ray-cast "
                         "test path, util_sph.py:36-57)")
    ap.add_argument("--w25d", type=float, default=0.01,
                    help="--joint_w25d for stage 2: weight on the 2.5D "
                         "supervision relative to the voxel loss")
    ap.add_argument("--lr2", type=float, default=None,
                    help="stage-2 phase-a lr override (default --lr)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--train_n", type=int, default=1024,
                    help="unique procedural training scenes")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--logdir", default="/tmp/qualrun")
    ap.add_argument("--out", default=None, help="markdown report path")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny resolutions for CPU smoke testing")
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU platform (the "
                         "axon sitecustomize otherwise claims the backend)")
    ap.add_argument("--eval_batches", type=int, default=None)
    ap.add_argument("--skip1", action="store_true",
                    help="reuse an existing stage-1 checkpoint "
                         "(<logdir>/inpaint.pt) instead of retraining")
    ap.add_argument("--full_pipeline", action="store_true",
                    help="no GT-depth oracle anywhere: stage 0 trains net1 "
                         "(RGB -> 2.5D, the reference's marrnet1 step), and "
                         "the geometry chain runs on net1's PREDICTED depth "
                         "through training and eval -- the complete "
                         "reference workflow (README.md:136-156)")
    ap.add_argument("--skip0", action="store_true",
                    help="reuse an existing stage-0 checkpoint "
                         "(<logdir>/net1.pt) instead of retraining")
    ap.add_argument("--offline", action="store_true",
                    help="oracle-ceiling decomposition cell: --load_offline "
                         "everywhere -- net2 inpaints the GT full spherical "
                         "map instead of the rendered partial one, so the "
                         "result isolates inpaint-fidelity + sph-bp + refine "
                         "(removes the render-partial inpainting task)")
    ap.add_argument("--gtminmax", action="store_true",
                    help="oracle split for --full_pipeline: net1's "
                         "PREDICTED depth map but GT scalar minmax -- "
                         "isolates the minmax head's absolute-scale error "
                         "(a dmin error radially displaces the whole "
                         "backprojected shell)")
    ap.add_argument("--f32_heads", action="store_true",
                    help="net1 decoders/heads in f32 (must match the net1 "
                         "checkpoint; see tools/ablate_net1.py)")
    ap.add_argument("--decoder_width", type=float, default=1.0,
                    help="net1 decoder width multiplier (must match the "
                         "net1 checkpoint)")
    ap.add_argument("--no_aug", action="store_true",
                    help="disable photometric augmentation in every stage")
    ap.add_argument("--gtsph", action="store_true",
                    help="oracle-ceiling decomposition cell: --gt_sph_full "
                         "-- the refine net backprojects the GT spherical "
                         "map directly (no inpainting net at all), "
                         "isolating sph-bp + refine; stage 1 is skipped")
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
    common = dict(batch_size=args.batch, lr=args.lr,
                  gt_depth_input=not args.full_pipeline,
                  load_offline=args.offline,
                  gt_minmax_input=args.gtminmax,
                  f32_heads=args.f32_heads, decoder_width=args.decoder_width,
                  no_aug=args.no_aug,
                  procedural_length=args.train_n, workers=args.workers,
                  dtype="bfloat16", log_every=8, **dims)
    os.makedirs(args.logdir, exist_ok=True)
    report = {"config": {**common, "steps0": args.steps0,
                         "steps0b": args.steps0b, "steps1": args.steps1,
                         "steps2": args.steps2, "steps2b": args.steps2b,
                         "lr_b": args.lr_b if args.lr_b is not None
                         else args.lr / 10,
                         "init0": args.init0, "lr0": args.lr0,
                         "lr0b": args.lr0b, "init2": args.init2,
                         "joint2": args.joint2, "w25d": args.w25d,
                         "lr2": args.lr2, "offline": args.offline,
                         "gtsph": args.gtsph, "gtminmax": args.gtminmax,
                         "full_pipeline": args.full_pipeline}}

    import jax
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.parallel import mesh as pmesh
    enable_compile_cache()
    report["backend"] = jax.default_backend()

    # ------------------------------ stage 0: net1 2.5D prediction (full
    # pipeline only; the reference's marrnet1 pretraining step)
    ckpt0 = os.path.join(args.logdir, "net1.pt")
    if args.full_pipeline:
        if args.skip0 and os.path.exists(ckpt0):
            report["stage0"] = {"reused": ckpt0}
            print(f"[qualrun] stage0 reused: {ckpt0}")
        else:
            t0 = time.time()
            opt0 = default_opt(**{**common,
                                  "lr": args.lr0 if args.lr0 is not None
                                  else args.lr},
                               pred_depth_minmax=True)
            model0, trainer0, tl0, vl0 = build("marrnet1", opt0)
            if args.init0:
                trainer0.load(args.init0)
                trainer0.start_epoch = 0
            spe = min(100, args.steps0)
            log0 = trainer0.fit(tl0, vl0,
                                epochs=max(args.steps0 // spe, 1),
                                steps_per_epoch=spe, eval_batches=2,
                                rng=jax.random.PRNGKey(7))
            trainer0.save(ckpt0, epoch=args.steps0)
            if args.steps0b:
                lr_b = args.lr_b if args.lr_b is not None else args.lr / 10
                if args.lr0b is not None:
                    lr_b = args.lr0b
                opt0b = default_opt(**{**common, "lr": lr_b},
                                    pred_depth_minmax=True)
                model0, trainer0, tl0, vl0 = build("marrnet1", opt0b)
                trainer0.load(ckpt0)
                trainer0.start_epoch = 0   # fit() counts epochs from here
                speb = min(100, args.steps0b)
                log0 = trainer0.fit(tl0, vl0,
                                    epochs=max(args.steps0b // speb, 1),
                                    steps_per_epoch=speb, eval_batches=2,
                                    rng=jax.random.PRNGKey(77))
                trainer0.save(ckpt0, epoch=args.steps0 + args.steps0b)
            report["stage0"] = {
                "final_log": {k: float(v) for k, v in log0.items()},
                "seconds": round(time.time() - t0, 1)}
            print(f"[qualrun] stage0 done in "
                  f"{report['stage0']['seconds']}s: {log0}")

    # ---------------------------------------------- stage 1: inpainting
    ckpt1 = os.path.join(args.logdir, "inpaint.pt")
    if args.gtsph:
        report["stage1"] = {"reused": "skipped (--gtsph bypasses net2)"}
        print("[qualrun] stage1 skipped (--gtsph)")
    elif args.skip1 and os.path.exists(ckpt1):
        report["stage1"] = {"reused": ckpt1}
        print(f"[qualrun] stage1 reused: {ckpt1}")
    else:
        t0 = time.time()
        opt1 = default_opt(**common)
        model1, trainer1, tl1, vl1 = build("depth_pred_with_sph_inpaint",
                                           opt1)
        if args.full_pipeline:
            # net1 (frozen by default, stop_gradient in the net) supplies
            # the predicted depth that feeds the geometry chain
            trainer1.state = model1.load_subnet(trainer1.state, "net1",
                                                ckpt0)
            trainer1.state = pmesh.replicate_state(trainer1.state,
                                                   trainer1.mesh)
        spe = min(100, args.steps1)
        log1 = trainer1.fit(tl1, vl1, epochs=max(args.steps1 // spe, 1),
                            steps_per_epoch=spe, eval_batches=2,
                            rng=jax.random.PRNGKey(1))
        trainer1.save(ckpt1, epoch=args.steps1)
        report["stage1"] = {
            "final_log": {k: float(v) for k, v in log1.items()},
            "seconds": round(time.time() - t0, 1)}
        print(f"[qualrun] stage1 done in {report['stage1']['seconds']}s: "
              f"{log1}")

    # ------------------------------- untrained baseline (fresh genre net)
    common2 = dict(common, joint_train=args.joint2, joint_w25d=args.w25d,
                   gt_sph_full=args.gtsph,
                   lr=args.lr2 if args.lr2 is not None else args.lr)
    opt2 = default_opt(**common2, inpaint_path=None)
    model2, trainer2, tl2, vl2 = build("genre_full_model", opt2)
    base_res, base_ex = eval_quality(model2, trainer2, vl2,
                                     max_batches=args.eval_batches,
                                     tag="untrained")
    report["untrained"] = base_res

    # ------------------------------------------ stage 2: voxel refinement
    t0 = time.time()
    if args.init2:
        # continued training (optionally joint end-to-end fine-tuning) from
        # a full-genre checkpoint of a previous run
        trainer2.load(args.init2)
        trainer2.start_epoch = 0
    elif not args.gtsph:                  # --gtsph never runs net2
        trainer2.state = model2.load_subnet(trainer2.state,
                                            "depth_and_inpaint", ckpt1)
        trainer2.state = pmesh.replicate_state(trainer2.state, trainer2.mesh)
    if args.joint2:
        probe = probe_joint_grad_split(model2, trainer2, tl2)
        report["joint_grad_split"] = probe
        print(f"[qualrun] joint grad split at stage-2 start: "
              f"{json.dumps(probe)}", flush=True)
    spe = min(100, args.steps2)
    log2 = trainer2.fit(tl2, vl2, epochs=max(args.steps2 // spe, 1),
                        steps_per_epoch=spe, eval_batches=2,
                        rng=jax.random.PRNGKey(2))
    ckpt2 = os.path.join(args.logdir, "genre.pt")
    trainer2.save(ckpt2, epoch=args.steps2)
    if args.steps2b:
        lr_b = args.lr_b if args.lr_b is not None else args.lr / 10
        opt2b = default_opt(**{**common2, "lr": lr_b}, inpaint_path=None)
        model2, trainer2, tl2, vl2 = build("genre_full_model", opt2b)
        trainer2.load(ckpt2)
        trainer2.start_epoch = 0
        speb = min(100, args.steps2b)
        log2 = trainer2.fit(tl2, vl2, epochs=max(args.steps2b // speb, 1),
                            steps_per_epoch=speb, eval_batches=2,
                            rng=jax.random.PRNGKey(22))
        trainer2.save(ckpt2, epoch=args.steps2 + args.steps2b)
    report["stage2"] = {"final_log": {k: float(v) for k, v in log2.items()},
                        "seconds": round(time.time() - t0, 1)}
    print(f"[qualrun] stage2 done in {report['stage2']['seconds']}s: {log2}")

    trained_res, trained_ex = eval_quality(model2, trainer2, vl2,
                                           max_batches=args.eval_batches,
                                           tag="trained")
    report["trained"] = trained_res
    dump_examples(trained_ex, os.path.join(args.logdir, "examples"),
                  "trained")
    dump_examples(base_ex[:1], os.path.join(args.logdir, "examples"),
                  "untrained")

    with open(os.path.join(args.logdir, "qualrun.json"), "w") as f:
        json.dump(report, f, indent=2)
    if args.out:
        write_markdown(args.out, report)
    print("[qualrun] report:", json.dumps(
        {k: report[k] for k in ("untrained", "trained")}, indent=2))


def write_markdown(path, report):
    u, t = report["untrained"], report["trained"]
    cfg = report["config"]
    full = cfg.get("full_pipeline")
    mode = (
        "with NO oracle anywhere: stage 0 trains net1 (RGB -> 2.5D, the "
        "reference's marrnet1 step) and the geometry chain consumes net1's "
        "PREDICTED depth through training and eval -- the complete RGB -> "
        "3D reference workflow (README.md:136-156)"
        if full else
        "with oracle GT depth inputs (`--gt_depth_input`)")
    lines = [
        "# QUALRUN — reconstruction quality on the procedural benchmark"
        + (" (full RGB pipeline)" if full else ""),
        "",
        "Staged GenRe training (" + ("net1 -> " if full else "")
        + "inpaint -> full refine, the reference's "
        + ("train_marrnet1.sh -> " if full else "")
        + "train_inpaint.sh -> train_full_genre.sh workflow) "
        + mode + " on analytic scenes "
        "(`genre_shapehd_tpu/data/procedural.py`): random unions of rotated "
        "boxes/ellipsoids with exact multi-modal GT, geometric consistency "
        "pinned by `tests/test_procedural_data.py`.",
        "",
        f"- backend: `{report['backend']}`, dtype bfloat16, "
        f"batch {cfg['batch_size']}, lr {cfg['lr']}",
        f"- resolutions: voxel {cfg['vox_res']}^3, image {cfg['im_size']}^2, "
        f"spherical {cfg['sph_res']}^2, z_res {cfg['z_res']}",
    ] + ([
        f"- stage 0 (net1 2.5D prediction): {cfg['steps0']} steps"
        + (f" + {cfg['steps0b']} at lr {cfg['lr_b']}"
           if cfg.get("steps0b") else "") + ", "
        + (f"{report['stage0']['seconds']}s, final "
           f"{json.dumps(report['stage0']['final_log'])}"
           if "seconds" in report.get("stage0", {})
           else f"reused checkpoint {report['stage0']['reused']}")
    ] if full else []) + [
        f"- stage 1 (spherical inpainting): {cfg['steps1']} steps, "
        + (f"{report['stage1']['seconds']}s, final "
           f"{json.dumps(report['stage1']['final_log'])}"
           if "seconds" in report["stage1"]
           else f"reused checkpoint {report['stage1']['reused']}"),
        f"- stage 2 (voxel refinement): {cfg['steps2']} steps"
        + (f" + {cfg['steps2b']} at lr {cfg['lr_b']}"
           if cfg.get("steps2b") else "") + ", "
        f"{report['stage2']['seconds']}s, final "
        f"{json.dumps(report['stage2']['final_log'])}",
        f"- held-out scenes: {t['n_items']} (disjoint seed range from "
        f"{cfg['procedural_length']} train scenes)",
        "",
        "## Results (held-out)",
        "",
        "| metric | untrained | trained |",
        "|---|---|---|",
        f"| surface IoU @0.5 | {u['iou_0.5']:.4f} | {t['iou_0.5']:.4f} |",
        f"| surface IoU @best th | {u['iou_best']:.4f} "
        f"(th {u['iou_best_th']}) | {t['iou_best']:.4f} "
        f"(th {t['iou_best_th']}) |",
        f"| Chamfer distance (mean of {t['chamfer_n']}) | "
        f"{u['chamfer_mean']:.4f} | {t['chamfer_mean']:.4f} |",
        "",
        "Surface IoU = intersection-over-union of the thresholded sigmoid "
        "voxel prediction against the GT 2-iteration-erosion surface shell "
        "(the training target, genre_full_model.py:93-95).  Chamfer follows "
        "the in-repo protocol (tools/eval_chamfer.py): marching-cubes "
        "surfaces, 1024 area-weighted samples, bidirectional "
        "`nndistance_score`.",
        "",
        "Artifacts: `qualrun.json`, `examples/*.npz`, `examples/*.obj` in "
        "the run logdir.",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
