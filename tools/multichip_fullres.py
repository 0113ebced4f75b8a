"""Full-resolution multi-device semantics run (VERDICT r04 item 6/7).

The driver dryrun (__graft_entry__.dryrun_multichip) validates the
sharding design at 64^3; this runs the REAL thing once: the genre_full
train step at the reference scale (256^2 RGB -> 128^3 voxels, padded
spherical 160^2, z_res 256) on the 8-device virtual CPU mesh, with

  * dp(8) over a batch of 4 -> shard_batch's exact uniform-repetition
    padding engages (parallel/mesh.py:85-116),
  * metric equality vs a 1-device control (the padding + BatchNorm
    exactness claim at full shapes),
  * a dp(4) x sp(2) attempt: the 3D U-Net runs spatially sharded with
    GSPMD conv halos at 128^3 (tests/test_mesh_2d.py only covers 32^3).

Slow by design (one CPU core simulates 8 devices at full resolution);
results stream into MULTICHIP_r05.json so partial progress is recorded.

Usage:
  python tools/multichip_fullres.py --out MULTICHIP_r05.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MULTICHIP_r05.json")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--skip_2d", action="store_true")
    ap.add_argument("--skip_control", action="store_true")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + os.environ.get("XLA_FLAGS", "")).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import collate
    from genre_shapehd_tpu.models.base import default_opt
    from genre_shapehd_tpu.parallel import mesh as pmesh
    from genre_shapehd_tpu.train.loggers import ComposeLogger
    from genre_shapehd_tpu.train.loop import Trainer

    report = {"res": {"im_size": 256, "vox_res": 128, "sph_res": 128,
                      "z_res": 256},
              "batch": args.batch, "devices": jax.device_count(),
              "dtype": "bfloat16", "ok": False}

    def flush():
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)

    flush()
    opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                      padding_margin=16, batch_size=args.batch,
                      synthetic_length=args.batch, dtype="bfloat16",
                      lr=1e-4)
    model = get_model("genre_full_model")(opt)
    ds = get_dataset("synthetic")(opt, "train", model=model)
    batch = collate([ds[i] for i in range(args.batch)])

    def run(mesh, tag):
        t0 = time.time()
        trainer = Trainer(model, opt, ComposeLogger([]), mesh=mesh)
        try:
            trainer.initialize(jax.random.PRNGKey(0))
            losses = []
            for _ in range(args.steps):
                dev_batch, _ = trainer._device_batch(batch)
                trainer.state, metrics = trainer._train_step(
                    trainer.state, dev_batch, jax.random.PRNGKey(1))
                jax.block_until_ready(trainer.state)
                losses.append({k: float(v) for k, v in
                               jax.device_get(metrics).items()})
            dev_batch, _ = trainer._device_batch(batch)
            em, pred = trainer._eval_step(trainer.state, dev_batch,
                                          jax.random.PRNGKey(2))
            jax.block_until_ready(pred)
            losses.append({k: float(v) for k, v in
                           jax.device_get(em).items()})
            report[tag] = {"losses": losses,
                           "seconds": round(time.time() - t0, 1)}
            print(f"[multichip] {tag}: {losses} "
                  f"({report[tag]['seconds']}s)", flush=True)
            return losses
        finally:
            pmesh.set_active_mesh(None)
            flush()

    # ---- dp(8), batch 4 -> 2x uniform repetition padding ---------------
    losses_dp = run(pmesh.make_mesh(jax.devices()), "dp8")
    assert all(np.isfinite(v) for m in losses_dp for v in m.values())

    # ---- 1-device control: exact metric equality ----------------------
    if not args.skip_control:
        losses_1 = run(pmesh.make_mesh(jax.devices()[:1]), "dev1")
        diffs = [abs(a["loss"] - b["loss"])
                 for a, b in zip(losses_dp, losses_1)]
        # bf16 compute reduced over different shard layouts: allow tiny
        # reassociation slack, assert equality at bf16 resolution
        tol = [1e-2 * max(1.0, abs(b["loss"])) for b in losses_1]
        report["control_equal"] = bool(
            all(d <= t for d, t in zip(diffs, tol)))
        report["control_diffs"] = diffs
        assert report["control_equal"], (losses_dp, losses_1)
        flush()

    # ---- dp(4) x sp(2): spatially sharded 3D U-Net at 128^3 -----------
    if not args.skip_2d:
        try:
            losses_2d = run(pmesh.make_mesh_2d(dp=4, sp=2), "dp4sp2")
            assert all(np.isfinite(v) for m in losses_2d
                       for v in m.values())
            report["dp4sp2_ok"] = True
        except Exception as e:             # document the bound, don't die
            report["dp4sp2_ok"] = False
            report["dp4sp2_error"] = repr(e)[:500]
            print(f"[multichip] dp4sp2 failed: {e!r}", flush=True)

    report["ok"] = True
    flush()
    print("[multichip] done")


if __name__ == "__main__":
    main()
