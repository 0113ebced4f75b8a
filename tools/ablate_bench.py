"""In-graph marginal cost of each GenRe pipeline stage, by ablation.

Isolated per-stage probes (tools/profile_stages.py) over-estimate: XLA
fuses across stage boundaries in the full graph, so the sum of isolated
times exceeds the fused step.  This tool measures the MARGINAL in-graph
cost instead: bench the full forward, then re-bench with one stage
replaced by a shape-preserving near-zero-cost dummy; the difference is
what that stage actually costs inside the fused program.

Usage: python tools/ablate_bench.py [--batch 8] [--iters 24]
       [--only cam_bp,render,...]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def bench_once(batch, n_iter, ablate):
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu import ops
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_model
    from genre_shapehd_tpu.models.base import default_opt
    from genre_shapehd_tpu.nn import unet3d as unet3d_mod
    from genre_shapehd_tpu.ops import render_sph_fast as rsf

    enable_compile_cache()

    # --- install ablation dummies (shape-preserving, near-zero cost) ----
    saved = {}

    def patch(obj, name, fn):
        saved[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if ablate == "cam_bp":
        def dummy_cam_bp(depth, fl=None, cam_dist=None, res=128):
            v = jnp.mean(depth) * 1e-6 + 0.9
            n = depth.shape[0]
            return jnp.broadcast_to(v, (n, res, res, res))
        patch(ops, "camera_backproject_shifted", dummy_cam_bp)
    elif ablate == "render":
        def dummy_render(vox, sph_res=128, z_res=256, **kw):
            v = jnp.mean(vox) * 1e-6 + 0.5
            return jnp.broadcast_to(v, (vox.shape[0], sph_res, sph_res))
        patch(rsf, "render_spherical_fast", dummy_render)
    elif ablate == "sph_bp":
        def dummy_sph_bp(sph, margin, res):
            v = jnp.mean(sph) * 1e-6 + 0.3
            return jnp.broadcast_to(v, (sph.shape[0], res, res, res))
        patch(ops, "backproject_spherical_masked", dummy_sph_bp)
    elif ablate == "unet3d":
        def dummy_unet(self, x, train):
            return jnp.mean(x, axis=-1) * 1e-3
        patch(unet3d_mod.UNet3D, "__call__", dummy_unet)
    elif ablate != "none":
        raise SystemExit(f"unknown ablation {ablate!r}")

    try:
        opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                          padding_margin=16, dtype="bfloat16",
                          batch_size=batch)
        model = get_model("genre_full_model")(opt)
        state = model.init_state(jax.random.PRNGKey(0))
        params, bstats = state.params["net"], state.batch_stats["net"]

        @jax.jit
        def chained(params, bstats, rgb, silhou):
            def body(i, carry):
                rgb, acc = carry
                out = model.net.apply(
                    {"params": params, "batch_stats": bstats}, rgb, silhou,
                    train=False)
                delta = jnp.mean(out["pred_voxel"].astype(jnp.float32))
                rgb = rgb + (delta * 1e-6).astype(rgb.dtype)
                return (rgb, acc + delta)
            (_, acc) = jax.lax.fori_loop(
                0, n_iter, body, (rgb, jnp.float32(0)))
            return acc

        rgb = jnp.zeros((batch, 256, 256, 3), jnp.float32)
        silhou = 100.0 * jnp.ones((batch, 256, 256, 1), jnp.float32)
        float(chained(params, bstats, rgb, silhou))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(params, bstats, rgb, silhou))
            times.append((time.perf_counter() - t0) / n_iter)
        return statistics.median(times)
    finally:
        for (obj, name), fn in saved.items():
            setattr(obj, name, fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    ablations = ["none", "unet3d", "render", "cam_bp", "sph_bp"]
    if args.only:
        ablations = ["none"] + [a for a in args.only.split(",")
                                if a != "none"]
    base = None
    print(f"batch={args.batch} iters={args.iters}", flush=True)
    for ab in ablations:
        sec = bench_once(args.batch, args.iters, ab)
        if ab == "none":
            base = sec
            print(f"  full forward          {sec * 1e3:8.2f} ms/step",
                  flush=True)
        else:
            print(f"  - {ab:18s}  {sec * 1e3:8.2f} ms/step  "
                  f"(marginal {1e3 * (base - sec):+8.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
