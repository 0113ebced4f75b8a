"""Per-stage wall-clock profile of full-GenRe inference on one chip.

Times each pipeline stage (net1 U-ResNet, camera backprojection, spherical
rendering, inpainting U-ResNet, spherical backprojection, 3D U-Net) in
isolation with the same serial-dependency `lax.fori_loop` used by bench.py
(the axon relay acks unfetched buffers early, so naive dispatch loops
over-report).  Also prints XLA's FLOP estimate per stage
(`Compiled.cost_analysis`) and the implied achieved TFLOP/s.

Usage: python tools/profile_stages.py [--batch 4] [--iters 8]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")

PEAK_BF16_TFLOPS = 197.0  # TPU v5e (v5 lite) peak bf16


def timed(fn, args, n_iter, trials=3, with_flops=False):
    """Median seconds per call of fn(*args), serial-chained n_iter times."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            delta = jnp.mean(out.astype(jnp.float32)) * 1e-3
            bumped = tuple(
                a + (delta * 1e-6).astype(a.dtype) if a.dtype in (
                    jnp.float32, jnp.bfloat16) else a for a in args)
            return (bumped, acc + delta)
        (_, acc) = jax.lax.fori_loop(0, n_iter, body, (args, jnp.float32(0)))
        return acc

    float(chained(*args))  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) / n_iter)
    flops = 0.0
    if with_flops:  # costs an extra (unlooped) compile per stage
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        flops = (cost or {}).get("flops", 0.0)
    return statistics.median(times), flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--flops", action="store_true",
                    help="also report XLA FLOP estimates (extra compiles)")
    ap.add_argument("--only", default=None,
                    help="comma-separated stage-name substrings to run")
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu import ops
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.nn import UNet3D, UResNet
    from genre_shapehd_tpu.ops.render_sph_fast import render_spherical_fast

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    rgb = jax.random.normal(rng, (B, 256, 256, 3), jnp.float32)
    net1 = UResNet(out_planes=(3, 1, 1),
                   layer_names=("normal", "depth", "silhou"),
                   pred_depth_minmax=True, dtype=dt)
    v1 = jax.jit(lambda r: net1.init(r, rgb[:1], train=False))(rng)

    def net1_fwd(rgb):
        return net1.apply(v1, rgb, train=False)["depth"]

    depth = jax.random.uniform(rng, (B, 256, 256), jnp.float32,
                               minval=2.0, maxval=2.4)

    def cambp(depth):
        return ops.camera_backproject_shifted(
            depth, ops.FL_GENRE, ops.CAM_DIST, 128)

    vox = jax.random.uniform(rng, (B, 128, 128, 128), jnp.float32,
                             minval=1e-4, maxval=1.0 - 1e-4)

    def render(vox):
        return render_spherical_fast(vox, 128, 256, compute_dtype=dt)

    sphmap = jax.random.uniform(rng, (B, 160, 160, 1), jnp.float32)
    net2 = UResNet(out_planes=(1,), layer_names=("spherical",),
                   inpainting=True, dtype=dt)
    v2 = jax.jit(lambda r: net2.init(r, sphmap[:1], train=False))(rng)

    def net2_fwd(sph):
        return net2.apply(v2, sph, train=False)["spherical"]

    def sphbp(sph):
        return ops.backproject_spherical_masked(sph[..., 0], 16, 128)

    refine_in = jax.random.uniform(rng, (B, 128, 128, 128, 2), jnp.float32)
    unet = UNet3D(nf=20, res=128, dtype=dt)
    vu = jax.jit(lambda r: unet.init(r, refine_in[:1], train=False))(rng)

    def unet_fwd(x):
        return unet.apply(vu, x, train=False)

    tiny = jax.random.normal(rng, (8, 128), jnp.float32)
    stages = [
        # trivial op first: measures the fixed per-iteration overhead of
        # the axon relay (launch + value fetch); mentally subtract it
        # from every stage below (~4ms measured)
        ("overhead_floor", lambda x: x * 1.0001, (tiny,)),
        ("net1_uresnet_256", net1_fwd, (rgb,)),
        ("camera_backproject_128", cambp, (depth,)),
        ("render_spherical_fast", render, (vox,)),
        ("net2_inpaint_160", net2_fwd, (sphmap,)),
        ("spherical_backproject", sphbp, (sphmap,)),
        ("unet3d_refine_128", unet_fwd, (refine_in,)),
    ]

    if args.only:
        keys = args.only.split(",")
        stages = [s for s in stages if any(k in s[0] for k in keys)]

    total = 0.0
    print(f"batch={B} iters={args.iters}  (seconds per batch-{B} call)",
          flush=True)
    for name, fn, a in stages:
        sec, flops = timed(fn, a, args.iters, with_flops=args.flops)
        total += sec
        tflops = flops / sec / 1e12 if sec > 0 else 0.0
        print(f"  {name:28s} {sec * 1e3:8.2f} ms   "
              f"{flops / 1e9:9.1f} GFLOP   {tflops:7.2f} TF/s  "
              f"({tflops / PEAK_BF16_TFLOPS * 100:5.1f}% peak)", flush=True)
    print(f"  {'TOTAL (sum of stages)':28s} {total * 1e3:8.2f} ms   "
          f"-> {B / total:.1f} recon/s")


if __name__ == "__main__":
    main()
