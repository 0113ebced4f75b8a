"""Measure conv-decomposition implementations per U-Net geometry on chip.

Each 3D conv/deconv geometry in the voxel networks can be realized
several exact ways (XLA native 3-spatial conv, per-depth-phase 2D convs,
depth-tap-stacked 2D convs, full 1x1-GEMM tap unfold); which is fastest
depends on the GEMM shapes the MXU sees.  This probe times every
(geometry, impl) pair at reference scale and prints a ranked table; the
'auto' routing in nn/voxel_nets.py cites these numbers.

Usage: python tools/probe_conv_impls.py [--batch 8] [--iters 8]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def timed(fn, x, n_iter, trials=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            delta = jnp.mean(out.astype(jnp.float32)) * 1e-3
            return (x + (delta * 1e-6).astype(x.dtype), acc + delta)
        _, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
        return acc

    float(chained(x))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(x))
        ts.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    import flax.linen as fnn
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.nn.voxel_nets import (
        Conv3D, DepthPhaseConv3D, SubpixelTConv3D, _tp)
    from genre_shapehd_tpu.nn.init import kaiming_normal

    enable_compile_cache()
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def conv_case(d, cin, cout, k, p, impl):
        if impl == "native3d":
            m = fnn.Conv(cout, (k,) * 3, strides=(2,) * 3, padding=p,
                         kernel_init=kaiming_normal, dtype=dt)
        else:
            m = DepthPhaseConv3D(cout, k, p, impl=impl, dtype=dt)
        x = jax.random.normal(rng, (B, d, d, d, cin), jnp.float32)
        v = m.init(rng, x[:1])
        return (lambda xx: m.apply(v, xx)), x

    def deconv_case(d, cin, cout, k, impl):
        if impl == "flaxT":
            m = fnn.ConvTranspose(cout, (k,) * 3, strides=(2,) * 3,
                                  padding=_tp(k, k // 2 - 1),
                                  kernel_init=kaiming_normal, dtype=dt)
        else:
            m = SubpixelTConv3D(cout, k, impl=impl, dtype=dt)
        x = jax.random.normal(rng, (B, d, d, d, cin), jnp.float32)
        v = m.init(rng, x[:1])
        return (lambda xx: m.apply(v, xx)), x

    cases = []
    for name, d, cin, cout, k, p in [
            ("enc1 k8 2->20 @128", 128, 2, 20, 8, 3),
            ("enc2 k4 20->40 @64", 64, 20, 40, 4, 1),
            ("enc3 k4 40->80 @32", 32, 40, 80, 4, 1)]:
        for impl in ("phase2d", "tapstack2d", "native3d"):
            cases.append((f"{name} [{impl}]",
                          lambda i=impl, a=(d, cin, cout, k, p):
                          conv_case(*a, i)))
    for name, d, cin, cout, k in [
            ("dec4 k4 320->40 @16", 16, 320, 40, 4),
            ("dec5 k8 80->20 @32", 32, 80, 20, 8),
            ("dec6 k4 40->1 @64", 64, 40, 1, 4)]:
        impls = ("native3d", "stacked2d", "gemm1x1", "scan2d") if k == 4 \
            else ("native3d", "stacked2d", "scan2d")
        for impl in impls:
            cases.append((f"{name} [{impl}]",
                          lambda i=impl, a=(d, cin, cout, k):
                          deconv_case(*a, i)))

    if args.only:
        keys = args.only.split(",")
        cases = [c for c in cases if any(s in c[0] for s in keys)]

    print(f"batch={B} iters={args.iters} (ms per batch call)", flush=True)
    for name, make in cases:
        try:
            fn, x = make()
            sec = timed(fn, x, args.iters)
            print(f"  {name:36s} {sec * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name:36s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
