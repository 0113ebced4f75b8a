"""Probe: dec5's GEMM ceiling vs XLA's 2D-conv realization.

dec5 (subpixel form) is one VALID 2D conv (288, 36, 36, 80) * (4, 4, 80,
640) + 4 shifted depth adds = 513 GFLOP.  This probe measures:
  1. a pure matmul of the same GEMM volume (M=313k, K=1280, N=640)
     -- the MXU ceiling for this contraction
  2. the XLA 2D conv alone
  3. the conv + shifted-add + assemble tail (full dec5 stacked2d)
If (2) ~ (1), XLA's conv engine is near the ceiling and Pallas has no
room; if (2) >> (1), an im2col-in-VMEM Pallas kernel is worth building.

Usage: python tools/probe_dec5_gemm.py [--iters 8]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def timed(fn, args, n_iter=8, trials=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            delta = jnp.mean(out.astype(jnp.float32)) * 1e-3
            bumped = tuple(
                a + (delta * 1e-6).astype(a.dtype)
                if a.dtype in (jnp.float32, jnp.bfloat16) else a
                for a in args)
            return (bumped, acc + delta)
        (_, acc) = jax.lax.fori_loop(0, n_iter, body, (args, jnp.float32(0)))
        return acc

    float(chained(*args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    GF = 313632 * 1280 * 640 * 2 / 1e9  # 513.9

    # 1. pure matmul, same GEMM volume
    a = jax.random.normal(rng, (313632, 1280), jnp.float32).astype(dt)
    b = jax.random.normal(rng, (1280, 640), jnp.float32).astype(dt)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(dt)

    # 2. the XLA 2D conv alone
    x2 = jax.random.normal(rng, (288, 36, 36, 80), jnp.float32).astype(dt)
    w2 = jax.random.normal(rng, (4, 4, 80, 640), jnp.float32).astype(dt)

    def conv(x2, w2):
        return jax.lax.conv_general_dilated(
            x2, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(dt)

    # 2b. conv expressed as 16 accumulated 1x1 convs (matmul per tap)
    def conv_taps(x2, w2):
        acc = None
        for kh in range(4):
            for kw in range(4):
                xs = x2[:, kh:kh + 33, kw:kw + 33, :]
                t = jnp.einsum("nhwc,co->nhwo", xs, w2[kh, kw],
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return acc.astype(dt)

    # 3. full dec5 stacked2d (conv + shifted adds across depth)
    xb = jax.random.normal(rng, (8, 36, 36, 36, 80), jnp.float32).astype(dt)

    def dec5_full(xb, w2):
        from genre_shapehd_tpu.nn.voxel_nets import _conv3d_stride1_via2d
        w = w2.reshape(4, 4, 4, 80, 160)  # fake (k,k,k,cin,cout*phases)
        w = jnp.moveaxis(w.reshape(4, 4, 4, 80, 160), 0, 0)
        return _conv3d_stride1_via2d(xb, w, dt)

    for name, fn, fargs, gf in [
            ("pure matmul 313k x 1280 x 640", mm, (a, b), GF),
            ("XLA 2D conv (288,36,36,80)*(4,4,80,640)", conv, (x2, w2), GF),
            ("16 accumulated 1x1 matmul taps", conv_taps, (x2, w2), GF),
            ("dec5 stacked2d conv+depth adds", dec5_full, (xb, w2), GF)]:
        sec = timed(fn, fargs, args.iters)
        print(f"  {name:44s} {sec * 1e3:8.2f} ms   "
              f"{gf / sec / 1e3:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
