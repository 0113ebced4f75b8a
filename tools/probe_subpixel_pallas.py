"""Probe: the subpixel-deconv tail -- Pallas fused dec6 + XLA assemblies.

PERF.md's round-5 decomposition attributes the U-Net's residual cost to
the non-GEMM subpixel tail: dec5's phase assembly (a few ms after its
5.9 ms conv) and the whole of dec6 (~8 ms against a <1 ms compute
floor).  Measures, at the exact U-Net geometries (batch 8, bf16):

  1. the phase-assembly step alone (dec5 and dec4 shapes), for the
     record (an interior-dilated-pad XLA variant measured 56 ms vs the
     chain's 4.5 at the dec5 shape and was dropped);
  2. the full dec6 deconv: the stacked-2D chain vs the fused Pallas
     tail (ops/pallas/subpixel_kernel.py::deconv_final_fused);

and checks exactness of the replacement.

Usage: python tools/probe_subpixel_pallas.py [--iters 16] [--batch 8]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def timed(fn, args, n_iter=16, trials=3):
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.ops.pallas import subpixel_kernel as sk
    from genre_shapehd_tpu.nn.voxel_nets import _conv3d_stride1_via2d

    enable_compile_cache()
    B = args.batch
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    print(f"backend={jax.default_backend()} batch={B}")

    # ---- assembly alone (chain), for the record ----
    for name, s1, c8 in [("dec5 asm (33^3,160)", 33, 160),
                         ("dec4 asm (17^3,320)", 17, 320)]:
        c = c8 // 8
        y = jax.random.normal(rng, (B, s1, s1, s1, c8),
                              jnp.float32).astype(dt)
        t_c = timed(lambda v: sk._assemble_xla(v, c), (y,), args.iters)
        print(f"{name}  chain {t_c*1e3:7.2f} ms")

    # ---- dec6 full: stacked2d chain vs fused pallas ----
    x6 = jax.random.normal(rng, (B, 64, 64, 64, 40), jnp.float32).astype(dt)
    w6 = (jax.random.normal(rng, (2, 2, 2, 40, 8), jnp.float32) * 0.1
          ).astype(dt)
    b6 = jnp.asarray([0.1], dt)

    def stacked2d(x, w, b):
        xb = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = _conv3d_stride1_via2d(xb, w, dt)
        return sk._assemble_xla(y, 1)[..., 0] + b.reshape(())

    err6 = float(jnp.max(jnp.abs(
        jax.jit(stacked2d)(x6, w6, b6).astype(jnp.float32)
        - jax.jit(sk._final_fwd)(x6, w6, b6).astype(jnp.float32))))
    t_s = timed(stacked2d, (x6, w6, b6), args.iters)
    t_f = timed(sk._final_fwd, (x6, w6, b6), args.iters)
    print(f"dec6 full           chain {t_s*1e3:7.2f} ms   fused"
          f" {t_f*1e3:7.2f} ms   maxerr {err6:g} (bias rounds in f32)")


if __name__ == "__main__":
    main()
