"""Probe: block-sparse vs dense stage-1 renderer kernel on chip.

Times _s1_sparse_call against the dense _s1_call at full scale (batch 8)
and checks numerical parity between the two compiled kernels.

Usage: python tools/probe_s1_sparse.py [--iters 8]
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

    import numpy as np
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.ops.pallas import render_kernel as rk

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    B, V, R, Z, M = 8, 128, 128, 256, 192
    vox = jax.random.uniform(rng, (B, V, V, V), jnp.float32,
                             minval=1e-4, maxval=1.0 - 1e-4)
    tg = rk._s1_sparse_tg(V, R, Z, M, B) or 1
    x0s, y0s, wxc, wyc, mb, xw = rk._s1_sparse_plan_np(V, R, Z, M, tg)
    print(f"plan: theta-group={tg} MB={mb} window={xw}x{xw} "
          f"K={xw * xw} (dense {V * V})", flush=True)

    def s1_dense(vox):
        w = rk._pallas_weights(V, R, Z, M)
        vox2 = jnp.transpose(vox.astype(rk.BF16), (1, 2, 0, 3)).reshape(
            V * V, B * V)
        return rk._s1_call(vox2, B, w, R, M, False)

    def s1_sparse(vox):
        vox3 = jnp.transpose(vox.astype(rk.BF16), (1, 2, 0, 3)).reshape(
            V, V, B * V)
        return rk._s1_sparse_call(vox3, B, V, R, Z, M, False, tg)

    def full(vox):
        return rk.render_expected_depth_pallas(vox, V, R, Z, M)

    cd = np.asarray(jax.jit(s1_dense)(vox), np.float32)   # (Th, B, M, V)
    cs = np.asarray(jax.jit(s1_sparse)(vox), np.float32)  # (Th, M, B, V)
    err = np.abs(cd - cs.transpose(0, 2, 1, 3))
    print(f"parity dense vs sparse: mean {err.mean():.2e} "
          f"max {err.max():.2e} (scale {np.abs(cd).max():.3f})", flush=True)

    for name, fn in [("stage-1 dense", s1_dense),
                     ("stage-1 sparse", s1_sparse),
                     ("full fused renderer (sparse s1)", full)]:
        sec = timed(fn, (vox,), args.iters)
        print(f"  {name:36s} {sec * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
