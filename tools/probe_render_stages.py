"""Probe: per-stage cost of the fused Pallas renderer (batch 8).

Splits render_expected_depth_pallas into its pieces and times each on
chip, to locate where the ~18.6ms in-graph marginal (tools/ablate_bench)
goes:
  * stage-1 kernel alone (cylindrical resample)  -- 825 GF MXU +
    vox2 chunk re-DMA per theta
  * stage-2+scan kernel alone (from a precomputed c)  -- 1.65 TF MXU dot
    + ~13G VPU ops in the wr mul-reduce
  * full fused chain
  * stage-2 variant with the wr mul-reduce removed (upper-bounds the
    VPU share of stage 2)

Usage: python tools/probe_render_stages.py [--iters 8]
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
    from genre_shapehd_tpu.ops.pallas import render_kernel as rk

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    B, V, R, Z, M = 8, 128, 128, 256, 192

    vox = jax.random.uniform(rng, (B, V, V, V), jnp.float32,
                             minval=1e-4, maxval=1.0 - 1e-4)

    def full(vox):
        return rk.render_expected_depth_pallas(vox, V, R, Z, M)

    def s1_only(vox):
        w = rk._pallas_weights(V, R, Z, M)
        vox2 = jnp.transpose(vox.astype(rk.BF16), (1, 2, 0, 3)).reshape(
            V * V, B * V)
        return rk._s1_call(vox2, B, w, R, M, False)

    c0 = jax.random.uniform(jax.random.PRNGKey(1), (R, M, B, V),
                            jnp.float32, minval=0.0,
                            maxval=0.02).astype(rk.BF16)

    def s2_only(c):
        w = rk._pallas_weights(V, R, Z, M)
        return rk._s2scan_call(c, w, Z, False)

    def s2_dot_only(c):
        # stage-2 MXU dot without the wr mul-reduce / scan epilogue:
        # isolates the VPU share (difference vs s2_only)
        w = rk._pallas_weights(V, R, Z, M)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        th, m, b, v = c.shape

        def kern(c_ref, wz_ref, out_ref):
            tc_, m_, b_, v_ = c_ref.shape
            s = wz_ref.shape[2]
            c2 = c_ref[:].reshape(tc_ * m_ * b_, v_)
            t2 = jnp.dot(c2, wz_ref[0], preferred_element_type=jnp.float32)
            # cheap reduce (max over m) so t2 isn't DCE'd; far below the
            # wr mul-reduce's cost
            out_ref[0] = jnp.max(t2.reshape(tc_, m_, b_, s), axis=1)

        _, tc = rk._common_sizes(v, th, b)
        return pl.pallas_call(
            kern,
            grid=(th // tc, th),
            in_specs=[
                pl.BlockSpec((tc, m, b, v), lambda it, ip: (it, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, v, Z), lambda it, ip: (ip, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tc, b, Z),
                                   lambda it, ip: (ip, it, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((th, th, b, Z), jnp.float32),
        )(c, w["wz"])

    for name, fn, fargs in [
            ("full fused renderer", full, (vox,)),
            ("stage-1 kernel only", s1_only, (vox,)),
            ("stage-2+scan kernel only", s2_only, (c0,)),
            ("stage-2 dot only (no wr reduce)", s2_dot_only, (c0,))]:
        sec = timed(fn, fargs, args.iters)
        print(f"  {name:38s} {sec * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
