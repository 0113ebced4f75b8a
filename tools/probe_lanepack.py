"""Probe: w-blocked lane packing for the small-cout 3D conv layers.

The U-Net's edge layers run XLA's conv engine with N = 8..40 output
channels -- 70-94% of the MXU's 128 lanes idle.  _conv2d_lanepack packs
``wb`` adjacent output w-positions into the channel dim (exact, via
zero-padded weights) at a (kw + s*(wb-1))/kw FLOP inflation.  This probe
measures the trade per real geometry (batch 8, bf16) and checks
exactness against the unpacked path.

Usage: python tools/probe_lanepack.py [--iters 16]
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
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.nn import voxel_nets as vn

    enable_compile_cache()
    BF = jnp.bfloat16
    rng = np.random.RandomState(0)

    # exactness (small shapes, f32, both stride variants)
    x = jnp.asarray(rng.randn(2, 10, 10, 10, 5), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 4, 5, 3), jnp.float32)
    xb = jnp.pad(x, ((0, 0),) + ((2, 2),) * 3 + ((0, 0),))
    for wb in (2, 3, 4):
        a = vn._conv3d_stride1_via2d(xb, w, jnp.float32)
        b = vn._conv3d_stride1_via2d(xb, w, jnp.float32, wb=wb)
        err1 = float(jnp.max(jnp.abs(a - b)))
        a2 = vn._conv3d_stride2_via2d(x, w, 1, jnp.float32)
        b2 = vn._conv3d_stride2_via2d(x, w, 1, jnp.float32, wb=wb)
        err2 = float(jnp.max(jnp.abs(a2 - b2)))
        print(f"exactness wb={wb}: stride1 {err1:.2e} stride2 {err2:.2e}",
              flush=True)
        assert err1 < 1e-4 and err2 < 1e-4

    # real geometries, batch 8 bf16
    B = 8
    geoms = [
        # (name, fn factory, x shape, w shape, extra)
        ("dec6 stacked2d 40->16 @66 VALID s1",
         lambda wb: (lambda x, w: vn._conv3d_stride1_via2d(x, w, BF, wb=wb)),
         (B, 66, 66, 66, 40), (2, 2, 2, 40, 8), [None, 4, 6, 8]),
        ("gen-last stacked2d 64->16 @130 VALID s1",
         lambda wb: (lambda x, w: vn._conv3d_stride1_via2d(x, w, BF, wb=wb)),
         (B, 130, 130, 130, 64), (2, 2, 2, 64, 8), [None, 4, 6, 8]),
        ("enc1 phase2d 2->20 @128 k8 s2 p3",
         lambda wb: (lambda x, w: vn._conv3d_stride2_via2d(x, w, 3, BF,
                                                           wb=wb)),
         (B, 128, 128, 128, 2), (8, 8, 8, 2, 20), [None, 2, 4, 6]),
        ("enc2 phase2d 20->40 @64 k4 s2 p1",
         lambda wb: (lambda x, w: vn._conv3d_stride2_via2d(x, w, 1, BF,
                                                           wb=wb)),
         (B, 64, 64, 64, 20), (4, 4, 4, 20, 40), [None, 2, 3, 4]),
        ("disc1 phase2d 1->64 @128 k4 s2 p1",
         lambda wb: (lambda x, w: vn._conv3d_stride2_via2d(x, w, 1, BF,
                                                           wb=wb)),
         (B, 128, 128, 128, 1), (4, 4, 4, 1, 64), [None, 2]),
    ]
    for name, mk, xs, ws, wbs in geoms:
        x = jnp.asarray(rng.randn(*xs), BF)
        w = jnp.asarray(rng.randn(*ws), jnp.float32)
        base = None
        for wb in wbs:
            sec = timed(mk(wb), (x, w), args.iters)
            tag = f"wb={wb}" if wb else "unpacked"
            rel = "" if base is None else f"  ({sec / base:.2f}x)"
            if base is None:
                base = sec
            print(f"  {name:42s} {tag:9s} {sec * 1e3:8.2f} ms{rel}",
                  flush=True)


if __name__ == "__main__":
    main()
