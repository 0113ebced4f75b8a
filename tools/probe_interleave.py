"""Probe: subpixel phase-interleave formulations (dec5 geometry).

All SubpixelTConv3D impls share an assemble tail that stacks 8 phase
slices and transposes them into the 2x-upsampled grid.  The stacked
intermediate (N, d, d, d, 8, o) has minor dims (8, o=20) -> physically
padded to (16, 128) on TPU, a ~12.8x write inflation.  This probe times
alternative formulations that keep wide dims minor.

Geometry: y (8, 33, 33, 33, 160) -> out (8, 64, 64, 64, 20)
(dec5: 8 phases x 20 channels after the VALID conv, offsets a,b,c per
phase as in SubpixelTConv3D).

Usage: python tools/probe_interleave.py [--iters 8]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")

PHASES = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)]


def timed(fn, x, n_iter=8, trials=3):
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
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from genre_shapehd_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B, d, o = 8, 32, 20
    y = jax.random.normal(rng, (B, d + 1, d + 1, d + 1, 8 * o),
                          jnp.float32).astype(dt)

    def assemble_current(y):
        outs = [y[:, a:d + a, b:d + b, c:d + c, i * o:(i + 1) * o]
                for i, (a, b, c) in enumerate(PHASES)]
        t = jnp.stack(outs, axis=-2)                 # (B,d,d,d,8,o)
        t = t.reshape(B, d, d, d, 2, 2, 2, o)
        t = t.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return t.reshape(B, 2 * d, 2 * d, 2 * d, o)

    def assemble_phase_major(y):
        outs = [y[:, a:d + a, b:d + b, c:d + c, i * o:(i + 1) * o]
                for i, (a, b, c) in enumerate(PHASES)]
        t = jnp.stack(outs, axis=1)                  # (B,8,d,d,d,o)
        t = t.reshape(B, 2, 2, 2, d, d, d, o)
        t = t.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return t.reshape(B, 2 * d, 2 * d, 2 * d, o)

    def assemble_three_axis(y):
        # interleave one spatial axis at a time: every intermediate keeps
        # (spatial, o) as its minor dims, avoiding tiny-minor-dim stacks.
        # channel blocks of y are (a*4 + b*2 + c) -> reshape to bit axes
        # a=4, b=5, c=6; phase bit p on a spatial axis selects source
        # index j + p (the per-phase slice offset of the current tail)
        t = y.reshape(B, d + 1, d + 1, d + 1, 2, 2, 2, o)
        for axis, bit_axis in ((3, 6), (2, 5), (1, 4)):
            t0 = jax.lax.slice_in_dim(jnp.take(t, 0, axis=bit_axis),
                                      0, d, axis=axis)
            t1 = jax.lax.slice_in_dim(jnp.take(t, 1, axis=bit_axis),
                                      1, d + 1, axis=axis)
            s = jnp.stack([t0, t1], axis=axis + 1)
            shp = list(s.shape)
            shp[axis:axis + 2] = [shp[axis] * 2]
            t = s.reshape(shp)
        return t

    def write_floor(y):
        # pure-write floor: one output-sized tensor from a cheap broadcast
        v = jnp.mean(y.astype(jnp.float32)).astype(dt)
        return jnp.full((B, 2 * d, 2 * d, 2 * d, o), v, dt) + y[0, 0, 0, 0, 0]

    cases = [("assemble current (stack axis=-2)", assemble_current),
             ("assemble phase-major (stack axis=1)", assemble_phase_major),
             ("assemble three-axis pairwise", assemble_three_axis),
             ("output write floor", write_floor)]
    print(f"iters={args.iters}  (ms per batch-8 call)", flush=True)
    outs = {}
    for name, fn in cases:
        try:
            sec = timed(fn, y, args.iters)
            print(f"  {name:42s} {sec * 1e3:8.2f} ms", flush=True)
            outs[name] = fn(y)
        except Exception as e:
            print(f"  {name:42s} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    ref = np.asarray(outs["assemble current (stack axis=-2)"], np.float32)
    for name in ("assemble phase-major (stack axis=1)",
                 "assemble three-axis pairwise"):
        if name in outs:
            err = np.max(np.abs(np.asarray(outs[name], np.float32) - ref))
            print(f"  {name} max abs err vs current: {err:.2e}")


if __name__ == "__main__":
    main()
