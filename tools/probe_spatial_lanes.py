"""Probe: TPU lane padding of small-channel 3D tensors + alternative
layouts for the U-Net's bandwidth-bound layers.

Hypothesis: channels-minor (NDHWC) tensors with C << 128 pad the lane
dimension to 128, inflating HBM traffic by up to 128/C; re-laying the
tensor as (N, C, D, H*W) puts big spatial products on the lanes and makes
traffic logical-sized.  Measures:

  1. elementwise copy bandwidth of (8,64,64,64,40) bf16 in NDHWC vs
     (8,40,64,4096) spatial-lanes layout
  2. dec6 (k4 s2 tconv, 40 -> 1, 64^3 -> 128^3): current subpixel
     stacked2d vs a spatial-lanes dot_general formulation (with and
     without the boundary layout transposes)
  3. enc1 (k8 s2 conv, 2 -> 20 @128^3): current per-phase 2D conv vs
     space-to-depth(2) + k5 stride-1 conv (zero-padded taps: the two
     parities' tap windows span 5 offsets)

Usage: python tools/probe_spatial_lanes.py [--iters 8] [--only substr]
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
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) / n_iter)
    return statistics.median(times)


def dec6_phase_assemble(y, b):
    """Shared tail of the NDHWC dec6 variants: per-phase slices of the
    VALID conv output (65^3, 8 phase channels) -> interleaved 128^3."""
    import jax.numpy as jnp
    phases = [(a, b_, c) for a in (0, 1) for b_ in (0, 1) for c in (0, 1)]
    outs = [y[:, a:64 + a, b_:64 + b_, c:64 + c, i:i + 1]
            for i, (a, b_, c) in enumerate(phases)]
    t = jnp.stack(outs, axis=-2).reshape(b, 64, 64, 64, 2, 2, 2, 1)
    t = t.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return t.reshape(b, 128, 128, 128)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.nn.voxel_nets import (_conv3d_stride1_gemm,
                                                 _conv3d_stride1_via2d,
                                                 _conv3d_stride2_via2d)

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B = 8
    results = {}

    def run(name, fn, fargs):
        if args.only and args.only not in name:
            return
        t = timed(fn, fargs, args.iters)
        results[name] = t
        print(f"  {name:44s} {t * 1e3:8.2f} ms", flush=True)

    # --- 1. copy bandwidth: channels-minor vs spatial-lanes -------------
    x_cm = jax.random.normal(rng, (B, 64, 64, 64, 40), jnp.float32).astype(dt)
    x_sl = jnp.transpose(x_cm, (0, 4, 1, 2, 3)).reshape(B, 40, 64, 4096)
    run("copy (8,64,64,64,40) NDHWC", lambda x: x * 1.0001 + 0.0001, (x_cm,))
    run("copy (8,40,64,4096) spatial-lanes",
        lambda x: x * 1.0001 + 0.0001, (x_sl,))

    # --- 2. dec6: k4 s2 tconv 40 -> 1, 64^3 -> 128^3 --------------------
    # weights in the subpixel-concat form: (2,2,2 taps, 40, 8 phases)
    wcat = jax.random.normal(rng, (2, 2, 2, 40, 8), jnp.float32).astype(dt)

    def dec6_stacked2d(x, w):
        xb = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = _conv3d_stride1_via2d(xb, w, dt)
        return dec6_phase_assemble(y, B)

    def dec6_gemm1x1(x, w):
        xb = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        y = _conv3d_stride1_gemm(xb, w, dt)
        return dec6_phase_assemble(y, B)

    def dec6_spatial_lanes_core(x_sl, w):
        # x_sl: (B, 40, 64, 4096); w: (2,2,2 taps, 40, 8 phases)
        # channel contraction first: one (64, 40) x (B, 40, 64*4096) GEMM
        wm = w.reshape(8, 40, 8).transpose(1, 0, 2).reshape(40, 64)
        t = jax.lax.dot_general(
            wm.T.astype(dt), x_sl.reshape(B, 40, 64 * 4096),
            (((1,), (1,)), ((), ())))              # (64, B, 64*4096)
        t = t.reshape(2, 2, 2, 8, B, 64, 64, 64)   # taps; phase; b; spatial
        tp = jnp.pad(t, ((0, 0),) * 5 + ((1, 1), (1, 1), (1, 1)))
        # final[phase a][j] = sum_ta wcat[ta, :, phase] x[j + a + ta - 1]
        #                   = sum_ta tp[ta, phase][j + a + ta]
        phase_outs = []
        for pa in (0, 1):
            for pb in (0, 1):
                for pc in (0, 1):
                    pidx = (pa * 2 + pb) * 2 + pc
                    acc = None
                    for ta in (0, 1):
                        for tb in (0, 1):
                            for tc in (0, 1):
                                sl = tp[ta, tb, tc, pidx, :,
                                        pa + ta:pa + ta + 64,
                                        pb + tb:pb + tb + 64,
                                        pc + tc:pc + tc + 64]
                                acc = sl if acc is None else acc + sl
                    phase_outs.append(acc)
        y = jnp.stack(phase_outs).reshape(2, 2, 2, B, 64, 64, 64)
        y = y.transpose(3, 4, 0, 5, 1, 6, 2)
        return y.reshape(B, 128, 128, 128)

    def dec6_spatial_lanes_with_layout(x, w):
        x_sl = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(B, 40, 64, 4096)
        return dec6_spatial_lanes_core(x_sl, w)

    x40 = jax.random.normal(rng, (B, 64, 64, 64, 40), jnp.float32).astype(dt)
    x40_sl = jnp.transpose(x40, (0, 4, 1, 2, 3)).reshape(B, 40, 64, 4096)
    run("dec6 stacked2d (current)", dec6_stacked2d, (x40, wcat))
    run("dec6 gemm1x1", dec6_gemm1x1, (x40, wcat))
    run("dec6 spatial-lanes (pre-laid)", dec6_spatial_lanes_core,
        (x40_sl, wcat))
    run("dec6 spatial-lanes (incl. transpose-in)",
        dec6_spatial_lanes_with_layout, (x40, wcat))

    if not args.only or "dec6" in args.only:
        ya = np.asarray(dec6_stacked2d(x40, wcat), np.float32)
        yc = np.asarray(dec6_spatial_lanes_core(x40_sl, wcat), np.float32)
        err = np.max(np.abs(ya - yc)) / (np.max(np.abs(ya)) + 1e-9)
        print(f"  dec6 spatial-lanes vs stacked2d rel err: {err:.2e}")

    # --- 3. enc1: k8 s2 p3 conv 2 -> 20 @ 128^3 -------------------------
    w8 = jax.random.normal(rng, (8, 8, 8, 2, 20), jnp.float32).astype(dt)
    x2c = jax.random.normal(rng, (B, 128, 128, 128, 2), jnp.float32).astype(dt)

    def enc1_phase2d(x, w):
        return _conv3d_stride2_via2d(x, w, 3, dt)

    def _s2d16(x):
        # space-to-depth(2): (B,128^3,2) -> (B,64^3,16), channel index
        # ((ph1*2+ph2)*2+ph3)*2 + c
        n = x.shape[0]
        xp = x.reshape(n, 64, 2, 64, 2, 64, 2, 2)
        xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(n, 64, 64, 64, 16)
        return jnp.pad(xp, ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0)))

    def _s2d_kernel5(w):
        # y[o] = sum_kd w[kd] x[2o + kd - 3]; with i = 2j + ph:
        #   ph=0: kd = 2*delta - 1, delta = j-o+2 in {1..4}
        #   ph=1: kd = 2*delta,     delta in {0..3}
        # -> k5 VALID conv over the padded phase grid, zero taps elsewhere
        wnp = np.asarray(w, np.float32)
        w5 = np.zeros((5, 5, 5, 16, 20), np.float32)
        for da in range(5):
            for db in range(5):
                for dc in range(5):
                    for pa in range(2):
                        for pb in range(2):
                            for pc in range(2):
                                ta = 2 * da if pa else 2 * da - 1
                                tb = 2 * db if pb else 2 * db - 1
                                tc = 2 * dc if pc else 2 * dc - 1
                                if min(ta, tb, tc) < 0 or max(ta, tb, tc) > 7:
                                    continue
                                ch = (pa * 2 + pb) * 2 + pc
                                w5[da, db, dc, ch * 2:(ch + 1) * 2] = \
                                    wnp[ta, tb, tc]
        return jnp.asarray(w5, jnp.bfloat16)

    def enc1_s2d_native(xp, w5):
        return jax.lax.conv_general_dilated(
            xp, w5, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def enc1_s2d_via2d(xp, w5):
        return _conv3d_stride1_via2d(xp, w5, dt)

    def enc1_s2d_incl_s2d(x, w5):
        return _conv3d_stride1_via2d(_s2d16(x), w5, dt)

    xp5, w5 = _s2d16(x2c), _s2d_kernel5(w8)
    run("enc1 phase2d (current)", enc1_phase2d, (x2c, w8))
    run("enc1 s2d16+native3d k5", enc1_s2d_native, (xp5, w5))
    run("enc1 s2d16+via2d k5", enc1_s2d_via2d, (xp5, w5))
    run("enc1 s2d16+via2d k5 (incl. s2d)", enc1_s2d_incl_s2d, (x2c, w5))

    if not args.only or "enc1" in args.only:
        ya = np.asarray(enc1_phase2d(x2c, w8), np.float32)
        yc = np.asarray(enc1_s2d_via2d(xp5, w5), np.float32)
        err = np.max(np.abs(ya - yc)) / (np.max(np.abs(ya)) + 1e-9)
        print(f"  enc1 s2d vs phase2d rel err: {err:.2e}")

    print(results)


if __name__ == "__main__":
    main()
