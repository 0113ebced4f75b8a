"""Probe: XLA 3D conv vs depth-decomposed stacked-2D formulation on TPU.

Hypothesis: XLA's TPU lowering of conv_general_dilated with 3 spatial
dims is far slower than an exact reformulation that runs ONE 2D conv
over (H, W) with the depth taps stacked into the output-channel dim,
followed by cheap shifted adds along D.

Times three shapes from the 3D U-Net (batch 4, bf16):
  enc2: k4 s2 p1,  20 ->  40 @ 64^3 in
  dec5-subpixel internal: k4^2-tap stride-1 conv, 80 -> 8*20 @ 32^3
  enc1: k8 s2 p3,   2 ->  20 @ 128^3 in
"""

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
            bumped = tuple(a + (delta * 1e-6).astype(a.dtype) for a in args)
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
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B = 4

    def conv3d(x, w, s, p):
        return jax.lax.conv_general_dilated(
            x, w, (s, s, s), [(p, p)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    def conv3d_via2d_s1(x, w):
        """stride-1 pad-0 3D conv via one 2D conv + shifted D adds."""
        n, dp, hp, wp, cin = x.shape
        k = w.shape[0]
        cout = w.shape[-1]
        x2 = x.reshape(n * dp, hp, wp, cin)
        # stack depth taps into output channels: (kh, kw, cin, k*cout)
        w2 = jnp.moveaxis(w, 0, 3).reshape(k, k, cin, k * cout)
        t = jax.lax.conv_general_dilated(
            x2, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ho, wo = t.shape[1], t.shape[2]
        t = t.reshape(n, dp, ho, wo, k, cout)
        dout = dp - k + 1
        acc = t[:, 0:dout, :, :, 0]
        for kd in range(1, k):
            acc = acc + t[:, kd:kd + dout, :, :, kd]
        return acc

    def conv3d_via2d_s2(x, w, p):
        """stride-2 3D conv via per-phase 2D convs + shifted D adds."""
        n, d, hp, wp, cin = x.shape
        k = w.shape[0]
        cout = w.shape[-1]
        dout = d // 2
        phases = {0: [], 1: []}
        for kd in range(k):
            # input index = 2*do + kd - p = 2*(do + off) + ph
            ph = (kd - p) % 2
            off = (kd - p - ph) // 2
            phases[ph].append((off, kd))
        xs = {0: x[:, 0::2], 1: x[:, 1::2]}
        acc = None
        for ph, taps in phases.items():
            offs = [o for o, _ in taps]
            omin, omax = min(offs), max(offs)
            xp = jnp.pad(xs[ph], ((0, 0), (-omin, omax), (0, 0), (0, 0),
                                  (0, 0)))
            w2 = jnp.stack([w[kd] for _, kd in taps], axis=2).reshape(
                k, k, len(taps) * cin, cout)
            # stack the shifted depth views into channels -> one 2D conv
            views = [xp[:, (o - omin):(o - omin) + dout] for o, _ in taps]
            xcat = jnp.concatenate(views, axis=-1)
            x2 = xcat.reshape(n * dout, hp, wp, len(taps) * cin)
            t = jax.lax.conv_general_dilated(
                x2, w2, (2, 2), [(p, p)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            t = t.reshape(n, dout, t.shape[1], t.shape[2], cout)
            acc = t if acc is None else acc + t
        return acc

    # --- correctness check (small, CPU-friendly shapes) ---
    x = jax.random.normal(rng, (2, 10, 10, 10, 3), jnp.float32)
    w = jax.random.normal(rng, (4, 4, 4, 3, 5), jnp.float32)
    ref = conv3d(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))),
                 w, 1, 0)
    import numpy as np
    got = conv3d_via2d_s1(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1),
                                      (0, 0))), w)
    err = float(jnp.abs(ref - got).max())
    print(f"s1 exactness maxdiff: {err:.2e}")
    ref2 = conv3d(x, w, 2, 1)
    got2 = conv3d_via2d_s2(x, w, 1)
    err2 = float(jnp.abs(ref2 - got2).max())
    print(f"s2 exactness maxdiff: {err2:.2e}")

    # --- timing at U-Net shapes ---
    cases = []
    x_enc2 = jax.random.normal(rng, (B, 64, 64, 64, 20), dt)
    w_enc2 = jax.random.normal(rng, (4, 4, 4, 20, 40), dt)
    cases.append(("enc2 3Dconv   k4s2 20->40@64",
                  lambda a: conv3d(a, w_enc2, 2, 1), (x_enc2,)))
    cases.append(("enc2 via2D    k4s2 20->40@64",
                  lambda a: conv3d_via2d_s2(a, w_enc2, 1), (x_enc2,)))

    x_dec = jax.random.normal(rng, (B, 34, 34, 34, 80), dt)
    w_dec = jax.random.normal(rng, (2, 2, 2, 80, 160), dt)
    cases.append(("dec5sub 3Dconv k2s1 80->160@32",
                  lambda a: conv3d(a, w_dec, 1, 0), (x_dec,)))
    cases.append(("dec5sub via2D  k2s1 80->160@32",
                  lambda a: conv3d_via2d_s1(a, w_dec), (x_dec,)))

    x_enc1 = jax.random.normal(rng, (B, 128, 128, 128, 2), dt)
    w_enc1 = jax.random.normal(rng, (8, 8, 8, 2, 20), dt)
    cases.append(("enc1 3Dconv   k8s2 2->20@128",
                  lambda a: conv3d(a, w_enc1, 2, 3), (x_enc1,)))
    cases.append(("enc1 via2D    k8s2 2->20@128",
                  lambda a: conv3d_via2d_s2(a, w_enc1, 3), (x_enc1,)))

    for name, fn, a in cases:
        sec = timed(fn, a)
        print(f"  {name:34s} {sec * 1e3:8.2f} ms", flush=True)


def extra():
    """Exact subpixel internal-conv geometries of dec5/dec6."""
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    B = 4

    def conv3d_valid(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)

    def via2d(x, w):
        n, dp, hp, wp, cin = x.shape
        k = w.shape[0]
        cout = w.shape[-1]
        x2 = x.reshape(n * dp, hp, wp, cin)
        w2 = jnp.moveaxis(w, 0, 3).reshape(k, k, cin, k * cout)
        t = jax.lax.conv_general_dilated(
            x2, w2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ho, wo = t.shape[1], t.shape[2]
        t = t.reshape(n, dp, ho, wo, k, cout)
        dout = dp - k + 1
        acc = t[:, 0:dout, :, :, 0]
        for kd in range(1, k):
            acc = acc + t[:, kd:kd + dout, :, :, kd]
        return acc

    cases = []
    x5 = jax.random.normal(rng, (B, 36, 36, 36, 80), dt)
    w5 = jax.random.normal(rng, (4, 4, 4, 80, 160), dt)
    cases.append(("dec5int 3D  k4 80->160@36", lambda a: conv3d_valid(a, w5), (x5,)))
    cases.append(("dec5int 2D  k4 80->160@36", lambda a: via2d(a, w5), (x5,)))
    x6 = jax.random.normal(rng, (B, 66, 66, 66, 40), dt)
    w6 = jax.random.normal(rng, (2, 2, 2, 40, 8), dt)
    cases.append(("dec6int 3D  k2 40->8@66", lambda a: conv3d_valid(a, w6), (x6,)))
    cases.append(("dec6int 2D  k2 40->8@66", lambda a: via2d(a, w6), (x6,)))
    x4 = jax.random.normal(rng, (B, 18, 18, 18, 320), dt)
    w4 = jax.random.normal(rng, (2, 2, 2, 320, 320), dt)
    cases.append(("dec4int 3D  k2 320->320@18", lambda a: conv3d_valid(a, w4), (x4,)))
    cases.append(("dec4int 2D  k2 320->320@18", lambda a: via2d(a, w4), (x4,)))
    x3 = jax.random.normal(rng, (B, 32, 32, 32, 40), dt)
    w3 = jax.random.normal(rng, (4, 4, 4, 40, 80), dt)
    cases.append(("enc3 3Dconv k4s2 40->80@32", lambda a: jax.lax.conv_general_dilated(
        a, w3, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32), (x3,)))

    for name, fn, a in cases:
        sec = timed(fn, a)
        print(f"  {name:34s} {sec * 1e3:8.2f} ms", flush=True)



if __name__ == "__main__":
    import sys as _s
    (extra if "--extra" in _s.argv else main)()
