"""Layer-level microprofile of the 3D U-Net on the chip.

Times isolated pieces (encoder stack, each subpixel deconv, batchnorm
chain) to locate the residual cost after the subpixel-deconv rewrite.
"""

import sys
import time
import statistics

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
    from genre_shapehd_tpu.nn.voxel_nets import SubpixelTConv3D, Conv3D

    import os
    enable_compile_cache()
    B = int(os.environ.get("PROF_BATCH", "4"))
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    cases = []

    # encoder convs (strided, forward)
    for name, d, cin, cout, k in [
        ("enc1 k8 2->20 @128", 128, 2, 20, 8),
        ("enc2 k4 20->40 @64", 64, 20, 40, 4),
        ("enc3 k4 40->80 @32", 32, 40, 80, 4),
    ]:
        m = Conv3D(cout, k, 2, k // 2 - 1, dtype=dt)
        x = jax.random.normal(rng, (B, d, d, d, cin), jnp.float32)
        v = m.init(rng, x[:1])
        cases.append((name, lambda xx, m=m, v=v: m.apply(v, xx), (x,)))

    # decoder subpixel deconvs
    for name, d, cin, cout, k in [
        ("dec4 k4 320->40 @16", 16, 320, 40, 4),
        ("dec5 k8 80->20 @32", 32, 80, 20, 8),
        ("dec6 k4 40->1 @64", 64, 40, 1, 4),
    ]:
        m = SubpixelTConv3D(cout, k, dtype=dt)
        x = jax.random.normal(rng, (B, d, d, d, cin), jnp.float32)
        v = m.init(rng, x[:1])
        cases.append((name, lambda xx, m=m, v=v: m.apply(v, xx), (x,)))

    # BN + leaky at the two largest resolutions
    import flax.linen as fnn
    for name, d, c in [("bn+leaky 20ch @64", 64, 20),
                       ("bn+leaky 40ch @64(cat)", 64, 40)]:
        bn = fnn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, dtype=dt)
        x = jax.random.normal(rng, (B, d, d, d, c), jnp.float32)
        v = bn.init(rng, x[:1])
        cases.append((name,
                      lambda xx, bn=bn, v=v: fnn.leaky_relu(
                          bn.apply(v, xx), 0.01), (x,)))

    for name, fn, a in cases:
        sec = timed(fn, a)
        print(f"  {name:26s} {sec * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
