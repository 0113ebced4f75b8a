"""Microbenchmark: renderer ray-sampling forward vs backward routes.

Backs the claim in ops/pallas/render_kernel.py that delegating the VJP to
XLA's transpose of the einsum formulation is the right call: the map is
linear, XLA DCEs the dead forward and keeps only the transposed
contraction chain.  This probe measures, on the real chip:

  * fwd_pallas   -- the fused Pallas kernels (production inference path)
  * fwd_mxu      -- the chunked XLA einsum formulation (CPU/parity path)
  * bwd_xla      -- the VJP actually used in training
                    (XLA transpose of the einsum formulation)
  * fwd+bwd via jax.vjp on the custom_vjp op (what a train step pays)

Writes tools/probe_render_vjp.json next to this file; numbers cited in
the render_kernel docstring come from this probe.

Usage: python tools/probe_render_vjp.py [--batch 4] [--iters 8]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")


def timed_scalar(fn, n_iter):
    """Jitted loop chaining ``fn`` (array -> f32 scalar) n_iter times with
    a serial data dependency (axon relay: only value fetches are reliable
    completion barriers, see bench.py)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        def body(i, carry):
            x, acc = carry
            s = fn(x)
            return (x + (s * 1e-9).astype(x.dtype), acc + s)
        _, acc = jax.lax.fori_loop(0, n_iter, body, (x, jnp.float32(0)))
        return acc

    return chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    B, N = args.batch, args.iters

    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.ops.pallas.render_kernel import sample_rays_pallas
    from genre_shapehd_tpu.ops.render_sph_fast import sample_rays_mxu

    enable_compile_cache()
    rng = jax.random.PRNGKey(0)
    vox = jax.random.uniform(rng, (B, 128, 128, 128), jnp.float32,
                             minval=1e-4, maxval=1 - 1e-4)
    g = jax.random.normal(rng, (B, 128, 128, 256), jnp.float32)

    def run(make_scalar_fn, arg):
        chained = timed_scalar(make_scalar_fn, N)
        float(chained(arg))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(arg))
            times.append((time.perf_counter() - t0) / N)
        return statistics.median(times)

    results = {"batch": B, "iters": N,
               "backend": jax.default_backend()}

    results["fwd_pallas_sec"] = run(
        lambda v: jnp.mean(sample_rays_pallas(v, 128, 128, 256)
                           .astype(jnp.float32)), vox)
    results["fwd_mxu_bf16_sec"] = run(
        lambda v: jnp.mean(sample_rays_mxu(
            v, 128, 256, compute_dtype=jnp.bfloat16).astype(jnp.float32)),
        vox)

    # the training backward: VJP of the custom_vjp op = XLA transpose of
    # the einsum chain (forward is DCE'd since only the cotangent is used)
    def bwd_only(v):
        _, vjp = jax.vjp(lambda x: sample_rays_pallas(x, 128, 128, 256), v)
        return jnp.mean(vjp(g)[0].astype(jnp.float32))

    results["bwd_xla_transpose_sec"] = run(bwd_only, vox)

    def fwd_bwd(v):
        out, vjp = jax.vjp(
            lambda x: sample_rays_pallas(x, 128, 128, 256), v)
        return (jnp.mean(out.astype(jnp.float32))
                + jnp.mean(vjp(g)[0].astype(jnp.float32)))

    results["fwd_plus_bwd_sec"] = run(fwd_bwd, vox)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_render_vjp.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
