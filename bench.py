"""Benchmark: full-GenRe single-view reconstruction throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes: the axon relay acks unfetched result buffers early, so
naive dispatch loops over-report by >10x.  We time an in-graph
``lax.fori_loop`` whose every iteration feeds the next (serial data
dependency), warm up once, and take the median of 3 trials.

Headline metric: full GenRe reconstructions (256^2 RGB+mask -> 128^3
voxels, including camera backprojection, differentiable spherical
rendering, inpainting and 3D U-Net refinement) per second per chip, bf16
compute.  The reference publishes no throughput; vs_baseline uses the
derived 40 recon/s estimate for the reference's differentiable forward on
its CUDA-9-era GPU (generous to the reference -- full derivation in
BASELINE.md "Derived throughput baseline").  vs_released_test compares
against the CPU-trimesh-bound pipeline the reference actually ships at
test time (~1 recon/s, same section).

Roofline context: achieved TFLOP/s vs the 197 TF/s bf16 peak (MFU) and
achieved HBM GB/s vs the measured ~819 GB/s bandwidth, both from XLA's
cost_analysis of the compiled forward.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

REFERENCE_RECONS_PER_SEC = 40.0   # derived estimate, BASELINE.md
RELEASED_TEST_RECONS_PER_SEC = 1.0
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
N_ITER = int(os.environ.get("BENCH_ITERS", "24"))
PEAK_BF16_TFLOPS = 197.0          # TPU v5e (v5 lite) peak bf16
HBM_GBPS = 819.0                  # measured on this chip (round 2)


def main():
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_model
    from genre_shapehd_tpu.models.base import default_opt

    enable_compile_cache()
    opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                      padding_margin=16, dtype="bfloat16", batch_size=BATCH)
    model = get_model("genre_full_model")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    params, bstats = state.params["net"], state.batch_stats["net"]

    @jax.jit
    def chained(params, bstats, rgb, silhou):
        def body(i, carry):
            rgb, acc = carry
            out = model.net.apply(
                {"params": params, "batch_stats": bstats}, rgb, silhou,
                train=False)
            delta = jnp.mean(out["pred_voxel"].astype(jnp.float32)) * 1e-3
            return (rgb + delta * 1e-6, acc + delta)
        _, acc = jax.lax.fori_loop(0, N_ITER, body,
                                   (rgb, jnp.float32(0)))
        return acc

    rgb = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 256, 256, 3))
    silhou = 100.0 * jnp.ones((BATCH, 256, 256, 1))
    float(chained(params, bstats, rgb, silhou))   # compile + warm

    # NOTE: block_until_ready is not a reliable completion barrier on the
    # axon relay -- fetching the VALUE to host is; time through float().
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(params, bstats, rgb, silhou))
        rates.append(BATCH * N_ITER / (time.perf_counter() - t0))
    recon_per_sec = statistics.median(rates)

    # achieved TFLOP/s + MFU from XLA's own FLOP count of the forward
    def fwd(params, bstats, rgb, silhou):
        return model.net.apply(
            {"params": params, "batch_stats": bstats}, rgb, silhou,
            train=False)["pred_voxel"]

    cost = jax.jit(fwd).lower(params, bstats, rgb, silhou) \
        .compile().cost_analysis()
    flops_per_call = float((cost or {}).get("flops", 0.0))
    bytes_per_call = float((cost or {}).get("bytes accessed", 0.0))
    # cost_analysis cannot see inside pallas_call: add the fused
    # renderer's analytic counts when the Pallas route is active
    from genre_shapehd_tpu.ops.render_sph_fast import _use_pallas_default
    if _use_pallas_default(128, 128, 256):
        from genre_shapehd_tpu.ops.pallas.render_kernel import \
            fused_render_cost
        pf, pb = fused_render_cost(BATCH, 128, 128, 256)
        flops_per_call += pf
        bytes_per_call += pb
    tflops = flops_per_call / BATCH * recon_per_sec / 1e12
    gbps = bytes_per_call / BATCH * recon_per_sec / 1e9

    print(json.dumps({
        "metric": "genre_full_recon_per_sec_per_chip",
        "value": round(recon_per_sec, 2),
        "unit": "reconstructions/s",
        "vs_baseline": round(recon_per_sec / REFERENCE_RECONS_PER_SEC, 2),
        "vs_released_test": round(
            recon_per_sec / RELEASED_TEST_RECONS_PER_SEC, 1),
        "gflops_per_recon": round(flops_per_call / BATCH / 1e9, 1),
        "gbytes_per_recon": round(bytes_per_call / BATCH / 1e9, 2),
        "achieved_tflops_per_s": round(tflops, 1),
        "mfu": round(tflops / PEAK_BF16_TFLOPS, 3),
        "achieved_hbm_gbps": round(gbps, 1),
        "hbm_bw_util": round(gbps / HBM_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
