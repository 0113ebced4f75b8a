"""Benchmark: full-GenRe TRAINING step throughput on one chip.

Times the complete jitted train step (forward + backward + Adam update +
BatchNorm stat updates) at reference scale (batch 4, 256^2 images, 128^3
voxels; scripts/train_full_genre.sh) three ways:

  * device_step_sec -- pure device compute: an in-graph ``lax.fori_loop``
    chains N train steps through the state (serial dependency), one
    launch, one value fetch.  No host pipeline at all.
  * e2e (per-step metric fetch) -- the reference-faithful loop: dataset ->
    threaded prefetch -> device_put -> step -> ``float(loss)`` each step.
    The per-step fetch syncs the pipeline on the loss, which is ready
    before the backward/update tail, so each step pays host dead time.
  * e2e (log_every=4) -- the trainer's deferred-fetch mode: identical
    logging values, fetched in batches of 4, steps dispatch back-to-back.

Prints ONE JSON line.  The device/e2e split quantifies the host gap the
round-2 review flagged; the deferred mode is what closes it.
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

BATCH = 4
STEPS = 12
DEV_ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader, InfiniteLoader
    from genre_shapehd_tpu.models.base import default_opt
    from genre_shapehd_tpu.train.loggers import ComposeLogger
    from genre_shapehd_tpu.train.loop import Trainer

    enable_compile_cache()
    opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                      padding_margin=16, dtype="bfloat16", batch_size=BATCH,
                      synthetic_length=BATCH * 4, workers=2)
    model = get_model("genre_full_model")(opt)
    ds = get_dataset("synthetic")(opt, "train", model=model)
    loader = DataLoader(ds, BATCH, num_workers=2)
    trainer = Trainer(model, opt, ComposeLogger([]))
    state = trainer.initialize(jax.random.PRNGKey(0))
    it = InfiniteLoader(loader)

    # warm the procedural sample cache: the synthetic dataset renders its
    # samples on first touch (seconds each); measuring across that would
    # charge one-time host work to the steady-state loop
    for _ in loader:
        pass

    # one fixed device batch for the pure-device measurement
    first = next(iter(loader))
    dev_batch0, _ = trainer._device_batch(first)

    from genre_shapehd_tpu.train.loop import decompress_batch as decompress

    @jax.jit
    def chained(state, batch, rng):
        def body(i, carry):
            st, acc = carry
            st, metrics = model.train_step(
                st, decompress(batch), jax.random.fold_in(rng, i))
            return (st, acc + metrics["loss"].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, DEV_ITERS, body,
                                   (state, jnp.float32(0)))
        return acc

    rng = jax.random.PRNGKey(1)
    float(chained(state, dev_batch0, rng))       # compile + warm
    dev_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(state, dev_batch0, rng))
        dev_times.append((time.perf_counter() - t0) / DEV_ITERS)
    device_step = statistics.median(dev_times)

    def e2e(log_every: int) -> float:
        """MEAN seconds/step over the measured span (a median would report
        the cheap dispatch-only steps of the deferred-fetch mode, not
        throughput)."""
        st = trainer.initialize(jax.random.PRNGKey(0))
        pend = []
        t_start, n_meas = None, 0
        for i, (dev_batch, _, _, _) in enumerate(
                trainer._prefetched(it, STEPS)):
            st, metrics = trainer._train_step(
                st, dev_batch, jax.random.fold_in(rng, i))
            pend.append(metrics)
            if len(pend) >= log_every:
                for m in pend:
                    float(m["loss"])
                pend.clear()
            if i == 1:                  # drop compile + async head start
                for m in pend:          # drain so the span starts clean
                    float(m["loss"])
                pend.clear()
                t_start = time.perf_counter()
            elif i > 1:
                n_meas += 1
        for m in pend:
            float(m["loss"])
        jax.block_until_ready(st)
        return (time.perf_counter() - t_start) / n_meas

    step_sync = e2e(1)
    step_deferred = e2e(4)
    # on the axon-relay rig, deep async pipelining (deferred fetch) can
    # measure SLOWER than strict per-step alternation -- the tunnel
    # serializes queued h2d/dispatch traffic; report the best cadence as
    # the headline and both raw modes for the record
    best = min(step_sync, step_deferred)

    # isolate the host->device transfer cost of one (compressed) batch:
    # on this rig it rides the axon tunnel, not PCIe, so it is reported
    # separately rather than folded into a "host gap" claim
    packed, _ = trainer._device_batch(first)
    jax.block_until_ready(packed)
    h2d_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        pb, _ = trainer._device_batch(first)
        jax.block_until_ready(pb)
        h2d_times.append(time.perf_counter() - t0)
    h2d = statistics.median(h2d_times)
    h2d_mb = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                 for v in packed.values()) / 1e6

    print(json.dumps({
        "metric": "genre_full_train_step_sec_batch4",
        "value": round(best, 4),
        "unit": "s/step e2e (host pipeline, best fetch cadence)",
        "examples_per_sec": round(BATCH / best, 2),
        "device_step_sec": round(device_step, 4),
        "e2e_per_step_fetch_sec": round(step_sync, 4),
        "e2e_deferred4_sec": round(step_deferred, 4),
        "h2d_batch_sec": round(h2d, 4),
        "h2d_batch_mb": round(h2d_mb, 2),
        "host_gap_sec": round(best - device_step, 4),
        "device_fraction": round(device_step / best, 3),
    }))


if __name__ == "__main__":
    main()
