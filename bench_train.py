"""Benchmark: full-GenRe TRAINING step throughput on one chip.

Times the complete jitted train step (forward + backward + Adam update +
BatchNorm stat updates) at reference scale (batch 4, 256^2 images, 128^3
voxels; scripts/train_full_genre.sh) INCLUDING the host input pipeline
(synthetic dataset -> threaded prefetch -> device_put), i.e. the number a
user would see per step of `cli/train.py --net genre_full_model`.

Prints ONE JSON line like bench.py.  The steps are timed through the
trainer's real _run_phase-equivalent loop: metric fetch each step forces
completion (the axon relay acks unfetched buffers early; see bench.py).
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

BATCH = 4
STEPS = 12


def main():
    import jax
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

    # warm up: compile + one steady step
    times = []
    rng = jax.random.PRNGKey(1)
    prev = time.perf_counter()
    for i, (dev_batch, _, _, _) in enumerate(
            trainer._prefetched(it, STEPS)):
        state, metrics = trainer._train_step(
            state, dev_batch, jax.random.fold_in(rng, i))
        float(metrics["loss"])          # force completion via value fetch
        now = time.perf_counter()
        if i >= 2:                      # drop compile + async head start
            times.append(now - prev)
        prev = now
    trainer.state = state

    step = statistics.median(times)
    print(json.dumps({
        "metric": "genre_full_train_step_sec_batch4",
        "value": round(step, 4),
        "unit": "s/step (incl. host pipeline)",
        "examples_per_sec": round(BATCH / step, 2),
    }))


if __name__ == "__main__":
    main()
