"""Produce TRAINRUN_r{N}.md: a committed full-scale on-chip training log.

Runs the full-GenRe training step at reference scale (batch 4, 256^2
images, 128^3 voxels; scripts/train_full_genre.sh) for --steps steps on
synthetic data, recording the loss series and per-step wall time, and
writes a markdown artifact with the loss curve (sparkline table), the
start/end loss, and the step-time statistics.

Usage:  python tools/trainrun_artifact.py --steps 200 --out TRAINRUN_r02.md
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="TRAINRUN_r02.md")
    ap.add_argument("--net", default="genre_full_model")
    args = ap.parse_args()

    import jax
    from genre_shapehd_tpu.core.cache import enable_compile_cache
    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader, InfiniteLoader
    from genre_shapehd_tpu.models.base import default_opt
    from genre_shapehd_tpu.train.loggers import ComposeLogger
    from genre_shapehd_tpu.train.loop import Trainer

    enable_compile_cache()
    opt = default_opt(im_size=256, vox_res=128, sph_res=128, z_res=256,
                      padding_margin=16, dtype="bfloat16",
                      batch_size=args.batch,
                      synthetic_length=args.batch * 8, workers=2)
    model = get_model(args.net)(opt)
    ds = get_dataset("synthetic")(opt, "train", model=model)
    loader = InfiniteLoader(DataLoader(ds, args.batch, num_workers=2))
    trainer = Trainer(model, opt, ComposeLogger([]))
    state = trainer.initialize(jax.random.PRNGKey(0))

    losses, times = [], []
    rng = jax.random.PRNGKey(1)
    prev = time.perf_counter()
    for i, (dev_batch, _, _, _) in enumerate(
            trainer._prefetched(loader, args.steps)):
        state, metrics = trainer._train_step(
            state, dev_batch, jax.random.fold_in(rng, i))
        loss = float(metrics["loss"])   # value fetch = completion barrier
        now = time.perf_counter()
        losses.append(loss)
        if i >= 2:                      # drop compile + async head start
            times.append(now - prev)
        prev = now
        if (i + 1) % 20 == 0:
            print(f"step {i + 1:4d}  loss {loss:.4f}  "
                  f"({times[-1]:.2f}s)" if times else "", flush=True)

    step_med = statistics.median(times)
    k = max(1, len(losses) // 20)
    rows = "\n".join(
        f"| {i} | {statistics.mean(losses[i:i + k]):.4f} |"
        for i in range(0, len(losses), k))
    backend = jax.default_backend()
    md = f"""# Full-scale training run (round 2)

Full-GenRe training at reference scale on one chip, synthetic dataset.
Produced by `python tools/trainrun_artifact.py --steps {args.steps}`.

- model: `{args.net}`, batch {args.batch}, 256^2 images -> 128^3 voxels,
  bf16 compute, Adam (model defaults), backend `{backend}`
- steps: {args.steps}
- loss: **{statistics.mean(losses[:k]):.4f} -> {statistics.mean(losses[-k:]):.4f}**
  (first-{k} mean -> last-{k} mean)
- step time (median, incl. host pipeline): **{step_med:.3f}s**
  ({args.batch / step_med:.1f} examples/s)

## Loss series (mean per {k}-step bucket)

| step | loss |
|---|---|
{rows}

Raw JSON: see the fenced block below.

```json
{json.dumps({"losses": [round(x, 5) for x in losses],
             "step_time_median_s": round(step_med, 4)})}
```
"""
    with open(args.out, "w") as f:
        f.write(md)
    print(f"wrote {args.out}: loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
          f"{step_med:.3f}s/step")


if __name__ == "__main__":
    main()
