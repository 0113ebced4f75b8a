"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed CPU run (or the single-process control).

Trains ONE step of marrnet2 (tiny config) over the global mesh, with this
process loading only its per-process data shard, and prints the loss.
Invoked as:  python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                                   process_id=pid)
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    from genre_shapehd_tpu.core.registry import get_dataset, get_model
    from genre_shapehd_tpu.data.loader import DataLoader
    from genre_shapehd_tpu.models.base import default_opt
    from genre_shapehd_tpu.train.loggers import ComposeLogger
    from genre_shapehd_tpu.train.loop import Trainer

    GLOBAL_BATCH = 4
    opt = default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                      padding_margin=4, batch_size=GLOBAL_BATCH,
                      synthetic_length=8)
    model = get_model("marrnet2")(opt)
    # vali mode: augmentation-free, index-deterministic samples so every
    # process (and the single-process control) sees identical data
    ds = get_dataset("synthetic")(opt, "vali", model=model)
    loader = DataLoader(ds, GLOBAL_BATCH, shuffle=False, num_workers=1,
                        shard_id=jax.process_index(),
                        num_shards=jax.process_count())
    trainer = Trainer(model, opt, ComposeLogger([]))
    state = trainer.initialize(jax.random.PRNGKey(0))
    batch = next(iter(loader))
    assert next(iter(
        v for v in batch.values() if hasattr(v, "shape"))).shape[0] \
        == GLOBAL_BATCH // nproc
    dev_batch, _ = trainer._device_batch(batch)
    _, metrics = trainer._train_step(state, dev_batch, jax.random.PRNGKey(1))
    print(f"MULTIHOST_LOSS {float(metrics['loss']):.8f}", flush=True)


if __name__ == "__main__":
    main()
