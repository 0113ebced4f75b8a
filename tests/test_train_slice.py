"""End-to-end training-slice tests: marrnet1/marrnet2 on the 8-device mesh.

Covers the reference's core runtime semantics: jitted train steps with
data-parallel sharding, metric accumulation, CSV logging, checkpointing
with -1/-2/N resume, and NaN termination.
"""

import os

import numpy as np
import jax
import pytest

from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data.loader import DataLoader
from genre_shapehd_tpu.models.base import default_opt
from genre_shapehd_tpu.train.loggers import (ComposeLogger, CsvLogger,
                                             ModelSaveLogger, TerminateOnNaN)
from genre_shapehd_tpu.train.loop import Trainer


def tiny_opt(**kw):
    return default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                       padding_margin=4, batch_size=8, synthetic_length=16,
                       workers=2, **kw)


def make_bits(net, **kw):
    opt = tiny_opt(**kw)
    model = get_model(net)(opt)
    ds_train = get_dataset("synthetic")(opt, "train", model=model)
    ds_vali = get_dataset("synthetic")(opt, "vali", model=model)
    tl = DataLoader(ds_train, opt.batch_size, num_workers=2)
    vl = DataLoader(ds_vali, opt.batch_size, num_workers=2, shuffle=False)
    return opt, model, tl, vl


def test_marrnet1_trains_and_loss_decreases():
    opt, model, tl, vl = make_bits("marrnet1")
    trainer = Trainer(model, opt, ComposeLogger([]))
    trainer.initialize(jax.random.PRNGKey(0))
    log = trainer.fit(tl, vl, epochs=2, steps_per_epoch=2, eval_batches=1,
                      rng=jax.random.PRNGKey(1))
    assert "loss" in log and np.isfinite(log["loss"])
    for k in ("normal", "depth", "silhou"):
        assert k in log


def test_marrnet1_state_is_sharding_compatible():
    """Train step executes over all 8 virtual devices."""
    assert jax.device_count() == 8
    opt, model, tl, vl = make_bits("marrnet1")
    trainer = Trainer(model, opt, ComposeLogger([]))
    state = trainer.initialize(jax.random.PRNGKey(0))
    batch = next(iter(tl))
    dev_batch, _ = trainer._device_batch(batch)
    # batch is sharded over dp axis
    shard_devs = {d for leaf in jax.tree.leaves(dev_batch)
                  for d in leaf.sharding.device_set}
    assert len(shard_devs) == 8
    new_state, metrics = trainer._train_step(state, dev_batch,
                                             jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_marrnet2_trains_with_voxels():
    opt, model, tl, vl = make_bits("marrnet2")
    trainer = Trainer(model, opt, ComposeLogger([]))
    trainer.initialize(jax.random.PRNGKey(0))
    log = trainer.fit(tl, vl, epochs=1, steps_per_epoch=2, eval_batches=1,
                      rng=jax.random.PRNGKey(1))
    assert np.isfinite(log["loss"])


def test_checkpoint_save_resume_roundtrip(tmp_path):
    opt, model, tl, vl = make_bits("marrnet1")
    logdir = str(tmp_path)
    logger = ComposeLogger([CsvLogger(f"{logdir}/epoch_loss.csv")])
    trainer = Trainer(model, opt, logger)
    trainer.initialize(jax.random.PRNGKey(0))
    logger.add_logger(ModelSaveLogger(f"{logdir}/checkpoint.pt", period=1,
                                      save_fn=lambda p, e: trainer.save(p, e)))
    logger.add_logger(ModelSaveLogger(logdir + "/nets/{epoch:04d}.pt",
                                      period=1,
                                      save_fn=lambda p, e: trainer.save(p, e)))
    logger.add_logger(ModelSaveLogger(f"{logdir}/best.pt",
                                      save_best_only=True,
                                      save_fn=lambda p, e: trainer.save(p, e)))
    trainer.fit(tl, vl, epochs=2, steps_per_epoch=1, eval_batches=1,
                rng=jax.random.PRNGKey(1))
    assert os.path.isfile(f"{logdir}/checkpoint.pt")
    assert os.path.isfile(f"{logdir}/nets/0001.pt")
    assert os.path.isfile(f"{logdir}/nets/0002.pt")
    assert os.path.isfile(f"{logdir}/best.pt")
    assert os.path.isfile(f"{logdir}/epoch_loss.csv")

    # resume from -1 (checkpoint.pt)
    model2 = get_model("marrnet1")(opt)
    trainer2 = Trainer(model2, opt, ComposeLogger([]))
    trainer2.initialize(jax.random.PRNGKey(3))
    payload = trainer2.maybe_resume(logdir, -1)
    assert payload["epoch"] == 2
    assert trainer2.start_epoch == 2
    # params actually restored: equal to trainer's current params
    p1 = jax.tree.leaves(trainer.state.params)[0]
    p2 = jax.tree.leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))

    # resume from nets/1
    trainer3 = Trainer(get_model("marrnet1")(opt), opt, ComposeLogger([]))
    trainer3.initialize(jax.random.PRNGKey(4))
    assert trainer3.maybe_resume(logdir, 1)["epoch"] == 1
    # resume from best (-2)
    trainer4 = Trainer(get_model("marrnet1")(opt), opt, ComposeLogger([]))
    trainer4.initialize(jax.random.PRNGKey(5))
    assert trainer4.maybe_resume(logdir, -2) is not None


def test_terminate_on_nan_logger():
    t = TerminateOnNaN()
    t.on_batch_begin(0)
    t.on_batch_end(0, {"loss": float("nan"), "size": 4})
    with pytest.raises(FloatingPointError):
        t.on_batch_begin(1)


def test_csv_logger_writes_train_and_eval_rows(tmp_path):
    path = str(tmp_path / "epoch_loss.csv")
    lg = CsvLogger(path)
    lg.train()
    lg.on_epoch_begin(1)
    lg.on_batch_end(0, {"size": 4, "loss": 1.0})
    lg.on_batch_end(1, {"size": 4, "loss": 3.0})
    lg.on_epoch_end(1, {"size": 8, "loss": 2.0})
    lg.eval()
    lg.on_epoch_begin(1)
    lg.on_batch_end(0, {"size": 4, "loss": 0.5})
    lg.on_epoch_end(1, {"size": 4, "loss": 0.5})
    rows = open(path).read().strip().splitlines()
    assert len(rows) == 3            # header + train + eval
    assert "train" in rows[1] and "eval" in rows[2]
