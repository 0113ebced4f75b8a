"""Train entry point mirroring /root/reference/train.py.

Usage (reference-script compatible):
  python -m genre_shapehd_tpu.cli.train --net marrnet1 --dataset shapenet \
      --classes chair --batch_size 4 --epoch_batches 1000 --eval_batches 10 \
      --lr 1e-3 --epoch 500 --logdir logs/ --expr_id 1 [--tensorboard]
"""

from __future__ import annotations

import os
import pickle
import shutil
import sys

import jax
import numpy as np

from ..core.registry import get_dataset, get_model
from ..data.loader import DataLoader
from ..train.loggers import (BatchCsvLogger, ComposeLogger, CsvLogger,
                             ModelSaveLogger, ProgbarLogger, TensorBoardLogger,
                             TerminateOnNaN)
from ..train.loop import Trainer
from ..utils import str_stage, str_verbose, str_warning
from . import options


def make_logdir(opt) -> str:
    """logdir templating + clobber guard (train.py:34-59)."""
    name = f"{opt.net}_{opt.dataset}_{opt.lr}"
    if opt.suffix:
        name += "_" + opt.suffix.format(**vars(opt))
    logdir = os.path.join(opt.logdir, name, str(opt.expr_id))
    if os.path.isdir(logdir) and opt.resume == 0:
        if opt.expr_id > 0:
            raise RuntimeError(
                f"logdir {logdir} exists with positive expr_id; refusing to "
                "overwrite -- use expr_id <= 0 for scratch runs")
        print(f"{str_warning} overwriting existing logdir {logdir}")
        shutil.rmtree(logdir)
    os.makedirs(logdir, exist_ok=True)
    return logdir


def main(argv=None) -> int:
    opt, unique_params = options.parse_train(argv)

    from ..core.cache import enable_compile_cache
    enable_compile_cache()

    print(str_stage, "Setting up device + seed")
    if getattr(opt, "multihost", False):
        # multi-host slice over DCN: same sharding annotations, global mesh
        jax.distributed.initialize()
        print(str_verbose, f"process {jax.process_index()} of "
              f"{jax.process_count()}")
    if opt.manual_seed is not None:
        np.random.seed(opt.manual_seed)
    rng = jax.random.PRNGKey(opt.manual_seed or 0)
    print(str_verbose, f"devices: {jax.devices()}")

    print(str_stage, "Setting up logging directory")
    opt.full_logdir = make_logdir(opt)
    # resume: restore saved options except unique params (train.py:61-64)
    if opt.resume != 0 and os.path.isfile(f"{opt.full_logdir}/opt.pt"):
        with open(f"{opt.full_logdir}/opt.pt", "rb") as f:
            saved = pickle.load(f)
        opt = options.overwrite_opt(opt, saved, unique_params)
    options.save_opt(opt.full_logdir, opt)

    print(str_stage, "Setting up models")
    model_cls = get_model(opt.net)
    model = model_cls(opt)
    print(str_verbose, model.__class__.__module__)

    print(str_stage, "Setting up loggers")
    loggers = [ProgbarLogger(), CsvLogger(f"{opt.full_logdir}/epoch_loss.csv"),
               TerminateOnNaN()]
    if opt.log_batch:
        loggers.append(BatchCsvLogger(f"{opt.full_logdir}/batch_loss.csv"))
    if opt.tensorboard:
        loggers.append(TensorBoardLogger(f"{opt.full_logdir}/tensorboard"))
    logger = ComposeLogger(loggers)

    from ..viz.visualizer import Visualizer
    visualizer = Visualizer(n_workers=opt.vis_workers,
                            param_f=getattr(opt, "vis_param_f", None)) \
        if opt.vis_batches_vali > 0 else None
    mesh = None
    if getattr(opt, "sp", 1) > 1:
        from ..parallel.mesh import make_mesh_2d
        n = len(jax.devices())
        dp = n // opt.sp
        if dp * opt.sp != n:
            print(str_warning, f"--sp {opt.sp} does not divide "
                  f"{n} devices; using only {dp * opt.sp}")
        mesh = make_mesh_2d(dp=dp, sp=opt.sp)
        print(str_verbose, f"mesh: dp={dp} x sp={opt.sp}")
    trainer = Trainer(model, opt, logger, visualizer=visualizer, mesh=mesh)
    trainer.initialize(rng)

    # checkpoint writers (train.py:87-111): latest each epoch, periodic
    # snapshots, best-on-eval
    logger.add_logger(ModelSaveLogger(
        f"{opt.full_logdir}/checkpoint.pt", period=1,
        save_fn=lambda p, e: trainer.save(p, e)))
    if opt.save_net:
        logger.add_logger(ModelSaveLogger(
            opt.full_logdir + "/nets/{epoch:04d}.pt", period=opt.save_net,
            save_fn=lambda p, e: trainer.save(p, e)))
    best_logger = ModelSaveLogger(
        f"{opt.full_logdir}/best.pt", save_best_only=True,
        save_fn=lambda p, e: trainer.save(p, e))
    logger.add_logger(best_logger)

    if opt.resume != 0:
        print(str_stage, "Resuming")
        trainer.maybe_resume(opt.full_logdir, opt.resume)
        best_logger.best = trainer.initial_loss_eval

    print(str_stage, "Setting up data loaders")
    dataset_cls = get_dataset(opt.dataset)
    ds_train = dataset_cls(opt, mode="train", model=model)
    ds_vali = dataset_cls(opt, mode="vali", model=model)
    # per-process data sharding: every process draws the same global index
    # sequence and loads only its slice (no-op single-process)
    shard = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
    train_loader = DataLoader(ds_train, opt.batch_size, shuffle=True,
                              num_workers=opt.workers,
                              seed=opt.manual_seed or 0, **shard)
    vali_loader = DataLoader(ds_vali, opt.batch_size, shuffle=False,
                             num_workers=opt.workers, **shard)
    steps = opt.epoch_batches or len(train_loader)
    eval_steps = (opt.eval_batches if opt.eval_batches is not None
                  else len(vali_loader))
    eval_steps = min(eval_steps, len(vali_loader))
    print(str_verbose, f"{len(ds_train)} train / {len(ds_vali)} vali samples;"
          f" {steps} steps/epoch, {eval_steps} eval batches")

    print(str_stage, "Training")
    trainer.fit(train_loader, vali_loader, epochs=opt.epoch,
                steps_per_epoch=steps, eval_batches=eval_steps, rng=rng,
                eval_at_start=opt.eval_at_start)
    return 0


if __name__ == "__main__":
    sys.exit(main())
