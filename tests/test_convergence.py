"""Convergence: losses must actually DROP, not just stay finite.

Slow-marked synthetic training runs for marrnet2 and the full GenRe model
(tiny resolutions, 8-device DP mesh): the first-epoch mean loss must fall
by a substantial fraction after a few dozen steps.  Guards against
silently broken gradients, dead stop_gradient paths, and optimizer wiring
regressions -- the failure mode a single-step finiteness check misses.
"""

import numpy as np
import jax
import pytest

from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data.loader import DataLoader, InfiniteLoader
from genre_shapehd_tpu.models.base import default_opt
from genre_shapehd_tpu.train.loggers import ComposeLogger
from genre_shapehd_tpu.train.loop import Trainer


def _run(net, steps, **kw):
    kw.setdefault("padding_margin", 4)
    opt = default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                      batch_size=8, synthetic_length=16,
                      workers=2, **kw)
    model = get_model(net)(opt)
    ds = get_dataset("synthetic")(opt, "train", model=model)
    loader = InfiniteLoader(DataLoader(ds, 8, num_workers=2))
    trainer = Trainer(model, opt, ComposeLogger([]))
    state = trainer.initialize(jax.random.PRNGKey(0))
    losses = []
    rng = jax.random.PRNGKey(1)
    for i, (dev_batch, _, _, _) in enumerate(
            trainer._prefetched(loader, steps)):
        state, metrics = trainer._train_step(state, dev_batch,
                                             jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    return np.asarray(losses)


@pytest.mark.slow
def test_marrnet2_loss_drops_40pct():
    losses = _run("marrnet2", steps=40)
    assert np.isfinite(losses).all()
    start = losses[:4].mean()
    end = losses[-4:].mean()
    assert end < 0.6 * start, (start, end)


@pytest.mark.slow
def test_genre_loss_drops_40pct():
    # padding_margin=16 keeps the inpaint net input (sph_res + 2*margin
    # = 64) divisible by 32, so the U-ResNet skip pyramid stays aligned
    losses = _run("genre_full_model", steps=40, padding_margin=16)
    assert np.isfinite(losses).all()
    start = losses[:4].mean()
    end = losses[-4:].mean()
    assert end < 0.6 * start, (start, end)
