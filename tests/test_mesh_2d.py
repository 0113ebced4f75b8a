"""2-D (dp x sp) mesh: genre train step with spatial voxel sharding."""

import numpy as np
import jax
import pytest

from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data.loader import collate
from genre_shapehd_tpu.models.base import default_opt
from genre_shapehd_tpu.parallel import mesh as pmesh
from genre_shapehd_tpu.train.loggers import ComposeLogger
from genre_shapehd_tpu.train.loop import Trainer


def test_genre_trains_on_dp4_sp2_mesh():
    assert jax.device_count() >= 8
    opt = default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                      padding_margin=16, batch_size=4, synthetic_length=4,
                      lr=1e-4)
    model = get_model("genre_full_model")(opt)
    mesh = pmesh.make_mesh_2d(dp=4, sp=2)
    assert mesh.axis_names == ("dp", "sp")
    trainer = Trainer(model, opt, ComposeLogger([]), mesh=mesh)
    try:
        state = trainer.initialize(jax.random.PRNGKey(0))
        ds = get_dataset("synthetic")(opt, "train", model=model)
        batch = collate([ds[i] for i in range(4)])
        dev_batch, _ = trainer._device_batch(batch)
        # batch sharded over dp only (4-way), replicated over sp
        leaf = next(iter(dev_batch.values()))
        assert len(leaf.sharding.device_set) == 8
        new_state, metrics = trainer._train_step(state, dev_batch,
                                                 jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        pmesh.set_active_mesh(None)


def test_dp_only_mesh_unaffected_by_spatial_helper():
    """maybe_shard_spatial is the identity without an sp axis."""
    import jax.numpy as jnp
    pmesh.set_active_mesh(pmesh.make_mesh())
    try:
        x = jnp.ones((2, 4, 4, 4, 1))
        y = pmesh.maybe_shard_spatial(x, axis=3)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    finally:
        pmesh.set_active_mesh(None)
