"""--load_offline path: precomputed spherical depth replaces the renderer.

The reference's depth_pred_with_sph_inpaint supports precomputed
``spherical_depth`` inputs (--load_offline,
/root/reference/models/depth_pred_with_sph_inpaint.py:121-123).  The
decisive check: with identical parameters, feeding the ONLINE renderer's
own output through the offline path reproduces the online prediction
exactly -- so offline datasets and the in-graph renderer are
interchangeable.
"""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data.loader import collate
from genre_shapehd_tpu.models.base import default_opt


def _opt(**kw):
    return default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                       padding_margin=16, batch_size=2, synthetic_length=4,
                       procedural_length=4, **kw)


def test_offline_spherical_matches_online_renderer():
    opt_on = _opt(gt_depth_input=True, exact_render=True)
    model_on = get_model("depth_pred_with_sph_inpaint")(opt_on)
    state = model_on.init_state(jax.random.PRNGKey(0))

    ds = get_dataset("procedural")(opt_on, "vali", model=model_on)
    batch = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}

    _, pred_on = model_on.eval_step(state, batch, jax.random.PRNGKey(1))
    m = opt_on.padding_margin
    partial = pred_on["pred_sph_partial"]          # (N, R+2m, R+2m, 1)
    sph_depth = partial[:, m:-m, m:-m, :]          # un-padded renderer out

    opt_off = _opt(gt_depth_input=True, exact_render=True,
                   load_offline=True)
    model_off = get_model("depth_pred_with_sph_inpaint")(opt_off)
    assert "spherical_depth" in model_off.input_names
    batch_off = dict(batch)
    batch_off["spherical_depth"] = sph_depth
    _, pred_off = model_off.eval_step(state, batch_off,
                                      jax.random.PRNGKey(1))

    np.testing.assert_allclose(np.asarray(pred_off["pred_sph_partial"]),
                               np.asarray(partial), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_off["pred_sph_full"]),
                               np.asarray(pred_on["pred_sph_full"]),
                               rtol=1e-4, atol=1e-5)


def test_offline_input_actually_used():
    """A different spherical_depth must change the prediction (the offline
    input is consumed, not ignored)."""
    opt_off = _opt(gt_depth_input=True, exact_render=True,
                   load_offline=True)
    model = get_model("depth_pred_with_sph_inpaint")(opt_off)
    state = model.init_state(jax.random.PRNGKey(0))
    ds = get_dataset("procedural")(opt_off, "vali", model=model)
    batch = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}
    r = opt_off.sph_res
    a = dict(batch, spherical_depth=jnp.full((2, r, r, 1), 0.3))
    b = dict(batch, spherical_depth=jnp.full((2, r, r, 1), 0.9))
    _, pa = model.eval_step(state, a, jax.random.PRNGKey(1))
    _, pb = model.eval_step(state, b, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(pa["pred_sph_full"]),
                           np.asarray(pb["pred_sph_full"]))
