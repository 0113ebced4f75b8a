"""Tests for wgangp, depth_inpaint, genre_full, shapehd, marrnet models.

Run at reduced resolutions (im 64, vox 32, sph 32) on the 8-device CPU
mesh; topology is resolution-parametric so the code paths match full scale.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genre_shapehd_tpu.core.registry import get_dataset, get_model
from genre_shapehd_tpu.data.loader import collate
from genre_shapehd_tpu.models.base import default_opt


def tiny_opt(**kw):
    # padded spherical size (sph_res + 2*margin) must divide cleanly through
    # the 5 U-Net downsamplings -> use 32 + 2*16 = 64
    return default_opt(im_size=64, vox_res=32, sph_res=32, z_res=32,
                       padding_margin=16, batch_size=4, synthetic_length=8,
                       lr=1e-4, **kw)


def make_batch(model, opt, n=4):
    ds = get_dataset("synthetic")(opt, "train", model=model)
    batch = collate([ds[i] for i in range(n)])
    return {k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)}


def test_wgangp_train_step_updates_both_nets():
    opt = tiny_opt(canon_voxel=True)
    model = get_model("wgangp")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    step = jax.jit(model.train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("err_d_real", "err_d_fake", "err_d_gp", "err_d", "err_g",
              "loss"):
        assert np.isfinite(float(metrics[k])), k
    # both param sets changed
    for net in ("net_g", "net_d"):
        p0 = jax.tree.leaves(state.params[net])[0]
        p1 = jax.tree.leaves(new_state.params[net])[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1)), net
    # gp positive at init (untrained D has small gradients vs norm target 1)
    assert float(metrics["err_d_gp"]) > 0


def test_wgangp_gan_d_iter_skips_g_updates():
    opt = tiny_opt(canon_voxel=True, gan_d_iter=2)
    model = get_model("wgangp")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    step = jax.jit(model.train_step)
    # step 0: G updates (0 % 2 == 0); step 1: G skipped
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    g_after_0 = jax.tree.leaves(s1.params["net_g"])[0]
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
    g_after_1 = jax.tree.leaves(s2.params["net_g"])[0]
    np.testing.assert_array_equal(np.asarray(g_after_0),
                                  np.asarray(g_after_1))
    # skipped step reports the carried err_g (wgangp.py:132-134)
    assert float(m2["err_g"]) == pytest.approx(float(m1["err_g"]))


def test_wgangp_train_step_bf16():
    """bf16 compute: the lax.cond G-update/G-skip branches must agree on
    the f32 err_g carry dtype (regression: bf16 -err_g vs f32 last_err_g)."""
    opt = tiny_opt(canon_voxel=True, dtype="bfloat16", gan_d_iter=2)
    model = get_model("wgangp")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    step = jax.jit(model.train_step)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))   # G-skip branch
    for k in ("err_d", "err_g", "loss"):
        assert np.isfinite(float(m2[k])), k


def test_wgangp_eval_step():
    opt = tiny_opt(canon_voxel=True)
    model = get_model("wgangp")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    metrics, pred = jax.jit(model.eval_step)(state, batch,
                                             jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert pred["gen_voxel"].shape == (4, 32, 32, 32)


def test_depth_inpaint_trains_inpaint_module_only():
    opt = tiny_opt()
    model = get_model("depth_pred_with_sph_inpaint")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    assert batch["spherical_object"].shape == (4, 64, 64, 1)  # 32+2*16 padded
    step = jax.jit(model.train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["spherical"]))
    # net1 frozen (stop_gradient): params identical
    p0 = state.params["net"]["net1"]
    p1 = new_state.params["net"]["net1"]
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # net2 trained: at least one leaf changed
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params["net"]["net2"]),
                        jax.tree.leaves(new_state.params["net"]["net2"])))
    assert changed


def test_genre_full_trains_refiner_with_surface_loss():
    opt = tiny_opt()
    model = get_model("genre_full_model")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    assert batch["voxel"].shape == (4, 32, 32, 32)
    # GT arrives as the (transposed/flipped) solid; the surface shell is
    # derived in-graph by compute_loss
    frac = float(jnp.mean(batch["voxel"]))
    assert 0 < frac < 0.5
    from genre_shapehd_tpu.ops.voxel import (surface_from_solid_jax,
                                             surface_from_solid_np)
    shell = np.asarray(surface_from_solid_jax(batch["voxel"]))
    want = np.stack([surface_from_solid_np(v)
                     for v in np.asarray(batch["voxel"])])
    np.testing.assert_allclose(shell, want)
    step = jax.jit(model.train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    # non-joint genre has no spherical loss (genre_full_model.py:62-63)
    for k in ("loss", "voxel_loss", "surface_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert "spherical" not in metrics
    # frozen stage-1/2 (non-joint): depth_and_inpaint unchanged
    for a, b in zip(
            jax.tree.leaves(state.params["net"]["depth_and_inpaint"]),
            jax.tree.leaves(new_state.params["net"]["depth_and_inpaint"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params["net"]["refine_net"]),
                        jax.tree.leaves(new_state.params["net"]["refine_net"])))
    assert changed


def test_shapehd_finetunes_only_marrnet2():
    opt = tiny_opt(canon_sup=True, w_gan_loss=0.5)
    model = get_model("shapehd")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    step = jax.jit(model.train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "sup", "gan"):
        assert np.isfinite(float(metrics[k])), k
    # frozen: discriminator + noft copy unchanged
    for net in ("net_d", "net_noft"):
        for a, b in zip(jax.tree.leaves(state.params[net]),
                        jax.tree.leaves(new_state.params[net])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params["net"]),
                        jax.tree.leaves(new_state.params["net"])))
    assert changed


def test_marrnet_finetune_voxel_loss():
    opt = tiny_opt(canon_sup=False)
    model = get_model("marrnet")(opt)
    state = model.init_state(jax.random.PRNGKey(0))
    batch = make_batch(model, opt)
    step = jax.jit(model.train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # marrnet1 frozen
    for a, b in zip(jax.tree.leaves(state.params["net"]["marrnet1"]),
                    jax.tree.leaves(new_state.params["net"]["marrnet1"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_subnet_checkpoint_composition(tmp_path):
    """Pretrained net1 loads into depth_inpaint (net1_path flag)."""
    from genre_shapehd_tpu.core.checkpoint import save_checkpoint
    opt1 = tiny_opt(pred_depth_minmax=True)
    m1 = get_model("marrnet1")(opt1)
    s1 = m1.init_state(jax.random.PRNGKey(7))
    ckpt = str(tmp_path / "marrnet1.pt")
    save_checkpoint(ckpt, {
        "nets": [{"params": s1.params["net"],
                  "batch_stats": s1.batch_stats["net"]}],
        "optimizers": [s1.opt_state["net"]], "epoch": 1, "loss_eval": 0.0})

    opt2 = tiny_opt(net1_path=ckpt)
    m2 = get_model("depth_pred_with_sph_inpaint")(opt2)
    s2 = m2.init_state(jax.random.PRNGKey(0))
    a = jax.tree.leaves(s1.params["net"])[0]
    b = jax.tree.leaves(s2.params["net"]["net1"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
