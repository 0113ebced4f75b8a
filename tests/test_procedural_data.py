"""Geometric consistency of the procedural dataset with the ops pipeline.

These tests are the ground truth for the frame conventions: the analytic
renders (depth / spherical / voxel) must agree with what the in-repo
differentiable ops produce from each other.  Any permute/flip mistake in
either side breaks the overlap assertions here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from genre_shapehd_tpu import ops
from genre_shapehd_tpu.data.procedural import (
    Scene, cambp_to_image_frame, generate_sample)
from genre_shapehd_tpu.ops.camera_bp import CAM_DIST, FL_GENRE


SEEDS = [3, 11]


def test_cambp_to_image_frame_roundtrip():
    arr = np.arange(24, dtype=np.float32).reshape(4, 6)[:4, :4]
    img = cambp_to_image_frame(arr)
    back = np.asarray(ops.coords.depth_image_to_cambp_frame(img[None]))[0]
    np.testing.assert_array_equal(back, arr)
    # channelled variant
    arr3 = np.random.default_rng(0).random((5, 5, 3)).astype(np.float32)
    img3 = cambp_to_image_frame(arr3)
    for c in range(3):
        back = np.asarray(
            ops.coords.depth_image_to_cambp_frame(img3[None, ..., c]))[0]
        np.testing.assert_array_equal(back, arr3[..., c])


@pytest.mark.parametrize("seed", SEEDS)
def test_camera_depth_backprojects_into_gt_voxels(seed):
    """cam_bp of the analytic depth must land on the GT occupancy surface."""
    res = 64
    scene = Scene(seed)
    cam = scene.render_camera(size=128, fl=FL_GENRE * 128.0 / 256.0)
    occ = scene.voxelize(res)                       # glob frame
    depth_cb = jnp.asarray(cam["depth"][None])      # already cam_bp frame
    tdf = np.asarray(ops.camera_bp.camera_backproject(
        depth_cb, FL_GENRE * 128.0 / 256.0, CAM_DIST, res))[0]
    hits = tdf != 1.0 / res
    assert hits.sum() > 200, "depth map should scatter many voxels"
    # hit voxels must be on/near the GT surface: dilate occupancy by one
    # voxel and require almost all hits inside
    occ_d = occ.copy()
    for ax in range(3):
        occ_d |= np.roll(occ, 1, ax) | np.roll(occ, -1, ax)
    frac_inside = (hits & occ_d).sum() / hits.sum()
    assert frac_inside > 0.97, frac_inside
    # and the visible surface should cover a decent part of the shell
    interior = occ & np.all(
        [np.roll(occ, s, ax) for ax in range(3) for s in (1, -1)], axis=0)
    shell = occ & ~interior
    cover = (hits & shell).sum() / shell.sum()
    assert cover > 0.15, cover


@pytest.mark.parametrize("seed", SEEDS)
def test_analytic_spherical_matches_renderer(seed):
    """Exact differentiable renderer on GT voxels ~= analytic spherical."""
    res, sph_res, z_res = 64, 64, 128
    scene = Scene(seed)
    occ = scene.voxelize(res).astype(np.float32)
    prob = jnp.clip(jnp.asarray(occ[None]), 1e-5, 1 - 1e-5)
    rendered = np.asarray(ops.render_spherical(prob, sph_res, z_res))[0]
    analytic = scene.render_spherical(sph_res)
    # agreement on confidently-foreground rays (analytic depth < 0.9);
    # voxelisation/trilinear smoothing causes ~1-voxel boundary bands
    fg = analytic < 0.9
    assert fg.mean() > 0.05
    diff = np.abs(rendered - analytic)[fg]
    assert np.mean(diff) < 0.03, np.mean(diff)
    # scenes contain the origin, so usually every ray hits; if any true
    # background rays exist the renderer must agree there too
    bg = analytic > 0.999
    if bg.any():
        assert np.mean(np.abs(rendered - analytic)[bg]) < 0.02


@pytest.mark.parametrize("seed", SEEDS)
def test_spherical_backprojection_lands_on_voxels(seed):
    """sph_bp of (1 - analytic t) must scatter onto the GT surface."""
    res, sph_res = 64, 64
    scene = Scene(seed)
    occ = scene.voxelize(res)
    t = scene.render_spherical(sph_res)
    radius = jnp.asarray((1.0 - t)[None])          # glob radius of entry
    _, cnt = ops.spherical_backproject(radius, res=res)
    hits = np.asarray(cnt)[0] > 0
    # background rays have radius 0 -> glob origin voxel; drop centre blob
    ctr = res // 2
    hits[ctr - 2:ctr + 2, ctr - 2:ctr + 2, ctr - 2:ctr + 2] = False
    assert hits.sum() > 100
    occ_d = occ.copy()
    for ax in range(3):
        occ_d |= np.roll(occ, 1, ax) | np.roll(occ, -1, ax)
    frac = (hits & occ_d).sum() / hits.sum()
    assert frac > 0.97, frac


def test_generate_sample_shapes_and_ranges():
    s = generate_sample(7, im_size=128, vox_res=64, sph_res=64)
    assert s["rgb"].shape == (128, 128, 3)
    assert s["depth"].shape == (128, 128)
    assert s["normal"].shape == (128, 128, 3)
    assert s["voxel"].shape == (64, 64, 64)
    assert s["spherical_object"].shape == (1, 64, 64)
    fg = s["silhou"] > 0.5
    assert 0.02 < fg.mean() < 0.6
    assert s["depth"][fg].min() >= 0.0 and s["depth"][fg].max() <= 1.0
    assert np.all(s["depth"][~fg] == 0.0)
    dmin, dmax = s["depth_minmax"]
    assert 1.0 < dmin < dmax < 3.2
    assert 0.005 < s["voxel"].mean() < 0.5
    # depth normalisation must invert exactly: 1 - norm -> [dmin, dmax]
    recon = (1.0 - s["depth"][fg]) * (dmax - dmin + 1e-4) + dmin
    assert recon.min() >= dmin - 1e-3 and recon.max() <= dmax + 1e-3


def test_gt_voxel_frame_matches_model_preprocess():
    """Dataset voxel --genre preprocess--> must equal the glob-frame occ."""
    from genre_shapehd_tpu.models import genre_full
    from genre_shapehd_tpu.models.base import default_opt

    scene = Scene(5)
    occ = scene.voxelize(32).astype(np.float32)
    vox_gt = np.swapaxes(np.flip(occ, axis=2), 1, 2)
    opt = default_opt(vox_res=32, im_size=64, sph_res=32, z_res=64)
    model = genre_full.Model(opt)
    out = model.preprocess({"voxel": vox_gt}, mode="train")
    np.testing.assert_array_equal(out["voxel"], occ)


def test_dataset_contract_with_model_requires():
    from genre_shapehd_tpu.data.procedural import Dataset

    class FakeModel:
        requires = ["rgb", "depth", "silhou", "normal", "depth_minmax",
                    "voxel", "spherical"]
        preprocess = None

    from genre_shapehd_tpu.models.base import default_opt
    opt = default_opt(im_size=64, vox_res=32, sph_res=32)
    opt.procedural_length = 8
    ds = Dataset(opt, "train", model=FakeModel())
    a = ds[1]
    b = ds[1]                                       # cache round-trip
    np.testing.assert_allclose(a["voxel"], b["voxel"])
    np.testing.assert_allclose(a["depth"], b["depth"], atol=1e-3)
    vali = Dataset(opt, "vali", model=FakeModel())
    assert len(vali) == 16
    v = vali[1]
    assert not np.allclose(v["depth"], a["depth"])
