"""Tests for auxiliary utilities: camera, BatchSave, cam_para, surface
mask, reprojection loss, Chamfer eval tooling."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from genre_shapehd_tpu.ops import get_surface_mask, reprojection_loss
from genre_shapehd_tpu.utils import (BatchSave, Camera,
                                     backproject_depth_to_ptcloud, cam_para)


def test_camera_project_backproject_roundtrip():
    cam = Camera()
    cam.res = [32, 24]
    cam.set_diagonal((0.036 ** 2 + 0.024 ** 2) ** 0.5)
    cam.lookat(orig=[2.0, 0.5, 0.5], target=[0, 0, 0], up=[0, 1, 0])
    pt = np.array([0.1, 0.05, -0.02])
    px, py = cam.project_point(pt)
    assert np.isfinite(px) and np.isfinite(py)
    d_ray = cam.project_depth(pt, "ray")
    d_plane = cam.project_depth(pt, "plane")
    assert d_plane <= d_ray + 1e-9

    # backproject a synthetic depth map and re-project: depths must match
    depth = np.full((24, 32), -1.0, np.float32)
    depth[8:16, 10:20] = 2.0
    pts, (ys, xs) = backproject_depth_to_ptcloud(depth, cam,
                                                 depth_type="ray")
    d2 = cam.project_depth(pts, "ray")
    np.testing.assert_allclose(d2, 2.0, atol=1e-5)


def test_batchsave_shards(tmp_path):
    patt = str(tmp_path / "shard{ind:03d}")
    bs = BatchSave(patt, filesize=5)
    for _ in range(3):
        bs.add_data({"a": np.ones((4, 2)), "b": list(range(4))})
    bs.close()
    assert bs.get_fileind() == 3          # 12 samples -> 5 + 5 + 2
    d0 = np.load(str(tmp_path / "shard000.npz"), allow_pickle=True)
    assert d0["a"].shape == (5, 2)
    d2 = np.load(str(tmp_path / "shard002.npz"), allow_pickle=True)
    assert d2["a"].shape == (2, 2)


def test_cam_para_angle_roundtrip():
    for az in (-2.0, 0.0, 1.2):
        onehot = cam_para.azimuth_to_onehot(az, 24)
        assert onehot.sum() == 1
        back = cam_para.onehot_to_azimuth(onehot, 24)
        # round-trips within a bin width
        assert abs(back - az) < 2 * np.pi / 24 + 1e-6
    for el in (-0.7, 0.3):
        onehot = cam_para.elevation_to_onehot(el, 12)
        back = cam_para.onehot_to_elevation(onehot, 12)
        assert abs(back - el) < np.pi / 12 + 1e-6


def test_cam_para_xml_parsing(tmp_path):
    xml = """<scene><sensor type="perspective">
      <transform name="toWorld">
        <lookAt origin="1.5,0.8,1.0" target="0,0,0" up="0,1,0"/>
      </transform>
      <film type="ldrfilm">
        <integer name="width" value="480"/>
        <integer name="height" value="480"/>
      </film>
    </sensor></scene>"""
    path = str(tmp_path / "cam.xml")
    open(path, "w").write(xml)
    az, el = cam_para.read_cam_para_from_xml(path)
    assert -np.pi <= az <= np.pi
    assert -np.pi / 2 <= el <= np.pi / 2
    raw = cam_para.raw_camparam_from_xml(path)
    assert raw["width"] == 480
    r = cam_para.get_object_rotation(path, "zup")
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_get_surface_mask_carves_free_space():
    """A frontal plane at depth ~cam_dist: voxels in front of the plane
    (toward the camera) that project onto it are carved to 0."""
    res = 16
    depth = np.full((1, 24, 24), 2.2, np.float32)
    surface, mask = get_surface_mask(jnp.asarray(depth), fl=20.0,
                                     cam_dist=2.2, res=res)
    surface = np.asarray(surface)[0]
    mask = np.asarray(mask)[0]
    assert surface.max() == 1.0
    assert mask.min() == 0.0            # some free space carved
    # occupied voxels keep mask 1
    assert np.all(mask[surface > 0] == 1.0)


def test_reprojection_loss_prefers_consistent_voxels():
    res = 6
    centers = (np.mgrid[0:res, 0:res, 0:res].reshape(3, -1).T + 0.5) / res - 0.5
    x = jnp.asarray(centers, jnp.float32)
    x0 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    n0 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    # voxel grid occupied exactly at the nearest voxel -> low loss
    v_good = np.zeros(res ** 3, np.float32)
    i0 = np.argmin(((centers - np.zeros(3)) ** 2).sum(1))
    v_good[i0] = 1.0
    l_good = float(reprojection_loss(jnp.asarray(v_good), x, x0, n0, 1 / res))
    v_bad = np.ones(res ** 3, np.float32) - v_good
    l_bad = float(reprojection_loss(jnp.asarray(v_bad), x, x0, n0, 1 / res))
    assert l_good < l_bad


def test_chamfer_eval_pipeline_identical_voxels():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.eval_chamfer import chamfer_between_voxels
    vol = np.zeros((24, 24, 24), np.float32)
    vol[8:16, 8:16, 8:16] = 1.0
    cd_same = chamfer_between_voxels(vol, vol, th=0.5, use_sigmoid=False,
                                     n_points=256)
    assert cd_same < 0.05
    shifted = np.roll(vol, 4, axis=0)
    cd_shift = chamfer_between_voxels(vol, shifted, th=0.5,
                                      use_sigmoid=False, n_points=256)
    assert cd_shift > cd_same
