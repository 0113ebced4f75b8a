"""Tests for voxel utilities and frame-convention transforms."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from genre_shapehd_tpu.ops import coords, voxel


def test_downsample_max_and_mean():
    v = np.zeros((4, 4, 4), np.float32)
    v[0, 0, 0] = 1.0
    out = voxel.downsample(v, 1, use_max=True)
    assert out.shape == (2, 2, 2)
    assert out[0, 0, 0] == 1.0
    out_mean = voxel.downsample(v, 1, use_max=False)
    np.testing.assert_allclose(out_mean[0, 0, 0], 1.0 / 8)


def test_translate():
    v = np.zeros((3, 3, 3), np.float32)
    v[1, 1, 1] = 1.0
    out = voxel.translate(v, np.array([1, 0, -1]))
    assert out[2, 1, 0] == 1.0
    assert out.sum() == 1.0


def test_bounding_box_align_centres_match():
    a = np.zeros((16, 16, 16), np.float32)
    a[1:5, 1:5, 1:5] = 1.0
    b = np.zeros((16, 16, 16), np.float32)
    b[9:13, 8:12, 10:14] = 1.0
    aligned = voxel.bounding_box_align(a, b)
    ca = voxel.find_bound(aligned).mean(axis=1)
    cb = voxel.find_bound(b).mean(axis=1)
    np.testing.assert_allclose(ca, cb, atol=0.51)
    assert aligned.sum() == a.sum()


def test_fill_solid_closes_hollow_cube():
    v = np.zeros((10, 10, 10), np.float32)
    v[2:8, 2:8, 2:8] = 1.0
    v[3:7, 3:7, 3:7] = 0.0     # hollow interior
    filled = voxel.fill_solid(v)
    assert filled[5, 5, 5] == 1.0
    assert filled[0, 0, 0] == 0.0


def test_surface_extraction_np_vs_jax():
    rng = np.random.default_rng(0)
    v = (rng.random((1, 16, 16, 16)) > 0.5).astype(np.float32)
    want = np.stack([voxel.surface_from_solid_np(x) for x in v])
    got = np.asarray(voxel.surface_from_solid_jax(jnp.asarray(v)))
    np.testing.assert_allclose(got, want)


def test_surface_matches_genre_preprocess_formula():
    """GT voxel preprocessing oracle: genre_full_model.py:90-96."""
    rng = np.random.default_rng(1)
    val = (rng.random((12, 12, 12)) > 0.6).astype(np.float64)
    # reference chain
    ref = np.transpose(val, (0, 2, 1))
    ref = np.flip(ref, 2)
    ref_surface = ref - ndi.binary_erosion(
        ref, structure=np.ones((3, 3, 3)), iterations=2).astype(float)
    ref_surface = np.clip(ref_surface, 0, 1)
    # ours
    got = np.asarray(coords.gt_voxel_to_train_frame(jnp.asarray(val)))
    got_surface = voxel.surface_from_solid_np(got)
    np.testing.assert_allclose(got_surface, ref_surface)


def test_depth_image_to_cambp_frame_matches_torch_ops():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    d = rng.standard_normal((2, 5, 7)).astype(np.float32)
    t = torch.from_numpy(d)[:, None]            # (N,1,H,W)
    want = torch.flip(t.permute(0, 1, 3, 2), [2])[:, 0].numpy()
    got = np.asarray(coords.depth_image_to_cambp_frame(jnp.asarray(d)))
    np.testing.assert_array_equal(got, want)


def test_voxel_swap_roundtrip_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    v = rng.standard_normal((2, 4, 5, 6)).astype(np.float32)
    t = torch.from_numpy(v)[:, None]            # (N,1,X,Y,Z)
    want_fwd = torch.flip(torch.transpose(t, 3, 4), [3])[:, 0].numpy()
    got_fwd = np.asarray(coords.voxel_swap_yz_flip_y(jnp.asarray(v)))
    np.testing.assert_array_equal(got_fwd, want_fwd)

    v2 = rng.standard_normal((2, 4, 6, 6)).astype(np.float32)
    t2 = torch.from_numpy(v2)[:, None]
    want_bwd = torch.transpose(t2.flip([3]), 3, 4)[:, 0].numpy()
    got_bwd = np.asarray(coords.voxel_flip_y_swap_yz(jnp.asarray(v2)))
    np.testing.assert_array_equal(got_bwd, want_bwd)


def test_transform_by_matrix_identity_and_rotation():
    v = np.zeros((8, 8, 8), np.float32)
    v[2, 3, 4] = 1.0
    out = voxel.transform_by_matrix(v, np.eye(3))
    np.testing.assert_allclose(out, v, atol=1e-6)
    # 90-degree rotation about z maps voxel positions consistently
    rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
    out = voxel.transform_by_matrix(v, rot, order=0)
    assert out.sum() == 1.0
