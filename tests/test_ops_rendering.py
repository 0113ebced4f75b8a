"""Tests for stop probability, 3D grid sampling and the spherical renderer.

Oracles: the CUDA recurrence for stop probability
(calc_prob_kernel.cu:129-141) and torch.nn.functional.grid_sample
(align_corners=True) for the trilinear probe -- torch (CPU) is available in
the image as a test oracle only.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genre_shapehd_tpu.ops import (
    stop_probability, grid_sample_3d, render_spherical,
)


def _stop_prob_recurrence(p):
    """CUDA-kernel recurrence transcription (oracle)."""
    out = np.zeros_like(p)
    out[..., 0] = p[..., 0]
    for z in range(1, p.shape[-1]):
        out[..., z] = out[..., z - 1] * (1.0 / p[..., z - 1] - 1.0) * p[..., z]
    return out


def test_stop_probability_matches_cuda_recurrence():
    rng = np.random.default_rng(0)
    p = np.clip(rng.random((2, 4, 4, 16)), 1e-5, 1 - 1e-5)
    got = np.asarray(stop_probability(jnp.asarray(p)))
    want = _stop_prob_recurrence(p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_stop_probability_sums_with_background_to_one():
    rng = np.random.default_rng(1)
    p = np.clip(rng.random((3, 8)), 1e-4, 1 - 1e-4)
    stop = np.asarray(stop_probability(jnp.asarray(p)))
    bg = np.prod(1 - p, axis=-1)
    np.testing.assert_allclose(stop.sum(-1) + bg, 1.0, rtol=1e-6)


def test_stop_probability_grad_finite():
    p = jnp.asarray(np.clip(np.random.default_rng(2).random((2, 12)),
                            1e-5, 1 - 1e-5))
    g = jax.grad(lambda x: jnp.sum(stop_probability(x) ** 2))(p)
    assert np.isfinite(np.asarray(g)).all()


def test_grid_sample_3d_matches_torch_align_corners_true():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    vol = rng.standard_normal((2, 5, 6, 7)).astype(np.float32)
    pts = (rng.random((2, 4, 3, 3)).astype(np.float32) * 2.4) - 1.2  # incl. OOB

    got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts)))

    # torch: input (N,C,D,H,W), grid (N,d,h,w,3) with x->W, y->H, z->D.
    # our convention: component 0 -> axis X of (N,X,Y,Z). Map by making
    # torch W = our X, H = our Y, D = our Z, i.e. input = vol transposed.
    tvol = torch.from_numpy(vol.transpose(0, 3, 2, 1))[:, None]  # (N,1,Z,Y,X)
    tpts = torch.from_numpy(pts)[:, None]                        # (N,1,h,w,3)
    want = torch.nn.functional.grid_sample(
        tvol, tpts, mode="bilinear", padding_mode="zeros",
        align_corners=True)[:, 0, 0].numpy()                     # (N,h,w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_render_spherical_empty_vox_gives_background_depth_one():
    vox = jnp.full((1, 16, 16, 16), 1e-5)
    out = np.asarray(render_spherical(vox, sph_res=16, z_res=32))
    np.testing.assert_allclose(out, 1.0, atol=1e-2)


def test_render_spherical_solid_center_hits_before_background():
    vox = np.full((1, 32, 32, 32), 1e-4, np.float32)
    vox[0, 12:20, 12:20, 12:20] = 1 - 1e-4     # solid cube at centre
    out = np.asarray(render_spherical(jnp.asarray(vox), sph_res=16, z_res=64))
    # every ray passes near the centre: expected depth well below bg=1,
    # and roughly the distance from the radius-2 shell to the cube surface
    assert out.max() < 0.95
    assert out.min() > 0.5


def test_render_spherical_grad_finite():
    vox = jnp.full((1, 16, 16, 16), 0.3)
    g = jax.grad(lambda v: jnp.sum(render_spherical(v, 8, 16)))(vox)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
