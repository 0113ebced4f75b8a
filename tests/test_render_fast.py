"""Parity tests: MXU-native spherical renderer vs the gather reference."""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.ops import render_spherical
from genre_shapehd_tpu.ops.render_sph_fast import (render_spherical_fast,
                                                   sample_rays_mxu,
                                                   _hat_weights)
from genre_shapehd_tpu.ops.grid_sample import grid_sample_3d
from genre_shapehd_tpu.ops.render_sph import _ray_points


def test_hat_weights_partition_of_unity():
    w = _hat_weights(np.linspace(0, 9, 40), 10)
    np.testing.assert_allclose(w.sum(0), 1.0, atol=1e-12)
    # out-of-range targets get (partially) zero columns
    w2 = _hat_weights(np.array([-0.5, 9.5]), 10)
    np.testing.assert_allclose(w2.sum(0), [0.5, 0.5])


def test_ray_sampling_matches_gather_reference():
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.random((2, 32, 32, 32)), jnp.float32)
    R, Z = 32, 64
    fast = np.asarray(sample_rays_mxu(vox, R, Z, rho_res=64, chunk=8))
    pts = jnp.asarray(_ray_points(R, Z))
    pts = jnp.broadcast_to(pts[None], (2,) + pts.shape)
    ref = np.asarray(grid_sample_3d(vox, pts))
    # one extra bilinear resample through the rho grid -> small smoothing
    assert np.abs(fast - ref).mean() < 0.02
    assert np.abs(fast - ref).max() < 0.35
    # correlation stays essentially 1
    cc = np.corrcoef(fast.ravel(), ref.ravel())[0, 1]
    assert cc > 0.99


def test_expected_depth_close_to_reference():
    rng = np.random.default_rng(1)
    vox = np.full((1, 32, 32, 32), 1e-4, np.float32)
    vox[0, 10:22, 10:22, 10:22] = 1 - 1e-4
    vox = jnp.asarray(vox)
    R, Z = 32, 64
    ref = np.asarray(render_spherical(vox, R, Z))
    fast = np.asarray(render_spherical_fast(vox, R, Z, rho_res=64))
    assert np.abs(ref - fast).mean() < 0.01
    assert np.abs(ref - fast).max() < 0.1


def test_fast_renderer_grad_finite():
    vox = jnp.full((1, 16, 16, 16), 0.3)
    g = jax.grad(lambda v: jnp.sum(
        render_spherical_fast(v, 16, 32, rho_res=32, )))(vox)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_bf16_compute_dtype_close_to_f32():
    """bf16 MXU contractions (the TPU fast path) stay within ~1% of f32:
    operands are [0,1] probabilities/hat-weights, accumulation is f32."""
    rng = np.random.default_rng(2)
    vox = jnp.asarray(rng.random((1, 32, 32, 32)), jnp.float32)
    R, Z = 32, 64
    f32 = np.asarray(render_spherical_fast(vox, R, Z, rho_res=64))
    bf16 = np.asarray(render_spherical_fast(
        vox, R, Z, rho_res=64, compute_dtype=jnp.bfloat16))
    assert np.abs(f32 - bf16).mean() < 5e-3
    assert np.abs(f32 - bf16).max() < 5e-2
