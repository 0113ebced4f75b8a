"""Tests for sph grid / padding ops against straightforward numpy oracles."""

import numpy as np
import jax.numpy as jnp

from genre_shapehd_tpu.ops import gen_sph_grid, sph_pad, sph_pad_numpy


def _gen_sph_grid_loop(res):
    """Direct transcription of the reference double loop (oracle)."""
    pi = np.pi
    phi = np.linspace(0, 180, res * 2 + 1)[1::2]
    theta = np.linspace(0, 360, res + 1)[:-1]
    grid = np.zeros([res, res, 3])
    for idp, p in enumerate(phi):
        for idt, t in enumerate(theta):
            grid[idp, idt, 2] = np.cos(p * pi / 180)
            proj = np.sin(p * pi / 180)
            grid[idp, idt, 0] = proj * np.cos(t * pi / 180)
            grid[idp, idt, 1] = proj * np.sin(t * pi / 180)
    return grid


def test_gen_sph_grid_matches_loop_oracle():
    for res in (8, 32):
        got = gen_sph_grid(res)
        want = _gen_sph_grid_loop(res)
        np.testing.assert_allclose(got, want, atol=1e-6)
        # unit directions
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_sph_pad_wrap_and_replicate():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    m = 2
    out = np.asarray(sph_pad(jnp.asarray(x), m))
    assert out.shape == (2, 12, 12, 1)
    # interior preserved
    np.testing.assert_allclose(out[:, m:-m, m:-m], x)
    # rows replicated at poles
    np.testing.assert_allclose(out[:, 0, m:-m], x[:, 0, :])
    np.testing.assert_allclose(out[:, -1, m:-m], x[:, -1, :])
    # columns wrapped: left margin = last m cols, right = first m cols
    np.testing.assert_allclose(out[:, m:-m, :m], x[:, :, -m:])
    np.testing.assert_allclose(out[:, m:-m, -m:], x[:, :, :m])
    # corners: wrapped columns carry replicated rows
    np.testing.assert_allclose(out[:, 0, 0], x[:, 0, -m])


def test_sph_pad_numpy_matches_jax_version():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16)).astype(np.float32)
    m = 4
    via_np = sph_pad_numpy(x, m)                       # (1, H+2m, W+2m)
    via_jax = np.asarray(sph_pad(jnp.asarray(x[..., None]), m))[..., 0]
    # reference applies wrap-then-edge (np) vs edge-then-wrap (torch);
    # they agree everywhere except corner source ordering -- check both
    np.testing.assert_allclose(via_np[:, m:-m], via_jax[:, m:-m])
    np.testing.assert_allclose(via_np[:, :, m:-m], via_jax[:, :, m:-m])
    np.testing.assert_allclose(via_np, via_jax)
