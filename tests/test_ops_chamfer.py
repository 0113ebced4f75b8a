"""Chamfer / nndistance tests against a brute-force oracle.

Mirrors the reference's own validation approach: CPU brute force vs the
fast kernel (toolbox/nndistance/test.py:1-48, my_lib.c:6-28).
"""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.ops import nndistance, nndistance_w_idx, nndistance_score


def _brute(x1, x2):
    d = ((x1[:, :, None, :] - x2[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.min(1), d.argmin(2), d.argmin(1)


def test_nndistance_matches_bruteforce():
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((2, 50, 3)).astype(np.float32)
    x2 = rng.standard_normal((2, 70, 3)).astype(np.float32)
    d1, d2, i1, i2 = nndistance_w_idx(jnp.asarray(x1), jnp.asarray(x2))
    wd1, wd2, wi1, wi2 = _brute(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), wd1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), wi1)
    np.testing.assert_array_equal(np.asarray(i2), wi2)


def test_nndistance_blocked_path_matches_unblocked():
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal((1, 40, 3)).astype(np.float32)
    x2 = rng.standard_normal((1, 100, 3)).astype(np.float32)
    d1a, d2a, i1a, i2a = nndistance_w_idx(jnp.asarray(x1), jnp.asarray(x2))
    d1b, d2b, i1b, i2b = nndistance_w_idx(jnp.asarray(x1), jnp.asarray(x2),
                                          block=32)
    np.testing.assert_allclose(np.asarray(d1a), np.asarray(d1b), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1a), np.asarray(i1b))
    np.testing.assert_array_equal(np.asarray(i2a), np.asarray(i2b))


def test_nndistance_zero_for_identical_clouds():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 30, 3)),
                    dtype=jnp.float32)
    d1, d2 = nndistance(x, x)
    np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
    score = np.asarray(nndistance_score(x, x))
    np.testing.assert_allclose(score, 0.0, atol=1e-2)


def test_nndistance_grad_matches_reference_formula():
    """CUDA backward scatters 2*(x1 - x2_nn)*g (nnd_cuda.cu:143-163)."""
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.standard_normal((1, 10, 3)), dtype=jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 12, 3)), dtype=jnp.float32)

    g = jax.grad(lambda a: jnp.sum(nndistance(a, x2)[0]))(x1)
    _, _, i1, _ = nndistance_w_idx(x1, x2)
    nn = np.asarray(x2)[0, np.asarray(i1)[0]]
    want = 2.0 * (np.asarray(x1)[0] - nn)
    np.testing.assert_allclose(np.asarray(g)[0], want, rtol=1e-4, atol=1e-5)
