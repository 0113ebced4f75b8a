"""Pallas chamfer kernel vs the XLA reference implementation.

On CPU the kernel runs in interpreter mode; the same code path compiles
via Mosaic on TPU (exercised by tools/tpu_smoke_ops.py / bench flows).
"""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.ops import nndistance
from genre_shapehd_tpu.ops.pallas import (nndistance_pallas,
                                          nndistance_score_pallas)


def test_pallas_matches_xla_reference():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((2, 700, 3)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((2, 1200, 3)), jnp.float32)
    d1p, d2p = nndistance_pallas(x1, x2)
    d1x, d2x = nndistance(x1, x2)
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_handles_non_block_multiple_sizes():
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.standard_normal((1, 513, 3)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 511, 3)), jnp.float32)
    d1p, d2p = nndistance_pallas(x1, x2)
    d1x, d2x = nndistance(x1, x2)
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2x),
                               rtol=1e-4, atol=1e-5)


def test_pallas_custom_vjp_matches_autodiff_of_reference():
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((1, 40, 3)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1, 60, 3)), jnp.float32)

    def loss_pallas(a, b):
        d1, d2 = nndistance_pallas(a, b)
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    def loss_ref(a, b):
        d1, d2 = nndistance(a, b)
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    g1p, g2p = jax.grad(loss_pallas, argnums=(0, 1))(x1, x2)
    g1r, g2r = jax.grad(loss_ref, argnums=(0, 1))(x1, x2)
    np.testing.assert_allclose(np.asarray(g1p), np.asarray(g1r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2r),
                               rtol=1e-4, atol=1e-5)


def test_pallas_score():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 256, 3)),
                    jnp.float32)
    s = nndistance_score_pallas(x, x)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-3)
