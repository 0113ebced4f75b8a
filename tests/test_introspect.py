"""Gradient introspection utilities (train/introspect.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from genre_shapehd_tpu.train.introspect import (CircularGradBuffer,
                                                grad_stats,
                                                per_module_grad_norms)


def test_grad_stats_values():
    grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([[0.0]])}
    s = grad_stats(grads)
    np.testing.assert_allclose(float(s["grad_norm"]), 5.0)
    np.testing.assert_allclose(float(s["grad_mean"]), 7.0 / 3)
    np.testing.assert_allclose(float(s["grad_rms"]), np.sqrt(25.0 / 3))


def test_per_module_grad_norms():
    grads = {"net1": {"w": jnp.asarray([3.0, 4.0])},
             "net2": {"w": jnp.asarray([6.0, 8.0])}}
    out = per_module_grad_norms(grads)
    np.testing.assert_allclose(float(out["grad/net1"]), 5.0)
    np.testing.assert_allclose(float(out["grad/net2"]), 10.0)


def test_circular_buffer_rolls():
    buf = CircularGradBuffer(maxlen=3)
    for i in range(5):
        buf.record(i, {"grad_norm": float(i)})
    assert len(buf.buffer) == 3
    assert buf.latest()[0] == 4
    np.testing.assert_allclose(buf.summary()["grad_norm"], (2 + 3 + 4) / 3)


def test_grad_stats_composes_with_train_grad():
    def loss(p, x):
        return jnp.sum((p["w"] * x) ** 2)

    params = {"w": jnp.asarray([1.0, 2.0])}
    g = jax.grad(loss)(params, jnp.asarray([1.0, 1.0]))
    s = jax.jit(grad_stats)(g)
    assert float(s["grad_norm"]) > 0
