"""Exactness: subpixel transposed-conv decomposition vs flax ConvTranspose.

SubpixelTConv3D re-expresses ConvTranspose3d(k, s=2, p=k/2-1) as a
stride-1 conv over (k/2)^3 phase taps + interleave (8x fewer FLOPs on
TPU, MXU-wide GEMM).  Same parameters must give the same outputs as
ConvTranspose with the torch-equivalent padding, for both geometries the
model family uses (k=4 and k=8), with and without bias.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genre_shapehd_tpu.nn.voxel_nets import (Deconv3D, SubpixelTConv3D, _tp)
import flax.linen as fnn


@pytest.mark.parametrize("k,cin,cout,d", [(4, 3, 5, 6), (8, 2, 4, 5)])
@pytest.mark.parametrize("use_bias", [True, False])
def test_subpixel_matches_conv_transpose(k, cin, cout, d, use_bias):
    rng = np.random.default_rng(k + use_bias)
    x = jnp.asarray(rng.standard_normal((2, d, d, d, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)),
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)

    ref = fnn.ConvTranspose(cout, (k,) * 3, strides=(2,) * 3,
                            padding=_tp(k, k // 2 - 1), use_bias=use_bias)
    ref_params = {"kernel": kernel}
    sub_params = {"kernel": kernel}
    if use_bias:
        ref_params["bias"] = bias
        sub_params["bias"] = bias
    want = ref.apply({"params": ref_params}, x)

    sub = SubpixelTConv3D(cout, k, use_bias=use_bias)
    got = sub.apply({"params": sub_params}, x)

    assert got.shape == want.shape == (2, 2 * d, 2 * d, 2 * d, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_deconv3d_routes_and_param_tree_is_stable():
    """Deconv3D's param tree must keep the ConvTranspose_0/{kernel,bias}
    paths (checkpoint + conversion-table compatibility)."""
    m = Deconv3D(4, 4, 2, 1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4, 2)))
    assert set(v["params"]) == {"ConvTranspose_0"}
    assert set(v["params"]["ConvTranspose_0"]) == {"kernel", "bias"}
    assert v["params"]["ConvTranspose_0"]["kernel"].shape == (4, 4, 4, 2, 4)

    # gradient flows
    def loss(p):
        return jnp.sum(m.apply(p, jnp.ones((1, 4, 4, 4, 2))) ** 2)
    g = jax.grad(loss)(v)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_subpixel_large_width_3d_path_matches():
    """cout >= 16 keeps the native 3D conv path; still exact."""
    rng = np.random.default_rng(7)
    k, cin, cout, d = 4, 3, 16, 6
    x = jnp.asarray(rng.standard_normal((1, d, d, d, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)),
                         jnp.float32)
    ref = fnn.ConvTranspose(cout, (k,) * 3, strides=(2,) * 3,
                            padding=_tp(k, k // 2 - 1), use_bias=False)
    want = ref.apply({"params": {"kernel": kernel}}, x)
    got = SubpixelTConv3D(cout, k, use_bias=False).apply(
        {"params": {"kernel": kernel}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [4, 8])
def test_depth_phase_conv_matches_nn_conv(k):
    """Conv3D's >=64^3 stride-2 route (per-phase 2D decomposition) must
    match nn.Conv exactly, and keep the Conv_0/{kernel,bias} tree."""
    from genre_shapehd_tpu.nn.voxel_nets import Conv3D

    rng = np.random.default_rng(k)
    cin, cout, d = 2, 4, 64
    p = k // 2 - 1
    x = jnp.asarray(rng.standard_normal((1, d, d, d, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)),
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)

    ref = fnn.Conv(cout, (k,) * 3, strides=(2,) * 3, padding=p)
    want = ref.apply({"params": {"kernel": kernel, "bias": bias}}, x)

    m = Conv3D(cout, k, 2, p)
    v = m.init(jax.random.PRNGKey(0), x)
    assert set(v["params"]) == {"Conv_0"}
    assert v["params"]["Conv_0"]["kernel"].shape == (k, k, k, cin, cout)
    got = m.apply({"params": {"Conv_0": {"kernel": kernel, "bias": bias}}},
                  x)
    assert got.shape == want.shape == (1, d // 2, d // 2, d // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("impl", ["stacked2d", "native3d", "gemm1x1",
                                  "scan2d"])
@pytest.mark.parametrize("k,cin,cout,d", [(4, 3, 1, 6), (4, 5, 3, 4)])
def test_subpixel_impls_match(impl, k, cin, cout, d):
    """Every SubpixelTConv3D realization is exact (same params, same
    outputs as flax ConvTranspose)."""
    rng = np.random.default_rng(hash(impl) % 1000 + k)
    x = jnp.asarray(rng.standard_normal((2, d, d, d, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)),
                         jnp.float32)
    ref = fnn.ConvTranspose(cout, (k,) * 3, strides=(2,) * 3,
                            padding=_tp(k, k // 2 - 1), use_bias=False)
    want = ref.apply({"params": {"kernel": kernel}}, x)
    sub = SubpixelTConv3D(cout, k, use_bias=False, impl=impl)
    got = sub.apply({"params": {"kernel": kernel}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["phase2d", "tapstack2d"])
@pytest.mark.parametrize("k", [4, 8])
def test_stride2_impls_match(impl, k):
    """Both stride-2 depth decompositions are exact vs nn.Conv."""
    from genre_shapehd_tpu.nn.voxel_nets import DepthPhaseConv3D
    rng = np.random.default_rng(k)
    cin, cout, d, p = 3, 5, 2 * k, k // 2 - 1
    x = jnp.asarray(rng.standard_normal((2, d, d, d, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, k, k, cin, cout)),
                         jnp.float32)
    ref = fnn.Conv(cout, (k,) * 3, strides=(2,) * 3, padding=p,
                   use_bias=False)
    want = ref.apply({"params": {"kernel": kernel}}, x)
    m = DepthPhaseConv3D(cout, k, p, use_bias=False, impl=impl)
    got = m.apply({"params": {"kernel": kernel}}, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
