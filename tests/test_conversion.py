"""Torch->Flax conversion rules validated against torch ops as oracles.

torch (CPU) is available in the image for conversion/testing only; no
torchvision is required -- a structurally identical resnet18 state_dict is
synthesized and a torch functional forward serves as the oracle.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.torch_layer_conversion import (conv_w, tconv_w, linear_w,
                                          convert_torchvision_resnet18)
import flax.linen as fnn


def test_conv2d_conversion_matches_torch():
    rng = np.random.default_rng(0)
    w = torch.tensor(rng.standard_normal((8, 3, 3, 3)), dtype=torch.float32)
    x = torch.tensor(rng.standard_normal((2, 3, 16, 16)), dtype=torch.float32)
    want = torch.nn.functional.conv2d(x, w, stride=2, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()

    m = fnn.Conv(8, (3, 3), strides=2, padding=1, use_bias=False)
    vars_ = {"params": {"kernel": jnp.asarray(conv_w(w.numpy()))}}
    got = np.asarray(m.apply(vars_, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv3d_conversion_matches_torch():
    rng = np.random.default_rng(1)
    w = torch.tensor(rng.standard_normal((4, 2, 4, 4, 4)),
                     dtype=torch.float32)
    x = torch.tensor(rng.standard_normal((1, 2, 8, 8, 8)),
                     dtype=torch.float32)
    want = torch.nn.functional.conv3d(x, w, stride=2, padding=1)
    want = want.permute(0, 2, 3, 4, 1).numpy()
    m = fnn.Conv(4, (4, 4, 4), strides=2, padding=1, use_bias=False)
    vars_ = {"params": {"kernel": jnp.asarray(conv_w(w.numpy()))}}
    got = np.asarray(m.apply(vars_, jnp.asarray(
        x.permute(0, 2, 3, 4, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_conversion_matches_torch():
    rng = np.random.default_rng(2)
    w = torch.tensor(rng.standard_normal((6, 4, 4, 4)), dtype=torch.float32)
    x = torch.tensor(rng.standard_normal((2, 6, 8, 8)), dtype=torch.float32)
    want = torch.nn.functional.conv_transpose2d(x, w, stride=2, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()

    pad = ((4 - 1 - 1, 4 - 1 - 1),) * 2          # (k-1-p, k-1-p+op)
    m = fnn.ConvTranspose(4, (4, 4), strides=(2, 2), padding=pad,
                          use_bias=False)
    vars_ = {"params": {"kernel": jnp.asarray(tconv_w(w.numpy()))}}
    got = np.asarray(m.apply(vars_, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_and_batchnorm_conversion():
    rng = np.random.default_rng(3)
    w = torch.tensor(rng.standard_normal((5, 7)), dtype=torch.float32)
    b = torch.tensor(rng.standard_normal(5), dtype=torch.float32)
    x = torch.tensor(rng.standard_normal((3, 7)), dtype=torch.float32)
    want = torch.nn.functional.linear(x, w, b).numpy()
    m = fnn.Dense(5)
    vars_ = {"params": {"kernel": jnp.asarray(linear_w(w.numpy())),
                        "bias": jnp.asarray(b.numpy())}}
    got = np.asarray(m.apply(vars_, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # BatchNorm eval-mode semantics
    c = 6
    bn_t = torch.nn.BatchNorm2d(c)
    bn_t.weight.data = torch.tensor(rng.standard_normal(c),
                                    dtype=torch.float32)
    bn_t.bias.data = torch.tensor(rng.standard_normal(c),
                                  dtype=torch.float32)
    bn_t.running_mean = torch.tensor(rng.standard_normal(c),
                                     dtype=torch.float32)
    bn_t.running_var = torch.tensor(rng.random(c) + 0.5,
                                    dtype=torch.float32)
    bn_t.eval()
    x = torch.tensor(rng.standard_normal((2, c, 4, 4)), dtype=torch.float32)
    want = bn_t(x).permute(0, 2, 3, 1).detach().numpy()
    m = fnn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    vars_ = {"params": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
                        "bias": jnp.asarray(bn_t.bias.detach().numpy())},
             "batch_stats": {"mean": jnp.asarray(bn_t.running_mean.numpy()),
                             "var": jnp.asarray(bn_t.running_var.numpy())}}
    got = np.asarray(m.apply(vars_, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _synth_resnet18_state_dict(rng):
    """Structurally faithful torchvision-resnet18 state_dict with random
    weights (no torchvision needed)."""
    sd = {}

    def add_bn(prefix, c):
        sd[prefix + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[prefix + ".bias"] = rng.standard_normal(c).astype(np.float32)
        sd[prefix + ".running_mean"] = rng.standard_normal(c).astype(
            np.float32)
        sd[prefix + ".running_var"] = (rng.random(c) + 0.5).astype(np.float32)

    sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
    add_bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_c = 64
    for layer, width in enumerate(widths, start=1):
        for sub in range(2):
            t = f"layer{layer}.{sub}"
            first_in = in_c if sub == 0 else width
            sd[f"{t}.conv1.weight"] = rng.standard_normal(
                (width, first_in, 3, 3)).astype(np.float32)
            add_bn(f"{t}.bn1", width)
            sd[f"{t}.conv2.weight"] = rng.standard_normal(
                (width, width, 3, 3)).astype(np.float32)
            add_bn(f"{t}.bn2", width)
            if sub == 0 and (layer > 1):
                sd[f"{t}.downsample.0.weight"] = rng.standard_normal(
                    (width, in_c, 1, 1)).astype(np.float32)
                add_bn(f"{t}.downsample.1", width)
        in_c = width
    return sd


def test_resnet18_state_dict_maps_onto_flax_tree():
    from genre_shapehd_tpu.nn import ResNet18Features

    rng = np.random.default_rng(4)
    sd = _synth_resnet18_state_dict(rng)
    params, stats = convert_torchvision_resnet18(sd)

    model = ResNet18Features()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     train=False)

    # converted tree must structurally match the initialized tree
    ref_paths = {jax.tree_util.keystr(k): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got_paths = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths

    # and must run
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 64, 64, 3)), train=False)
    assert out[-1].shape == (1, 2, 2, 512)
    assert np.isfinite(np.asarray(out[-1])).all()
