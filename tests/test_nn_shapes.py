"""Shape and parameter-count tests for the network zoo.

Shape specs come from SURVEY.md section 2 / the reference architecture:
256^2 images, 8^2x512 bottleneck, 128^3 voxels, 200-d latents.  Tests use
reduced resolutions where the full ones would be slow on CPU; topology is
resolution-parametric so the same code path is exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genre_shapehd_tpu import nn as gnn


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_resnet18_pyramid_shapes(rng):
    model = gnn.ResNet18Features()
    x = jnp.zeros((1, 64, 64, 3))          # 1/4-res stand-in for 256
    vars_ = model.init(rng, x, train=False)
    feats = model.apply(vars_, x, train=False)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 16, 16, 64), (1, 16, 16, 64), (1, 8, 8, 128),
                      (1, 4, 4, 256), (1, 2, 2, 512)]


def test_resnet18_param_count_matches_torchvision(rng):
    """torchvision resnet18 backbone (conv+bn, no fc) has 11,176,512 params."""
    model = gnn.ResNet18Features()
    vars_ = model.init(rng, jnp.zeros((1, 32, 32, 3)), train=False)
    n = sum(x.size for x in jax.tree.leaves(vars_["params"]))
    assert n == 11_176_512


def test_uresnet_multihead_shapes(rng):
    model = gnn.UResNet(out_planes=(3, 1, 1),
                        layer_names=("normal", "depth", "silhou"),
                        pred_depth_minmax=False)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(rng, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert set(out) == {"normal", "depth", "silhou"}
    assert out["normal"].shape == (2, 64, 64, 3)
    assert out["depth"].shape == (2, 64, 64, 1)
    assert out["silhou"].shape == (2, 64, 64, 1)


def test_uresnet_minmax_head_requires_256_input(rng):
    """The minmax head (Conv 2s2 -> Conv 4 VALID) is sized for an 8x8
    bottleneck, i.e. 256^2 input (marrnet1.py:141-154)."""
    model = gnn.UResNet(out_planes=(1,), layer_names=("depth",),
                        pred_depth_minmax=True)
    x = jnp.zeros((1, 256, 256, 3))
    vars_ = model.init(rng, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out["depth_minmax"].shape == (1, 2)
    assert out["depth"].shape == (1, 256, 256, 1)


def test_uresnet_inpaint_final_deconv_geometry(rng):
    """Net_inpaint's deconv2 is k8 s2 p3 op0 (uresnet.py:104): still 2x."""
    model = gnn.UResNet(out_planes=(1,), layer_names=("spherical",),
                        inpainting=True)
    x = jnp.zeros((1, 96, 96, 1))           # 160-like padded spherical map
    vars_ = model.init(rng, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out["spherical"].shape == (1, 96, 96, 1)


def test_voxel_decoder_shapes(rng):
    model = gnn.VoxelDecoder(n_dims=200, nf=64, res=32)
    z = jnp.zeros((2, 200))
    vars_ = model.init(rng, z, train=False)
    out = model.apply(vars_, z, train=False)
    assert out.shape == (2, 32, 32, 32)


def test_voxel_generator_and_discriminator_shapes(rng):
    g = gnn.VoxelGenerator(nz=32, nf=8, res=32)
    z = jnp.zeros((2, 32))
    gv = g.init(rng, z, train=False)
    vox = g.apply(gv, z, train=False)
    assert vox.shape == (2, 32, 32, 32)
    assert float(vox.min()) >= 0.0 and float(vox.max()) <= 1.0

    d = gnn.VoxelDiscriminator(nf=8, res=32)
    dv = d.init(rng, vox)
    score = d.apply(dv, vox)
    assert score.shape == (2,)


def test_unet3d_shapes(rng):
    model = gnn.UNet3D(nf=4, res=32)
    x = jnp.zeros((1, 32, 32, 32, 2))
    vars_ = model.init(rng, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 32, 32, 32)


def test_revresnet18_standalone(rng):
    model = gnn.RevResNet18(out_planes=5)
    x = jnp.zeros((1, 2, 2, 512))           # 8x8 at full res
    vars_ = model.init(rng, x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 64, 64, 5)      # 32x upsample


def test_batchnorm_state_updates_in_train_mode(rng):
    model = gnn.VoxelDiscriminator(nf=4, res=32)
    x = jax.random.normal(rng, (2, 32, 32, 32))
    vars_ = model.init(rng, x)
    # discriminator has no BN (WGAN-GP); check a BN net instead
    dec = gnn.VoxelDecoder(n_dims=8, nf=16, res=32)
    z = jax.random.normal(rng, (2, 8))
    dv = dec.init(rng, z, train=True)
    out, mutated = dec.apply(dv, z, train=True, mutable=["batch_stats"])
    ra_before = jax.tree.leaves(dv["batch_stats"])[0]
    ra_after = jax.tree.leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(ra_before), np.asarray(ra_after))
