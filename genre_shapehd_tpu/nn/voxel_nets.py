"""3D voxel networks (Flax, NDHWC): decoder, generator, discriminator.

Counterparts of /root/reference/networks/networks.py:
  VoxelDecoder        (:25-61)  latent 200 -> 128^3 logits, nf 512 halving
  VoxelGenerator      (:64-104) z 200 -> 128^3 sigmoid, nf 64
  VoxelDiscriminator  (:107-144) 128^3 -> scalar critic, leaky 0.2
All are resolution-parametric (number of 2x stages = log2(res/4)) so tiny
configurations stage on a virtual CPU mesh; defaults match the reference's
128^3 exactly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from .init import kaiming_normal, bn_scale_init


def _tp(k: int, p: int, op: int = 0):
    pad = (k - 1 - p, k - 1 - p + op)
    return (pad, pad, pad)


class Deconv3D(nn.Module):
    """ConvTranspose3d(k, s, p) equivalent (see revresnet.tconv_padding)."""
    features: int
    kernel: int = 4
    stride: int = 1
    torch_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (self.kernel,) * 3, strides=(self.stride,) * 3,
            padding=_tp(self.kernel, self.torch_padding),
            use_bias=self.use_bias, kernel_init=kaiming_normal,
            dtype=self.dtype)(x)


class Conv3D(nn.Module):
    features: int
    kernel: int = 4
    stride: int = 2
    torch_padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel,) * 3, strides=(self.stride,) * 3,
            padding=self.torch_padding, use_bias=self.use_bias,
            kernel_init=kaiming_normal, dtype=self.dtype)(x)


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, scale_init=bn_scale_init(), dtype=dtype)


class VoxelDecoder(nn.Module):
    """latent (N, n_dims) -> (N, res, res, res) logits.

    networks.py:25-61: deconv(k4,VALID) to 4^3 at nf, then 2x deconvs
    halving channels each stage; final 2x deconv to 1 channel, no bn/act.
    """
    n_dims: int = 200
    nf: int = 512
    res: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool):
        stages = int(math.log2(self.res // 4))
        x = z.reshape(z.shape[0], 1, 1, 1, self.n_dims)
        x = Deconv3D(self.nf, 4, 1, 0, dtype=self.dtype)(x)       # -> 4^3
        x = nn.relu(_bn(train, self.dtype)(x))
        width = self.nf
        for _ in range(stages - 1):
            width //= 2
            x = Deconv3D(width, 4, 2, 1, dtype=self.dtype)(x)
            x = nn.relu(_bn(train, self.dtype)(x))
        x = Deconv3D(1, 4, 2, 1, dtype=self.dtype)(x)
        return x[..., 0]                                           # (N,X,Y,Z)


class VoxelGenerator(nn.Module):
    """noise (N, nz) -> (N, res, res, res) in (0,1).

    networks.py:64-104: nz -> nf*8 @4^3 -> ... -> nf @32^3, then for
    res=128 two extra stages (nf@64^3, 1@128^3), sigmoid.
    """
    nz: int = 200
    nf: int = 64
    res: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool):
        x = z.reshape(z.shape[0], 1, 1, 1, self.nz)
        x = Deconv3D(self.nf * 8, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(_bn(train, self.dtype)(x))
        widths = {128: (self.nf * 4, self.nf * 2, self.nf, self.nf),
                  64: (self.nf * 4, self.nf * 2, self.nf),
                  32: (self.nf * 2, self.nf)}[self.res]
        for w in widths:
            x = Deconv3D(w, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
            x = nn.relu(_bn(train, self.dtype)(x))
        x = Deconv3D(1, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
        return nn.sigmoid(x[..., 0])


class VoxelDiscriminator(nn.Module):
    """(N, res, res, res) -> (N,) Wasserstein critic scores.

    networks.py:107-144: k4 s2 p1 conv stack with LeakyReLU(0.2), no norm
    (WGAN-GP), final k4 VALID conv from 4^3 to a scalar.  res=128 inserts
    an extra nf->nf stage after the first conv (:132-137).
    """
    nf: int = 64
    res: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v, train: bool = False):
        x = v[..., None]
        widths = {128: (self.nf, self.nf, self.nf * 2, self.nf * 4, self.nf * 8),
                  64: (self.nf, self.nf * 2, self.nf * 4, self.nf * 8),
                  32: (self.nf, self.nf * 2, self.nf * 4)}[self.res]
        for w in widths:
            x = Conv3D(w, 4, 2, 1, use_bias=False, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = Conv3D(1, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)  # 4^3 -> 1
        return x.reshape(v.shape[0])
