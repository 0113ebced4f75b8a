"""Reverse (transposed-conv) ResNet-18 decoder blocks (Flax, NHWC).

Counterpart of /root/reference/networks/revresnet.py: mirrored ResNet
blocks built from ConvTranspose, with the stride on the FIRST layer's
mirror position (reference puts it on the second deconv of the block,
revresnet.py:27-32).  Deconv geometry matches torch's
``(i-1)*s - 2p + k + op`` via explicit (k-1-p, k-1-p+op) padding.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .init import kaiming_normal, bn_scale_init


def tconv_padding(k: int, p: int, op: int = 0):
    """lax.conv_transpose padding equivalent to torch (k, p, output_padding)."""
    return ((k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op))


class Deconv(nn.Module):
    """ConvTranspose2d(k, stride, padding, output_padding) equivalent."""
    features: int
    kernel: int
    stride: int = 1
    torch_padding: int = 0
    output_padding: int = 0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=tconv_padding(self.kernel, self.torch_padding,
                                  self.output_padding),
            use_bias=self.use_bias, kernel_init=kaiming_normal,
            dtype=self.dtype)(x)


class RevBasicBlock(nn.Module):
    """deconv3x3(s1) -> bn -> relu -> deconv3x3(stride) -> bn, + upsample(x).

    Mirrors revresnet.py:21-48 including the 1x1 deconv + bn projection
    shortcut when stride != 1 or channel width changes.
    """
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, scale_init=bn_scale_init(),
                                dtype=self.dtype)(y)

        residual = x
        y = Deconv(self.features, 3, 1, 1, dtype=self.dtype)(x)
        y = nn.relu(bn(y))
        y = Deconv(self.features, 3, self.stride, 1,
                   output_padding=1 if self.stride > 1 else 0,
                   dtype=self.dtype)(y)
        y = bn(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = Deconv(self.features, 1, self.stride, 0,
                              output_padding=1 if self.stride > 1 else 0,
                              dtype=self.dtype)(x)
            residual = bn(residual)
        return nn.relu(y + residual)


class RevLayer(nn.Module):
    """A stage of RevBasicBlocks (first block strided), revresnet.py:146-165."""
    features: int
    blocks: int = 2
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = RevBasicBlock(self.features, self.stride, dtype=self.dtype)(x, train)
        for _ in range(1, self.blocks):
            x = RevBasicBlock(self.features, 1, dtype=self.dtype)(x, train)
        return x


class RevResNet18(nn.Module):
    """Full standalone reverse resnet-18 (revresnet.py:179-186):
    latent (N,8,8,512) -> (N,256,256,out_planes)."""
    out_planes: int = 5
    planes: Sequence[int] = (512, 256, 128, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        strides = (2, 2, 2, 1)
        for width, s in zip(self.planes, strides):
            x = RevLayer(width, 2, s, dtype=self.dtype)(x, train)
        x = Deconv(self.planes[3], 3, 2, 1, 1, use_bias=True,
                   dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init(),
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        return Deconv(self.out_planes, 7, 2, 3, 1, dtype=self.dtype)(x)
