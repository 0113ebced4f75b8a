"""ResNet-18 feature backbone (Flax, NHWC).

TPU-native counterpart of the torchvision resnet18 used as the encoder of
every 2D network in the reference (networks/uresnet.py:16, networks.py:13).
Returns the full feature pyramid so U-Net style decoders can consume skip
connections.  No ImageNet pretraining is bundled (torchvision is absent on
the TPU path); `tools/convert_torch_resnet18.py` can import torch weights
when a checkpoint file is supplied.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .init import kaiming_normal, bn_scale_init


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.kernel // 2,
                    use_bias=False, kernel_init=kaiming_normal,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init(),
                         dtype=self.dtype)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3(s) -> 3x3(1) + projection shortcut."""
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(x, train)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_normal, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init(),
                         dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=kaiming_normal,
                               dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    scale_init=bn_scale_init(),
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNet18Features(nn.Module):
    """Stem + 4 stages; returns the 5-entry pyramid the U-decoders consume.

    For a (N, 256, 256, C) input the pyramid is
      [ (N,64,64,64), (N,64,64,64), (N,32,32,128), (N,16,16,256), (N,8,8,512) ]
    mirroring the encoder ModuleList of networks/uresnet.py:19-31.
    """
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    features: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=kaiming_normal, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init(),
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = [x]
        for stage, (blocks, width) in enumerate(
                zip(self.stage_sizes, self.features)):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(width, stride, dtype=self.dtype)(x, train)
            feats.append(x)
        return tuple(feats)


class ResNet18Encoder(nn.Module):
    """resnet18 -> global average pool -> fc(encode_dims).

    Counterpart of networks/networks.py:6-22 (ImageEncoder): custom input
    channel count, AdaptiveAvgPool2d(1), Linear(512, encode_dims).
    """
    encode_dims: int = 200
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> jnp.ndarray:
        feats = ResNet18Features(dtype=self.dtype)(x, train)
        x = jnp.mean(feats[-1], axis=(1, 2))
        return nn.Dense(self.encode_dims, kernel_init=kaiming_normal,
                        dtype=self.dtype)(x)
