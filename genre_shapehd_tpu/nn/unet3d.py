"""3D U-Net voxel refinement network (Flax, NDHWC).

Counterpart of Unet_3D (/root/reference/networks/networks.py:147-190): a
6-level 3D encoder/decoder with skip concatenation, a linear bottleneck
block, LeakyReLU(0.01) + BatchNorm conv blocks.  Resolution-parametric:
``res`` picks the number of middle k4-s2 levels (default 128 -> exact
reference topology: 128 -> 64 -> 32 -> 16 -> 8 -> 4 -> 1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from .init import kaiming_normal
from .voxel_nets import Conv3D, Deconv3D, _bn


class UNet3D(nn.Module):
    nf: int = 20
    res: int = 128
    no_linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        """x: (N, X, Y, Z, C_in) -> (N, X, Y, Z) logits."""
        nf = self.nf
        n_mid = int(math.log2(self.res)) - 3        # 128 -> 4 middle levels

        encs = []
        # enc1: k8 s2 p3 (networks.py:151)
        h = Conv3D(nf, 8, 2, 3, dtype=self.dtype)(x)
        h = nn.leaky_relu(_bn(train, self.dtype)(h), 0.01)
        encs.append(h)
        width = nf
        for _ in range(n_mid):                      # k4 s2 p1 levels
            width *= 2
            h = Conv3D(width, 4, 2, 1, dtype=self.dtype)(h)
            h = nn.leaky_relu(_bn(train, self.dtype)(h), 0.01)
            encs.append(h)
        # final level: k4 s1 VALID, 4^3 -> 1^3 (networks.py:156)
        width *= 2
        h = Conv3D(width, 4, 1, 0, dtype=self.dtype)(h)
        h = nn.leaky_relu(_bn(train, self.dtype)(h), 0.01)
        encs.append(h)

        if not self.no_linear:
            flat = h.reshape(h.shape[0], width)
            flat = nn.leaky_relu(
                nn.Dense(width, kernel_init=kaiming_normal,
                         dtype=self.dtype)(flat), 0.01)
            bottleneck = flat.reshape(h.shape[0], 1, 1, 1, width)
        else:
            bottleneck = h

        # dec1: cat bottleneck with enc_last, k4 s1 VALID-transpose -> 4^3
        h = jnp.concatenate([bottleneck, encs[-1]], axis=-1)
        width //= 2
        h = Deconv3D(width, 4, 1, 0, dtype=self.dtype)(h)
        h = nn.leaky_relu(_bn(train, self.dtype)(h), 0.01)
        # middle deconvs k4 s2 p1 with skips
        for i in range(n_mid - 1):
            h = jnp.concatenate([h, encs[-(i + 2)]], axis=-1)
            width //= 2
            h = Deconv3D(width, 4, 2, 1, dtype=self.dtype)(h)
            h = nn.leaky_relu(_bn(train, self.dtype)(h), 0.01)
        # dec5: k8 s2 p3 (networks.py:165)
        h = jnp.concatenate([h, encs[1]], axis=-1)
        h = Deconv3D(nf, 8, 2, 3, dtype=self.dtype)(h)
        h = nn.leaky_relu(_bn(train, self.dtype)(h), 0.01)
        # dec6: k4 s2 p1, no bn/activation (networks.py:166-167)
        h = jnp.concatenate([h, encs[0]], axis=-1)
        h = Deconv3D(1, 4, 2, 1, dtype=self.dtype)(h)
        return h[..., 0]
