"""U-ResNet: resnet18 encoder + reverse-resnet18 decoders with skips.

TPU-native counterpart of /root/reference/networks/uresnet.py (Net and
Net_inpaint) plus the depth-minmax head of models/marrnet1.py:137-161.
Multiple named decoder heads share one encoder; after each decoder stage
the matching encoder feature map is concatenated (uresnet.py:64-74).

The decoder stage widths/strides reproduce ``revuresnet18``
(revresnet.py:189-200): planes (256, 128, 64, 64), strides (2, 2, 2, 1),
each stage consuming the concat of the previous output and the skip.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .init import kaiming_normal, bn_scale_init
from .resnet import ResNet18Features
from .revresnet import RevLayer, Deconv


class URDecoder(nn.Module):
    """One revuresnet18 decoder head consuming the encoder pyramid."""
    out_planes: int
    final_kernel: int = 7           # Net: deconv2 k7 s2 p3 op1
    final_torch_padding: int = 3
    final_output_padding: int = 1
    #: channel multiplier on the decoder stages (capacity ablation knob;
    #: 1.0 = reference revuresnet18 widths)
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool):
        planes = tuple(int(round(p * self.width))
                       for p in (256, 128, 64, 64))
        strides = (2, 2, 2, 1)
        x = feats[-1]
        for i, (width, s) in enumerate(zip(planes, strides)):
            x = RevLayer(width, 2, s, dtype=self.dtype)(x, train)
            skip = feats[-(i + 2)]
            assert skip.shape[1:3] == x.shape[1:3], (skip.shape, x.shape)
            x = jnp.concatenate([x, skip], axis=-1)
        x = Deconv(int(round(64 * self.width)), 3, 2, 1, 1, use_bias=True,
                   dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init(),
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        return Deconv(self.out_planes, self.final_kernel, 2,
                      self.final_torch_padding, self.final_output_padding,
                      dtype=self.dtype)(x)


class MinmaxHead(nn.Module):
    """Scalar depth min/max head off the encoder bottleneck.

    marrnet1.py:141-154: Conv(512,512,2,s2) -> Conv(512,512,4) -> flatten
    -> 512-256-128-2 MLP with BatchNorm1d+ReLU between layers.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(y):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, scale_init=bn_scale_init(),
                                dtype=self.dtype)(y)

        x = nn.Conv(512, (2, 2), strides=2, padding=0, use_bias=True,
                    kernel_init=kaiming_normal, dtype=self.dtype)(x)
        # second conv collapses the remaining spatial extent (4x4 at the
        # reference's 256^2 input); sized from the bottleneck so reduced
        # resolutions stage too
        k = x.shape[1]
        x = nn.Conv(512, (k, k), strides=1, padding=0, use_bias=True,
                    kernel_init=kaiming_normal, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(bn(nn.Dense(256, kernel_init=kaiming_normal,
                                dtype=self.dtype)(x)))
        x = nn.relu(bn(nn.Dense(128, kernel_init=kaiming_normal,
                                dtype=self.dtype)(x)))
        return nn.Dense(2, kernel_init=kaiming_normal, dtype=self.dtype)(x)


class UResNet(nn.Module):
    """RGB (or any image) -> named 2.5D / spherical maps.

    Args mirror uresnet.Net(out_planes, layer_names, input_planes) plus the
    marrnet1 ``pred_depth_minmax`` head and the Net_inpaint final-deconv
    variant (k8 s2 p3, uresnet.py:104).
    """
    out_planes: Sequence[int] = (3, 1, 1)
    layer_names: Sequence[str] = ("normal", "depth", "silhou")
    pred_depth_minmax: bool = False
    inpainting: bool = False
    #: decoder capacity multiplier (ablation knob; 1.0 = reference widths)
    decoder_width: float = 1.0
    #: run the decoders/heads at a different dtype than the encoder (e.g.
    #: f32 heads over a bf16 encoder, --f32_heads); None = same dtype
    head_dtype: jnp.dtype = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, im, train: bool) -> Dict[str, jnp.ndarray]:
        feats = ResNet18Features(dtype=self.dtype)(im, train)
        hd = self.head_dtype if self.head_dtype is not None else self.dtype
        if hd != self.dtype:
            feats = tuple(f.astype(hd) for f in feats)
        out: Dict[str, jnp.ndarray] = {}
        for planes, name in zip(self.out_planes, self.layer_names):
            if self.inpainting:
                head = URDecoder(planes, final_kernel=8,
                                 final_torch_padding=3, final_output_padding=0,
                                 width=self.decoder_width,
                                 dtype=hd, name=f"decoder_{name}")
            else:
                head = URDecoder(planes, width=self.decoder_width,
                                 dtype=hd, name=f"decoder_{name}")
            out[name] = head(feats, train)
        if self.pred_depth_minmax:
            out["depth_minmax"] = MinmaxHead(dtype=hd)(feats[-1], train)
        return out
