"""Torch-layout -> Flax-layout weight conversion rules + resnet18 mapping.

The conversion primitives (used by tools/convert_reference_checkpoint.py):
  conv:   torch (O, I, k...)        -> flax kernel (k..., I, O)
  tconv:  torch (I, O, k...)        -> flip spatial taps -> (k..., I, O)
          (lax.conv_transpose correlates where torch's transposed conv
           convolves, so taps flip; validated in tests/test_conversion.py)
  linear: torch (O, I)              -> flax kernel (I, O)
  bn:     weight/bias               -> params scale/bias
          running_mean/running_var  -> batch_stats mean/var

`convert_torchvision_resnet18` maps a torchvision-style resnet18
state_dict onto nn/resnet.py::ResNet18Features param/batch_stats trees,
enabling ImageNet-pretrained encoders when a torch checkpoint is supplied
(the reference relies on pretrained=True, networks/uresnet.py:16).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def conv_w(w) -> np.ndarray:
    w = np.asarray(w)
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))


def tconv_w(w) -> np.ndarray:
    w = np.asarray(w)
    spatial = tuple(range(2, w.ndim))
    return np.transpose(np.flip(w, axis=spatial), spatial + (0, 1))


def linear_w(w) -> np.ndarray:
    return np.asarray(w).T


def bn_entries(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[prefix + ".weight"]),
              "bias": np.asarray(sd[prefix + ".bias"])}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"]),
             "var": np.asarray(sd[prefix + ".running_var"])}
    return params, stats


def convert_torchvision_resnet18(sd: Dict) -> Tuple[Dict, Dict]:
    """torchvision resnet18 state_dict -> (params, batch_stats) for
    nn.ResNet18Features.

    Flax module naming (from ResNet18Features' @nn.compact order):
      stem:    Conv_0, BatchNorm_0
      blocks:  BasicBlock_{0..7}, inside each:
                 ConvBN_0/{Conv_0, BatchNorm_0}  (3x3 stride s)
                 Conv_0, BatchNorm_0             (3x3 stride 1)
                 Conv_1, BatchNorm_1             (1x1 projection, if any)
    torchvision naming: conv1, bn1, layer{1..4}.{0,1}.conv{1,2}/bn{1,2}
    (+ .downsample.0/.1 on the first block of layers 2-4).
    """
    params: Dict = {}
    stats: Dict = {}

    params["Conv_0"] = {"kernel": conv_w(sd["conv1.weight"])}
    p, s = bn_entries(sd, "bn1")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    block_idx = 0
    for layer in range(1, 5):
        for sub in range(2):
            t = f"layer{layer}.{sub}"
            name = f"BasicBlock_{block_idx}"
            bp: Dict = {}
            bs: Dict = {}
            # first 3x3 conv+bn lives in the nested ConvBN module
            p1, s1 = bn_entries(sd, f"{t}.bn1")
            bp["ConvBN_0"] = {
                "Conv_0": {"kernel": conv_w(sd[f"{t}.conv1.weight"])},
                "BatchNorm_0": p1,
            }
            bs["ConvBN_0"] = {"BatchNorm_0": s1}
            # second 3x3 conv+bn
            bp["Conv_0"] = {"kernel": conv_w(sd[f"{t}.conv2.weight"])}
            p2, s2 = bn_entries(sd, f"{t}.bn2")
            bp["BatchNorm_0"] = p2
            bs["BatchNorm_0"] = s2
            # projection shortcut
            if f"{t}.downsample.0.weight" in sd:
                bp["Conv_1"] = {
                    "kernel": conv_w(sd[f"{t}.downsample.0.weight"])}
                p3, s3 = bn_entries(sd, f"{t}.downsample.1")
                bp["BatchNorm_1"] = p3
                bs["BatchNorm_1"] = s3
            params[name] = bp
            stats[name] = bs
            block_idx += 1
    return params, stats
