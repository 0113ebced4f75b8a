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


# --------------------------------------------------------------------------
# Per-network mapping tables for every reference net
# (/root/reference/networks/networks.py, uresnet.py, revresnet.py and the
# marrnet1 minmax head, models/marrnet1.py:137-161).  Each converter takes a
# torch state_dict (sub-)view and returns (params, batch_stats) trees that
# drop onto the Flax twins in genre_shapehd_tpu/nn.  Validated end-to-end
# against the actual reference torch modules in tests/test_torch_parity.py.
# --------------------------------------------------------------------------


def _sub(sd: Dict, prefix: str) -> Dict:
    """View of sd restricted to keys under `prefix.`, prefix stripped."""
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _deconv_entry(sd: Dict, key: str, bias: bool = False) -> Dict:
    """torch ConvTranspose2d/3d at `key` -> Deconv/Deconv3D module tree."""
    entry = {"kernel": tconv_w(sd[key + ".weight"])}
    if bias:
        entry["bias"] = np.asarray(sd[key + ".bias"])
    return {"ConvTranspose_0": entry}


def _conv3d_entry(sd: Dict, key: str, bias: bool = True) -> Dict:
    """torch Conv3d at `key` -> Conv3D module tree."""
    entry = {"kernel": conv_w(sd[key + ".weight"])}
    if bias:
        entry["bias"] = np.asarray(sd[key + ".bias"])
    return {"Conv_0": entry}


def _linear_entry(sd: Dict, key: str) -> Dict:
    return {"kernel": linear_w(sd[key + ".weight"]),
            "bias": np.asarray(sd[key + ".bias"])}


def uresnet_encoder_to_torchvision_names(sd: Dict) -> Dict:
    """uresnet.Net encoder keys (encoder.0.0 = conv1, encoder.0.1 = bn1,
    encoder.{1..4} = layer{1..4}; uresnet.py:15-31) -> torchvision names."""
    out = {}
    for k, v in sd.items():
        if k.startswith("encoder.0.0."):
            out["conv1." + k[len("encoder.0.0."):]] = v
        elif k.startswith("encoder.0.1."):
            out["bn1." + k[len("encoder.0.1."):]] = v
        elif k.startswith("encoder."):
            rest = k[len("encoder."):]
            idx, tail = rest.split(".", 1)
            out[f"layer{idx}.{tail}"] = v
    return {k: v for k, v in out.items()
            if not k.endswith("num_batches_tracked")}


def convert_rev_basic_block(sd: Dict) -> Tuple[Dict, Dict]:
    """RevBasicBlock (revresnet.py:21-48): deconv1/bn1/deconv2/bn2
    [+ upsample projection] -> nn/revresnet.py::RevBasicBlock tree."""
    params: Dict = {"Deconv_0": _deconv_entry(sd, "deconv1")}
    stats: Dict = {}
    p, s = bn_entries(sd, "bn1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
    params["Deconv_1"] = _deconv_entry(sd, "deconv2")
    p, s = bn_entries(sd, "bn2")
    params["BatchNorm_1"], stats["BatchNorm_1"] = p, s
    if "upsample.0.weight" in sd:
        params["Deconv_2"] = _deconv_entry(sd, "upsample.0")
        p, s = bn_entries(sd, "upsample.1")
        params["BatchNorm_2"], stats["BatchNorm_2"] = p, s
    return params, stats


def convert_rev_layer(sd: Dict) -> Tuple[Dict, Dict]:
    """One revresnet _make_layer stage (2 RevBasicBlocks)."""
    params: Dict = {}
    stats: Dict = {}
    for b in range(2):
        bp, bs = convert_rev_basic_block(_sub(sd, str(b)))
        params[f"RevBasicBlock_{b}"] = bp
        stats[f"RevBasicBlock_{b}"] = bs
    return params, stats


def convert_urdecoder(sd: Dict, final_bias: bool = True) -> Tuple[Dict, Dict]:
    """One uresnet decoder head: ModuleList [layer1..4,
    Sequential(deconv1, bn1, relu, deconv2)] (uresnet.py:35-51) ->
    nn/uresnet.py::URDecoder tree.  ``final_bias`` covers revresnet's
    deconv1 default bias=True (revresnet.py:115-122)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(4):
        lp, ls = convert_rev_layer(_sub(sd, str(i)))
        params[f"RevLayer_{i}"] = lp
        stats[f"RevLayer_{i}"] = ls
    params["Deconv_0"] = _deconv_entry(sd, "4.0", bias=final_bias)
    p, s = bn_entries(sd, "4.1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
    params["Deconv_1"] = _deconv_entry(sd, "4.3")
    return params, stats


def convert_minmax_head(sd: Dict) -> Tuple[Dict, Dict]:
    """marrnet1.Net decoder_minmax Sequential (marrnet1.py:141-154):
    Conv2d(2,s2), Conv2d(4), Linear/BN1d x2, Linear(2) ->
    nn/uresnet.py::MinmaxHead tree."""
    params: Dict = {
        "Conv_0": {"kernel": conv_w(sd["0.weight"]),
                   "bias": np.asarray(sd["0.bias"])},
        "Conv_1": {"kernel": conv_w(sd["1.weight"]),
                   "bias": np.asarray(sd["1.bias"])},
        "Dense_0": _linear_entry(sd, "3"),
        "Dense_1": _linear_entry(sd, "6"),
        "Dense_2": _linear_entry(sd, "9"),
    }
    stats: Dict = {}
    p, s = bn_entries(sd, "4")
    params["BatchNorm_0"], stats["BatchNorm_0"] = p, s
    p, s = bn_entries(sd, "7")
    params["BatchNorm_1"], stats["BatchNorm_1"] = p, s
    return params, stats


def convert_uresnet_net(sd: Dict, layer_names,
                        pred_depth_minmax: bool = False) -> Tuple[Dict, Dict]:
    """uresnet.Net / Net_inpaint / marrnet1.Net state_dict ->
    nn/uresnet.py::UResNet (params, batch_stats).

    Both reference variants share the layout: encoder.* (resnet18 pyramid)
    + decoder_{name}.* ModuleLists; Net_inpaint's shared final deconv2
    appears under each decoder_{name}.4.3 too (uresnet.py:91-125).
    """
    params: Dict = {}
    stats: Dict = {}
    enc = uresnet_encoder_to_torchvision_names(sd)
    params["ResNet18Features_0"], stats["ResNet18Features_0"] = \
        convert_torchvision_resnet18(enc)
    for name in layer_names:
        dp, ds = convert_urdecoder(_sub(sd, "decoder_" + name))
        params[f"decoder_{name}"] = dp
        stats[f"decoder_{name}"] = ds
    if pred_depth_minmax:
        mp, ms = convert_minmax_head(_sub(sd, "decoder_minmax"))
        params["MinmaxHead_0"] = mp
        stats["MinmaxHead_0"] = ms
    return params, stats


def convert_image_encoder(sd: Dict, prefix: str = "main.0") -> Tuple[Dict, Dict]:
    """networks.ImageEncoder (networks.py:6-22): modified resnet18 + fc ->
    nn/resnet.py::ResNet18Encoder tree."""
    sub = _sub(sd, prefix)
    enc = {k: v for k, v in sub.items()
           if not (k.startswith("fc.") or k.endswith("num_batches_tracked"))}
    params: Dict = {}
    stats: Dict = {}
    params["ResNet18Features_0"], stats["ResNet18Features_0"] = \
        convert_torchvision_resnet18(enc)
    params["Dense_0"] = _linear_entry(sub, "fc")
    return params, stats


def convert_voxel_decoder(sd: Dict, prefix: str = "main") -> Tuple[Dict, Dict]:
    """networks.VoxelDecoder (networks.py:25-61; note the two no-op
    Sequentials at main.6/7) -> nn/voxel_nets.py::VoxelDecoder tree."""
    sub = _sub(sd, prefix)
    deconvs = ["0", "3", "8", "11", "14", "17"]
    bns = ["1", "4", "9", "12", "15"]
    params: Dict = {}
    stats: Dict = {}
    for i, key in enumerate(deconvs):
        params[f"Deconv3D_{i}"] = _deconv_entry(sub, key, bias=True)
    for i, key in enumerate(bns):
        p, s = bn_entries(sub, key)
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = p, s
    return params, stats


def convert_voxel_generator(sd: Dict, prefix: str = "main") -> Tuple[Dict, Dict]:
    """networks.VoxelGenerator res=128 (networks.py:64-104), bias=False."""
    sub = _sub(sd, prefix)
    deconvs = ["0", "3", "6", "9", "12", "15"]
    bns = ["1", "4", "7", "10", "13"]
    params: Dict = {}
    stats: Dict = {}
    for i, key in enumerate(deconvs):
        params[f"Deconv3D_{i}"] = _deconv_entry(sub, key, bias=False)
    for i, key in enumerate(bns):
        p, s = bn_entries(sub, key)
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = p, s
    return params, stats


def convert_voxel_discriminator(sd: Dict,
                                prefix: str = "main") -> Tuple[Dict, Dict]:
    """networks.VoxelDiscriminator res=128 (networks.py:107-144): 6 convs
    at Sequential indices 0,2,4,6,8,10, bias=False, no norm."""
    sub = _sub(sd, prefix)
    params = {f"Conv3D_{i}": _conv3d_entry(sub, str(2 * i), bias=False)
              for i in range(6)}
    return params, {}


def convert_unet3d(sd: Dict) -> Tuple[Dict, Dict]:
    """networks.Unet_3D (networks.py:147-190): enc1..6 Conv3d_blocks,
    full_conv_block Linear, dec1..6 Deconv3d_skips ->
    nn/unet3d.py::UNet3D tree (encoder BatchNorm_0..5, decoder _6..10)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(6):
        params[f"Conv3D_{i}"] = _conv3d_entry(sd, f"enc{i + 1}.net.0")
        p, s = bn_entries(sd, f"enc{i + 1}.net.1")
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = p, s
    params["Dense_0"] = _linear_entry(sd, "full_conv_block.0")
    for i in range(5):
        params[f"Deconv3D_{i}"] = _deconv_entry(sd, f"dec{i + 1}.net.0",
                                                bias=True)
        p, s = bn_entries(sd, f"dec{i + 1}.net.1")
        params[f"BatchNorm_{6 + i}"], stats[f"BatchNorm_{6 + i}"] = p, s
    params["Deconv3D_5"] = _deconv_entry(sd, "dec6.net", bias=True)
    return params, stats


def convert_marrnet2_net(sd: Dict) -> Tuple[Dict, Dict]:
    """marrnet2.Net (marrnet2.py:88-111): encoder (ImageEncoder) + decoder
    (VoxelDecoder) -> models/marrnet2.py::Marrnet2Net tree."""
    params: Dict = {}
    stats: Dict = {}
    ep, es = convert_image_encoder(sd, "encoder.main.0")
    params["ResNet18Encoder_0"], stats["ResNet18Encoder_0"] = ep, es
    dp, ds = convert_voxel_decoder(sd, "decoder.main")
    params["VoxelDecoder_0"], stats["VoxelDecoder_0"] = dp, ds
    return params, stats


def convert_depth_inpaint_net(sd: Dict) -> Tuple[Dict, Dict]:
    """depth_pred_with_sph_inpaint Net pair: net1 = marrnet1.Net (minmax),
    net2 = uresnet.Net_inpaint([1], ['spherical'], input_planes=1)
    (depth_pred_with_sph_inpaint.py:98-102) ->
    models/depth_inpaint.py::DepthInpaintNet tree."""
    params: Dict = {}
    stats: Dict = {}
    p1, s1 = convert_uresnet_net(_sub(sd, "net1"),
                                 ("normal", "depth", "silhou"),
                                 pred_depth_minmax=True)
    params["net1"], stats["net1"] = p1, s1
    p2, s2 = convert_uresnet_net(_sub(sd, "net2"), ("spherical",))
    params["net2"], stats["net2"] = p2, s2
    return params, stats


def convert_genre_net(sd: Dict) -> Tuple[Dict, Dict]:
    """genre_full_model.Net: depth_and_inpaint.* + refine_net.*
    (genre_full_model.py:104-105) -> models/genre_full.py::GenreNet tree."""
    params: Dict = {}
    stats: Dict = {}
    dp, ds = convert_depth_inpaint_net(_sub(sd, "depth_and_inpaint"))
    params["depth_and_inpaint"], stats["depth_and_inpaint"] = dp, ds
    rp, rs = convert_unet3d(_sub(sd, "refine_net"))
    params["refine_net"], stats["refine_net"] = rp, rs
    return params, stats


def convert_shapehd_net(sd: Dict) -> Tuple[Dict, Dict, Dict, Dict, Dict]:
    """shapehd.Net: marrnet2 + marrnet2_noft + frozen D (shapehd.py:89-106).
    Returns (m2_params, m2_stats, noft_params, noft_stats, d_params)."""
    mp, ms = convert_marrnet2_net(_sub(sd, "marrnet2"))
    np_, ns = convert_marrnet2_net(_sub(sd, "marrnet2_noft"))
    dp, _ = convert_voxel_discriminator(_sub(sd, "d"))
    return mp, ms, np_, ns, dp
