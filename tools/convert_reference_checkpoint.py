"""Convert a reference PyTorch checkpoint (.pt) into this framework's format.

The reference releases checkpoints as
``{'nets': [state_dict, ...], 'optimizers': [...], 'epoch': N}``
(netinterface.py:405-412) with torch-layout weights (OIHW convs, NCHW
batchnorm).  This tool remaps them to the Flax trees used here:

  * Conv2d   weight (O, I, kH, kW)  -> kernel (kH, kW, I, O)
  * Conv3d   weight (O, I, kD, kH, kW) -> kernel (kD, kH, kW, I, O)
  * ConvTranspose2d/3d weight (I, O, k...) -> kernel (k..., I, O) with
    spatially flipped taps (lax.conv_transpose convolves, torch correlates
    the transposed kernel)
  * Linear   weight (O, I) -> kernel (I, O)
  * BatchNorm {weight, bias, running_mean, running_var} ->
    {scale, bias} params + {mean, var} batch_stats

A name-mapping table per network pairs torch module paths with Flax module
paths; the tool is data-driven so new networks only add a table.  Requires
torch (CPU) -- available in this image for conversion/testing only.

Usage:
  python tools/convert_reference_checkpoint.py --src marrnet1.pt \
      --net marrnet1 --dst converted_marrnet1.pt
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    # (O, I, k...) -> (k..., I, O)
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def torch_tconv_to_flax(w: np.ndarray) -> np.ndarray:
    # (I, O, k...) -> flip spatial taps -> (k..., I, O)
    nd = w.ndim
    spatial = tuple(range(2, nd))
    w = np.flip(w, axis=spatial)
    return np.transpose(w, spatial + (0, 1))


def torch_linear_to_flax(w: np.ndarray) -> np.ndarray:
    return w.T


def convert_state_dict(sd: dict) -> dict:
    """Best-effort structural conversion of a torch state_dict into
    {name: {kind, arrays}} records for manual tree assembly."""
    out = {}
    for k, v in sd.items():
        out[k] = np.asarray(v.detach().cpu().numpy()
                            if hasattr(v, "detach") else v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="reference .pt checkpoint")
    ap.add_argument("--dst", required=True, help="output path")
    ap.add_argument("--net", required=True, help="model alias")
    args = ap.parse_args()

    try:
        import torch
    except ImportError:
        raise SystemExit("torch is required for checkpoint conversion")

    payload = torch.load(args.src, map_location="cpu")

    import pickle

    if args.net == "resnet18":
        # torchvision resnet18 -> nn.ResNet18Features params/batch_stats
        # (rules validated against torch oracles, tests/test_conversion.py)
        from torch_layer_conversion import convert_torchvision_resnet18
        sd = payload if not hasattr(payload, "state_dict") else \
            payload.state_dict()
        sd = {k: np.asarray(v) for k, v in sd.items()
              if not k.endswith("num_batches_tracked")}
        params, stats = convert_torchvision_resnet18(sd)
        with open(args.dst, "wb") as f:
            pickle.dump({"nets": [{"params": params,
                                   "batch_stats": stats}],
                         "optimizers": [], "epoch": 0, "loss_eval": 0.0},
                        f)
        print(f"wrote {args.dst} (resnet18 backbone)")
        return

    nets = [convert_state_dict(sd) for sd in payload.get("nets", [payload])]
    out_nets, net_names = convert_model_nets(args.net, nets)
    with open(args.dst, "wb") as f:
        pickle.dump({"nets": out_nets, "optimizers": [],
                     "net_names": net_names, "opt_names": [],
                     "epoch": payload.get("epoch", 0),
                     "loss_eval": float(payload.get("loss_eval", 0.0))}, f)
    print(f"wrote {args.dst} ({len(out_nets)} nets, {args.net})")


def convert_model_nets(alias: str, nets: list):
    """Map a reference checkpoint's ``nets`` list (torch state_dicts,
    netinterface.py:405-412) to this framework's payload entries
    ({params, batch_stats} per net, raw trees as train/state.py saves them).
    Returns (entries, net_names).

    Per-model layouts (reference ``self._nets``):
      marrnet1:        [marrnet1.Net]                        (marrnet1.py:37)
      marrnet2:        [marrnet2.Net]                        (marrnet2.py:35)
      marrnet:         [Net(marrnet1+marrnet2)]              (marrnet.py:36)
      wgangp:          [G, D]                                (wgangp.py:45)
      shapehd:         [shapehd.Net(marrnet2+noft+d)]        (shapehd.py:41)
      depth_inpaint:   [Net(net1+net2)]   (depth_pred_with_sph_inpaint.py:46)
      genre_full_model: [Net(depth_and_inpaint+refine_net)]
                                               (genre_full_model.py:45)
    """
    from torch_layer_conversion import (
        _sub, convert_depth_inpaint_net, convert_genre_net,
        convert_marrnet2_net, convert_shapehd_net, convert_uresnet_net,
        convert_voxel_discriminator, convert_voxel_generator)

    def entry(params, stats):
        return {"params": params, "batch_stats": stats}

    if alias == "marrnet1":
        p, s = convert_uresnet_net(nets[0], ("normal", "depth", "silhou"),
                                   pred_depth_minmax=True)
        return [entry(p, s)], ["net"]
    if alias == "marrnet2":
        return [entry(*convert_marrnet2_net(nets[0]))], ["net"]
    if alias == "marrnet":
        p1, s1 = convert_uresnet_net(_sub(nets[0], "marrnet1"),
                                     ("normal", "depth", "silhou"),
                                     pred_depth_minmax=True)
        p2, s2 = convert_marrnet2_net(_sub(nets[0], "marrnet2"))
        return [entry({"marrnet1": p1, "marrnet2": p2},
                      {"marrnet1": s1, "marrnet2": s2})], ["net"]
    if alias == "wgangp":
        g = entry(*convert_voxel_generator(nets[0]))
        d_params, _ = convert_voxel_discriminator(nets[1])
        return [g, entry(d_params, {})], ["net_g", "net_d"]
    if alias == "shapehd":
        mp, ms, np_, ns, dp = convert_shapehd_net(nets[0])
        return ([entry(mp, ms), entry(np_, ns), entry(dp, {})],
                ["net", "net_noft", "net_d"])
    if alias in ("depth_pred_with_sph_inpaint", "depth_inpaint"):
        return [entry(*convert_depth_inpaint_net(nets[0]))], ["net"]
    if alias in ("genre_full_model", "genre"):
        return [entry(*convert_genre_net(nets[0]))], ["net"]
    raise SystemExit(f"no conversion table for model alias {alias!r}")


if __name__ == "__main__":
    main()
