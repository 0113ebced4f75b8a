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

    nets = payload.get("nets", [payload])
    converted = [convert_state_dict(sd) for sd in nets]
    # NOTE: per-model name-mapping tables extend torch_layer_conversion as
    # released checkpoints become available; this emits the raw arrays
    # keyed by torch names so a mapping can be assembled per network.
    with open(args.dst, "wb") as f:
        pickle.dump({"torch_nets": converted,
                     "epoch": payload.get("epoch"),
                     "net": args.net}, f)
    print(f"wrote {args.dst} ({len(converted)} nets)")


if __name__ == "__main__":
    main()
