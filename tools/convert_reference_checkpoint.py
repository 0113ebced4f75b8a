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
        # copy: .numpy() aliases torch storage, and optimizers mutate
        # parameters/moments in place
        out[k] = np.array(v.detach().cpu().numpy()
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
    out_opts, opt_names = convert_model_optimizers(args.net, payload, nets)
    with open(args.dst, "wb") as f:
        pickle.dump({"nets": out_nets, "optimizers": out_opts,
                     "net_names": net_names, "opt_names": opt_names,
                     "epoch": payload.get("epoch", 0),
                     "loss_eval": float(payload.get("loss_eval", 0.0))}, f)
    print(f"wrote {args.dst} ({len(out_nets)} nets, "
          f"{len(out_opts)} optimizers, {args.net})")


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


# --------------------------------------------------------------- optimizers

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def _param_names(sd: dict) -> list:
    """Names of optimisable parameters in torch ``state_dict`` order --
    identical to ``module.parameters()`` order (buffers filtered out)."""
    return [k for k in sd if not k.endswith(_BUFFER_SUFFIXES)]


def _opt_np(v):
    # np.array (not asarray): never alias torch storage
    return np.array(v.detach().cpu().numpy() if hasattr(v, "detach")
                    else v)


def _moment_sds(net_sd: dict, opt_sd: dict, param_filter=None):
    """Build state_dict twins holding Adam moments instead of weights.

    ``opt_sd`` is a torch ``Optimizer.state_dict()``
    ({'state': {idx: {step, exp_avg, exp_avg_sq}}, 'param_groups': [...]}),
    whose indices follow ``parameters()`` order (netinterface.py:405-412
    saves them verbatim).  Non-optimised entries (buffers, filtered params)
    become zeros, so frozen sub-nets resume with empty moments.
    Returns (mu_sd, nu_sd, step_count).
    """
    names = [k for k in _param_names(net_sd)
             if param_filter is None or param_filter(k)]
    ids = [pid for g in opt_sd.get("param_groups", []) for pid in g["params"]]
    assert len(ids) == len(names), \
        f"optimizer covers {len(ids)} params, expected {len(names)}"
    mu = {k: np.zeros_like(np.asarray(v)) for k, v in net_sd.items()}
    nu = {k: np.zeros_like(np.asarray(v)) for k, v in net_sd.items()}
    count = 0
    state = opt_sd.get("state", {})
    for name, pid in zip(names, ids):
        st = state.get(pid) or state.get(str(pid))
        if st is None:          # param never stepped (torch lazy state)
            continue
        mu[name] = _opt_np(st["exp_avg"])
        nu[name] = _opt_np(st["exp_avg_sq"])
        count = max(count, int(_opt_np(st["step"])))
    return mu, nu, count


def convert_model_optimizers(alias: str, payload, nets: list):
    """torch Adam states -> optax ``adam`` states parallel to this
    framework's ``optimizer_names``.

    The layout transforms applied to each weight (transposes/tap flips)
    are pure element reorderings, and Adam is elementwise, so applying the
    SAME table to exp_avg/exp_avg_sq yields moment trees whose resume
    updates match torch exactly (pinned by
    tests/test_optimizer_conversion.py).  Assumes the reference's
    single-param-group Adam with wdecay 0 (options_train.py defaults; all
    launch scripts leave --wdecay unset), i.e. the optax state shape
    ``(ScaleByAdamState, EmptyState)``.
    """
    import optax

    opts = payload.get("optimizers") or []
    if not opts:
        return [], []

    def opt_sd(o):
        # tolerate both raw state_dicts and pickled Optimizer objects
        return o if isinstance(o, dict) else o.state_dict()

    def adam_state(mu_entries, nu_entries, idx, count):
        return (optax.ScaleByAdamState(
            count=np.asarray(count, np.int32),
            mu=mu_entries[idx]["params"], nu=nu_entries[idx]["params"]),
            optax.EmptyState())

    if alias == "wgangp":
        out = []
        for i in range(2):
            mu_sd, nu_sd, cnt = _moment_sds(nets[i], opt_sd(opts[i]))
            # convert both nets per moment kind; pick this net's entry
            mu_e, _ = convert_model_nets(alias, [mu_sd if j == i else nets[j]
                                                 for j in range(2)])
            nu_e, _ = convert_model_nets(alias, [nu_sd if j == i else nets[j]
                                                 for j in range(2)])
            out.append(adam_state(mu_e, nu_e, i, cnt))
        return out, ["net_g", "net_d"]

    if alias == "shapehd":
        # reference finetunes net.marrnet2 only (shapehd.py:42-46); our
        # opt_state["net"] spans exactly that subtree (entry 0)
        mu_sd, nu_sd, cnt = _moment_sds(
            nets[0], opt_sd(opts[0]),
            param_filter=lambda k: k.startswith("marrnet2."))
        mu_e, _ = convert_model_nets(alias, [mu_sd])
        nu_e, _ = convert_model_nets(alias, [nu_sd])
        return [adam_state(mu_e, nu_e, 0, cnt)], ["net"]

    # marrnet also finetunes only its marrnet2 half (marrnet.py:37-41),
    # but our opt tree spans the whole net -- frozen half keeps zero moments
    flt = (lambda k: k.startswith("marrnet2.")) if alias == "marrnet" \
        else None
    # single net, single optimizer over (a subset of) net.parameters()
    mu_sd, nu_sd, cnt = _moment_sds(nets[0], opt_sd(opts[0]),
                                    param_filter=flt)
    mu_e, _ = convert_model_nets(alias, [mu_sd])
    nu_e, _ = convert_model_nets(alias, [nu_sd])
    return [adam_state(mu_e, nu_e, 0, cnt)], ["net"]


if __name__ == "__main__":
    main()
