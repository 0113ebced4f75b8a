"""Two-stage CLI option parsing mirroring the reference flag surface.

Rebuild of /root/reference/options/options_train.py and options_test.py:
general flags are parsed first with ``parse_known_args``, then the chosen
model's and dataset's ``add_arguments`` extend the parser; each
``add_arguments`` returns the ``unique_params`` that survive resume
un-overwritten (options_train.py:10-11, 91-127).
"""

from __future__ import annotations

import argparse
import pickle
from typing import Set, Tuple

from ..core.registry import get_dataset, get_model


def add_general_arguments(parser: argparse.ArgumentParser) -> Set[str]:
    """options_train.py:13-86 plus TPU-native additions (mesh/dtype)."""
    unique_params = {"gpu", "resume", "epoch", "workers", "batch_size",
                     "save_net", "epoch_batches", "logdir"}

    parser.add_argument("--gpu", default="none", type=str,
                        help="accepted for reference-script compatibility; "
                             "device selection is automatic on TPU")
    parser.add_argument("--manual_seed", type=int, default=None,
                        help="manual random seed")
    parser.add_argument("--resume", type=int, default=0,
                        help="0: scratch; -1: checkpoint.pt; -2: best.pt; "
                             "N>0: nets/N.pt")
    parser.add_argument("--suffix", default="", type=str,
                        help="logdir suffix, formatted with opt vars")
    parser.add_argument("--epoch", type=int, default=0,
                        help="number of epochs to train")
    # dataset
    parser.add_argument("--dataset", type=str, default=None,
                        help="dataset alias")
    parser.add_argument("--workers", type=int, default=4,
                        help="data-loading worker threads")
    parser.add_argument("--classes", default="car", type=str,
                        help="class names, comma separated")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epoch_batches", default=None, type=int,
                        help="batches used per epoch")
    parser.add_argument("--eval_batches", default=None, type=int,
                        help="batches used for evaluation")
    parser.add_argument("--eval_at_start", action="store_true",
                        help="evaluate before training starts")
    parser.add_argument("--log_time", action="store_true",
                        help="log batch_time/data_time")
    parser.add_argument("--log_every", type=int, default=1,
                        help="defer train metric fetches by up to N steps "
                             "(same values/order; avoids a per-step device "
                             "sync -- see train/loop.py)")
    # network
    parser.add_argument("--net", type=str, required=True, help="model alias")
    # optimization
    parser.add_argument("--optim", type=str, default="adam")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--adam_beta1", type=float, default=0.5)
    parser.add_argument("--adam_beta2", type=float, default=0.9)
    parser.add_argument("--sgd_momentum", type=float, default=0.9)
    parser.add_argument("--sgd_dampening", type=float, default=0.0)
    parser.add_argument("--sgd_wdecay", type=float, default=0.0)
    parser.add_argument("--wdecay", type=float, default=0.0)
    # logging / saving
    parser.add_argument("--logdir", type=str, default=None)
    parser.add_argument("--log_batch", action="store_true")
    parser.add_argument("--expr_id", type=int, default=0,
                        help="experiment index; >0 refuses deletion")
    parser.add_argument("--save_net", type=int, default=1,
                        help="save network every N epochs")
    parser.add_argument("--save_net_opt", action="store_true",
                        help="save optimizer state in periodic snapshots")
    parser.add_argument("--vis_every_vali", default=1, type=int)
    parser.add_argument("--vis_every_train", default=1, type=int)
    parser.add_argument("--vis_batches_vali", type=int, default=10)
    parser.add_argument("--vis_batches_train", type=int, default=10)
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--vis_workers", default=4, type=int)
    parser.add_argument("--vis_param_f", default=None, type=str)
    # TPU-native additions
    parser.add_argument("--im_size", type=int, default=256)
    parser.add_argument("--vox_res", type=int, default=128)
    parser.add_argument("--sph_res", type=int, default=128)
    parser.add_argument("--z_res", type=int, default=256)
    # NOTE: --padding_margin belongs to the GenRe models' add_arguments
    # (depth_pred_with_sph_inpaint.py:23-24), not the general options
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="compute dtype for network forward passes")
    parser.add_argument("--backbone_init", type=str, default=None,
                        help="converted resnet18 backbone checkpoint "
                             "(tools/convert_reference_checkpoint.py) to "
                             "initialize the image encoder -- stands in "
                             "for torchvision pretrained=True")
    parser.add_argument("--sp", type=int, default=1,
                        help="spatial-parallel mesh width: devices form a "
                             "(n_devices/sp, sp) mesh and large voxel "
                             "activations shard their Z axis across sp")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for "
                             "multi-host (DCN) training: the mesh then "
                             "spans all hosts' devices; each host loads "
                             "its own data shard")
    parser.add_argument("--synthetic_length", type=int, default=64,
                        help="samples per epoch for the synthetic dataset")
    return unique_params


def parse_train(argv=None) -> Tuple[argparse.Namespace, Set[str]]:
    """options_train.py:106-127 two-stage parse."""
    parser = argparse.ArgumentParser()
    unique_params = add_general_arguments(parser)
    parser.add_argument("--printhelp", action="store_true",
                        help="print help AFTER model/dataset flags are "
                             "registered (options_train.py:121-122)")
    first, _ = parser.parse_known_args(argv)

    if first.dataset is not None:
        dataset_cls = get_dataset(first.dataset)
        parser, u = dataset_cls.add_arguments(parser)
        unique_params |= u
    model_cls = get_model(first.net)
    parser, u = model_cls.add_arguments(parser)
    unique_params |= u

    if first.printhelp:
        parser.print_help()
        raise SystemExit(0)
    opt = parser.parse_args(argv)
    return opt, unique_params


def parse_test(argv=None) -> Tuple[argparse.Namespace, Set[str]]:
    """options_test.py:12-51: reuses train general args + test I/O flags;
    dataset forced to 'test'."""
    parser = argparse.ArgumentParser()
    add_general_arguments(parser)
    parser.add_argument("--input_rgb", type=str, required=True,
                        help="glob pattern for rgb images")
    parser.add_argument("--input_mask", type=str, default=None,
                        help="glob pattern for object masks")
    parser.add_argument("--net_file", type=str, required=True,
                        help="trained checkpoint path")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--marrnet1_file", type=str, default=None,
                        help="(shapehd) path to trained MarrNet-1")
    first, _ = parser.parse_known_args(argv)
    model_cls = get_model(first.net, test=True)
    parser, _ = model_cls.add_arguments(parser)
    opt = parser.parse_args(argv)
    opt.dataset = "test"
    return opt, set()


def save_opt(logdir: str, opt: argparse.Namespace) -> None:
    """Persist opt.pt (pickle) + human-readable opt.txt (train.py:66-70)."""
    with open(f"{logdir}/opt.pt", "wb") as f:
        pickle.dump(vars(opt), f)
    with open(f"{logdir}/opt.txt", "w") as f:
        for k in sorted(vars(opt)):
            f.write(f"{k}: {getattr(opt, k)}\n")


def overwrite_opt(opt: argparse.Namespace, saved: dict,
                  unique_params: Set[str]) -> argparse.Namespace:
    """Restore saved options except unique params (options_train.py:91-103)."""
    for k, v in saved.items():
        if k not in unique_params:
            setattr(opt, k, v)
    return opt
