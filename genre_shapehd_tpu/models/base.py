"""Model interface base: config, optimizers, preprocessing, jitted steps.

TPU-native re-design of /root/reference/models/netinterface.py +
marrnetbase.py.  The reference's mutable trainer object (preallocated
tensor slots, .backward()/.step() calls) becomes:

  * ``init_state(rng) -> ModelState`` -- one pytree of all net params,
    batch_stats and optax optimizer states;
  * ``train_step(state, batch, rng) -> (state, metrics)`` -- a pure
    function the trainer jits once over a device mesh; the whole
    forward+backward+update+metric graph fuses into a single XLA program
    (the reference pays a D2H sync per batch for every ``.item()`` call,
    marrnet1.py:122-125 -- here metrics stay on device);
  * ``eval_step(state, batch, rng) -> (metrics, pred)``.

Host-side contracts kept from the reference: ``requires`` drives the
dataset (datasets/shapenet.py:96-101), ``preprocess`` is a per-sample
numpy transform, batch logs are sample-mean dicts with 'size' and 'loss'.
"""

from __future__ import annotations

import argparse
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import preprocess as pp
from ..train.state import ModelState


def default_opt(**overrides) -> SimpleNamespace:
    """Programmatic stand-in for the CLI options (options_train.py:13-86)."""
    base = dict(
        lr=1e-3, adam_beta1=0.5, adam_beta2=0.9, optim="adam", wdecay=0.0,
        sgd_momentum=0.9, sgd_dampening=0.0, sgd_wdecay=0.0,
        batch_size=4, epoch_batches=None, eval_batches=None, epoch=0,
        logdir=None, full_logdir=None, log_time=False, log_every=1,
        manual_seed=None,
        im_size=256, vox_res=128, sph_res=128, z_res=256, padding_margin=16,
        dtype="float32",
        # model flags (reference add_arguments defaults)
        pred_depth_minmax=False, canon_sup=False, joint_train=False,
        load_offline=False, net1_path=None, inpaint_path=None,
        surface_weight=1.0, joint_w25d=0.01, canon_voxel=False,
        wgangp_lambda=10.0,
        wgangp_norm=1.0, gan_d_iter=1, marrnet1=None, marrnet2=None,
        gan=None, w_gan_loss=0.0, marrnet1_file=None, net_file=None,
        output_dir=None, backbone_init=None, sp=1, exact_render=False,
        gt_depth_input=False, procedural_length=512, procedural_max_prims=4,
        augment=True, no_aug=False, f32_heads=False, decoder_width=1.0,
        gt_sph_full=False, gt_minmax_input=False,
    )
    base.update(overrides)
    return SimpleNamespace(**base)


class ModelBase:
    """Shared constants + preprocessing (marrnetbase.py:11-155)."""

    im_size = 256
    rgb_jitter_d = 0.4
    rgb_light_noise = 0.1
    silhou_thres = 0.999
    pred_silhou_thres = 0.3
    scale_25d = 100.0

    requires: List[str] = []
    input_names: List[str] = []
    gt_names: List[str] = []
    metrics: List[str] = ["loss"]

    @classmethod
    def add_arguments(cls, parser: argparse.ArgumentParser):
        """Register model-specific flags; returns (parser, unique_params)
        (netinterface.py:64-67)."""
        return parser, set()

    def __init__(self, opt):
        self.opt = opt
        assert opt.optim == "adam", "all reference projects use adam"
        self.dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
        # instance override of the class constant (reference hard-codes 256,
        # marrnetbase.py:12; we keep that default but let opt shrink it for
        # tiny-mesh staging and tests)
        self.im_size = getattr(opt, "im_size", type(self).im_size)
        # train-time photometric augmentation (marrnetbase.py:76-83) can be
        # ablated off (--no_aug)
        self.augment = bool(getattr(opt, "augment", True)) \
            and not getattr(opt, "no_aug", False)
        if opt.log_time:
            self.metrics = list(self.metrics) + ["batch_time", "data_time"]

    # ------------------------------------------------------------- optim
    def adam(self, lr: Optional[float] = None) -> optax.GradientTransformation:
        """Adam with the reference betas (options_train.py:52-54) +
        optional decoupled weight decay (--wdecay)."""
        opt = self.opt
        tx = optax.adam(lr if lr is not None else opt.lr,
                        b1=opt.adam_beta1, b2=opt.adam_beta2)
        if getattr(opt, "wdecay", 0.0):
            tx = optax.chain(optax.add_decayed_weights(opt.wdecay), tx)
        return tx

    # ------------------------------------------------------- data contract
    def preprocess(self, data: Dict[str, np.ndarray],
                   mode: str = "train") -> Dict[str, np.ndarray]:
        """Host-side per-sample transform (marrnetbase.py:71-126).

        Channel-last throughout: rgb (H,W,3) normalized; depth/silhou
        (H,W,1) and normal (H,W,3) resized + scaled by ``scale_25d``;
        silhou binarized at ``silhou_thres``.  Bound method (not the
        reference's classmethod) so ``opt.im_size`` overrides apply.
        """
        im_size = self.im_size
        out = dict(data)
        rng = np.random.default_rng() if mode == "train" else None
        for key, val in data.items():
            if key == "rgb":
                im = pp.resize(val, im_size, "horizontal")
                if mode == "train" and getattr(self, "augment", True):
                    im = pp.jitter_colors(im, self.rgb_jitter_d,
                                          self.rgb_jitter_d,
                                          self.rgb_jitter_d, rng=rng)
                    im = pp.add_lighting_noise(im, self.rgb_light_noise,
                                               rng=rng)
                out[key] = pp.normalize_colors(im).astype(np.float32)
            elif key == "depth":
                im = val[..., 0] if val.ndim == 3 else val
                im = pp.resize(im, im_size, "horizontal",
                               clamp=(im.min(), im.max()))
                out[key] = (im * self.scale_25d)[..., None].astype(np.float32)
            elif key == "silhou":
                im = val[..., 0] if val.ndim == 3 else val
                im = pp.resize(im, im_size, "horizontal",
                               clamp=(im.min(), im.max()))
                im = pp.binarize(im, self.silhou_thres)
                out[key] = (im * self.scale_25d)[..., None].astype(np.float32)
            elif key == "normal":
                im = pp.resize(val, im_size, "horizontal",
                               clamp=(val.min(), val.max()))
                out[key] = (im * self.scale_25d).astype(np.float32)
        return out

    # ---------------------------------------------------------- jnp helpers
    @staticmethod
    def mask(image: jnp.ndarray, mask01: jnp.ndarray,
             bg: float = 1.0) -> jnp.ndarray:
        """Blend fg/bg by a [0,1] mask (marrnetbase.py:128-135)."""
        return mask01 * image + (1.0 - mask01) * bg

    @classmethod
    def postprocess(cls, t: jnp.ndarray, bg: float = 1.0,
                    input_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        scaled = t / cls.scale_25d
        if input_mask is not None:
            return cls.mask(scaled, input_mask, bg)
        return scaled

    @staticmethod
    def to_abs_depth(rel_depth: jnp.ndarray,
                     depth_minmax: jnp.ndarray) -> jnp.ndarray:
        """Min-max denormalize (marrnetbase.py:144-151); rel_depth
        (N,H,W,1), depth_minmax (N,2)."""
        dmin = depth_minmax[:, 0][:, None, None, None]
        dmax = depth_minmax[:, 1][:, None, None, None]
        return rel_depth * (dmax - dmin + 1e-4) + dmin

    @staticmethod
    def masked_mse(pred: jnp.ndarray, gt: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
        """Mean over selected elements -- torch's ``mse(a[m], b[m])``."""
        mask = jnp.broadcast_to(mask, pred.shape).astype(pred.dtype)
        se = mask * (pred - gt) ** 2
        return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1.0)

    @staticmethod
    def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    # ------------------------------------------------------------ backbone
    @staticmethod
    def load_backbone(params: Dict, batch_stats: Dict, path: str,
                      subname: str = "ResNet18Features_0"):
        """Replace an encoder backbone subtree with converted weights
        (e.g. ImageNet-pretrained resnet18 via
        tools/convert_reference_checkpoint.py --net resnet18); the
        counterpart of the reference's torchvision pretrained=True."""
        from ..core.checkpoint import load_checkpoint
        payload = load_checkpoint(path)
        net = payload["nets"][0]
        params = dict(params)
        batch_stats = dict(batch_stats)
        assert subname in params, (subname, list(params))
        params[subname] = net["params"]
        batch_stats[subname] = net.get("batch_stats", {})
        return params, batch_stats

    # --------------------------------------------------------- abstract api
    def init_state(self, rng: jax.Array) -> ModelState:
        raise NotImplementedError

    def train_step(self, state: ModelState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[ModelState, Dict[str, jnp.ndarray]]:
        raise NotImplementedError

    def eval_step(self, state: ModelState, batch: Dict[str, jnp.ndarray],
                  rng: jax.Array) -> Tuple[Dict[str, jnp.ndarray], Any]:
        raise NotImplementedError

    def pack_output(self, pred: Dict[str, np.ndarray],
                    batch: Dict[str, np.ndarray],
                    add_gt: bool = True) -> Dict[str, Any]:
        return {}

    # ------------------------------------------------------ bookkeeping api
    @property
    def net_names(self) -> List[str]:
        return ["net"]

    @property
    def optimizer_names(self) -> List[str]:
        return ["net"]
