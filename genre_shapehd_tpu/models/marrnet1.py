"""MarrNet-1: RGB -> 2.5D sketches (normal, depth, silhouette [+ minmax]).

TPU-native rebuild of /root/reference/models/marrnet1.py.  One U-ResNet
with three decoder heads and an optional scalar depth-minmax head; loss is
foreground-masked MSE on normal/depth, full MSE on silhouette, plus a
(256^2/2)-weighted minmax MSE (marrnet1.py:104-134).  The whole
forward+backward+update runs as one jitted function.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import UResNet
from ..train.state import ModelState
from .base import ModelBase


class Model(ModelBase):
    requires = ["rgb", "depth", "silhou", "normal"]
    input_names = ["rgb"]
    gt_names = ["depth", "silhou", "normal"]
    metrics = ["loss", "depth", "silhou", "normal"]

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument(
            "--pred_depth_minmax", action="store_true",
            help="Also predicts depth minmax (for GenRe)")
        parser.add_argument(
            "--f32_heads", action="store_true",
            help="run the 2.5D decoders + minmax head in float32 over the "
                 "bf16 encoder (precision ablation)")
        parser.add_argument(
            "--decoder_width", type=float, default=1.0,
            help="decoder channel multiplier (capacity ablation; 1.0 = "
                 "reference revuresnet18 widths)")
        parser.add_argument(
            "--no_aug", action="store_true",
            help="disable train-time photometric augmentation")
        return parser, set()

    def __init__(self, opt):
        super().__init__(opt)
        self.pred_depth_minmax = bool(getattr(opt, "pred_depth_minmax", False))
        if self.pred_depth_minmax:
            self.requires = self.requires + ["depth_minmax"]
            self.gt_names = self.gt_names + ["depth_minmax"]
            self.metrics = self.metrics + ["depth_minmax"]
        self.net = UResNet(
            out_planes=(3, 1, 1),
            layer_names=("normal", "depth", "silhou"),
            pred_depth_minmax=self.pred_depth_minmax,
            decoder_width=float(getattr(opt, "decoder_width", 1.0)),
            head_dtype=(jnp.float32 if getattr(opt, "f32_heads", False)
                        else None),
            dtype=self.dtype,
        )
        self.tx = self.adam()

    # ----------------------------------------------------------- state
    def init_state(self, rng: jax.Array) -> ModelState:
        dummy = jnp.zeros((1, self.opt.im_size, self.opt.im_size, 3),
                          jnp.float32)
        # jit the init: eager flax init dispatches hundreds of ops
        # individually (minutes over the axon tunnel)
        variables = jax.jit(
            lambda r: self.net.init(r, dummy, train=False))(rng)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        if getattr(self.opt, "backbone_init", None):
            params, stats = self.load_backbone(
                params, stats, self.opt.backbone_init)
        return ModelState(
            params={"net": params},
            batch_stats={"net": stats},
            opt_state={"net": self.tx.init(params)},
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ loss
    def _loss(self, params, batch_stats, batch, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            pred, mutated = self.net.apply(
                variables, batch["rgb"], train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            pred = self.net.apply(variables, batch["rgb"], train=False)
            new_stats = batch_stats
        loss, loss_data = self.compute_loss(pred, batch)
        return loss, (loss_data, new_stats, pred)

    def compute_loss(self, pred, batch) -> Tuple[jnp.ndarray, Dict]:
        """marrnet1.py:104-134 with element-mean masked MSE."""
        is_fg = (batch["silhou"] != 0).astype(jnp.float32)        # (N,H,W,1)
        loss_normal = self.masked_mse(pred["normal"], batch["normal"], is_fg)
        loss_depth = self.masked_mse(pred["depth"], batch["depth"], is_fg)
        loss_silhou = jnp.mean((pred["silhou"] - batch["silhou"]) ** 2)
        loss = loss_normal + loss_depth + loss_silhou
        loss_data = {"normal": loss_normal, "depth": loss_depth,
                     "silhou": loss_silhou}
        if self.pred_depth_minmax:
            w_minmax = (256.0 ** 2) / 2.0                 # marrnet1.py:127
            loss_minmax = w_minmax * jnp.mean(
                (pred["depth_minmax"] - batch["depth_minmax"]) ** 2)
            loss = loss + loss_minmax
            loss_data["depth_minmax"] = loss_minmax
        loss_data["loss"] = loss
        return loss, loss_data

    # ------------------------------------------------------------ steps
    def train_step(self, state: ModelState, batch, rng):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, (loss_data, new_stats, _)), grads = grad_fn(
            state.params["net"], state.batch_stats["net"], batch, True)
        updates, new_opt = self.tx.update(
            grads, state.opt_state["net"], state.params["net"])
        new_params = jax.tree.map(lambda p, u: p + u,
                                  state.params["net"], updates)
        state = state.replace(
            params={"net": new_params},
            batch_stats={"net": new_stats},
            opt_state={"net": new_opt},
            step=state.step + 1,
        )
        return state, loss_data

    def eval_step(self, state: ModelState, batch, rng):
        _, (loss_data, _, pred) = self._loss(
            state.params["net"], state.batch_stats["net"], batch, False)
        return loss_data, pred

    # ----------------------------------------------------------- output
    def pack_output(self, pred, batch, add_gt: bool = True):
        """marrnet1.py:76-102 (host side, numpy)."""
        out = {"rgb_path": batch.get("rgb_path")}
        gt_silhou = np.asarray(self.postprocess(jnp.asarray(batch["silhou"])))
        out["pred_normal"] = np.asarray(self.postprocess(
            jnp.asarray(pred["normal"]), bg=1.0,
            input_mask=jnp.asarray(gt_silhou)))
        out["pred_silhou"] = np.asarray(
            self.postprocess(jnp.asarray(pred["silhou"])))
        out["pred_depth"] = np.asarray(self.postprocess(
            jnp.asarray(pred["depth"]), bg=0.0,
            input_mask=jnp.asarray(gt_silhou)))
        if self.pred_depth_minmax and "depth_minmax" in pred:
            out["pred_depth_minmax"] = np.asarray(pred["depth_minmax"])
            if add_gt and "depth_minmax" in batch:
                out["gt_depth_minmax"] = np.asarray(batch["depth_minmax"])
        return out
