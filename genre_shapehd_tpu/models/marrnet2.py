"""MarrNet-2: 2.5D sketches (depth+normal masked by silhouette) -> voxels.

TPU-native rebuild of /root/reference/models/marrnet2.py: ResNet-18
encoder over the 4-channel (depth, normal) stack -> 200-d latent -> 3D
deconv decoder -> res^3 logits; BCE-with-logits loss against view-space
(or canonical, --canon_sup) voxels.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn import ResNet18Encoder, VoxelDecoder
from ..train.state import ModelState
from .base import ModelBase


class Marrnet2Net(fnn.Module):
    """Encoder+decoder with input masking (marrnet2.py:88-111).

    ``silhou_thres`` masks depth/normal where silhou <= thres (0 at train;
    ShapeHD test sets 0.3*100, shapehd.py:171-173).
    """
    encode_dims: int = 200
    nf: int = 512
    vox_res: int = 128
    silhou_thres: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @fnn.compact
    def __call__(self, depth, normal, silhou, train: bool):
        is_fg = (silhou > self.silhou_thres).astype(depth.dtype)
        x = jnp.concatenate([depth * is_fg, normal * is_fg], axis=-1)
        z = ResNet18Encoder(self.encode_dims, dtype=self.dtype)(x, train)
        return VoxelDecoder(self.encode_dims, self.nf, self.vox_res,
                            dtype=self.dtype)(z, train)


class Model(ModelBase):
    requires = ["rgb", "depth", "normal", "silhou", "voxel"]
    input_names = ["depth", "normal", "silhou"]
    gt_names = ["voxel"]
    metrics = ["loss"]

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument(
            "--canon_sup", action="store_true",
            help="Use canonical-pose voxels as supervision")
        return parser, set()

    def __init__(self, opt, silhou_thres: float = 0.0):
        super().__init__(opt)
        self.voxel_key = "voxel_canon" if getattr(opt, "canon_sup", False) \
            else "voxel"
        self.requires = ["rgb", "depth", "normal", "silhou", self.voxel_key]
        self.gt_names = [self.voxel_key]
        self.net = Marrnet2Net(vox_res=opt.vox_res,
                               silhou_thres=silhou_thres, dtype=self.dtype)
        self.tx = self.adam()

    def init_state(self, rng: jax.Array) -> ModelState:
        s = self.opt.im_size
        dummy = (jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 3)),
                 jnp.zeros((1, s, s, 1)))
        variables = jax.jit(
            lambda r: self.net.init(r, *dummy, train=False))(rng)
        params = variables["params"]
        return ModelState(
            params={"net": params},
            batch_stats={"net": variables.get("batch_stats", {})},
            opt_state={"net": self.tx.init(params)},
            step=jnp.zeros((), jnp.int32),
        )

    def _forward(self, params, batch_stats, batch, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        args = (batch["depth"], batch["normal"], batch["silhou"])
        if train:
            pred, mutated = self.net.apply(variables, *args, train=True,
                                           mutable=["batch_stats"])
            return pred, mutated["batch_stats"]
        return self.net.apply(variables, *args, train=False), batch_stats

    def compute_loss(self, pred, batch) -> Tuple[jnp.ndarray, Dict]:
        loss = self.bce_with_logits(pred, batch[self.voxel_key])
        return loss, {"loss": loss}

    def _loss(self, params, batch_stats, batch, train):
        pred, new_stats = self._forward(params, batch_stats, batch, train)
        loss, loss_data = self.compute_loss(pred, batch)
        return loss, (loss_data, new_stats, pred)

    def train_step(self, state: ModelState, batch, rng):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, (loss_data, new_stats, _)), grads = grad_fn(
            state.params["net"], state.batch_stats["net"], batch, True)
        updates, new_opt = self.tx.update(
            grads, state.opt_state["net"], state.params["net"])
        new_params = optax.apply_updates(state.params["net"], updates)
        return state.replace(
            params={"net": new_params}, batch_stats={"net": new_stats},
            opt_state={"net": new_opt}, step=state.step + 1), loss_data

    def eval_step(self, state: ModelState, batch, rng):
        _, (loss_data, _, pred) = self._loss(
            state.params["net"], state.batch_stats["net"], batch, False)
        return loss_data, pred

    def pack_output(self, pred, batch, add_gt: bool = True):
        out = {"rgb_path": batch.get("rgb_path"),
               "pred_voxel": np.asarray(pred)}
        if add_gt and self.voxel_key in batch:
            out["gt_voxel"] = np.asarray(batch[self.voxel_key])
        return out
