"""MarrNet end-to-end finetune: frozen MarrNet-1 -> finetuned MarrNet-2.

TPU-native rebuild of /root/reference/models/marrnet.py: MarrNet-1 runs
under stop_gradient, its predicted silhouette thresholded at
``pred_silhou_thres * scale_25d`` masks the predicted depth/normal, which
feed the finetuned MarrNet-2 (marrnet.py:111-127); loss is BCE on voxels.
"""

from __future__ import annotations

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import load_checkpoint
from ..nn import UResNet
from ..train.state import ModelState
from .marrnet2 import Marrnet2Net, Model as Marrnet2Model
from .test_base import TestMixin


class MarrnetNet(fnn.Module):
    pred_silhou_thres: float = 30.0     # 0.3 * 100 (marrnet.py:33)
    vox_res: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.marrnet1 = UResNet(out_planes=(3, 1, 1),
                                layer_names=("normal", "depth", "silhou"),
                                pred_depth_minmax=True, dtype=self.dtype)
        self.marrnet2 = Marrnet2Net(vox_res=self.vox_res,
                                    silhou_thres=self.pred_silhou_thres,
                                    dtype=self.dtype)

    def __call__(self, rgb, train: bool):
        pred = self.marrnet1(rgb, train=False)            # frozen, eval mode
        pred = jax.tree.map(jax.lax.stop_gradient, pred)
        vox = self.marrnet2(pred["depth"], pred["normal"], pred["silhou"],
                            train=train)
        return {**pred, "voxel": vox}


class Model(Marrnet2Model):
    requires = ["rgb", "voxel"]
    input_names = ["rgb"]
    metrics = ["loss"]

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument("--canon_sup", action="store_true",
                            help="use canonical-pose voxel supervision")
        parser.add_argument("--marrnet1", type=str, default=None,
                            help="pretrained MarrNet-1 checkpoint")
        parser.add_argument("--marrnet2", type=str, default=None,
                            help="pretrained MarrNet-2 checkpoint to finetune")
        return parser, set()

    def __init__(self, opt):
        super().__init__(opt)
        self.requires = ["rgb", self.voxel_key]
        self.gt_names = [self.voxel_key]
        self.net = MarrnetNet(
            pred_silhou_thres=self.pred_silhou_thres * self.scale_25d,
            vox_res=opt.vox_res, dtype=self.dtype)
        self.tx = self.adam()

    def init_state(self, rng):
        s = self.opt.im_size
        variables = jax.jit(lambda r: self.net.init(
            r, jnp.zeros((1, s, s, 3)), train=False))(rng)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        # load pretrained subnets (marrnet.py:96-103)
        if getattr(self.opt, "marrnet1", None):
            payload = load_checkpoint(self.opt.marrnet1)
            params = dict(params); params["marrnet1"] = \
                payload["nets"][0]["params"]
            stats = dict(stats)
            stats["marrnet1"] = payload["nets"][0].get("batch_stats", {})
        if getattr(self.opt, "marrnet2", None):
            payload = load_checkpoint(self.opt.marrnet2)
            params = dict(params); params["marrnet2"] = \
                payload["nets"][0]["params"]
            stats = dict(stats)
            stats["marrnet2"] = payload["nets"][0].get("batch_stats", {})
        return ModelState(
            params={"net": params}, batch_stats={"net": stats},
            opt_state={"net": self.tx.init(params)},
            step=jnp.zeros((), jnp.int32))

    def _forward(self, params, batch_stats, batch, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            pred, mut = self.net.apply(variables, batch["rgb"], train=True,
                                       mutable=["batch_stats"])
            return pred, mut["batch_stats"]
        return self.net.apply(variables, batch["rgb"], train=False), \
            batch_stats

    def compute_loss(self, pred, batch):
        loss = self.bce_with_logits(pred["voxel"].astype(jnp.float32),
                                    batch[self.voxel_key])
        return loss, {"loss": loss}

    def _loss(self, params, batch_stats, batch, train):
        pred, new_stats = self._forward(params, batch_stats, batch, train)
        loss, loss_data = self.compute_loss(pred, batch)
        return loss, (loss_data, new_stats, pred)

    def train_step(self, state, batch, rng):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, (loss_data, new_stats, _)), grads = grad_fn(
            state.params["net"], state.batch_stats["net"], batch, True)
        updates, new_opt = self.tx.update(
            grads, state.opt_state["net"], state.params["net"])
        new_params = optax.apply_updates(state.params["net"], updates)
        return state.replace(
            params={"net": new_params}, batch_stats={"net": new_stats},
            opt_state={"net": new_opt}, step=state.step + 1), loss_data

    def eval_step(self, state, batch, rng):
        _, (loss_data, _, pred) = self._loss(
            state.params["net"], state.batch_stats["net"], batch, False)
        return loss_data, pred

    def predict_step(self, state, batch):
        pred, _ = self._forward(state.params["net"],
                                state.batch_stats["net"], batch, False)
        return pred

    def pack_output(self, pred, batch, add_gt=True):
        """marrnet.py:49-69."""
        from ..data import preprocess as pp
        out = {"rgb_path": batch.get("rgb_path")}
        if "rgb" in batch:
            out["rgb"] = pp.denormalize_colors(np.asarray(batch["rgb"]))
        silhou = np.clip(np.asarray(pred["silhou"]) / self.scale_25d, 0, 1)
        out["pred_silhou"] = silhou
        out["pred_normal"] = np.asarray(self.postprocess(
            jnp.asarray(pred["normal"]), bg=1.0, input_mask=jnp.asarray(silhou)))
        out["pred_depth"] = np.asarray(self.postprocess(
            jnp.asarray(pred["depth"]), bg=0.0, input_mask=jnp.asarray(silhou)))
        out["pred_voxel"] = np.asarray(pred["voxel"])
        if add_gt and self.voxel_key in batch:
            out["gt_voxel"] = np.asarray(batch[self.voxel_key])
        return out


class ModelTest(TestMixin, Model):
    """Photo -> voxel inference (marrnet.py:130-163)."""
    keep_silhou = False

    def __init__(self, opt):
        Model.__init__(self, opt)
        self.requires = ["rgb", "mask"]
        self.init_test(opt)
        self.load_net_file(jax.random.PRNGKey(0), opt.net_file)
