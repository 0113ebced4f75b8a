"""ShapeHD: finetune MarrNet-2 with a frozen WGAN-GP critic as shape prior.

TPU-native rebuild of /root/reference/models/shapehd.py: one jitted step
runs the finetuned marrnet2, the frozen un-finetuned copy (for comparison
outputs), and the frozen discriminator;
``loss = BCE(pred, gt) - w_gan_loss * mean(D(sigmoid(pred)))`` with
gradients flowing only into the finetuned marrnet2 (shapehd.py:67-79,
104-110 -- frozen-ness is `stop_gradient` + only optimizing that subtree,
instead of requires_grad flags).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import load_checkpoint
from ..nn import UResNet, VoxelDiscriminator
from ..train.state import ModelState
from .marrnet2 import Model as Marrnet2Model
from .test_base import TestMixin


class Model(Marrnet2Model):
    metrics = ["loss", "sup", "gan"]

    @classmethod
    def add_arguments(cls, parser):
        parser.add_argument("--canon_sup", action="store_true",
                            help="use canonical-pose voxel supervision")
        parser.add_argument("--marrnet2", type=str, default=None,
                            help="pretrained MarrNet-2 checkpoint to finetune")
        parser.add_argument("--gan", type=str, default=None,
                            help="pretrained WGAN-GP checkpoint")
        parser.add_argument("--w_gan_loss", type=float, default=0.0,
                            help="perceptual (critic) loss weight")
        return parser, set()

    def __init__(self, opt, silhou_thres: float = 0.0):
        super().__init__(opt, silhou_thres=silhou_thres)
        assert getattr(opt, "canon_sup", False), \
            "ShapeHD uses canonical-pose voxels (shapehd.py:39)"
        assert getattr(opt, "w_gan_loss", 0.0) >= 0
        self.w_gan_loss = float(opt.w_gan_loss)
        self.net_d = VoxelDiscriminator(nf=64, res=opt.vox_res,
                                        dtype=self.dtype)
        # self.net (marrnet2, finetuned) built by super

    @property
    def net_names(self):
        return ["net", "net_noft", "net_d"]

    def init_state(self, rng):
        base = super().init_state(rng)   # params/opt for finetuned marrnet2
        rng_d = jax.random.fold_in(rng, 1)
        dv = self.net_d.init(
            rng_d, jnp.zeros((1,) + (self.opt.vox_res,) * 3))
        params = dict(base.params)
        stats = dict(base.batch_stats)
        if getattr(self.opt, "marrnet2", None):
            payload = load_checkpoint(self.opt.marrnet2)
            params["net"] = payload["nets"][0]["params"]
            stats["net"] = payload["nets"][0].get("batch_stats", {})
        # REAL copies, not aliases: the trainer donates the state buffers,
        # and donating the same underlying buffer for two pytree slots is
        # an XLA InvalidArgument on TPU
        params["net_noft"] = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                          params["net"])
        stats["net_noft"] = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                         stats["net"])
        if getattr(self.opt, "gan", None):
            payload = load_checkpoint(self.opt.gan)
            # wgangp payload: nets[0]=G, nets[1]=D (wgangp.py:103)
            params["net_d"] = payload["nets"][1]["params"]
        else:
            params["net_d"] = dv["params"]
        stats["net_d"] = {}
        return ModelState(
            params=params, batch_stats=stats,
            opt_state={"net": self.tx.init(params["net"])},
            step=jnp.zeros((), jnp.int32))

    # ----------------------------------------------------------------- step
    def _forward_all(self, params, batch_stats, batch, train):
        args = (batch["depth"], batch["normal"], batch["silhou"])
        pred: Dict[str, jnp.ndarray] = {}
        if train:
            vox, mut = self.net.apply(
                {"params": params["net"], "batch_stats": batch_stats["net"]},
                *args, train=True, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            vox = self.net.apply(
                {"params": params["net"], "batch_stats": batch_stats["net"]},
                *args, train=False)
            new_stats = batch_stats["net"]
        pred["voxel"] = vox
        # frozen copies run in eval mode
        pred["voxel_noft"] = jax.lax.stop_gradient(self.net.apply(
            {"params": params["net_noft"],
             "batch_stats": batch_stats["net_noft"]}, *args, train=False))
        d_params = jax.lax.stop_gradient(params["net_d"])
        pred["is_real"] = self.net_d.apply(
            {"params": d_params},
            jax.nn.sigmoid(vox.astype(jnp.float32)))
        # realism of the frozen net's output, for finetune diagnostics; the
        # training loss never reads it, so XLA prunes it from the train step
        pred["is_real_noft"] = self.net_d.apply(
            {"params": d_params},
            jax.nn.sigmoid(pred["voxel_noft"].astype(jnp.float32)))
        return pred, new_stats

    def compute_loss(self, pred, batch) -> Tuple[jnp.ndarray, Dict]:
        loss_sup = self.bce_with_logits(pred["voxel"].astype(jnp.float32),
                                        batch[self.voxel_key])
        loss_gan = -jnp.mean(pred["is_real"]) * self.w_gan_loss
        loss = loss_sup + loss_gan
        return loss, {"loss": loss, "sup": loss_sup, "gan": loss_gan}

    def _loss(self, net_params, state, batch, train):
        params = dict(state.params); params["net"] = net_params
        pred, new_stats = self._forward_all(params, state.batch_stats,
                                            batch, train)
        loss, loss_data = self.compute_loss(pred, batch)
        return loss, (loss_data, new_stats, pred)

    def train_step(self, state, batch, rng):
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (_, (loss_data, new_stats, _)), grads = grad_fn(
            state.params["net"], state, batch, True)
        updates, new_opt = self.tx.update(
            grads, state.opt_state["net"], state.params["net"])
        new_params = dict(state.params)
        new_params["net"] = optax.apply_updates(state.params["net"], updates)
        stats = dict(state.batch_stats); stats["net"] = new_stats
        return state.replace(params=new_params, batch_stats=stats,
                             opt_state={"net": new_opt},
                             step=state.step + 1), loss_data

    def eval_step(self, state, batch, rng):
        _, (loss_data, _, pred) = self._loss(
            state.params["net"], state, batch, False)
        return loss_data, pred

    def pack_output(self, pred, batch, add_gt=True):
        out = {"rgb_path": batch.get("rgb_path"),
               "pred_voxel": np.asarray(pred["voxel"]),
               "pred_voxel_noft": np.asarray(pred["voxel_noft"])}
        if add_gt and self.voxel_key in batch:
            out["gt_voxel"] = np.asarray(batch[self.voxel_key])
        return out


class ModelTest(TestMixin, Model):
    """Photo -> 2.5D (MarrNet-1) -> voxel (GAN-tuned MarrNet-2),
    shapehd.py:121-202."""
    keep_silhou = False

    def __init__(self, opt):
        opt.canon_sup = True         # dummy, net init only (shapehd.py:133)
        Model.__init__(self, opt,
                       silhou_thres=self.pred_silhou_thres * self.scale_25d)
        self.requires = ["rgb", "mask"]
        self.marrnet1 = UResNet(out_planes=(3, 1, 1),
                                layer_names=("normal", "depth", "silhou"),
                                pred_depth_minmax=True, dtype=self.dtype)
        self.init_test(opt)
        self.load_net_file(jax.random.PRNGKey(0), opt.net_file)
        # MarrNet-1 loaded separately (shapehd.py:141-144)
        payload = load_checkpoint(opt.marrnet1_file)
        m1rng = jax.random.fold_in(jax.random.PRNGKey(0), 7)
        s = self.opt.im_size
        m1v = self.marrnet1.init(m1rng, jnp.zeros((1, s, s, 3)), train=False)
        self._m1_vars = {
            "params": payload["nets"][0]["params"],
            "batch_stats": payload["nets"][0].get(
                "batch_stats", m1v.get("batch_stats", {})),
        }

    def predict_step(self, state, batch):
        pred1 = self.marrnet1.apply(self._m1_vars, batch["rgb"], train=False)
        batch2 = {"depth": pred1["depth"], "normal": pred1["normal"],
                  "silhou": pred1["silhou"]}
        pred2, _ = self._forward_all(state.params, state.batch_stats,
                                     batch2, False)
        return {**pred1, **pred2}

    def pack_output(self, pred, batch, add_gt=True):
        """shapehd.py:181-202."""
        from ..data import preprocess as pp
        out = {"rgb_path": batch.get("rgb_path")}
        if "rgb" in batch:
            out["rgb"] = pp.denormalize_colors(np.asarray(batch["rgb"]))
        silhou = np.clip(np.asarray(pred["silhou"]) / self.scale_25d, 0, 1)
        out["pred_silhou"] = silhou
        out["pred_normal"] = np.asarray(self.postprocess(
            jnp.asarray(pred["normal"]), bg=1.0,
            input_mask=jnp.asarray(silhou)))
        out["pred_depth"] = np.asarray(self.postprocess(
            jnp.asarray(pred["depth"]), bg=0.0,
            input_mask=jnp.asarray(silhou)))
        out["pred_voxel"] = np.asarray(pred["voxel"])
        out["pred_voxel_noft"] = np.asarray(pred["voxel_noft"])
        return out
