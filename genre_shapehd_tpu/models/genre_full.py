"""GenRe full model: spherical inpainting + voxel refinement.

TPU-native rebuild of /root/reference/models/genre_full_model.py.  Extends
the stage-2 net with the spherical backprojection and the 3D U-Net
refinement, all inside one jitted step:

  pred full sph map --crop margin, spherical backprojection, hit-count
  mask, (-df + 1/res)*res--> projected df   (genre_full_model.py:134-143)
  cat(proj_sph_df, clamp(proj_depth/50)) --UNet3D--> voxel logits

Loss: BCE-with-logits on (surface-extracted) GT voxels plus
``surface_weight`` * BCE(sigmoid(pred)*gt, gt)  (genre_full_model.py:59-72).
GT preprocessing transposes/flips into the train frame and extracts the
2-iteration-erosion surface shell (genre_full_model.py:86-97).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..nn import UNet3D
from ..train.state import ModelState
from .depth_inpaint import DepthInpaintNet, Model as DepthInpaintModel
from .test_base import TestMixin


class GenreNet(fnn.Module):
    im_size: int = 256
    vox_res: int = 128
    sph_res: int = 128
    z_res: int = 256
    padding_margin: int = 16
    joint_train: bool = False
    load_offline: bool = False
    exact_render: bool = False
    gt_depth_input: bool = False
    #: oracle-ceiling decomposition mode: bypass the inpainting net and
    #: backproject the GT full spherical map directly, isolating
    #: spherical-bp + refine (the last two stages of
    #: genre_full_model.py:134-143)
    gt_sph_full: bool = False
    gt_minmax_input: bool = False
    net1_width: float = 1.0
    net1_head_dtype: jnp.dtype = None
    refine_nf: int = 20
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.depth_and_inpaint = DepthInpaintNet(
            im_size=self.im_size, vox_res=self.vox_res, sph_res=self.sph_res,
            z_res=self.z_res, padding_margin=self.padding_margin,
            joint_train=self.joint_train, load_offline=self.load_offline,
            exact_render=self.exact_render,
            gt_depth_input=self.gt_depth_input,
            gt_minmax_input=self.gt_minmax_input,
            net1_width=self.net1_width,
            net1_head_dtype=self.net1_head_dtype, dtype=self.dtype)
        self.refine_net = UNet3D(nf=self.refine_nf, res=self.vox_res,
                                 dtype=self.dtype)

    def backproject_spherical(self, sph):
        """(N, H, W, 1) full map -> (N, res^3) masked proj df
        (genre_full_model.py:134-143)."""
        return ops.backproject_spherical_masked(
            sph[..., 0].astype(jnp.float32), self.padding_margin,
            self.vox_res)

    def __call__(self, rgb, silhou, train: bool, spherical_depth=None,
                 gt_depth=None, gt_minmax=None, gt_sph=None):
        out1 = self.depth_and_inpaint(rgb, silhou, train=train,
                                      spherical_depth=spherical_depth,
                                      gt_depth=gt_depth, gt_minmax=gt_minmax)
        if not self.joint_train:
            out1 = jax.tree.map(jax.lax.stop_gradient, out1)
        if self.gt_sph_full and gt_sph is not None:
            # decomposition oracle: the refine net consumes the GT full
            # spherical map (already padded by preprocess), not net2's
            out1 = dict(out1)
            out1["pred_sph_full"] = jax.lax.stop_gradient(gt_sph)
        proj_depth = out1["proj_depth"]
        pred_proj_sph = self.backproject_spherical(out1["pred_sph_full"])
        proj_depth = jnp.clip(proj_depth / 50.0, 1e-5, 1.0 - 1e-5)
        refine_in = jnp.stack([pred_proj_sph, proj_depth], axis=-1)
        # on a (dp, sp) mesh, partition the voxel Z axis across sp so the
        # 3D U-Net runs spatially sharded (GSPMD inserts conv halos)
        from ..parallel.mesh import maybe_shard_spatial
        refine_in = maybe_shard_spatial(refine_in, axis=3)
        pred_voxel = self.refine_net(refine_in.astype(self.dtype), train)
        out1["pred_proj_depth"] = proj_depth
        out1["pred_voxel"] = pred_voxel
        out1["pred_proj_sph_full"] = pred_proj_sph
        return out1


class Model(DepthInpaintModel):
    @classmethod
    def add_arguments(cls, parser):
        parser, unique = DepthInpaintModel.add_arguments(parser)
        parser.add_argument("--inpaint_path", default=None, type=str,
                            help="pretrained inpainting module checkpoint")
        parser.add_argument("--gt_sph_full", action="store_true",
                            help="oracle-ceiling decomposition: bypass the "
                                 "inpainting net, backproject the GT full "
                                 "spherical map (isolates sph-bp + refine)")
        parser.add_argument("--surface_weight", default=1.0, type=float,
                            help="weight for voxel surface prediction")
        parser.add_argument("--joint_w25d", default=0.01, type=float,
                            help="weight on the 2.5D+spherical supervision "
                                 "under --joint_train (the per-component "
                                 "metrics stay unscaled; only the summed "
                                 "training loss is weighted). The raw 2.5D "
                                 "losses are scale_25d^2-sized (~300) vs a "
                                 "~0.05 voxel BCE; the default 0.01 is the "
                                 "working balance from the committed joint "
                                 "fine-tune run (QUALRUN_FULL_r04d) that "
                                 "lets voxel gradients reach net1 "
                                 "(tests/test_joint_finetune.py)")
        return parser, unique | {"surface_weight", "joint_train",
                                 "inpaint_path", "joint_w25d"}

    def __init__(self, opt):
        super().__init__(opt)
        if self.joint_train:
            self.requires = self.requires + ["voxel"]
        else:
            self.requires = ["rgb", "silhou", "voxel"]
            if self.gt_depth_input:
                self.requires = self.requires + ["depth", "depth_minmax"]
            if self.gt_minmax_input \
                    and "depth_minmax" not in self.requires:
                self.requires = self.requires + ["depth_minmax"]
            if getattr(opt, "load_offline", False) \
                    or getattr(opt, "gt_sph_full", False):
                # decomposition oracles need the GT spherical maps in-batch
                self.requires = self.requires + ["spherical"]
        self.gt_names = self.gt_names + ["voxel"]
        self.metrics = self.metrics + ["voxel_loss", "surface_loss"]
        self.surface_weight = float(getattr(opt, "surface_weight", 1.0))
        self.joint_w25d = float(getattr(opt, "joint_w25d", 1.0))
        self.net = GenreNet(
            im_size=opt.im_size, vox_res=opt.vox_res, sph_res=opt.sph_res,
            z_res=opt.z_res, padding_margin=opt.padding_margin,
            joint_train=self.joint_train,
            load_offline=bool(getattr(opt, "load_offline", False)),
            exact_render=bool(getattr(opt, "exact_render", False)),
            gt_depth_input=self.gt_depth_input,
            gt_sph_full=bool(getattr(opt, "gt_sph_full", False)),
            gt_minmax_input=self.gt_minmax_input,
            net1_width=float(getattr(opt, "decoder_width", 1.0)),
            net1_head_dtype=(jnp.float32
                             if getattr(opt, "f32_heads", False) else None),
            dtype=self.dtype)
        self.tx = self.adam()

    def init_state(self, rng):
        s = self.opt.im_size
        rgb = jnp.zeros((1, s, s, 3))
        sil = jnp.zeros((1, s, s, 1))
        variables = jax.jit(
            lambda r: self.net.init(r, rgb, sil, train=False))(rng)
        params = variables["params"]
        state = ModelState(
            params={"net": params},
            batch_stats={"net": variables.get("batch_stats", {})},
            opt_state={"net": self.tx.init(params)},
            step=jnp.zeros((), jnp.int32),
        )
        if getattr(self.opt, "inpaint_path", None):
            state = self.load_subnet(state, "depth_and_inpaint",
                                     self.opt.inpaint_path)
        return state

    def compute_loss(self, pred, batch) -> Tuple[jnp.ndarray, Dict]:
        loss, loss_data = (DepthInpaintModel.compute_loss(self, pred, batch)
                           if self.joint_train else (0.0, {}))
        loss = loss * self.joint_w25d
        # surface-shell GT derived IN-GRAPH (reduce_window erosion, ~ms on
        # TPU) instead of per-sample scipy erosion on the host, which
        # dominated data time (~0.4s/sample at 128^3); numerically equal to
        # the reference's preprocessing (tested vs scipy in
        # tests/test_ops_voxel_coords.py)
        gt = ops.voxel.surface_from_solid_jax(batch["voxel"])
        logits = pred["pred_voxel"].astype(jnp.float32)
        voxel_loss = self.bce_with_logits(logits, gt)
        sig = jnp.clip(jax.nn.sigmoid(logits) * gt, 1e-7, 1.0 - 1e-7)
        # BCE(sig*gt, gt): nonzero only where gt==1 -> -log(sigmoid)
        surface_loss = -jnp.mean(
            gt * jnp.log(sig) + (1.0 - gt) * jnp.log1p(-sig))
        loss = loss + voxel_loss + surface_loss * self.surface_weight
        loss_data["voxel_loss"] = voxel_loss
        loss_data["surface_loss"] = surface_loss * self.surface_weight
        loss_data["loss"] = loss
        return loss, loss_data

    def preprocess(self, data, mode="train"):
        """GT voxel -> train frame (genre_full_model.py:90-92); the surface
        shell (erosion subtraction, :93-95) is derived in-graph by
        compute_loss.  Voxel arrays arrive (X, Y, Z) and stay channel-free."""
        out = super().preprocess(data, mode)
        if "voxel" in out:
            val = np.asarray(out["voxel"], dtype=np.float32)
            if val.ndim == 4:
                val = val[0]
            val = np.transpose(val, (0, 2, 1))
            out["voxel"] = np.ascontiguousarray(np.flip(val, 2))
        return out

    def pack_output(self, pred, batch, add_gt=True):
        pack = {}
        if self.joint_train:
            pack = DepthInpaintModel.pack_output(self, pred, batch,
                                                 add_gt=add_gt)
        pack["pred_voxel"] = np.asarray(pred["pred_voxel"])
        pack["pred_proj_depth"] = np.asarray(pred["pred_proj_depth"])
        pack["pred_proj_sph_full"] = np.asarray(pred["pred_proj_sph_full"])
        pack["rgb_path"] = batch.get("rgb_path")
        if add_gt and "voxel" in batch:
            pack["gt_voxel"] = np.asarray(batch["voxel"])
        return pack

    def predict_step(self, state, batch):
        variables = {"params": state.params["net"],
                     "batch_stats": state.batch_stats["net"]}
        pred = self.net.apply(variables, batch["rgb"], batch["silhou"],
                              train=False)
        # return the voxel prediction to the dataset's original orientation
        # (the training GT was mapped by gt_voxel_to_train_frame; the
        # reference's test path achieves the same via its trimesh-frame
        # flips, genre_full_model.py:231)
        pred["pred_voxel_canonical"] = ops.coords.train_frame_to_gt_voxel(
            pred["pred_voxel"])
        return pred


class ModelTest(TestMixin, Model):
    """Photo -> full GenRe reconstruction (genre_full_model.py:146-233).

    Design deviation from the reference: the reference's test path swaps
    the differentiable renderer for a CPU trimesh ray-cast + compensating
    axis flips (forward_with_trimesh).  Here the differentiable renderer
    (identical to training) runs at test time too, so no frame fixups are
    needed and the whole path stays on-device.
    """
    keep_silhou = True               # silhouette is a network input

    def __init__(self, opt):
        Model.__init__(self, opt)
        self.requires = ["rgb", "mask"]
        self.input_names = ["rgb", "silhou"]
        self.init_test(opt)
        self.load_net_file(jax.random.PRNGKey(0), opt.net_file)
