"""Shared test-time machinery: checkpoint load, photo cropping, output dump.

Counterpart of the reference's per-model ``Model_test`` plumbing
(marrnet.py:130-163, shapehd.py:121-202, genre_full_model.py:146-233):
real photos are cropped around the mask bbox to look like renders
(in_size 480, pad 85, mask threshold 0.95), pushed through the jitted
predict path, then visualized + saved as .npz per batch.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict

import jax
import numpy as np

from ..core.checkpoint import load_checkpoint
from ..data import preprocess as pp
from ..train.state import reference_payload_to_state
from ..viz.visualizer import Visualizer

CROP_SILHOU_THRES = 0.95
CROP_IN_SIZE = 480
CROP_PAD = 85


def _fetch_np(a):
    """Device -> host, promoting bf16 to f32 (numpy/visualizer-safe)."""
    out = np.asarray(a)
    if out.dtype.name == "bfloat16":
        out = out.astype(np.float32)
    return out


class TestMixin:
    """Mixin over a Model providing the reference test-time contract."""

    def init_test(self, opt):
        self.output_dir = opt.output_dir
        self.visualizer = Visualizer(
            n_workers=getattr(opt, "vis_workers", 4),
            param_f=getattr(opt, "vis_param_f", None))
        self.state = None
        self._jit_predict = jax.jit(self.predict_step)

    def load_net_file(self, rng, net_file: str):
        state = self.init_state(rng)
        payload = load_checkpoint(net_file)
        self.state = reference_payload_to_state(payload, state)
        return self.state

    def preprocess_wrapper(self, in_dict: Dict) -> Dict:
        """Crop real photos by the mask bbox so framing matches renders
        (shapehd.py:150-163 / genre_full_model.py:159-173)."""
        im = in_dict["rgb"]
        mask = in_dict["silhou"]
        bbox = pp.get_bbox(mask, th=CROP_SILHOU_THRES)
        in_dict["rgb"] = pp.crop(im, bbox, CROP_IN_SIZE, CROP_PAD,
                                 pad_zero=False)
        if self.keep_silhou:
            in_dict["silhou"] = pp.crop(mask, bbox, CROP_IN_SIZE, CROP_PAD,
                                        pad_zero=False)
        else:
            del in_dict["silhou"]
        return self.preprocess(in_dict, mode="test")

    #: whether the cropped silhouette stays a network input (GenRe yes,
    #: MarrNet/ShapeHD no -- marrnet.py:152, genre_full_model.py:168-170)
    keep_silhou = False

    # subclasses supply predict_step(state, batch) via their Model base

    def test_on_batch(self, batch_i: int, batch: Dict) -> Dict:
        outdir = join(self.output_dir, f"batch{batch_i:04d}")
        os.makedirs(outdir, exist_ok=True)
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        pred = self._jit_predict(self.state, arrays)
        pred = jax.tree.map(_fetch_np, pred)
        output = self.pack_output(pred, batch, add_gt=False)
        self.visualizer.visualize(output, batch_i, outdir)
        from ..utils.io import npz_compatible
        np.savez(outdir + ".npz",
                 **{k: npz_compatible(v) for k, v in output.items()
                    if v is not None})
        return output
