"""Glob-pattern test dataset for real photos + masks.

Rebuild of /root/reference/datasets/test.py: each required modality gets a
``--input_<modality>`` glob; sorted filelists must be 1:1.  RGB loads in
color, masks load grayscale into the 'silhou' key, and the model's
``preprocess_wrapper`` (bbox crop + resize to render-like framing) runs on
each sample.
"""

from __future__ import annotations

from glob import glob
from typing import Dict, List

import cv2
import numpy as np

from . import preprocess as pp


class Dataset:
    @classmethod
    def add_arguments(cls, parser):
        return parser, set()

    def __init__(self, opt, mode: str = "test", model=None):
        assert model is not None, "test dataset is model-driven"
        required = list(model.requires)
        self.preproc = model.preprocess_wrapper

        type2files: Dict[str, List[str]] = {}
        for k in required:
            pattern = getattr(opt, "input_" + k)
            type2files[k] = sorted(glob(pattern))
        lengths = {len(v) for v in type2files.values()}
        assert len(lengths) == 1, \
            "filelists for different modalities must be 1:1"
        self.length = lengths.pop()
        self.samples = [
            {k + "_path": v[i] for k, v in type2files.items()}
            for i in range(self.length)
        ]

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        out: Dict = {}
        for k, v in self.samples[i].items():
            out[k] = v
            if k == "rgb_path":
                out["rgb"] = pp.imread_rgb(v)
            elif k == "mask_path":
                im = cv2.imread(v, cv2.IMREAD_GRAYSCALE)
                if im is None:
                    raise FileNotFoundError(v)
                out["silhou"] = im.astype(np.float64) / 255.0
            else:
                raise NotImplementedError(k)
        out = self.preproc(out)
        for k, v in out.items():
            if isinstance(v, np.ndarray) and v.dtype != np.float32:
                out[k] = v.astype(np.float32)
        return out
