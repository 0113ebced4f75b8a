"""Synthetic dataset: deterministic random samples shaped by model.requires.

Serves the role of the reference's bundled test fixtures for smoke tests,
CI and benchmarking -- every modality a model can request is generated
at the configured resolutions, deterministically per index.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


class Dataset:
    @classmethod
    def add_arguments(cls, parser):
        return parser, set()

    def __init__(self, opt, mode: str = "train", model=None):
        self.mode = mode
        self.opt = opt
        self.requires = list(model.requires) if model is not None \
            else ["rgb", "depth", "silhou", "normal"]
        self.preprocess = getattr(model, "preprocess", None)
        self.im_size = getattr(opt, "im_size", 256)
        self.vox_res = getattr(opt, "vox_res", 128)
        self.sph_res = getattr(opt, "sph_res", 128)
        self.margin = getattr(opt, "padding_margin", 16)
        self.length = getattr(opt, "synthetic_length", 64)
        # samples are deterministic per (index, mode); memoize them so the
        # per-item model.preprocess (the dominant host cost at full res)
        # runs once, not once per epoch
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if i in self._cache:
            return dict(self._cache[i])
        sample = self._generate(i)
        self._cache[i] = sample
        return dict(sample)

    def _generate(self, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(i + (10_000 if self.mode != "train" else 0))
        s, v = self.im_size, self.vox_res
        sample: Dict[str, np.ndarray] = {}
        silhou = np.zeros((s, s), np.float64)
        a, b = s // 4, 3 * s // 4
        silhou[a:b, a:b] = 1.0
        for key in self.requires:
            if key == "rgb":
                sample["rgb"] = rng.random((s, s, 3))
            elif key == "depth":
                d = np.zeros((s, s), np.float64)
                d[a:b, a:b] = 0.3 + 0.4 * rng.random((b - a, b - a))
                sample["depth"] = d
            elif key == "silhou" or key == "mask":
                sample[key] = silhou.copy()
            elif key == "normal":
                n = rng.random((s, s, 3))
                sample["normal"] = n
            elif key == "depth_minmax":
                lo = 2.0 + 0.2 * rng.random()
                sample["depth_minmax"] = np.array([lo, lo + 0.4])
            elif key in ("voxel", "voxel_canon"):
                g = rng.random((v, v, v))
                sample[key] = (g > 0.97).astype(np.float64)
            elif key == "spherical":
                r = self.sph_res
                sample["spherical_object"] = 0.5 + 0.3 * rng.random((1, r, r))
                sample["spherical_depth"] = 0.5 + 0.3 * rng.random((1, r, r))
            else:
                raise KeyError(f"synthetic dataset cannot fake '{key}'")
        if self.preprocess is not None:
            sample = self.preprocess(sample, mode=self.mode)
        sample["rgb_path"] = f"synthetic://{self.mode}/{i}"
        return sample
