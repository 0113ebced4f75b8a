"""Test-time spherical rendering from predicted depth.

Counterpart of /root/reference/util/util_sph.py, which goes
depth -> CPU TDF -> marching cubes -> trimesh ray cast (pyembree) at test
time.  TPU-native design: the same differentiable path used in training
(camera backprojection + first-hit expected-depth rendering) runs on
device -- the separate non-differentiable CPU pipeline disappears.  The
mesh-based helpers (``make_sgrid``, ray-cast vertex sampling) are kept for
evaluation tooling.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .. import ops


def make_sgrid(b: int) -> np.ndarray:
    """(4b^2, 3) unit sphere directions (util_sph.py:21-34); equals the
    flattened ops.gen_sph_grid(2b)."""
    return ops.gen_sph_grid(2 * b).reshape(-1, 3)


def render_spherical_from_depth(pack: Dict, silhou: np.ndarray,
                                sph_res: int = 128, z_res: int = 256,
                                vox_res: int = 128) -> np.ndarray:
    """Predicted depth pack -> spherical depth image (util_sph.py:36-57).

    Args:
      pack: {'depth': (1, H, W, 1) or (H, W) relative depth in [0,1],
             'depth_minmax': (2,) or (1, 2)}.
      silhou: (H, W) soft mask in [0, 1].
    Returns:
      (sph_res, sph_res) spherical depth, background 1 (matching the
      reference's all-ones fallback/clamp, util_sph.py:53-56).
    """
    depth = np.asarray(pack["depth"], dtype=np.float32)
    depth = depth.reshape(depth.shape[-3], depth.shape[-2]) \
        if depth.ndim >= 3 else depth
    minmax = np.asarray(pack["depth_minmax"], dtype=np.float32).reshape(-1)

    gt_sil = (np.asarray(silhou) > 0.95).astype(np.float32)
    depth = depth * gt_sil

    # relative -> absolute (same min-max denorm the models use)
    dmin, dmax = float(minmax[0]), float(minmax[1])
    abs_depth = (1.0 - depth) * (dmax - dmin + 1e-4) + dmin
    abs_depth = np.where(gt_sil > 0, abs_depth, 0.0)

    d = jnp.asarray(abs_depth)[None]
    d = ops.coords.depth_image_to_cambp_frame(d)
    proj = ops.camera_backproject_shifted(d, ops.FL_GENRE, ops.CAM_DIST,
                                          vox_res)
    sph = ops.render_spherical(jnp.clip(proj * 50.0, 1e-5, 1.0 - 1e-5),
                               sph_res, z_res)
    return np.minimum(np.asarray(sph)[0], 1.0)
