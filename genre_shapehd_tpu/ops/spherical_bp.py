"""Spherical backprojection: spherical depth map -> voxel distance field.

TPU-native rebuild of the reference's SphericalBackProjection CUDA op
(/root/reference/toolbox/cam_bp/cam_bp/src/back_projection_kernel.cu:475-627):
each (lat, lon) pixel of a spherical depth map, together with its unit
direction from ``gen_sph_grid``, yields a 3D point ``glob = dir * depth``
that scatters its distance-to-voxel-centre into a res^3 grid (mean over
hits).  Unlike the camera variant the accumulator starts at 0 and no bias is
subtracted (kernel wrap passes dist_bias=0.0, kernel.cu:695), so unhit
voxels are exactly 0; the op also returns the hit-count grid, which callers
use as a mask (models/genre_full_model.py:139-141).

Gradients flow to the spherical depths only (directions are a constant
grid), matching the reference backward (kernel.cu:544-627) via autodiff.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .camera_bp import _scatter_mean_tdf
from .sph import gen_sph_grid


def spherical_backproject(
    sph_depth: jnp.ndarray,
    grid: jnp.ndarray | None = None,
    res: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backproject a spherical depth map into a res^3 distance field.

    Args:
      sph_depth: (N, R, R) spherical depth values; <0 marks discarded pixels
        (kernel.cu:501-503).
      grid: optional (R, R, 3) unit directions; defaults to
        ``gen_sph_grid(R)``.
    Returns:
      (tdf, cnt): (N, res, res, res) mean-distance field (0 where unhit) and
      hit counts.
    """
    n, rh, rw = sph_depth.shape
    if grid is None:
        grid = jnp.asarray(gen_sph_grid(rh), dtype=sph_depth.dtype)
    glob = grid[None] * sph_depth[..., None]              # (N, R, R, 3)
    glob = glob.reshape(n, rh * rw, 3)
    valid = (sph_depth >= 0.0).reshape(n, rh * rw)
    return _scatter_mean_tdf(glob, valid, res, background=0.0)


def backproject_spherical_masked(
    sph_full: jnp.ndarray,
    margin: int = 16,
    res: int = 128,
) -> jnp.ndarray:
    """The full GenRe consumption pattern of the op.

    Mirrors /root/reference/models/genre_full_model.py:134-143: crop the
    padding margin off the (N, H, W) spherical map, backproject
    ``1 - crop``, convert the distance field with ``(-df + 1/res) * res``
    and zero out voxels that received no hits (cnt-derived mask is detached
    in the reference; indices are non-differentiable here anyway).
    """
    h, w = sph_full.shape[1], sph_full.shape[2]
    crop = sph_full[:, margin:h - margin, margin:w - margin]
    proj_df, cnt = spherical_backproject(1.0 - crop, res=res)
    mask = jnp.clip(jax.lax.stop_gradient(cnt), 0.0, 1.0)
    proj_df = (-proj_df + 1.0 / res) * res
    return proj_df * mask
