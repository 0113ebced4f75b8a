"""Camera backprojection: depth image -> truncated distance field (TDF).

TPU-native rebuild of the reference's cam_bp CUDA extension
(/root/reference/toolbox/cam_bp/cam_bp/src/back_projection_kernel.cu:200-306,
~1,100 lines of CUDA/C/cffi with a hand-derived backward).  Re-designed as a
scatter-mean over flattened voxel indices: XLA lowers the ``.at[].add`` to a
single TPU scatter, and autodiff supplies the backward (the CUDA backward is
the hand-written adjoint of exactly this composition; discrete voxel indices
get zero gradient in both).

Geometry (kernel.cu:231-266):
  * pixel (h, w) of an H x W ray-depth map, principal point at the centre:
      imind_h = h - (H-1)/2,  imind_w = w - (W-1)/2
  * ray depth -> plane depth: d = depth * fl / sqrt(imind_h^2+imind_w^2+fl^2)
  * global coords (camera on +x axis at distance cam_dist, looking at origin):
      glob_x = d - cam_dist, glob_y = -d*imind_w/fl, glob_z = -d*imind_h/fl
  * voxel index: floor((glob + 0.5) * res); the point scatters the distance
    to that voxel's centre and a hit count.
  * normalize: hit voxels -> mean distance, unhit voxels -> 1/res background
    (the reference seeds the accumulator with 1/res and subtracts a
    dist_bias/res inside inplace_safe_divide -- same result).

Pixels with depth < 0 are discarded (kernel.cu:225-227); zero-depth
background pixels land outside the cube and are dropped by bounds checks.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]

#: focal length (pixels, for 256 x 256 crops) used by the MarrNet family,
#: /root/reference/models/marrnetbase.py:163
FL_MARRNET = 784.4645406
#: focal length used by the GenRe pipeline via the toolbox module default,
#: /root/reference/toolbox/cam_bp/cam_bp/modules/camera_backprojection_module.py:13
FL_GENRE = 418.3
#: camera distance from the object centre (both pipelines)
CAM_DIST = 2.2


def _scatter_mean_tdf(
    glob: jnp.ndarray,      # (N, P, 3) global coordinates
    valid: jnp.ndarray,     # (N, P) bool
    res: int,
    background: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter distance-to-voxel-centre means onto a res^3 grid.

    Returns (tdf, cnt), each (N, res, res, res); unhit voxels take
    ``background`` in tdf and 0 in cnt.
    """
    n, p, _ = glob.shape
    vox_idx = jnp.floor((glob + 0.5) * res).astype(jnp.int32)   # (N, P, 3)
    inb = jnp.all((vox_idx >= 0) & (vox_idx < res), axis=-1)
    valid = valid & inb

    centre = (vox_idx.astype(glob.dtype) + 0.5) / res - 0.5
    dist = jnp.sqrt(jnp.sum((glob - centre) ** 2, axis=-1) + 1e-20)  # (N, P)

    flat = (vox_idx[..., 0] * res + vox_idx[..., 1]) * res + vox_idx[..., 2]
    # invalid points -> out-of-range index, dropped by scatter mode="drop"
    flat = jnp.where(valid, flat, res ** 3)

    zeros = jnp.zeros((n, res ** 3), dtype=glob.dtype)
    sums = zeros.at[jnp.arange(n)[:, None], flat].add(
        jnp.where(valid, dist, 0.0), mode="drop")
    cnt = zeros.at[jnp.arange(n)[:, None], flat].add(
        valid.astype(glob.dtype), mode="drop")

    eps = 1e-5  # kernel.cu:32 (EPS), used by inplace_safe_divide:299
    tdf = jnp.where(cnt > eps, sums / jnp.maximum(cnt, 1.0), background)
    shape = (n, res, res, res)
    return tdf.reshape(shape), cnt.reshape(shape)


def camera_backproject(
    depth: jnp.ndarray,
    fl: Scalar = FL_GENRE,
    cam_dist: Scalar = CAM_DIST,
    res: int = 128,
) -> jnp.ndarray:
    """Backproject a ray-depth image into a res^3 TDF.

    Args:
      depth: (N, H, W) absolute ray depth; <0 marks discarded pixels,
        0 (background) self-eliminates via the bounds check.
      fl: focal length in pixels -- float or (N,) array.
      cam_dist: camera distance -- float or (N,) array.
    Returns:
      (N, res, res, res) TDF: mean point-to-voxel-centre distance for hit
      voxels, 1/res elsewhere.
    """
    n, h, w = depth.shape
    dt = depth.dtype
    fl_b = jnp.broadcast_to(jnp.asarray(fl, dt), (n,))
    cd_b = jnp.broadcast_to(jnp.asarray(cam_dist, dt), (n,))
    glob = _camera_glob_coords(depth, fl_b, cd_b)
    valid = (depth >= 0.0).reshape(n, h * w)
    tdf, _ = _scatter_mean_tdf(glob, valid, res, background=1.0 / res)
    return tdf


def shift_tdf(tdf: jnp.ndarray, res: int = 128) -> jnp.ndarray:
    """1 - res * tdf (distance field -> proximity), marrnetbase.py:176-179."""
    return 1.0 - res * tdf


def camera_backproject_shifted(
    depth: jnp.ndarray,
    fl: Scalar = FL_GENRE,
    cam_dist: Scalar = CAM_DIST,
    res: int = 128,
) -> jnp.ndarray:
    """Backproject + shift, mirroring the toolbox layer's default
    (camera_backprojection_module.py:16-24, shift=True)."""
    return shift_tdf(camera_backproject(depth, fl, cam_dist, res), res)


def get_surface_mask(
    depth: jnp.ndarray,
    fl: Scalar = FL_GENRE,
    cam_dist: Scalar = CAM_DIST,
    res: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Visibility / free-space mask from a depth image.

    Rebuild of the cam_bp extension's third op (back_projection_kernel.cu
    :309-358, exported but unused by the reference models -- kept for
    capability parity).  Returns:
      surface_vox: clamp(hit count, 0, 1) -- voxels containing points;
      mask: 1 everywhere except empty voxels that project inside the image
        onto a valid (>=0) depth pixel and sit IN FRONT of the observed
        ray depth (free space carved to 0).
    """
    n, h, w = depth.shape
    dt = depth.dtype
    fl_b = jnp.broadcast_to(jnp.asarray(fl, dt), (n,))
    cd_b = jnp.broadcast_to(jnp.asarray(cam_dist, dt), (n,))

    # hit counts from the forward scatter
    _, cnt = _scatter_mean_tdf(
        _camera_glob_coords(depth, fl_b, cd_b), (depth >= 0).reshape(n, -1),
        res, background=1.0 / res)
    surface_vox = jnp.clip(cnt, 0.0, 1.0)

    # voxel centres -> image plane (kernel.cu:336-353)
    centre = (jnp.arange(res, dtype=dt) + 0.5) / res - 0.5
    cx = centre[:, None, None]
    cy = centre[None, :, None]
    cz = centre[None, None, :]
    fl_ = fl_b[:, None, None, None]
    cd_ = cd_b[:, None, None, None]
    denom = cx[None] + cd_
    im_h = -cz[None] * fl_ / denom
    im_w = -cy[None] * fl_ / denom
    idh = jnp.round(0.5 * (h - 1.0) + im_h).astype(jnp.int32)
    idw = jnp.round(0.5 * (w - 1.0) + im_w).astype(jnp.int32)
    inb = (idh >= 0) & (idh < h) & (idw >= 0) & (idw < w)
    idh_c = jnp.clip(idh, 0, h - 1)
    idw_c = jnp.clip(idw, 0, w - 1)
    flat = (idh_c * w + idw_c).reshape(n, -1)
    dep = jnp.take_along_axis(depth.reshape(n, -1), flat, axis=1)
    dep = dep.reshape(n, res, res, res)
    ray_depth = jnp.sqrt((cx[None] + cd_) ** 2 + cy[None] ** 2
                         + cz[None] ** 2)
    carve = (cnt <= 1e-5) & inb & (dep >= 0) & (dep < ray_depth)
    mask = jnp.where(carve, 0.0, 1.0)
    return surface_vox, mask


def _camera_glob_coords(depth, fl_b, cd_b):
    """(N,H,W) depth -> (N, H*W, 3) global coords (factored from
    camera_backproject for reuse by get_surface_mask)."""
    n, h, w = depth.shape
    dt = depth.dtype
    fl = fl_b[:, None, None]
    cam_dist = cd_b[:, None, None]
    imind_h = (jnp.arange(h, dtype=dt) - (h - 1) / 2.0)[None, :, None]
    imind_w = (jnp.arange(w, dtype=dt) - (w - 1) / 2.0)[None, None, :]
    cos_theta = fl / jnp.sqrt(imind_h ** 2 + imind_w ** 2 + fl ** 2)
    d = depth * cos_theta
    return jnp.stack(
        [jnp.broadcast_to(d - cam_dist, (n, h, w)),
         jnp.broadcast_to(-d * imind_w / fl, (n, h, w)),
         jnp.broadcast_to(-d * imind_h / fl, (n, h, w))],
        axis=-1,
    ).reshape(n, h * w, 3)
