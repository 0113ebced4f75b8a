"""Voxel-grid utilities: downsampling, transforms, solidification, surfaces.

Rebuilds /root/reference/util/util_voxel.py (numba-jit loops + scipy) with
vectorised numpy for host-side dataset work and pure-JAX variants for
in-graph use.  The DFS floodfill becomes an iterative frontier BFS (numpy)
-- no recursion limits, no numba dependency.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- host side

def downsample(vox: np.ndarray, times: int, use_max: bool = True) -> np.ndarray:
    """2x block-downsample ``times`` times (max or mean pooling).

    Mirrors util/util_voxel.py:10-28 (numba loops) as a reshape reduction.
    """
    for _ in range(times):
        d = vox.shape[0] // 2
        blocks = vox[:2 * d, :2 * d, :2 * d].reshape(d, 2, d, 2, d, 2)
        vox = blocks.max(axis=(1, 3, 5)) if use_max else blocks.mean(axis=(1, 3, 5))
    return vox


def find_bound(vox: np.ndarray, th: float = 0.0) -> np.ndarray:
    """(3, 2) min/max occupied index per axis (util_voxel.py:31-44)."""
    occ = np.argwhere(vox > th)
    if occ.size == 0:
        return np.zeros((3, 2), dtype=np.int64)
    return np.stack([occ.min(axis=0), occ.max(axis=0)], axis=1)


def bounding_box_align(vox_a: np.ndarray, vox_b: np.ndarray,
                       th: float = 0.0) -> np.ndarray:
    """Translate ``vox_a`` so its occupied bounding-box centre matches
    ``vox_b``'s (util_voxel.py:47-61)."""
    ba = find_bound(vox_a, th)
    bb = find_bound(vox_b, th)
    shift = np.round((bb.mean(axis=1) - ba.mean(axis=1))).astype(int)
    return translate(vox_a, shift)


def translate(vox: np.ndarray, shift: np.ndarray) -> np.ndarray:
    """Discrete integer translate with zero fill (util_voxel.py:64-90)."""
    out = np.zeros_like(vox)
    src = [slice(max(0, -s), vox.shape[i] - max(0, s)) for i, s in enumerate(shift)]
    dst = [slice(max(0, s), vox.shape[i] - max(0, -s)) for i, s in enumerate(shift)]
    out[tuple(dst)] = vox[tuple(src)]
    return out


def transform_by_matrix(vox: np.ndarray, mat: np.ndarray,
                        order: int = 1) -> np.ndarray:
    """Resample a voxel grid under a 3x3 linear map about the grid centre.

    Mirrors util/util_voxel.py:107-161 (RegularGridInterpolator) using
    scipy.ndimage.affine_transform with the inverse map.
    """
    centre = (np.asarray(vox.shape, dtype=np.float64) - 1.0) / 2.0
    inv = np.linalg.inv(mat)
    offset = centre - inv @ centre
    return ndi.affine_transform(vox, inv, offset=offset, order=order,
                                mode="constant", cval=0.0)


def fill_solid(vox: np.ndarray, th: float = 0.5) -> np.ndarray:
    """Solidify a surface voxelization by flooding exterior air.

    Re-design of the recursive DFS fill (util/util_voxel.py:167-238):
    binary-fill-holes on the thresholded grid -- everything not reachable
    from the border through empty space becomes occupied.
    """
    occ = vox > th
    return ndi.binary_fill_holes(occ).astype(vox.dtype)


def surface_from_solid_np(vox: np.ndarray, iterations: int = 2) -> np.ndarray:
    """Surface shell = v - erosion(v, ones(3,3,3), iterations), clipped to [0,1].

    Host-side twin of the GT preprocessing in
    /root/reference/models/genre_full_model.py:93-95.
    """
    er = ndi.binary_erosion(vox, structure=np.ones((3, 3, 3)),
                            iterations=iterations).astype(vox.dtype)
    return np.clip(vox - er, 0.0, 1.0)


# ---------------------------------------------------------------- jax side

def binary_erosion_jax(vox: jnp.ndarray, iterations: int = 2) -> jnp.ndarray:
    """In-graph 3x3x3 binary erosion via min-pooling (reduce_window).

    ``vox`` is (..., X, Y, Z) in {0, 1}; boundary behaves like a zero pad
    (scipy's border_value=0 default), so border voxels always erode.
    """
    out = vox
    for _ in range(iterations):
        nd = out.ndim
        window = (1,) * (nd - 3) + (3, 3, 3)
        pads = ((0, 0),) * (nd - 3) + (((1, 1),) * 3)
        out = jax.lax.reduce_window(
            out, 1.0, jax.lax.min, window, (1,) * nd, list(pads))
        # zero padding: reduce_window pads with init 1.0; mask borders to 0
        mask = jnp.ones(out.shape[-3:], out.dtype)
        mask = mask.at[0, :, :].set(0).at[-1, :, :].set(0)
        mask = mask.at[:, 0, :].set(0).at[:, -1, :].set(0)
        mask = mask.at[:, :, 0].set(0).at[:, :, -1].set(0)
        out = out * mask
    return out


def surface_from_solid_jax(vox: jnp.ndarray, iterations: int = 2) -> jnp.ndarray:
    """In-graph surface extraction matching :func:`surface_from_solid_np`."""
    return jnp.clip(vox - binary_erosion_jax(vox, iterations), 0.0, 1.0)
