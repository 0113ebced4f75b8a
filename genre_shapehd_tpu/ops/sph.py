"""Spherical-map helpers: unit-sphere direction grids and wrap padding.

TPU-native re-design of /root/reference/toolbox/spherical_proj.py:6-28.
The reference builds the grid with a Python double loop; here it is a
vectorised outer product, and the in-place longitude wrap of ``sph_pad``
is re-expressed functionally with jnp.pad + concatenation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gen_sph_grid(res: int = 128) -> np.ndarray:
    """Unit-sphere direction grid, shape (res, res, 3).

    Latitudes phi are the midpoints of ``linspace(0, 180, 2*res+1)`` (i.e.
    cell centres), longitudes theta are ``linspace(0, 360, res+1)[:-1]``;
    direction = (sin(phi)cos(theta), sin(phi)sin(theta), cos(phi)).
    Mirrors /root/reference/toolbox/spherical_proj.py:6-18 (returns
    (res,res,3) instead of the reference's (1,1,res,res,3); callers add
    batch axes as needed).
    """
    phi = np.deg2rad(np.linspace(0.0, 180.0, res * 2 + 1)[1::2])   # (res,)
    theta = np.deg2rad(np.linspace(0.0, 360.0, res + 1)[:-1])      # (res,)
    sin_phi = np.sin(phi)[:, None]
    grid = np.stack(
        [
            sin_phi * np.cos(theta)[None, :],
            sin_phi * np.sin(theta)[None, :],
            np.broadcast_to(np.cos(phi)[:, None], (res, res)),
        ],
        axis=-1,
    )
    return grid.astype(np.float32)


def sph_pad(sph_nhwc: jnp.ndarray, padding_margin: int = 16) -> jnp.ndarray:
    """Pad a square spherical map: replicate rows (poles), wrap columns.

    Input (N, H, W, C) with H == W; output (N, H+2m, W+2m, C).

    The reference (toolbox/spherical_proj.py:21-28) replicate-pads all four
    sides, then overwrites the left/right margins with wrapped longitude
    columns taken from the already-padded tensor, so the wrapped columns
    carry the replicate-padded rows with them.  We reproduce exactly that:
    pad rows by replication first, then wrap-pad columns.
    """
    m = padding_margin
    n, h, w, c = sph_nhwc.shape
    assert h == w, "spherical maps are square (lat x lon)"
    # replicate-pad top/bottom (pole rows)
    rows = jnp.pad(sph_nhwc, ((0, 0), (m, m), (0, 0), (0, 0)), mode="edge")
    # wrap-pad longitude: left margin <- last m columns, right <- first m
    left = rows[:, :, w - m:, :]
    right = rows[:, :, :m, :]
    return jnp.concatenate([left, rows, right], axis=2)


def sph_pad_numpy(sph_hw: np.ndarray, padding_margin: int = 16) -> np.ndarray:
    """Host-side GT spherical padding: wrap columns, edge rows.

    Mirrors /root/reference/models/depth_pred_with_sph_inpaint.py:89-91
    (np.pad 'wrap' on the last axis then 'edge' on the middle axis), which
    is the dataset-side twin of :func:`sph_pad`.  Input (C, H, W).
    """
    m = padding_margin
    out = np.pad(sph_hw, ((0, 0), (0, 0), (m, m)), "wrap")
    out = np.pad(out, ((0, 0), (m, m), (0, 0)), "edge")
    return out
