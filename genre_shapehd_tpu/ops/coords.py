"""Frame conventions for GenRe/ShapeHD geometry.

The single most bug-prone aspect of the reference pipeline is the set of
permute/flip conventions between the image frame, the camera (backprojection)
frame and the voxel frame.  This module centralises every such transform as a
named, tested function.

Layout conventions of THIS framework (TPU-native):
  * images:  (N, H, W, C)   -- NHWC (channels-last; XLA-preferred on TPU)
  * voxels:  (N, X, Y, Z)   -- channel-free; nn code adds a trailing C axis
  * a voxel grid covers the cube [-0.5, 0.5]^3; voxel i covers
    [i/res - 0.5, (i+1)/res - 0.5) -- see camera_bp.py

Reference conventions (PyTorch, NCHW / NCXYZ) that these functions mirror are
cited per function.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_image_to_cambp_frame(depth_nhw: jnp.ndarray) -> jnp.ndarray:
    """Image-frame absolute depth -> the frame `camera_backproject` expects.

    Mirrors /root/reference/models/depth_pred_with_sph_inpaint.py:140-141:
      ``pred_abs_depth.permute(0, 1, 3, 2)`` then ``torch.flip(..., [2])``
    i.e. (N,C,H,W) -> (N,C,W,H) -> flip the (new) dim 2.

    Args:
      depth_nhw: (N, H, W) absolute depth.
    Returns:
      (N, W, H) transposed-then-flipped depth.
    """
    out = jnp.swapaxes(depth_nhw, 1, 2)   # (N, W, H)
    return jnp.flip(out, axis=1)


def gt_voxel_to_train_frame(vox_xyz: jnp.ndarray) -> jnp.ndarray:
    """GT voxel preprocessing used by the full GenRe model.

    Mirrors /root/reference/models/genre_full_model.py:90-92:
      ``val = np.transpose(val, (0, 2, 1)); val = np.flip(val, 2)``
    applied to a single (X, Y, Z) grid.

    Works on (..., X, Y, Z): swaps the last two axes then flips the last.
    """
    out = jnp.swapaxes(vox_xyz, -2, -1)
    return jnp.flip(out, axis=-1)


def train_frame_to_gt_voxel(vox_xyz: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`gt_voxel_to_train_frame`: flip the last axis, then
    swap the last two axes -- returns predictions to the dataset's original
    voxel orientation for saving/eval."""
    out = jnp.flip(vox_xyz, axis=-1)
    return jnp.swapaxes(out, -2, -1)


def voxel_swap_yz_flip_y(vox_nxyz: jnp.ndarray) -> jnp.ndarray:
    """``torch.transpose(v, 3, 4)`` then ``torch.flip(v, [3])`` on (N,C,X,Y,Z).

    Used in the GenRe test-time path on backprojected grids,
    /root/reference/models/genre_full_model.py:220-223.

    On our (N, X, Y, Z): swap axes 2 and 3, then flip axis 2.
    """
    out = jnp.swapaxes(vox_nxyz, 2, 3)
    return jnp.flip(out, axis=2)


def voxel_flip_y_swap_yz(vox_nxyz: jnp.ndarray) -> jnp.ndarray:
    """``v.flip([3]).transpose(3, 4)`` on (N,C,X,Y,Z) -- the inverse-direction
    fixup applied to the refined prediction,
    /root/reference/models/genre_full_model.py:231.

    On our (N, X, Y, Z): flip axis 2, then swap axes 2 and 3.
    """
    out = jnp.flip(vox_nxyz, axis=2)
    return jnp.swapaxes(out, 2, 3)
