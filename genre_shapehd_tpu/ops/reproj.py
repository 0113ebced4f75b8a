"""Reprojection-consistency loss between a voxel grid and surface samples.

Rebuild of /root/reference/util/util_reproj.py (experimental; not wired
into any reference model -- kept for capability parity).  For each surface
sample (x_0, n_0): the voxel nearest to x_0 should be occupied, and voxels
whose perpendicular distance to the sample's normal line is below
``alpha * l`` should be empty (weighted by closeness).

Fully vectorised jnp; the reference's per-sample Python loops become a
scatter-free masked reduction.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def reprojection_loss(v: jnp.ndarray, x: jnp.ndarray, x0: jnp.ndarray,
                      n0: jnp.ndarray, l: float,
                      alpha: float = math.sqrt(2) / 2, beta: float = 1.0,
                      gamma: float = 1.0) -> jnp.ndarray:
    """Args:
      v:  (V,) voxel occupancies (flattened grid).
      x:  (V, 3) voxel centre positions.
      x0: (S, 3) surface sample points.
      n0: (3,) shared surface normal direction (reference semantics).
      l:  voxel edge length.
    """
    v = v.reshape(-1)
    x = x.reshape(-1, 3)
    n0 = n0 / jnp.sum(n0 ** 2)

    diff = x[:, None, :] - x0[None, :, :]              # (V, S, 3)
    sq = jnp.sum(diff ** 2, axis=2)                    # (V, S)
    i0 = jnp.argmin(sq, axis=0)                        # (S,)

    loss_1 = jnp.sum((1.0 - v[i0]) ** 2)

    d = jnp.linalg.norm(jnp.cross(diff, n0[None, None, :]), axis=2)
    mask_near = (d < alpha * l).astype(v.dtype)
    # exclude each sample's nearest voxel
    vs = jnp.arange(v.shape[0])
    mask_not_nearest = 1.0 - (vs[:, None] == i0[None, :]).astype(v.dtype)
    w = gamma * (1.0 - d / (alpha * l)) ** beta
    loss_2 = jnp.sum(w * (v[:, None] ** 2) * mask_near * mask_not_nearest)
    return loss_1 + loss_2
