"""Chamfer / nearest-neighbour distance between point clouds.

TPU-native rebuild of the reference's nndistance extension
(/root/reference/toolbox/nndistance/src/nnd_cuda.cu, ~500 lines of
tiled-shared-memory CUDA + CPU fallback + cffi glue).  On TPU the all-pairs
distance matrix is an MXU problem:

    ||x - y||^2 = ||x||^2 + ||y||^2 - 2 <x, y>

so the hot loop is one batched (N, P1, 3) x (N, 3, P2) matmul followed by a
row/column min -- XLA tiles this onto the systolic array with no custom
kernel needed.  For large clouds the matrix is built in column blocks to
bound memory.  Autodiff reproduces the CUDA backward (scatter of
2*(x1 - x2_nn) * g, nnd_cuda.cu:143-163) through the min/argmin.

API mirrors toolbox/nndistance/functions/nnd.py:66-87:
  nndistance        -> (dist1, dist2) squared NN distances per point
  nndistance_w_idx  -> (dist1, dist2, idx1, idx2)
  nndistance_score  -> mean sqrt(dist1) + mean sqrt(dist2)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(B, P1, D), (B, P2, D) -> (B, P1, P2) squared distances (MXU matmul)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # (B, P1, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)          # (B, P2, 1)
    # HIGHEST precision: the MXU's default bf16 passes lose ~1e-2 on the
    # x^2+y^2-2xy cancellation, which is material for Chamfer eval parity.
    xy = jnp.einsum("bpd,bqd->bpq", x, y,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 + jnp.swapaxes(y2, 1, 2) - 2.0 * xy, 0.0)


def nndistance(x1: jnp.ndarray, x2: jnp.ndarray,
               block: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional squared nearest-neighbour distances.

    Args:
      x1: (B, P1, 3) point cloud; x2: (B, P2, 3) point cloud.
      block: column block size bounding the (P1, block) temporary.
    Returns:
      dist1 (B, P1): min_j ||x1_i - x2_j||^2; dist2 (B, P2) symmetric.
    """
    d1, d2, _, _ = nndistance_w_idx(x1, x2, block=block)
    return d1, d2


def nndistance_w_idx(
    x1: jnp.ndarray, x2: jnp.ndarray, block: int = 4096
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NN distances plus argmin indices (toolbox nnd.py:75-80)."""
    p1, p2 = x1.shape[1], x2.shape[1]
    if max(p1, p2) <= block:
        d = _pairwise_sqdist(x1, x2)
        return (jnp.min(d, axis=2), jnp.min(d, axis=1),
                jnp.argmin(d, axis=2).astype(jnp.int32),
                jnp.argmin(d, axis=1).astype(jnp.int32))

    # blocked over x2 columns: scan keeps VMEM-sized temporaries
    nblk = -(-p2 // block)
    pad = nblk * block - p2
    x2p = jnp.pad(x2, ((0, 0), (0, pad), (0, 0)),
                  constant_values=jnp.inf)
    x2b = x2p.reshape(x2.shape[0], nblk, block, 3).swapaxes(0, 1)

    def body(carry, x2blk):
        best1, idx1, off = carry
        d = _pairwise_sqdist(x1, jnp.where(jnp.isfinite(x2blk), x2blk, 1e30))
        blk_min = jnp.min(d, axis=2)
        blk_arg = jnp.argmin(d, axis=2).astype(jnp.int32) + off
        upd = blk_min < best1
        best1 = jnp.where(upd, blk_min, best1)
        idx1 = jnp.where(upd, blk_arg, idx1)
        d2 = jnp.min(d, axis=1)
        i2 = jnp.argmin(d, axis=1).astype(jnp.int32)
        return (best1, idx1, off + block), (d2, i2)

    init = (jnp.full(x1.shape[:2], jnp.inf, x1.dtype),
            jnp.zeros(x1.shape[:2], jnp.int32), jnp.int32(0))
    (d1, i1, _), (d2b, i2b) = jax.lax.scan(body, init, x2b)
    d2 = d2b.swapaxes(0, 1).reshape(x1.shape[0], nblk * block)[:, :p2]
    i2 = i2b.swapaxes(0, 1).reshape(x1.shape[0], nblk * block)[:, :p2]
    return d1, d2, i1, i2


def nndistance_score(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """mean sqrt(d1) + mean sqrt(d2) per batch (toolbox nnd.py:83-87)."""
    d1, d2 = nndistance(x1, x2)
    return (jnp.mean(jnp.sqrt(d1 + 1e-20), axis=1)
            + jnp.mean(jnp.sqrt(d2 + 1e-20), axis=1))
