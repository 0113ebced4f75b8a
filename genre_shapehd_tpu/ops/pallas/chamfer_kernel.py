"""Pallas TPU kernel for nearest-neighbour (Chamfer) distance.

The XLA path (ops/chamfer.py) materializes (N, M)-shaped distance blocks in
HBM between the matmul and the min-reduction.  This kernel keeps each
(BLK, BLK) tile in VMEM: the tile's squared distances are formed via an MXU
dot plus rank-1 norm terms and immediately min-reduced, with the running
row-minima accumulated in VMEM scratch across the M-block loop.

This is the TPU re-design of the reference's tiled shared-memory CUDA
kernel (/root/reference/toolbox/nndistance/src/nnd_cuda.cu:6-128): same
blocking idea, but tiles live in VMEM and the inner product rides the MXU.

TPU layout: row-minima are stored as (8, 128) tiles -- BLK = 1024 points
per tile -- because Mosaic requires the last two block dims to be
(8k, 128)-shaped.  Points are padded from 3 to 8 lanes.

The kernel is forward-only; `nndistance_pallas` attaches the analytic
backward 2*(x - x_nn) (nnd_cuda.cu:143-163) via custom_vjp, with argmin
indices from the XLA path.  On non-TPU backends the kernel runs in
interpreter mode so tests stay portable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024            # points per tile = 8 sublanes x 128 lanes
_FAR = 1e15


def _min_dist_kernel(x_ref, y_ref, out_ref, acc_ref):
    """Grid (B, N/BLK, M/BLK); running min over the M-block axis (axis 2).

    Block shapes: x (1, BLK, 8), y (1, BLK, 8), out (1, 8, 128),
    acc scratch (8, 128).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, _FAR * _FAR)

    x = x_ref[0]                                   # (BLK, 8)
    y = y_ref[0]                                   # (BLK, 8)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)     # (BLK, 1)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)     # (BLK, 1)
    # HIGHEST: full-f32 passes on the MXU -- the x2+y2-2xy cancellation
    # loses ~1e-1 absolute in the default bf16 passes
    xy = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # (BLK, BLK)
    d = jnp.maximum(x2 + y2.T - 2.0 * xy, 0.0)
    blk_min = jnp.min(d, axis=1).reshape(8, 128)
    acc_ref[:] = jnp.minimum(acc_ref[:], blk_min)

    @pl.when(j == pl.num_programs(2) - 1)
    def _flush():
        out_ref[0] = acc_ref[:]


def _pad_points(x: jnp.ndarray, blk: int) -> jnp.ndarray:
    """(B, P, 3) -> (B, P_pad, 8): far-away padding rows, zero extra lanes."""
    b, p, _ = x.shape
    p_pad = -(-p // blk) * blk
    out = jnp.zeros((b, p_pad, 8), jnp.float32)
    out = out.at[:, p:, 0].set(_FAR)     # padding rows never win a min
    return out.at[:, :p, :3].set(x.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("blk",))
def _one_sided_min(x: jnp.ndarray, y: jnp.ndarray,
                   blk: int = BLK) -> jnp.ndarray:
    """(B, N, 3), (B, M, 3) -> (B, N) min squared distances to y."""
    b, n, _ = x.shape
    xp = _pad_points(x, blk)
    yp = _pad_points(y, blk)
    n_pad, m_pad = xp.shape[1], yp.shape[1]
    n_tiles = n_pad // blk

    out = pl.pallas_call(
        _min_dist_kernel,
        grid=(b, n_tiles, m_pad // blk),
        in_specs=[
            pl.BlockSpec((1, blk, 8), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 8), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda bi, i, j: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xp, yp)
    return out.reshape(b, n_pad)[:, :n]


@jax.custom_vjp
def nndistance_pallas(x1: jnp.ndarray, x2: jnp.ndarray):
    """Bidirectional squared NN distances via the Pallas kernel."""
    return _one_sided_min(x1, x2), _one_sided_min(x2, x1)


def _fwd(x1, x2):
    return nndistance_pallas(x1, x2), (x1, x2)


def _bwd(res, g):
    from ..chamfer import nndistance_w_idx
    x1, x2 = res
    g1, g2 = g
    _, _, i1, i2 = nndistance_w_idx(x1, x2)
    nn1 = jnp.take_along_axis(x2, i1[..., None], axis=1)    # (B, P1, 3)
    nn2 = jnp.take_along_axis(x1, i2[..., None], axis=1)    # (B, P2, 3)
    b = jnp.arange(x1.shape[0])[:, None]
    dx1 = 2.0 * (x1 - nn1) * g1[..., None]
    dx1 = dx1 + jnp.zeros_like(x1).at[b, i2].add(
        -2.0 * (x2 - nn2) * g2[..., None])
    dx2 = 2.0 * (x2 - nn2) * g2[..., None]
    dx2 = dx2 + jnp.zeros_like(x2).at[b, i1].add(
        -2.0 * (x1 - nn1) * g1[..., None])
    return dx1, dx2


nndistance_pallas.defvjp(_fwd, _bwd)


def nndistance_score_pallas(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """mean sqrt(d1) + mean sqrt(d2) per batch, kernel-backed."""
    d1, d2 = nndistance_pallas(x1, x2)
    return (jnp.mean(jnp.sqrt(d1 + 1e-20), axis=1)
            + jnp.mean(jnp.sqrt(d2 + 1e-20), axis=1))
