"""Trilinear 3D grid sampling (align_corners=True, zero padding).

The reference relies on ``torch.nn.functional.grid_sample`` (PyTorch 0.4.1,
whose fixed behaviour equals today's ``align_corners=True`` + zeros padding)
to probe a voxel grid along rays -- /root/reference/toolbox/spherical_proj.py:65.

This is a pure-JAX gather formulation: XLA fuses the 8 corner gathers and the
lerp weights into one kernel.  All shapes are static so it stages cleanly
under jit; autodiff provides the exact backward (grads w.r.t. both the volume
and the sample points).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_3d(vol: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample a volume at normalized points with trilinear interpolation.

    Args:
      vol: (N, X, Y, Z) volume.
      points: (N, ..., 3) sample locations in [-1, 1]; component 0 indexes
        the X axis, 1 -> Y, 2 -> Z (matching the reference's permute of the
        voxel before grid_sample, see ops/render_sph.py).
    Returns:
      (N, ...) sampled values; points outside [-1, 1] contribute zeros.
    """
    n, sx, sy, sz = vol.shape
    sizes = jnp.array([sx, sy, sz], dtype=points.dtype)

    # align_corners=True: -1 -> 0, +1 -> size-1
    idx = (points + 1.0) * 0.5 * (sizes - 1.0)          # (N, ..., 3)
    idx0 = jnp.floor(idx)
    frac = idx - idx0                                    # (N, ..., 3)
    idx0 = idx0.astype(jnp.int32)

    def gather_corner(ox: int, oy: int, oz: int):
        ix = idx0[..., 0] + ox
        iy = idx0[..., 1] + oy
        iz = idx0[..., 2] + oz
        inb = (
            (ix >= 0) & (ix < sx)
            & (iy >= 0) & (iy < sy)
            & (iz >= 0) & (iz < sz)
        )
        ixc = jnp.clip(ix, 0, sx - 1)
        iyc = jnp.clip(iy, 0, sy - 1)
        izc = jnp.clip(iz, 0, sz - 1)
        flat = (ixc * sy + iyc) * sz + izc               # (N, ...)
        vals = jnp.take_along_axis(
            vol.reshape(n, -1),
            flat.reshape(n, -1),
            axis=1,
        ).reshape(flat.shape)
        wx = frac[..., 0] if ox else (1.0 - frac[..., 0])
        wy = frac[..., 1] if oy else (1.0 - frac[..., 1])
        wz = frac[..., 2] if oz else (1.0 - frac[..., 2])
        return jnp.where(inb, vals, 0.0) * (wx * wy * wz)

    out = gather_corner(0, 0, 0)
    for ox, oy, oz in ((0, 0, 1), (0, 1, 0), (0, 1, 1),
                       (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)):
        out = out + gather_corner(ox, oy, oz)
    return out
