"""First-hit ("stop") probability along a ray.

Replaces the reference's hand-rolled CUDA scan + hand-derived backward
(/root/reference/toolbox/calc_prob/calc_prob/src/calc_prob_kernel.cu:113-190,
~330 lines of CUDA/C/cffi) with the closed form

    stop[z] = p[z] * prod_{i<z} (1 - p[i])

which the CUDA recurrence ``stop[z] = stop[z-1] * (1/p[z-1] - 1) * p[z]``
telescopes to.  ``jnp.cumprod`` maps onto an XLA parallel scan on TPU and
autodiff gives the exact backward for free.

Inputs must be clamped away from {0, 1} by the caller (the reference clamps
to [1e-5, 1 - 1e-5], toolbox/spherical_proj.py:66) -- with the closed form
this is only needed for numerical sanity, not to avoid the 1/p of the
recurrence.
"""

from __future__ import annotations

import jax.numpy as jnp


def stop_probability(p: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """stop[z] = p[z] * prod_{i<z}(1-p[i]) along ``axis`` (exclusive cumprod)."""
    q = 1.0 - p
    cum = jnp.cumprod(q, axis=axis)
    # exclusive shift: prepend 1, drop last
    ones_shape = list(p.shape)
    ones_shape[axis if axis >= 0 else p.ndim + axis] = 1
    excl = jnp.concatenate(
        [jnp.ones(ones_shape, dtype=p.dtype),
         jnp.take(cum, jnp.arange(p.shape[axis] - 1), axis=axis)],
        axis=axis,
    )
    return p * excl
