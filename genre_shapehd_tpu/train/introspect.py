"""Gradient introspection utilities.

Counterpart of the reference's grad-hook factories
(/root/reference/models/netinterface.py:78-83, 289-338, 518-520): the
torch hooks become pure functions over the gradient pytree that a train
step can fold into its metrics (on-device, no sync), plus a host-side
ring buffer for recent statistics.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, Deque, Tuple

import jax
import jax.numpy as jnp


def grad_stats(grads, prefix: str = "grad") -> Dict[str, jnp.ndarray]:
    """Global-norm/mean/std summary of a gradient pytree (the analog of
    `dict_grad_hook_factory` recording mean/std per tensor)."""
    leaves = jax.tree.leaves(grads)
    if not leaves:
        return {}
    total = sum(jnp.sum(jnp.square(g)) for g in leaves)
    count = sum(g.size for g in leaves)
    mean = sum(jnp.sum(g) for g in leaves) / count
    return {
        f"{prefix}_norm": jnp.sqrt(total),
        f"{prefix}_mean": mean,
        f"{prefix}_rms": jnp.sqrt(total / count),
    }


def per_module_grad_norms(grads, max_depth: int = 1,
                          prefix: str = "grad") -> Dict[str, jnp.ndarray]:
    """Per-top-level-module gradient norms, e.g. grad/net1, grad/net2."""
    out: Dict[str, jnp.ndarray] = {}
    if not isinstance(grads, dict):
        return grad_stats(grads, prefix)
    for name, sub in grads.items():
        leaves = jax.tree.leaves(sub)
        if leaves:
            out[f"{prefix}/{name}"] = jnp.sqrt(
                sum(jnp.sum(jnp.square(g)) for g in leaves))
    return out


class CircularGradBuffer:
    """Host-side ring buffer of recent grad statistics
    (`circular_grad_hook_factory`, netinterface.py:289-326)."""

    def __init__(self, maxlen: int = 100):
        self.buffer: Deque[Tuple[int, Dict[str, float]]] = deque(maxlen=maxlen)

    def record(self, step: int, stats: Dict) -> None:
        self.buffer.append(
            (int(step), {k: float(v) for k, v in stats.items()}))

    def latest(self):
        return self.buffer[-1] if self.buffer else None

    def summary(self) -> Dict[str, float]:
        if not self.buffer:
            return {}
        keys = self.buffer[-1][1].keys()
        n = len(self.buffer)
        return {k: sum(s[k] for _, s in self.buffer) / n for k in keys}
