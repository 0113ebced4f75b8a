"""Device mesh + sharding helpers (the framework's entire "distributed
communication backend").

Replaces the reference's single-process multi-GPU scatter/gather decorator
(/root/reference/models/netinterface.py:472-515) with the TPU-native
design: a 1-D (or 2-D) `jax.sharding.Mesh`, batch-sharded inputs, and
replicated parameters.  Gradient all-reduces over ICI are inserted by XLA
when the jitted train step consumes batch-sharded inputs and produces
replicated parameter updates -- no explicit collectives needed for data
parallelism.  Multi-host extends naturally via jax.distributed (DCN) --
the sharding annotations are identical.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = BATCH_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the dp mesh axis."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with its leading axis split across the mesh.

    Every leaf must have leading dim divisible by mesh size (the reference
    had the same constraint, netinterface.py:495-498).
    """
    sharding = batch_sharding(mesh)
    n = mesh.devices.size

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n != 0:
            raise ValueError(
                f"batch leading dim {x.shape} not divisible by mesh size {n}")
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, replicated(mesh))
