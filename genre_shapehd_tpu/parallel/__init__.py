from . import mesh
from .mesh import (make_mesh, make_mesh_2d, batch_sharding, replicated,
                   shard_batch, replicate_state, maybe_shard_spatial,
                   set_active_mesh)

__all__ = ["mesh", "make_mesh", "make_mesh_2d", "batch_sharding",
           "replicated", "shard_batch", "replicate_state",
           "maybe_shard_spatial", "set_active_mesh"]
