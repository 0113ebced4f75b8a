from . import mesh
from .mesh import make_mesh, batch_sharding, replicated, shard_batch, \
    replicate_state

__all__ = ["mesh", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "replicate_state"]
