"""Multi-device execution: meshes, sharding rules, data-parallel serving."""

from .mesh import make_mesh
from .sharding import (
    param_shardings,
    replicate,
    shard_batch,
    sharded_forward,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "param_shardings",
    "sharded_forward",
]
