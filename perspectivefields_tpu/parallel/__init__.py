"""Multi-device execution: meshes, sharding rules, data-parallel serving."""

from .mesh import init_distributed, make_mesh
from .sharding import (
    param_shardings,
    replicate,
    shard_batch,
    sharded_forward,
)

__all__ = [
    "make_mesh",
    "init_distributed",
    "replicate",
    "shard_batch",
    "param_shardings",
    "sharded_forward",
]
