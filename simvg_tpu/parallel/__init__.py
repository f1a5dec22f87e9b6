from .mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_sharding,
    shard_params,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_sharding",
    "shard_params",
]
