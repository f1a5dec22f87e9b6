from .mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_partition_spec,
    param_sharding,
    params_shardings,
    shard_params,
    FSDP_MIN_SIZE,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_partition_spec",
    "param_sharding",
    "params_shardings",
    "shard_params",
    "FSDP_MIN_SIZE",
]
