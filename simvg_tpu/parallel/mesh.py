"""Device mesh + sharding layout.

The reference's only parallelism is DDP over NCCL
(MMDistributedDataParallel, tools/train.py:102-103; collectives inventory
in SURVEY.md §2.8).  The TPU-native equivalent is a single
``jax.sharding.Mesh`` with axes ``("data", "model")``:

- **data**: batch-sharded inputs; gradient reduction happens implicitly
  through pjit (the XLA psum replaces DDP's all-reduce, and the
  criterion's ``num_boxes`` all_reduce disappears into global-batch
  semantics — simvg_tpu/losses/criterion.py docstring).
- **model**: tensor parallelism for the encoder's FFN/attention weights
  (column-parallel fc1/qkv, row-parallel fc2/out-proj).  Not needed for
  parity (BEiT-3-large fits one v5e chip) but the mesh carries the axis
  so the same code scales; with model=1 the rules degrade to pure DP.

Collectives ride ICI automatically: XLA partitions the matmuls and
inserts all-reduce/all-gather where the PartitionSpecs require.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"create_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available ({devices}). For multi-chip "
                "testing without hardware, force a virtual CPU mesh: set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} and JAX_PLATFORMS=cpu before importing jax "
                "(see tests/conftest.py)."
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"create_mesh: {n} devices not divisible by "
            f"model_parallel={model_parallel}"
        )
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data-parallel devices."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel layout rules, applied by parameter path.
# Column-parallel (shard output features) for up-projections; row-parallel
# (shard input features) for down-projections, so each FFN/attention block
# needs a single psum at its output.
_COL_PARALLEL = re.compile(
    r"(fc1_[AB]|q_proj_[AB]|k_proj_[AB]|v_proj_[AB])/kernel$"
)
_ROW_PARALLEL = re.compile(r"(fc2_[AB]|out_proj_[AB])/kernel$")


def param_sharding(path: str, value, mesh: Mesh) -> NamedSharding:
    """PartitionSpec for one parameter by its flattened path.

    Handles both the unrolled layout (2-D kernels) and the scan layout
    (3-D kernels with a leading [num_layers] axis)."""
    if mesh.shape["model"] > 1 and value.ndim in (2, 3):
        lead = (None,) * (value.ndim - 2)
        if _COL_PARALLEL.search(path):
            return NamedSharding(mesh, P(*lead, None, "model"))
        if _ROW_PARALLEL.search(path):
            return NamedSharding(mesh, P(*lead, "model", None))
    return NamedSharding(mesh, P())


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def shard_params(params, mesh: Mesh):
    """device_put every parameter according to the TP layout rules."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = [
        jax.device_put(v, param_sharding(_path_str(kp), v, mesh))
        for kp, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def params_shardings(params, mesh: Mesh):
    """The NamedSharding pytree matching ``shard_params`` placement."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shards = [param_sharding(_path_str(kp), v, mesh) for kp, v in flat]
    return jax.tree_util.tree_unflatten(treedef, shards)
