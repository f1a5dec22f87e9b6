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
- **fsdp** (config ``fsdp=True``): ZeRO-style sharding of params /
  grads / optimizer state / EMA over the *data* axis on top of either
  layout — each chip stores 1/dp of every large state tensor and XLA
  inserts all-gather (use) / reduce-scatter (grad) on ICI.  Composes
  with TP: a kernel can be [*, "data", "model"]-sharded.

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

# FSDP/ZeRO: leaves smaller than this stay replicated (biases, LN
# scales — gathering them costs more latency than their bytes save).
FSDP_MIN_SIZE = 1 << 16


def param_partition_spec(
    path: str, value, mesh: Mesh, fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
) -> P:
    """PartitionSpec for one parameter by its flattened path.

    Handles both the unrolled layout (2-D kernels) and the scan layout
    (3-D kernels with a leading [num_layers] axis).

    With ``fsdp=True`` large leaves are additionally sharded along the
    ``data`` axis (ZeRO-3: params, grads, optimizer state, and EMA all
    inherit the spec through pjit, so each chip holds 1/dp of every
    state tensor; XLA inserts the all-gather before use and the
    reduce-scatter on the gradient — the standard JAX FSDP recipe).
    Only the trailing two (matrix) dims are candidates: sharding the
    scan layout's leading [num_layers] axis would turn every per-layer
    ``dynamic_slice`` inside the scan into a collective."""
    spec = [None] * value.ndim
    if mesh.shape["model"] > 1 and value.ndim in (2, 3):
        if _COL_PARALLEL.search(path):
            spec[-1] = "model"
        elif _ROW_PARALLEL.search(path):
            spec[-2] = "model"
    if (fsdp and mesh.shape["data"] > 1 and value.ndim >= 2
            and value.size >= fsdp_min_size):
        # largest still-unsharded matrix dim divisible by dp; embeddings
        # with odd vocab (64010) fall through to their feature dim
        for d in sorted(range(value.ndim - 2, value.ndim),
                        key=lambda i: -value.shape[i]):
            if spec[d] is None and value.shape[d] % mesh.shape["data"] == 0:
                spec[d] = "data"
                break
    return P(*spec)


def param_sharding(
    path: str, value, mesh: Mesh, fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
) -> NamedSharding:
    return NamedSharding(
        mesh, param_partition_spec(path, value, mesh, fsdp, fsdp_min_size)
    )


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


def shard_params(params, mesh: Mesh, fsdp: bool = False,
                 fsdp_min_size: int = FSDP_MIN_SIZE):
    """device_put every parameter according to the TP/FSDP layout rules."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = [
        jax.device_put(
            v, param_sharding(_path_str(kp), v, mesh, fsdp, fsdp_min_size))
        for kp, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def params_shardings(params, mesh: Mesh, fsdp: bool = False,
                     fsdp_min_size: int = FSDP_MIN_SIZE):
    """The NamedSharding pytree matching ``shard_params`` placement."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shards = [param_sharding(_path_str(kp), v, mesh, fsdp, fsdp_min_size)
              for kp, v in flat]
    return jax.tree_util.tree_unflatten(treedef, shards)
