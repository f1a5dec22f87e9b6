"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip code paths (pjit/shard_map over a Mesh) are validated without
TPU hardware by forcing the CPU platform with 8 virtual devices, the
JAX-native substitute for the reference's untestable multi-GPU DDP path
(SURVEY.md §4).

Note: this environment's sitecustomize registers an 'axon' TPU backend and
overrides `jax_platforms` via jax.config, so the env var alone is not
enough — we must update the config after importing jax, before any
computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

import sys as _sys
from pathlib import Path as _Path

# make tests/ importable as top-level modules (util_synth fixtures)
_sys.path.insert(0, str(_Path(__file__).parent))
