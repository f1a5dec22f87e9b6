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
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU in-process collectives ABORT the process when a
    # rendezvous takes >40s; on this contended 1-core box a virtual
    # device thread can legitimately be starved longer than that
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()
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
