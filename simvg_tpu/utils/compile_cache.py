"""Persistent XLA compilation cache.

The tunnel's remote TPU compiler costs minutes per midsize program (and
can be the dominant cost of a restarted run: a resumed training job
repays the full train-step compile before its first batch).  JAX's
persistent compilation cache keys serialized executables by HLO hash,
so restarts, auto-resume after preemption, and repeated CLI invocations
(test/inference/bench over the same config) skip compilation entirely.

No reference analogue (torch caches kernels in-process only); this is
TPU-operations plumbing.  bench.py has used the same cache dir since
round 3 so driver bench runs reuse dev-run executables.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/root/repo/.jax_cache"


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Best-effort: point jax at a persistent on-disk compile cache.

    Call after `import jax` but before the first jit execution.  A
    JAX_COMPILATION_CACHE_DIR env var wins over the default; pass
    cache_dir to override both.  Never raises (older jax versions
    spell the knobs differently)."""
    import jax

    path = (cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_CACHE_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: through the tunnel even "fast" compiles
        # cost seconds of RPC
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:  # noqa: BLE001 - knob names vary across versions
        pass
