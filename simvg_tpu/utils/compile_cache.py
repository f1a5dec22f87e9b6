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

import hashlib
import os
import platform

# Repo root derived at runtime (this file lives at simvg_tpu/utils/),
# so any checkout location / user works; JAX_COMPILATION_CACHE_DIR
# still overrides.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def _machine_key() -> str:
    """A per-machine cache subdirectory key.

    XLA:CPU AOT-compiles against this host's exact CPU features; loading
    an entry produced on a different machine emits a cpu_aot_loader
    machine-feature-mismatch warning per entry (XLA warns it "could lead
    to execution errors such as SIGILL").  A shared cache dir written by
    several hosts (dev box + driver bench host) therefore poisons every
    startup with megabytes of warnings — and is a latent-crash hazard.
    Keying a subdirectory by platform + CPU-feature hash means each
    machine only ever sees entries it produced.  TPU executables would
    be shareable, but the same jax process also compiles CPU programs
    (host callbacks, small utilities), so keep one subdir per machine.
    """
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += " " + line.split(":", 1)[1].strip()
                    break
    except OSError:
        sig += " " + platform.processor()
    return "m-" + hashlib.sha256(sig.encode()).hexdigest()[:16]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Best-effort: point jax at a persistent on-disk compile cache.

    Call after `import jax` but before the first jit execution.  A
    JAX_COMPILATION_CACHE_DIR env var wins over the default; pass
    cache_dir to override both.  The chosen base dir gets a per-machine
    subdirectory (see _machine_key) so caches written by other hosts
    are never loaded here.  Never raises (older jax versions spell the
    knobs differently).

    CPU-forced processes skip the cache entirely: XLA:CPU persists
    AOT-compiled executables whose recorded target features include
    compiler tuning pseudo-features (+prefer-no-scatter/-gather) the
    host feature probe never reports, so EVERY cache hit logs a
    ~1.5 KB cpu_aot_loader feature-mismatch warning — even on the
    machine that wrote the entry — and XLA warns the mismatch "could
    lead to execution errors such as SIGILL".  CPU compiles cost
    seconds; the cache exists for the tunnelled TPU compiler's
    minutes-per-program, and that path keeps it."""
    import jax

    plat = (os.environ.get("JAX_PLATFORMS") or "").strip().lower()
    try:
        plat = (jax.config.jax_platforms or plat or "").strip().lower()
    except AttributeError:
        pass
    # first entry of the platform list is the default backend
    if plat.split(",")[0] == "cpu":
        return

    base = (cache_dir
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_CACHE_DIR)
    path = os.path.join(base, _machine_key())
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything: through the tunnel even "fast" compiles
        # cost seconds of RPC
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:  # noqa: BLE001 - knob names vary across versions
        pass
