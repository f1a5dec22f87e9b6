"""utils/compile_cache: persistent XLA executable cache plumbing (the
remote TPU compiler costs minutes per program through the tunnel; every
CLI calls enable_compilation_cache so auto-resume and repeated evals
skip compilation)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_enable_compilation_cache_sets_config(tmp_path):
    # subprocess: jax.config is process-global and other tests rely on
    # the default
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from simvg_tpu.utils.compile_cache import (enable_compilation_cache,
                                           _machine_key)
# every choice of base dir gets a per-machine subdirectory: entries
# AOT-compiled by a different host CPU must never be loaded here
# (cpu_aot_loader feature-mismatch warnings / SIGILL hazard)
key = _machine_key()
assert key.startswith("m-") and len(key) == 18
enable_compilation_cache({str(tmp_path)!r})
assert jax.config.jax_compilation_cache_dir == \\
    os.path.join({str(tmp_path)!r}, key), \\
    jax.config.jax_compilation_cache_dir
# env var wins over the default when no explicit dir is passed
os.environ["JAX_COMPILATION_CACHE_DIR"] = {str(tmp_path / "env")!r}
enable_compilation_cache()
assert jax.config.jax_compilation_cache_dir == \\
    os.path.join({str(tmp_path / "env")!r}, key)
# a jit actually populates the cache directory
import jax.numpy as jnp
jax.jit(lambda x: x * 2)(jnp.ones((8,))).block_until_ready()
import glob
assert glob.glob(os.path.join({str(tmp_path / "env")!r}, key, "*")), \\
    "cache subdir not populated"
print("CACHE_OK")
"""
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CACHE_OK" in proc.stdout
