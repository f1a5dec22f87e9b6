"""utils/compile_cache: persistent XLA executable cache plumbing (the
remote TPU compiler costs minutes per program through the tunnel; every
CLI calls enable_compilation_cache so auto-resume and repeated evals
skip compilation).  CPU-forced processes must NOT get the cache:
XLA:CPU AOT entries log a cpu_aot_loader feature-mismatch warning on
every hit (even same-machine) and are a SIGILL hazard cross-machine."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_machine_key_stable_and_wellformed():
    from simvg_tpu.utils.compile_cache import _machine_key

    k1, k2 = _machine_key(), _machine_key()
    assert k1 == k2
    assert k1.startswith("m-") and len(k1) == 18


def test_enable_is_noop_on_cpu_and_keyed_elsewhere(tmp_path):
    # subprocess: jax.config is process-global and other tests rely on
    # the default
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from simvg_tpu.utils.compile_cache import (enable_compilation_cache,
                                           _machine_key)
# CPU-forced process: the cache must stay OFF (XLA:CPU AOT entries
# warn on every load and are a cross-machine SIGILL hazard)
before = jax.config.jax_compilation_cache_dir
enable_compilation_cache({str(tmp_path)!r})
assert jax.config.jax_compilation_cache_dir == before, \\
    jax.config.jax_compilation_cache_dir
import jax.numpy as jnp
jax.jit(lambda x: x * 2)(jnp.ones((8,))).block_until_ready()
import glob
assert not glob.glob(os.path.join({str(tmp_path)!r}, "*")), \\
    "cpu process populated the persistent cache"

# non-CPU platform value: the chosen base dir gets the per-machine
# subdirectory (entries AOT-compiled by a different host CPU must
# never be loaded here).  Config-only flip AFTER the jit above: we
# only check path selection, no TPU is touched.
jax.config.update("jax_platforms", None)
os.environ.pop("JAX_PLATFORMS")
key = _machine_key()
enable_compilation_cache({str(tmp_path)!r})
assert jax.config.jax_compilation_cache_dir == \\
    os.path.join({str(tmp_path)!r}, key), \\
    jax.config.jax_compilation_cache_dir
# env var wins over the default when no explicit dir is passed
os.environ["JAX_COMPILATION_CACHE_DIR"] = {str(tmp_path / "env")!r}
enable_compilation_cache()
assert jax.config.jax_compilation_cache_dir == \\
    os.path.join({str(tmp_path / "env")!r}, key)
print("CACHE_OK")
"""
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CACHE_OK" in proc.stdout
