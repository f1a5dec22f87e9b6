"""Build the _rle C extension in-place with the system compiler."""

from __future__ import annotations

import os
import os.path as osp
import subprocess
import sys
import sysconfig

HERE = osp.dirname(osp.abspath(__file__))
BUILD_DIR = osp.join(HERE, "_build")


def build_rle() -> str | None:
    """Compile rle_ext.c -> _build/_rle.so; returns the directory or
    None on failure.  Idempotent (mtime-checked)."""
    src = osp.join(HERE, "rle_ext.c")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = osp.join(BUILD_DIR, "_rle" + ext)
    if osp.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return BUILD_DIR
    os.makedirs(BUILD_DIR, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"[simvg_tpu.native] build failed: {e}\n")
        return None
    return BUILD_DIR
