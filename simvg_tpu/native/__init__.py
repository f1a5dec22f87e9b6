"""Native (C) fast paths. Import ``get_rle_ext()`` to obtain the compiled
module, building it on first use; returns None when no compiler is
available (pure-python fallbacks take over)."""

from __future__ import annotations

import importlib
import sys

_CACHE = {}


def get_rle_ext():
    if "_rle" in _CACHE:
        return _CACHE["_rle"]
    mod = None
    try:
        from . import _rle as mod  # pre-built
    except ImportError:
        try:
            from .build import build_rle

            so_dir = build_rle()
            if so_dir and so_dir not in sys.path:
                sys.path.insert(0, so_dir)
            mod = importlib.import_module("_rle")
        except Exception:
            mod = None
    _CACHE["_rle"] = mod
    return mod
