"""Loader for the host-side serving accelerators (mllm_hostops.so).

Builds the CPython extension on first use when a compiler is available
(make-on-change, same pattern as index/native); callers fall back to the
pure-Python implementations when it is not — ``get()`` returns the module
or ``None``, never raises.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
from importlib.machinery import ExtensionFileLoader
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "mllm_hostops.so")
_mod = None
_failed = False


def get() -> Optional[object]:
    """The extension module, building it if needed; None if unavailable."""
    global _mod, _failed
    if _mod is not None:
        return _mod
    if _failed:
        return None
    try:
        import sys
        subprocess.run(["make", "-C", _DIR, f"PYTHON={sys.executable}"],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_SO):
            _failed = True
            return None
    try:
        loader = ExtensionFileLoader("mllm_hostops", _SO)
        spec = importlib.util.spec_from_file_location("mllm_hostops", _SO,
                                                      loader=loader)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception:
        _failed = True
        return None
    _mod = mod
    return mod


def available() -> bool:
    return get() is not None
