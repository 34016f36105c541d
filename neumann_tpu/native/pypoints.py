"""Loader for the native PointsService proto codec (_neumann_points).

Compiles points_ext.cpp against the running interpreter's headers at
first use. Returns None when no toolchain is available — the server and
client fall back to the Python protobuf classes (same wire bytes,
slower marshaling).
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "points_ext.cpp")
_SO = os.path.join(
    _HERE, "_neumann_points" + (sysconfig.get_config_var("EXT_SUFFIX")
                                or ".so"))

_lock = threading.Lock()
_mod = None
_tried = False


def load():
    """Build (if stale), import, and return the extension; None when
    compilation fails (no g++ / headers)."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    with _lock:
        if _mod is not None or _tried:
            return _mod
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                inc = sysconfig.get_paths()["include"]
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", f"-I{inc}",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            spec = importlib.util.spec_from_file_location(
                "_neumann_points", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except (OSError, subprocess.SubprocessError, ImportError):
            return None
        _mod = mod
        return _mod


def available() -> bool:
    return load() is not None
