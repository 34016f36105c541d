"""Loader for the native codec extension (_neumann_codec).

Compiles codec_ext.cpp against the running interpreter's headers at
first use and initialises it with the TensorValue/TensorData classes
plus numpy helpers. Returns None when no toolchain is available — the
pure-Python codec in store/codec.py remains the fallback and both
implementations share the exact on-disk byte format.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "codec_ext.cpp")
_SO = os.path.join(
    _HERE, "_neumann_codec" + (sysconfig.get_config_var("EXT_SUFFIX")
                               or ".so"))

_lock = threading.Lock()
_mod = None
_tried = False


def _vec_from_bytes(b):
    return np.frombuffer(b, "<f4").copy()


def _sparse_cls():
    from neumann_tpu.store.sparse import SparseVector

    return SparseVector


def _as_f4_bytes(v):
    return np.asarray(v, "<f4").tobytes()


def _sparse_parts(sv):
    return (sv.dim, np.asarray(sv.positions, "<i4").tobytes(),
            np.asarray(sv.values, "<f4").tobytes())


def load():
    """Build (if stale), import, and initialise the extension.

    Returns the module, or None when compilation fails (no g++, no
    headers): callers fall back to the pure-Python codec.
    """
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
                np_inc = np.get_include()
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", f"-I{inc}",
                     f"-I{np_inc}", _SRC, "-lz", "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            spec = importlib.util.spec_from_file_location(
                "_neumann_codec", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except (OSError, subprocess.SubprocessError, ImportError):
            return None
        from neumann_tpu.store.tensor_store import TensorData, TensorValue

        mod.init(TensorValue, TensorData, _vec_from_bytes,
                 _sparse_cls(), _as_f4_bytes, _sparse_parts)
        _mod = mod
        return _mod


def available() -> bool:
    return load() is not None
