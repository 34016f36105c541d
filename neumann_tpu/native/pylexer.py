"""Loader for the native tokenizer extension (_neumann_lexer).

Same build-at-first-use pattern as pycodec: compiles lexer_ext.cpp
against the running interpreter's headers, initialises it with the
Token class, returns None when no toolchain is available (the regex
lexer in lang/lexer.py remains the fallback and the specification).
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "lexer_ext.cpp")
_SO = os.path.join(
    _HERE, "_neumann_lexer" + (sysconfig.get_config_var("EXT_SUFFIX")
                               or ".so"))

_lock = threading.Lock()
_mod = None
_tried = False


def load():
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
                "_neumann_lexer", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except (OSError, subprocess.SubprocessError, ImportError):
            return None
        from neumann_tpu.lang.lexer import Token

        mod.init(Token)
        _mod = mod
        return _mod


def available() -> bool:
    return load() is not None
