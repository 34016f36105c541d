"""Loader for the native fast-path parser (_neumann_parser).

Compiles parser_ext.cpp at first use and registers the lang.ast
dataclasses (slot layouts) with it. Returns None when no toolchain is
available or the classes stop being slots dataclasses — lang.parser
then runs pure-Python for everything.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "parser_ext.cpp")
_SO = os.path.join(
    _HERE, "_neumann_parser" + (sysconfig.get_config_var("EXT_SUFFIX")
                                or ".so"))

_lock = threading.Lock()
_mod = None
_tried = False


def _specs():
    from neumann_tpu.engines.condition import Condition
    from neumann_tpu.lang import ast

    def fields(cls):
        import dataclasses

        return tuple(f.name for f in dataclasses.fields(cls))

    return tuple(
        (name, cls, fields(cls))
        for name, cls in (
            ("Select", ast.Select),
            ("SelectItem", ast.SelectItem),
            ("Insert", ast.Insert),
            ("Similar", ast.Similar),
            ("Condition", Condition),
            ("NodeCreate", ast.NodeCreate),
            ("Find", ast.Find),
            ("Update", ast.Update),
            ("Delete", ast.Delete),
            ("EmbedStore", ast.EmbedStore),
            ("EmbedGet", ast.EmbedGet),
            ("EmbedDelete", ast.EmbedDelete),
        ))


def load():
    """Build (if stale), import, and initialise the extension."""
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
                "_neumann_parser", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            if not mod.init_parser(_specs()):
                return None          # AST classes not slot dataclasses
        except (OSError, subprocess.SubprocessError, ImportError):
            return None
        _mod = mod
        return _mod


def available() -> bool:
    return load() is not None


def built() -> bool:
    """True when the extension is already compiled and fresh — i.e.
    load() would be a plain import, no g++ subprocess."""
    try:
        return (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC))
    except OSError:
        return False
