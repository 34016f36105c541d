"""Persistent compilation cache wiring (utils/compile_cache.py).

The reference ships prebuilt native binaries; our equivalent is JAX's
on-disk executable cache so server restarts / re-benches skip
trace+compile (SURVEY §7 hard part f). These tests pin the config
plumbing — idempotence, env opt-out/override, unwritable-target
fallback — not XLA's cache internals.
"""

import os

import jax

from neumann_tpu.utils import compile_cache


import pytest


@pytest.fixture
def _restore_cache_config():
    """Tests below rebind the process-global cache dir; put the
    session's real cache back so later tests keep hitting it."""
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def _reset(monkeypatch, tmp_path):
    monkeypatch.setattr(compile_cache, "_enabled_path", None)
    monkeypatch.delenv("NEUMANN_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("NEUMANN_COMPILE_CACHE", raising=False)


def test_enable_sets_jax_config_and_is_idempotent(monkeypatch, tmp_path, _restore_cache_config):
    _reset(monkeypatch, tmp_path)
    d = str(tmp_path / "cc")
    got = compile_cache.enable_persistent_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # second call returns the already-enabled path, even with a
    # different argument (one cache per process)
    assert compile_cache.enable_persistent_cache(
        str(tmp_path / "other")) == d


def test_env_opt_out(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    monkeypatch.setenv("NEUMANN_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable_persistent_cache(str(tmp_path)) is None


def test_env_override_path(monkeypatch, tmp_path, _restore_cache_config):
    _reset(monkeypatch, tmp_path)
    d = str(tmp_path / "env_cc")
    monkeypatch.setenv("NEUMANN_COMPILE_CACHE", d)
    assert compile_cache.enable_persistent_cache() == d
    assert os.path.isdir(d)


def test_unwritable_target_returns_none(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    blocker = tmp_path / "file"
    blocker.write_text("x")
    # a path whose parent is a regular file cannot be created
    assert compile_cache.enable_persistent_cache(
        str(blocker / "sub")) is None


def test_default_dir_is_package_adjacent(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    d = compile_cache.default_cache_dir()
    import neumann_tpu

    pkg = os.path.dirname(os.path.abspath(neumann_tpu.__file__))
    assert d == os.path.join(os.path.dirname(pkg), ".cache", "jax")
