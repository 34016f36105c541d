"""Persistent compilation cache wiring (utils/compile_cache.py).

The reference ships prebuilt native binaries; our equivalent is JAX's
on-disk executable cache so server restarts / re-benches skip
trace+compile (SURVEY §7 hard part f). These tests pin the config
plumbing — idempotence, env opt-out/override, unwritable-target
fallback, and the per-host machine-feature guard (an AOT executable
compiled under other CPU features must never be loaded here) — not
XLA's cache internals.
"""

import os

import jax
import pytest

from neumann_tpu.utils import compile_cache


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
    monkeypatch.delenv("NEUMANN_FAKE_CPU_FEATURES", raising=False)


def _hostdir(base: str) -> str:
    return os.path.join(base, compile_cache.host_fingerprint())


def test_enable_sets_jax_config_and_is_idempotent(monkeypatch, tmp_path, _restore_cache_config):
    _reset(monkeypatch, tmp_path)
    d = str(tmp_path / "cc")
    got = compile_cache.enable_persistent_cache(d)
    assert got == _hostdir(d) and os.path.isdir(got)
    assert jax.config.jax_compilation_cache_dir == got
    # second call returns the already-enabled path, even with a
    # different argument (one cache per process)
    assert compile_cache.enable_persistent_cache(
        str(tmp_path / "other")) == got


def test_env_opt_out(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    monkeypatch.setenv("NEUMANN_NO_COMPILE_CACHE", "1")
    assert compile_cache.enable_persistent_cache(str(tmp_path)) is None


def test_env_override_path(monkeypatch, tmp_path, _restore_cache_config):
    _reset(monkeypatch, tmp_path)
    d = str(tmp_path / "env_cc")
    monkeypatch.setenv("NEUMANN_COMPILE_CACHE", d)
    assert compile_cache.enable_persistent_cache() == _hostdir(d)
    assert os.path.isdir(_hostdir(d))


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


def test_foreign_host_cache_is_not_loaded(monkeypatch, tmp_path,
                                          _restore_cache_config):
    """A cache populated under OTHER machine features resolves a
    different directory — its entries are invisible here (the r4
    dryrun's cpu_aot_loader SIGILL-warning scenario)."""
    _reset(monkeypatch, tmp_path)
    base = str(tmp_path / "cc")
    # "another machine" writes its cache
    monkeypatch.setenv("NEUMANN_FAKE_CPU_FEATURES", "avx512 amx etc")
    foreign = compile_cache.enable_persistent_cache(base)
    os.makedirs(foreign, exist_ok=True)
    foreign_entry = os.path.join(foreign, "some_aot_executable")
    with open(foreign_entry, "w") as f:
        f.write("not for this host")
    # this host enables the same BASE dir
    monkeypatch.delenv("NEUMANN_FAKE_CPU_FEATURES")
    monkeypatch.setattr(compile_cache, "_enabled_path", None)
    local = compile_cache.enable_persistent_cache(base)
    assert local != foreign
    assert not os.path.exists(os.path.join(
        local, "some_aot_executable"))
    # and the fingerprint is stable for a fixed feature set
    monkeypatch.setenv("NEUMANN_FAKE_CPU_FEATURES", "avx512 amx etc")
    monkeypatch.setattr(compile_cache, "_enabled_path", None)
    assert compile_cache.enable_persistent_cache(base) == foreign


def test_cpu_backend_skips_default_cache(monkeypatch, tmp_path,
                                         _restore_cache_config):
    """CPU-only backends don't persist AOT executables by default —
    the loader feature-checks every load (SIGILL risk cross-host,
    warning spam same-host). Tests opt in via allow_cpu."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("needs a CPU-only backend")
    _reset(monkeypatch, tmp_path)
    assert compile_cache.enable_persistent_cache() is None
    # explicit opt-ins still work
    assert compile_cache.enable_persistent_cache(
        str(tmp_path / "cc"), allow_cpu=False) is not None


def test_host_fingerprint_shape():
    fp = compile_cache.host_fingerprint()
    import platform

    assert fp.startswith(platform.machine() + "-")
    assert len(fp.split("-")[-1]) == 12
