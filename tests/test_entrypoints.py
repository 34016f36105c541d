"""CLI/module entry points: `python -m neumann_tpu.server`,
`python -m neumann_tpu.shell`, server main() flag handling, and the
native-extension loader's no-toolchain fallback."""

import runpy
import sys

import pytest


def test_shell_main_module(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv",
                        ["neumann-tpu", "-c", "SHOW TABLES"])
    with pytest.raises(SystemExit) as ex:
        runpy.run_module("neumann_tpu.shell", run_name="__main__")
    assert ex.value.code == 0


def test_server_main_module(monkeypatch):
    import neumann_tpu.server.server as srvmod

    monkeypatch.setattr(srvmod, "main", lambda argv=None: 7)
    with pytest.raises(SystemExit) as ex:
        runpy.run_module("neumann_tpu.server", run_name="__main__")
    assert ex.value.code == 7


def test_server_main_flags(monkeypatch, tmp_path):
    """server.main: env/flag plumbing, WAL-dir recovery + durable
    reopen, graceful start — with the blocking serve stubbed out."""
    import neumann_tpu.server.server as srvmod

    calls = {}

    class _FakeGrpc:
        def wait_for_termination(self):
            calls["waited"] = True

    class _FakeServer:
        def __init__(self, router, host, port, api_keys=None,
                     rate_limit_per_min=0, tls=False):
            calls["host"] = host
            calls["keys"] = api_keys
            calls["rate"] = rate_limit_per_min
            self._server = _FakeGrpc()

        def serve(self, block=False, warmup=None):
            return 12345

        def stop(self, grace=1.0):
            calls["stopped"] = True

    monkeypatch.setattr(srvmod, "NeumannServer", _FakeServer)
    monkeypatch.setenv("NEUMANN_API_KEYS", "k1,k2")
    rc = srvmod.main(["--port", "0", "--wal-dir", str(tmp_path),
                      "--rate-limit", "5"])
    assert rc == 0 and calls["waited"]
    assert calls["keys"] == ["k1", "k2"] and calls["rate"] == 5
    assert (tmp_path / "wal.log").exists()


def test_server_main_help():
    import neumann_tpu.server.server as srvmod

    with pytest.raises(SystemExit) as ex:
        srvmod.main(["--help"])
    assert ex.value.code == 0


@pytest.mark.parametrize("loader", ["pycodec", "pylexer", "pyparser"])
def test_native_loader_no_toolchain_fallback(monkeypatch, loader):
    """load() must return None (pure-Python fallback), not raise,
    when the compiler is unavailable."""
    import importlib
    import subprocess

    mod = importlib.import_module(f"neumann_tpu.native.{loader}")
    saved = (mod._mod, mod._tried)
    try:
        mod._mod, mod._tried = None, False

        def boom(*a, **kw):
            raise OSError("no toolchain")

        monkeypatch.setattr(subprocess, "run", boom)
        monkeypatch.setattr(
            mod.os.path, "exists", lambda p: False)
        assert mod.load() is None
        assert mod.available() is False
    finally:
        mod._mod, mod._tried = saved
