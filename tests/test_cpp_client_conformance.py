"""Compiled C++ client conformance: build clients/cpp with g++ and run
its wire battery against a LIVE server (grpc-web gateway mounted on the
REST port) — the compiled-SDK counterpart of the reference's
neumann_client crate tests (neumann_client/src/lib.rs:286-843).

Unlike the Node-free TS suite (which re-implements the TS wire bytes in
Python), the C++ client actually COMPILES AND RUNS here: every
assertion below is an end-to-end round trip through real sockets, real
grpc-web frames, and the real gRPC handlers.
"""

import json
import shutil
import subprocess
from pathlib import Path

import pytest

from neumann_tpu.server.rest import RestServer
from neumann_tpu.server.server import NeumannServer

CPP_DIR = Path(__file__).resolve().parent.parent / "clients" / "cpp"

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def cli(tmp_path_factory):
    out = tmp_path_factory.mktemp("cppcli") / "neumann_cli"
    subprocess.run(
        ["g++", "-std=c++17", "-O1", "-Wall", "-Werror",
         "-o", str(out), str(CPP_DIR / "neumann_cli.cpp"),
         "-I", str(CPP_DIR)],
        check=True, capture_output=True, text=True)
    return out


@pytest.fixture(scope="module")
def stack():
    srv = NeumannServer()
    rest = RestServer(router=srv.router, grpc_web=srv)
    rest.serve()
    yield srv, rest
    rest.stop()
    srv.stop()


def _run(cli, port, *args):
    r = subprocess.run(
        [str(cli), "127.0.0.1", str(port), *args],
        capture_output=True, text=True, timeout=120)
    lines = [json.loads(x) for x in r.stdout.splitlines() if x.strip()]
    return r.returncode, {x["step"]: x for x in lines}, r.stderr


def test_conformance_battery(cli, stack):
    _, rest = stack
    rc, steps, err = _run(cli, rest.port, "conformance")
    assert rc == 0, f"cli failed: {err}\n{steps}"
    assert steps["done"] == {"step": "done"}

    assert steps["health"]["ok"] is True
    assert steps["select"]["rows"] == 2
    row0 = json.loads(steps["select_row0"]["json"])
    assert row0["id"] == 1 and row0["name"] == "alpha"

    assert steps["batch"]["n"] == 2
    assert steps["batch"]["rows_last"] == 3

    assert steps["paginate"]["p1"] == 2
    assert steps["paginate"]["p2"] == 1
    assert steps["paginate"]["exhausted"] is True

    assert steps["similar"]["hits"] == 2
    assert steps["similar_top"]["key"] == "cpp_v1"

    assert steps["stream"]["rows"] == 3

    assert steps["collections"]["n"] >= 1
    assert steps["collection_info"]["name"] == "cpp_col"
    assert steps["collection_info"]["dimension"] == 4
    assert steps["upsert"]["n"] == 2
    assert steps["get_points"]["n"] == 1
    assert steps["get_points"]["dim"] == 4
    assert steps["query_points"]["top"] == "p1"
    assert steps["query_batch"]["n"] == 2
    assert steps["query_batch"]["t0"] == "p1"
    assert steps["query_batch"]["t1"] == "p2"
    assert steps["scroll"]["n"] == 1
    assert steps["delete_points"]["n"] == 1

    assert steps["blob"]["size"] == 3 << 20
    assert steps["blob"]["roundtrip"] is True
    assert steps["blob"]["chunks"] >= 3  # 1 MiB client chunks

    assert steps["error"]["raised"] is True
    assert steps["error"]["msg"]


def test_exec_mode(cli, stack):
    _, rest = stack
    rc, steps, err = _run(cli, rest.port, "exec", "SELECT * FROM cpp_t")
    assert rc == 0, err
    assert steps["exec"]["kind"] == "rows"


def test_api_key_enforced(cli):
    # fresh stack: the battery creates tables the second run would trip on
    srv = NeumannServer()
    rest2 = RestServer(router=srv.router, grpc_web=srv,
                       api_keys=["sesame"])
    rest2.serve()
    try:
        rc, steps, _ = _run(cli, rest2.port, "conformance")
        assert rc == 1                       # rejected without the key
        assert "fatal" in steps
        rc, steps, err = _run(cli, rest2.port, "conformance", "sesame")
        assert rc == 0, err
        assert steps["health"]["ok"] is True
    finally:
        rest2.stop()
        srv.stop()
