"""Client<->server tests over a real gRPC socket (loopback)."""

import numpy as np
import pytest

from neumann_tpu.server import NeumannClient, NeumannServer
from neumann_tpu.utils.errors import NeumannError


@pytest.fixture
def srv():
    s = NeumannServer(port=0)
    s.serve()
    yield s
    s.stop()


@pytest.fixture
def cli(srv):
    c = NeumannClient.connect(f"127.0.0.1:{srv.port}")
    yield c
    c.close()


def test_execute_roundtrip(cli):
    assert "created" in cli.execute(
        "CREATE TABLE t (name TEXT, age INT)").message
    cli.execute("INSERT INTO t VALUES ('alice', 30), ('bob', 25)")
    res = cli.execute("SELECT * FROM t WHERE age > 26")
    assert res.rows == [{"_id": 0, "name": "alice", "age": 30}]
    res2 = cli.execute("EMBED STORE 'x' [1.0, 0.0]")
    assert "stored" in res2.message
    hits = cli.execute("SIMILAR 'x' TOP 1").hits
    assert hits[0]["key"] == "x"


def test_execute_error_propagates(cli):
    with pytest.raises(NeumannError) as ei:
        cli.execute("SELECT * FROM missing")
    assert "missing" in str(ei.value)
    with pytest.raises(NeumannError):
        cli.execute("TOTALLY BOGUS")


def test_batch(cli):
    out = cli.execute_batch([
        "CREATE TABLE b (v INT)",
        "INSERT INTO b VALUES (1)",
        "SELECT * FROM nope",
        "SELECT * FROM b"])
    assert out[0].ok and out[1].ok
    assert not out[2].ok and "nope" in out[2].error
    assert out[3].rows[0]["v"] == 1


def test_paginated(cli):
    cli.execute("CREATE TABLE p (v INT)")
    cli.execute("INSERT INTO p VALUES " +
                ", ".join(f"({i})" for i in range(25)))
    pages = list(cli.execute_paginated("SELECT * FROM p", page_size=10))
    assert [len(p) for p in pages] == [10, 10, 5]


def test_stream(cli):
    cli.execute("CREATE TABLE s (v INT)")
    cli.execute("INSERT INTO s VALUES " +
                ", ".join(f"({i})" for i in range(150)))
    chunks = list(cli.execute_stream("SELECT * FROM s"))
    assert sum(len(c.rows) for c in chunks) == 150
    assert len(chunks) >= 3


def test_health(cli):
    h = cli.health()
    assert h["ok"] and h["device"] in ("cpu", "tpu")


def test_points_api(cli):
    cli.create_collection("docs", dimension=4)
    n = cli.upsert_points("docs", [
        {"id": "a", "vector": [1, 0, 0, 0], "payload": {"lang": "en"}},
        {"id": "b", "vector": [0, 1, 0, 0]},
    ])
    assert n == 2
    hits = cli.query_points("docs", [1, 0, 0, 0], limit=1)
    assert hits[0]["id"] == "a"
    fhits = cli.query_points(
        "docs", [1, 0, 0, 0], limit=5,
        filter_json={"op": "eq", "field": "lang", "value": "en"})
    assert [h["id"] for h in fhits] == ["a"]
    cols = cli.list_collections()
    assert cols[0]["name"] == "docs" and cols[0]["count"] == 2
    pts = list(cli.scroll_points("docs", limit=1))
    assert {p["id"] for p in pts} == {"a", "b"}
    assert cli.delete_points("docs", ["a", "zz"]) == 1


def test_blob_streaming(cli):
    data = bytes(range(256)) * 5000  # 1.28 MB, crosses chunk boundary
    aid = cli.upload_blob("big.bin", data,
                          content_type="application/octet-stream")
    back = cli.download_blob(aid)
    assert back == data


def test_auth_and_rate_limit():
    srv = NeumannServer(port=0, api_keys=["sekret"], rate_limit_per_min=3)
    srv.serve()
    try:
        bad = NeumannClient.connect(f"127.0.0.1:{srv.port}",
                                    api_key="wrong", retries=0)
        with pytest.raises(NeumannError) as ei:
            bad.execute("SHOW TABLES")
        assert "UNAUTHENTICATED" in str(ei.value)
        bad.close()
        good = NeumannClient.connect(f"127.0.0.1:{srv.port}",
                                     api_key="sekret", retries=0)
        good.execute("SHOW TABLES")
        good.execute("SHOW TABLES")
        good.execute("SHOW TABLES")
        with pytest.raises(NeumannError) as ei:
            good.execute("SHOW TABLES")
        assert "RESOURCE_EXHAUSTED" in str(ei.value)
        good.close()
        audit = srv.audit_log()
        assert any(e["action"] == "auth_failure" for e in audit)
        assert any(e["action"] == "rate_limited" for e in audit)
    finally:
        srv.stop()


def test_embedded_mode():
    c = NeumannClient.embedded()
    c.execute("CREATE TABLE e (v INT)")
    c.execute("INSERT INTO e VALUES (7)")
    assert c.execute("SELECT * FROM e").rows[0]["v"] == 7
    pages = list(c.execute_paginated("SELECT * FROM e", 10))
    assert pages == [[{"_id": 0, "v": 7}]]
    c.upsert_points("col", [{"id": "x", "vector": [1.0, 0.0]}])
    assert c.query_points("col", [1.0, 0.0], 1)[0]["id"] == "x"


def test_metrics(srv, cli):
    cli.execute("SHOW TABLES")
    assert srv.metrics["requests"] >= 1


def test_rest_api(tmp_path):
    import json
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    srv = RestServer(port=0)
    port = srv.serve()
    base = f"http://127.0.0.1:{port}"

    def call(method, path, body=None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(base + path, data=data,
                                     method=method)
        req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    code, h = call("GET", "/health")
    assert code == 200 and h["ok"]
    code, out = call("POST", "/query",
                     {"query": "CREATE TABLE t (v INT)"})
    assert code == 200
    call("POST", "/query", {"query": "INSERT INTO t VALUES (7)"})
    code, out = call("POST", "/query", {"query": "SELECT * FROM t"})
    assert out["rows"] == [{"_id": 0, "v": 7}]
    # collections + points
    code, _ = call("PUT", "/collections/docs", {"dimension": 4})
    assert code == 200
    call("PUT", "/collections/docs/points", {"points": [
        {"id": "a", "vector": [1, 0, 0, 0], "payload": {"lang": "en"}},
        {"id": "b", "vector": [0, 1, 0, 0]}]})
    code, res = call("POST", "/collections/docs/points/query",
                     {"vector": [1, 0, 0, 0], "limit": 1})
    assert res["result"][0]["id"] == "a"
    code, res = call("POST", "/collections/docs/points/query",
                     {"vector": [1, 0, 0, 0], "limit": 5,
                      "filter": {"op": "eq", "field": "lang",
                                 "value": "en"}})
    assert [p["id"] for p in res["result"]] == ["a"]
    code, res = call("POST", "/collections/docs/points/delete",
                     {"ids": ["a"]})
    assert res["deleted"] == 1
    code, cols = call("GET", "/collections")
    assert cols["collections"][0]["count"] == 1
    code, res = call("POST", "/query", {"query": "BROKEN !!"})
    assert code == 400 and "error" in res
    code, _ = call("GET", "/nope")
    assert code == 400
    code, m = call("GET", "/metrics")
    assert "statements" in m
    srv.stop()


def test_rest_body_size_cap():
    import json
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    srv = RestServer(port=0)
    port = srv.serve()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query", data=b"{}",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(1 << 31)})
    try:
        urllib.request.urlopen(req, timeout=5)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "too large" in json.loads(e.read())["error"]
    srv.stop()


def test_rest_auth():
    import json
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    srv = RestServer(port=0, api_keys=["k1"])
    port = srv.serve()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/health", method="GET")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 401"
    except urllib.error.HTTPError as e:
        assert e.code == 401
    req.add_header("x-api-key", "k1")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
    srv.stop()


def test_query_batcher(rng):
    import threading

    from neumann_tpu.engines import VectorEngine
    from neumann_tpu.server.batcher import QueryBatcher

    eng = VectorEngine()
    vecs = rng.standard_normal((500, 32)).astype(np.float32)
    eng.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(500)])
    b = QueryBatcher(eng, dim=32, max_wait_ms=5.0)
    try:
        # concurrent searches coalesce into shared batches
        results = [None] * 20
        def worker(i):
            results[i] = b.search(vecs[i], 3)
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(20)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(20):
            assert results[i][0].key == f"v{i}"
        assert b.queries_served == 20
        assert b.batches_run < 20  # actually coalesced
        # error propagation: wrong dim
        with pytest.raises(Exception):
            b.search(np.zeros(7, np.float32), 3)
    finally:
        b.close()


def test_tls_grpc():
    srv = NeumannServer(port=0, tls=True)
    srv.serve()
    try:
        cli = NeumannClient.connect(f"127.0.0.1:{srv.port}",
                                    tls_root_cert=srv.tls_cert,
                                    retries=0)
        cli.execute("CREATE TABLE t (v INT)")
        cli.execute("INSERT INTO t VALUES (5)")
        assert cli.execute("SELECT * FROM t").rows[0]["v"] == 5
        cli.close()
        # plaintext client against the TLS port fails cleanly
        bad = NeumannClient.connect(f"127.0.0.1:{srv.port}", retries=0)
        with pytest.raises(NeumannError):
            bad.execute("SHOW TABLES")
        bad.close()
    finally:
        srv.stop()


def test_dashboard_html():
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    srv = RestServer(port=0)
    port = srv.serve()
    srv.router.execute("CREATE TABLE t (v INT)")
    srv.router.execute("EMBED STORE 'x' [1.0]")
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
        html = resp.read().decode()
        assert resp.headers["Content-Type"].startswith("text/html")
    assert "neumann-tpu" in html and "collections" in html
    assert "store entries" in html
    srv.stop()


def test_grpc_server_reflection():
    """v1alpha reflection: the grpcurl discovery flow end-to-end."""
    import grpc

    from neumann_tpu.server import reflection_pb2 as rpb
    from neumann_tpu.server.server import NeumannServer

    srv = NeumannServer(port=0)
    port = srv.serve()
    try:
        ch = grpc.insecure_channel(f"127.0.0.1:{port}")
        stub = ch.stream_stream(
            "/grpc.reflection.v1alpha.ServerReflection/"
            "ServerReflectionInfo",
            request_serializer=rpb.ServerReflectionRequest
            .SerializeToString,
            response_deserializer=rpb.ServerReflectionResponse
            .FromString)
        reqs = [
            rpb.ServerReflectionRequest(list_services=""),
            rpb.ServerReflectionRequest(
                file_containing_symbol="neumann.QueryService"),
            rpb.ServerReflectionRequest(
                file_by_filename="neumann.proto"),
            rpb.ServerReflectionRequest(
                file_containing_symbol="nope.Missing"),
        ]
        resps = list(stub(iter(reqs)))
        names = {s.name for s in resps[0].list_services_response.service}
        assert {"neumann.QueryService", "neumann.Health",
                "neumann.PointsService", "neumann.CollectionsService",
                "neumann.BlobService"} <= names
        # the served descriptor really describes the API: build a
        # dynamic stub from it and call Execute (what grpcurl does)
        from google.protobuf import (
            descriptor_pb2,
            descriptor_pool,
            message_factory,
        )

        fdp = descriptor_pb2.FileDescriptorProto.FromString(
            resps[1].file_descriptor_response.file_descriptor_proto[0])
        pool = descriptor_pool.DescriptorPool()
        pool.Add(fdp)
        req_cls = message_factory.GetMessageClass(
            pool.FindMessageTypeByName("neumann.QueryRequest"))
        resp_cls = message_factory.GetMessageClass(
            pool.FindMessageTypeByName("neumann.QueryResponse"))
        call = ch.unary_unary(
            "/neumann.QueryService/Execute",
            request_serializer=req_cls.SerializeToString,
            response_deserializer=resp_cls.FromString)
        out = call(req_cls(query="SHOW TABLES"))
        assert out.kind
        assert resps[2].file_descriptor_response.file_descriptor_proto
        assert resps[3].error_response.error_code == 5  # NOT_FOUND
    finally:
        srv.stop()


def test_blob_metadata_and_delete(cli):
    data = b"hello blob"
    aid = cli.upload_blob("x.txt", data, content_type="text/plain")
    info = cli.blob_metadata(aid)
    assert info["name"] == "x.txt" and info["size"] == len(data)
    assert info["content_type"] == "text/plain" and info["chunks"] >= 1
    assert cli.delete_blob(aid)
    assert not cli.delete_blob(aid)


def test_collection_get_and_delete(cli):
    cli.create_collection("g", dimension=3, metric="cosine")
    info = cli.get_collection("g")
    assert info == {"name": "g", "count": 0, "dimension": 3,
                    "metric": "cosine", "quantization": "none"}
    with pytest.raises(NeumannError):
        cli.get_collection("missing")
    assert cli.delete_collection("g")
    assert "g" not in [c["name"] for c in cli.list_collections()]


def test_rest_points_get_and_scroll():
    import json
    import urllib.request

    from neumann_tpu.router.router import QueryRouter
    from neumann_tpu.server.rest import RestServer

    r = QueryRouter()
    rs = RestServer(r, port=0)
    port = rs.serve()
    try:
        base = f"http://127.0.0.1:{port}"

        def post(path, body):
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            return json.load(urllib.request.urlopen(req))

        def put(path, body):
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="PUT")
            return json.load(urllib.request.urlopen(req))

        put("/collections/kc", {"dimension": 3})
        put("/collections/kc/points", {"points": [
            {"id": f"p{i}", "vector": [i, 0, 1]} for i in range(5)]})
        got = post("/collections/kc/points/get",
                   {"ids": ["p1", "p3", "zz"]})
        assert [p["id"] for p in got["points"]] == ["p1", "p3"]
        assert got["points"][0]["vector"] == [1.0, 0.0, 1.0]
        page1 = post("/collections/kc/points/scroll", {"limit": 3})
        assert len(page1["points"]) == 3 and page1["next_offset"]
        page2 = post("/collections/kc/points/scroll",
                     {"limit": 3, "offset": page1["next_offset"]})
        ids = [p["id"] for p in page1["points"] + page2["points"]]
        assert sorted(ids) == [f"p{i}" for i in range(5)]
        assert page2["next_offset"] is None
    finally:
        rs.stop()


def test_grpc_server_reflection_v1():
    """Modern grpcurl probes grpc.reflection.v1 first; the server
    serves the same (wire-identical) handler under both names."""
    import grpc

    from neumann_tpu.server import reflection_pb2 as rpb
    from neumann_tpu.server.server import NeumannServer

    srv = NeumannServer(port=0)
    port = srv.serve()
    try:
        ch = grpc.insecure_channel(f"127.0.0.1:{port}")
        stub = ch.stream_stream(
            "/grpc.reflection.v1.ServerReflection/ServerReflectionInfo",
            request_serializer=rpb.ServerReflectionRequest
            .SerializeToString,
            response_deserializer=rpb.ServerReflectionResponse
            .FromString)
        resps = list(stub(iter([
            rpb.ServerReflectionRequest(list_services="")])))
        names = {s.name for s in resps[0].list_services_response.service}
        assert "neumann.QueryService" in names
    finally:
        srv.stop()
