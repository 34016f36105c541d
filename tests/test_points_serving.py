"""Binary PointsService serving path: raw-bytes Query + QueryStream.

The round-5 serving data plane: queries travel as packed-float protobuf
bytes (never text SIMILAR statements), are decoded by the native codec,
coalesced through the router batchers, and answered with natively
encoded responses — unary for single callers, pipelined bidi for
throughput. Reference surface: proto/vector.proto +
neumann_server/src/service/query.rs:207-278."""

import concurrent.futures as fut

import numpy as np
import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.server.client import NeumannClient
from neumann_tpu.server.server import NeumannServer


@pytest.fixture(scope="module")
def served():
    router = QueryRouter()
    router.vector.config.mesh_auto = False
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((128, 32)).astype(np.float32)
    router.vector.batch_store_embeddings(
        [(f"e{i}", vecs[i]) for i in range(128)])
    router.vector.create_collection("docs")
    for i in range(32):
        router.vector.store_in_collection(
            "docs", f"d{i}", vecs[i],
            {"lang": "en" if i % 2 == 0 else "de"})
    srv = NeumannServer(router=router, port=0, max_workers=16)
    srv.serve(block=False, warmup=False)
    cli = NeumannClient.connect(f"127.0.0.1:{srv.port}", retries=0)
    yield srv, cli, vecs
    cli.close()
    srv.stop()


def test_unary_query_default_namespace(served):
    srv, cli, vecs = served
    hits = cli.query_points("", vecs[5], limit=3)
    assert hits[0]["id"] == "e5"
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-4)


def test_unary_query_collection_with_payload(served):
    srv, cli, vecs = served
    hits = cli.query_points("docs", vecs[4], limit=2,
                            with_payload=True)
    assert hits[0]["id"] == "d4"
    assert hits[0]["payload"] == {"lang": "en"}
    # with_payload=False suppresses the payload fetch (Qdrant default)
    hits = cli.query_points("docs", vecs[4], limit=2,
                            with_payload=False)
    assert hits[0]["id"] == "d4" and hits[0]["payload"] is None


def test_unary_query_filtered(served):
    srv, cli, vecs = served
    hits = cli.query_points(
        "docs", vecs[4], limit=8,
        filter_json={"op": "eq", "field": "lang", "value": "de"})
    assert hits and all(int(h["id"][1:]) % 2 == 1 for h in hits)


def test_unary_query_metric(served):
    srv, cli, vecs = served
    hits = cli.query_points("", vecs[7], limit=3, metric="euclidean")
    assert hits[0]["id"] == "e7"


def test_unary_query_error_response(served):
    srv, cli, vecs = served
    from neumann_tpu.utils.errors import NeumannError

    with pytest.raises(NeumannError):
        cli.query_points("no_such_collection", vecs[0], limit=3)


def test_stream_pipelined_queries(served):
    srv, cli, vecs = served
    with cli.points_pipeline() as pipe:
        futures = [pipe.search(vecs[i], limit=3) for i in range(64)]
        for i, f in enumerate(futures):
            hits = f.result(timeout=30)
            assert hits[0]["id"] == f"e{i}"


def test_stream_mixed_namespaces_and_errors(served):
    srv, cli, vecs = served
    with cli.points_pipeline() as pipe:
        good = pipe.search(vecs[3], limit=2)
        col = pipe.search(vecs[3], limit=2, collection="docs",
                          with_payload=True)
        bad = pipe.search(vecs[3], limit=2, collection="nope")
        assert good.result(timeout=30)[0]["id"] == "e3"
        got = col.result(timeout=30)
        assert got[0]["id"] == "d3" and got[0]["payload"] == {
            "lang": "de"}
        from neumann_tpu.utils.errors import NeumannError

        with pytest.raises(NeumannError):
            bad.result(timeout=30)
    # stream errors don't poison later pipelines
    with cli.points_pipeline() as pipe2:
        assert pipe2.search(vecs[9], limit=1).result(
            timeout=30)[0]["id"] == "e9"


def test_stream_coalesces_under_load(served):
    """Concurrent pipelined queries share batched device calls."""
    srv, cli, vecs = served
    b = srv.router._batcher_for(32)
    if b is None:
        pytest.skip("batching disabled")
    before_batches = b.batches_run
    before_served = b.queries_served
    with cli.points_pipeline() as pipe:
        futures = [pipe.search(vecs[i % 128], limit=3)
                   for i in range(96)]
        for f in futures:
            f.result(timeout=30)
    served_n = b.queries_served - before_served
    batches_n = b.batches_run - before_batches
    assert served_n >= 96
    assert batches_n < served_n    # actually coalesced


def test_unary_concurrent_threads(served):
    srv, cli, vecs = served
    def one(i):
        return cli.query_points("", vecs[i % 128], limit=1)[0]["id"]
    with fut.ThreadPoolExecutor(max_workers=16) as ex:
        got = list(ex.map(one, range(64)))
    assert got == [f"e{i % 128}" for i in range(64)]


def test_python_pb_fallback_codec_same_wire(served):
    """The pb shim and the native codec produce interchangeable bytes:
    a query encoded by the shim is served identically."""
    from neumann_tpu.server.server import _PbPointsCodec, _points_codec

    srv, cli, vecs = served
    codec = _points_codec()
    raw_q = _PbPointsCodec.encode_query(
        "", np.asarray(vecs[6], "<f4").tobytes(), 3, None, False,
        None, 77)
    out = srv._points_query_fast(raw_q, codec)
    rid, ids, scores, payloads, error = _PbPointsCodec.parse_response(
        out)
    assert rid == 77 and ids[0] == "e6" and error is None


def test_query_batch_ordered(served):
    srv, cli, vecs = served
    res = cli.query_points_batch(vecs[:32], limit=3)
    assert len(res) == 32
    for i, hits in enumerate(res):
        assert hits[0]["id"] == f"e{i}"


def test_query_batch_collection_and_metric(served):
    srv, cli, vecs = served
    res = cli.query_points_batch(vecs[:8], limit=2, collection="docs")
    for i, hits in enumerate(res):
        assert hits[0]["id"] == f"d{i}"
    res = cli.query_points_batch(vecs[:4], limit=2,
                                 metric="euclidean")
    assert res[0][0]["id"] == "e0"


def test_query_batch_error(served):
    srv, cli, vecs = served
    from neumann_tpu.utils.errors import NeumannError

    with pytest.raises(NeumannError):
        cli.query_points_batch(vecs[:4], limit=2, collection="nope")


def test_batch_codec_split_join_roundtrip(served):
    from neumann_tpu.server.server import _PbPointsCodec, _points_codec

    codec = _points_codec()
    subs = [b"\x0a\x01a", b"\x15\x00\x00\x80\x3f", b""]
    joined = codec.join_messages(subs)
    assert codec.split_messages(joined) == subs
    # shim and native produce identical bytes
    assert _PbPointsCodec.join_messages(subs) == joined
    assert _PbPointsCodec.split_messages(joined) == subs
