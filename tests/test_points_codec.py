"""Native PointsService proto codec vs the protoc-generated classes.

The serving fast path (server/server.py QueryStream + Query) runs on
raw bytes through native/points_ext.cpp; these tests pin wire-format
equivalence against protobuf in BOTH directions plus malformed-input
behavior. Reference wire surface: proto/vector.proto (Qdrant-style
Points API)."""

import numpy as np
import pytest

from neumann_tpu.native import pypoints
from neumann_tpu.server import neumann_pb2 as pb

px = pypoints.load()
pytestmark = pytest.mark.skipif(px is None,
                                reason="native codec unavailable")


def test_parse_query_roundtrip_protoc():
    req = pb.QueryPointsRequest(
        collection="docs", vector=[1.5, -2.25, 3.0], limit=7,
        filter_json='{"op":"eq"}', with_payload=True, metric="dot",
        req_id=99)
    col, vec, limit, filt, wp, metric, rid = px.parse_query(
        req.SerializeToString())
    assert col == "docs"
    np.testing.assert_array_equal(np.frombuffer(vec, "<f4"),
                                  np.array([1.5, -2.25, 3.0], "<f4"))
    assert limit == 7 and filt == '{"op":"eq"}' and wp is True
    assert metric == "dot" and rid == 99


def test_parse_query_defaults():
    req = pb.QueryPointsRequest(vector=[0.5])
    col, vec, limit, filt, wp, metric, rid = px.parse_query(
        req.SerializeToString())
    assert col == "" and limit == 0 and filt is None
    assert wp is False and metric is None and rid == 0
    assert np.frombuffer(vec, "<f4")[0] == 0.5


def test_encode_query_parsed_by_protoc():
    v = np.array([0.25, -1.0, 9.5], "<f4")
    raw = px.encode_query("c1", v.tobytes(), 5, '{"op":"true"}', True,
                          "euclidean", 1234)
    req = pb.QueryPointsRequest.FromString(raw)
    assert req.collection == "c1" and req.limit == 5
    assert list(req.vector) == [0.25, -1.0, 9.5]
    assert req.filter_json == '{"op":"true"}'
    assert req.with_payload and req.metric == "euclidean"
    assert req.req_id == 1234


def test_encode_query_omits_defaults():
    raw = px.encode_query("", np.zeros(0, "<f4").tobytes(), 0, None,
                          False, None, 0)
    assert raw == b""


def test_encode_response_parsed_by_protoc():
    scores = np.array([0.9, 0.5], "<f4")
    raw = px.encode_response(42, ["a", "b"], scores.tobytes(),
                             ['{"x":1}', None], None)
    resp = pb.QueryPointsResponse.FromString(raw)
    assert resp.req_id == 42
    assert [r.id for r in resp.result] == ["a", "b"]
    assert resp.result[0].score == pytest.approx(0.9)
    assert resp.result[0].payload_json == '{"x":1}'
    assert resp.result[1].payload_json == ""
    assert resp.error == ""


def test_encode_response_error():
    raw = px.encode_response(7, [], b"", None, "no such collection")
    resp = pb.QueryPointsResponse.FromString(raw)
    assert resp.error == "no such collection" and resp.req_id == 7
    assert len(resp.result) == 0


def test_parse_response_roundtrip_protoc():
    resp = pb.QueryPointsResponse(
        req_id=5, error="",
        result=[pb.ScoredPoint(id="k1", score=0.75,
                               payload_json='{"a":2}'),
                pb.ScoredPoint(id="k2", score=-0.25)])
    rid, ids, scores, payloads, error = px.parse_response(
        resp.SerializeToString())
    assert rid == 5 and ids == ["k1", "k2"] and error is None
    np.testing.assert_allclose(np.frombuffer(scores, "<f4"),
                               [0.75, -0.25])
    assert payloads == ['{"a":2}', None]


def test_parse_response_no_payloads_is_none():
    resp = pb.QueryPointsResponse(
        result=[pb.ScoredPoint(id="k", score=1.0)])
    _, ids, _, payloads, _ = px.parse_response(
        resp.SerializeToString())
    assert ids == ["k"] and payloads is None


def test_native_roundtrip_symmetric():
    """client encode -> server parse and server encode -> client parse."""
    v = np.random.default_rng(0).standard_normal(768).astype("<f4")
    raw = px.encode_query("col", v.tobytes(), 10, None, False, None, 3)
    col, vec, limit, filt, wp, metric, rid = px.parse_query(raw)
    assert col == "col" and limit == 10 and rid == 3
    np.testing.assert_array_equal(np.frombuffer(vec, "<f4"), v)

    sc = np.array([0.5] * 10, "<f4")
    raw = px.encode_response(3, [f"id{i}" for i in range(10)],
                             sc.tobytes(), None, None)
    rid, ids, scores, payloads, error = px.parse_response(raw)
    assert rid == 3 and len(ids) == 10 and payloads is None


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        px.parse_query(b"\x0a\xff")          # truncated length
    with pytest.raises(ValueError):
        px.parse_response(b"\x0a\x05\x0a")   # truncated submessage
    with pytest.raises(ValueError):
        # packed float payload not divisible by 4
        px.parse_query(b"\x12\x03\x00\x00\x00")
    with pytest.raises(ValueError):
        px.encode_response(0, ["a"], b"\x00" * 3, None, None)


def test_unknown_fields_are_skipped():
    raw = pb.QueryPointsRequest(collection="x",
                                vector=[1.0]).SerializeToString()
    # append an unknown varint field 13 and an unknown LEN field 12
    raw += b"\x68\x2a" + b"\x62\x02hi"
    col, vec, *_ = px.parse_query(raw)
    assert col == "x" and np.frombuffer(vec, "<f4")[0] == 1.0
