"""Cold-branch coverage, part 4: serializer fallbacks, reflection
error paths, cluster-query relay without a leader, router filter and
id-coercion errors, OTLP server wiring."""

import numpy as np
import pytest

from neumann_tpu.utils.errors import NeumannError


# ------------------------------------------------------------- server
def test_json_default_fallbacks():
    import base64

    from neumann_tpu.server.server import _json_default, dumps

    assert _json_default(b"\x01\x02") == {
        "__b64__": base64.b64encode(b"\x01\x02").decode()}
    assert _json_default(np.arange(3)) == [0, 1, 2]
    assert _json_default(np.int32(7)) == 7
    assert _json_default(np.float32(1.5)) == 1.5
    with pytest.raises(TypeError, match="unserializable"):
        _json_default(object())
    assert "1.5" in dumps({"x": np.float64(1.5)})


def test_reflection_unknown_file_and_unsupported():
    from neumann_tpu.server import reflection_pb2 as rpb
    from neumann_tpu.server.server import NeumannServer

    srv = NeumannServer(port=0)
    try:
        req = rpb.ServerReflectionRequest()
        req.file_by_filename = "nope.proto"
        out = list(srv._reflection_info(iter([req]), None))
        assert out[0].error_response.error_code == 5
        req2 = rpb.ServerReflectionRequest()
        req2.all_extension_numbers_of_type = "x.Y"
        out2 = list(srv._reflection_info(iter([req2]), None))
        assert out2[0].error_response.error_code == 12
    finally:
        srv.stop()


def test_server_otlp_wiring():
    from neumann_tpu.server.server import NeumannServer

    srv = NeumannServer(port=0)
    try:
        srv.enable_otlp("http://127.0.0.1:9", interval_s=3600)
        assert srv._otlp is not None
        srv._otlp.stop()
    finally:
        srv.stop()


# ------------------------------------------------------------- router
def test_router_filter_errors_and_id_coercion():
    from neumann_tpu.engines.condition import Condition as C
    from neumann_tpu.engines.vector import VectorError
    from neumann_tpu.router.router import _as_id, _filter_from_condition

    with pytest.raises(VectorError, match="LIKE"):
        _filter_from_condition(C.like("name", "%middle%"))
    f = _filter_from_condition(C.like("name", "pre%"))
    assert f is not None
    f2 = _filter_from_condition(C.is_not_null("name"))
    assert f2 is not None
    with pytest.raises(NeumannError, match="invalid id"):
        _as_id(True)
    with pytest.raises(NeumannError, match="invalid id"):
        _as_id("xyz")
    assert _as_id("17") == 17


def test_router_cluster_read_stays_local():
    """With a cluster_client attached, read statements classify as
    local and never touch the (broken) client; writes forward."""
    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    r.execute("CREATE TABLE t (v INT)")
    r.execute("INSERT INTO t VALUES (3)")

    class Boom:
        def execute(self, *a, **k):
            raise ConnectionError("no cluster")

    r.cluster_client = Boom()
    r.cluster_read_mode = "local"
    out = r.execute("SELECT * FROM t")      # read: local
    assert out.rows[0]["v"] == 3
    with pytest.raises(Exception):
        r.execute("INSERT INTO t VALUES (4)")   # write: forwards
    r.cluster_client = None


# ------------------------------------------------------------- node
def test_cluster_query_relay_no_leader():
    """A follower handling a strong cluster_query with no known leader
    answers 'no leader available' instead of dropping the request, and
    relays once a leader is known; results route back via _relay."""
    from neumann_tpu.chain.node import TcpClusterNode
    from neumann_tpu.chain.transport import Message

    n = TcpClusterNode("n1", {"n2": ("127.0.0.1", 1)}, port=0,
                       query_executor=lambda q: {"ok": q},
                       gossip=False)
    sent = []
    n.transport.send = lambda dst, kind, payload: (
        sent.append((dst, kind, payload)) or True)
    try:
        q = {"query": "SELECT 1", "qid": "q1", "reply_to": "n2",
             "strong": True}
        # follower, no leader -> error reply
        n.raft.state = "follower"
        n.raft.leader_id = None
        n._handle(Message(kind="cluster_query", src="n2", dst="n1", payload=q))
        dst, kind, payload = sent[-1]
        assert kind == "cluster_query_result"
        assert payload["error"] == "no leader available"
        # follower with a known leader -> relays and registers qid
        n.raft.leader_id = "n2"
        n._handle(Message(kind="cluster_query", src="n2", dst="n1", payload=q))
        dst, kind, payload = sent[-1]
        assert (dst, kind) == ("n2", "cluster_query")
        assert n._relay.get("q1") == "n2"
        # the result relays back to the original requester
        n._handle(Message(kind="cluster_query_result", src="n2", dst="n1",
                          payload={"qid": "q1", "result": {"x": 1},
                                   "error": None}))
        dst, kind, payload = sent[-1]
        assert (dst, kind) == ("n2", "cluster_query_result")
        assert payload["result"] == {"x": 1}
    finally:
        n.stop()
