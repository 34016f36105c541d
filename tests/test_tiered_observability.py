"""Tiered store + observability tests."""

import logging

import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.store.tensor_store import TensorData
from neumann_tpu.store.tiered import TieredStore
from neumann_tpu.utils.observability import (
    IndexTracker,
    QueryMetrics,
    span,
)


@pytest.fixture
def ts(tmp_path):
    t = TieredStore(str(tmp_path / "tiered"))
    yield t
    t.close()


def test_tiered_put_get_migrate(ts):
    for i in range(10):
        ts.put(f"k{i}", TensorData.with_values(v=i))
    assert len(ts) == 10
    assert ts.stats()["hot"] == 10
    # access some keys so they are "hot"
    for _ in range(5):
        ts.get("k0")
        ts.get("k1")
    n = ts.migrate_cold(max_items=8)
    assert n == 8
    st = ts.stats()
    assert st["hot"] == 2 and st["cold"] == 8
    # hottest keys stayed hot
    assert "k0" in ts._hot and "k1" in ts._hot
    # cold read works and promotes
    got = ts.get("k5")
    assert got.get("v").value == 5
    assert ts.stats()["hot"] == 3 and ts.stats()["cold"] == 7


def test_tiered_preload_delete_compact(ts):
    for i in range(6):
        ts.put(f"k{i}", TensorData.with_values(v=i))
    ts.migrate_cold()
    assert ts.stats()["hot"] == 0
    assert ts.preload(["k1", "k2", "nope"]) == 2
    assert ts.exists("k3") and not ts.exists("zz")
    assert ts.delete("k3")
    before = ts.stats()["cold_bytes"]
    ts.compact()
    assert ts.stats()["cold_bytes"] < before
    assert ts.get("k4").get("v").value == 4
    assert ts.get("k3") is None


def test_tiered_overwrite_cold(ts):
    ts.put("k", TensorData.with_values(v=1))
    ts.migrate_cold()
    ts.put("k", TensorData.with_values(v=2))
    assert ts.get("k").get("v").value == 2
    assert ts.stats()["cold"] == 0


def test_query_metrics_and_slow_log():
    m = QueryMetrics(slow_threshold_ms=5.0)
    m.record("Select", 1.0)
    m.record("Select", 10.0, query="SELECT * FROM big")
    m.record("Insert", 2.0, error=True)
    snap = m.snapshot()
    assert snap["Select"]["count"] == 2
    assert snap["Select"]["max_ms"] == 10.0
    assert snap["Insert"]["errors"] == 1
    slow = m.slow_queries()
    assert len(slow) == 1 and "big" in slow[0]["query"]


def test_router_records_metrics():
    r = QueryRouter()
    r.execute("SHOW TABLES")
    with pytest.raises(Exception):
        r.execute("SELECT * FROM nope")
    snap = r.metrics.snapshot()
    assert snap["ShowTables"]["count"] == 1
    assert snap["Select"]["errors"] == 1


def test_index_tracker():
    t = IndexTracker()
    for _ in range(150):
        t.record("users", "age", used_index=False)
    t.record("users", "email", used_index=True)
    sugg = t.suggestions(min_misses=100)
    assert sugg == [{"table": "users", "column": "age",
                     "full_scans": 150}]


def test_span_logs(caplog):
    with caplog.at_level(logging.DEBUG, logger="neumann_tpu"):
        with span("test_op", table="t"):
            pass
    assert any("test_op" in rec.message for rec in caplog.records)


# ------------------------------------------------- OTLP export

def test_otlp_metrics_json_shape():
    from neumann_tpu.utils.observability import QueryMetrics
    from neumann_tpu.utils.otlp import metrics_to_otlp

    m = QueryMetrics()
    m.record("Select", 1.2)
    m.record("Select", 250.0, error=True)
    m.record("Similar", 7.0)
    body = metrics_to_otlp(m, "svc-x")
    rm = body["resourceMetrics"][0]
    attrs = {a["key"]: a["value"] for a in rm["resource"]["attributes"]}
    assert attrs["service.name"]["stringValue"] == "svc-x"
    metrics = {mm["name"]: mm for mm in rm["scopeMetrics"][0]["metrics"]}
    counts = {tuple(a["value"]["stringValue"]
                    for a in dp["attributes"]): int(dp["asInt"])
              for dp in metrics["neumann.queries"]["sum"]["dataPoints"]}
    assert counts[("Select",)] == 2 and counts[("Similar",)] == 1
    errs = {tuple(a["value"]["stringValue"]
                  for a in dp["attributes"]): int(dp["asInt"])
            for dp in metrics["neumann.query.errors"]["sum"]["dataPoints"]}
    assert errs[("Select",)] == 1
    hist = metrics["neumann.query.duration"]["histogram"]["dataPoints"]
    sel = next(d for d in hist
               if d["attributes"][0]["value"]["stringValue"] == "Select")
    assert sum(int(c) for c in sel["bucketCounts"]) == 2
    assert len(sel["bucketCounts"]) == len(sel["explicitBounds"]) + 1


def test_otlp_http_push_and_span_recorder():
    import http.server
    import json as _json
    import threading

    from neumann_tpu.utils.observability import (
        QueryMetrics,
        set_span_recorder,
        span,
    )
    from neumann_tpu.utils.otlp import OtlpExporter, SpanRecorder

    received = []

    class Collector(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, _json.loads(body)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        exp = OtlpExporter(f"http://127.0.0.1:{srv.server_port}")
        m = QueryMetrics()
        m.record("Insert", 3.3)
        assert exp.export_metrics(m)

        rec = SpanRecorder()
        set_span_recorder(rec)
        try:
            with span("unit.work", table="t1"):
                pass
        finally:
            set_span_recorder(None)
        assert exp.export_spans(rec)
        paths = [p for p, _ in received]
        assert "/v1/metrics" in paths and "/v1/traces" in paths
        traces = next(b for p, b in received if p == "/v1/traces")
        sp = traces["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        assert sp["name"] == "unit.work"
        assert int(sp["endTimeUnixNano"]) >= int(sp["startTimeUnixNano"])
        assert len(sp["traceId"]) == 32 and len(sp["spanId"]) == 16
    finally:
        srv.shutdown()


def test_otlp_file_endpoint_and_collector_down(tmp_path):
    from neumann_tpu.utils.observability import QueryMetrics
    from neumann_tpu.utils.otlp import OtlpExporter

    m = QueryMetrics()
    m.record("Select", 1.0)
    path = tmp_path / "otlp.jsonl"
    exp = OtlpExporter(f"file://{path}")
    assert exp.export_metrics(m)
    assert exp.export_metrics(m)
    import json as _json

    lines = [_json.loads(ln) for ln in path.read_text().splitlines()]
    assert len(lines) == 2 and lines[0]["path"] == "/v1/metrics"
    # collector down: returns False, never raises
    down = OtlpExporter("http://127.0.0.1:9", timeout=0.3)
    assert down.export_metrics(m) is False


def test_hot_cold_shards(tmp_path):
    from neumann_tpu.store.tensor_store import TensorData, TensorValue
    from neumann_tpu.store.tiered import TieredStore

    ts = TieredStore(str(tmp_path))
    for i in range(64):
        ts.put(f"k{i}", TensorData.with_values(v=TensorValue.scalar(i)))
    for _ in range(20):
        ts.get("k7")                      # make k7's shard hot
    hot = ts.hot_shards(3)
    assert hot and hot[0][1] >= 20
    assert hot == sorted(hot, key=lambda kv: -kv[1])
    # with a huge threshold only never-touched shards are cold (key
    # hashing is salted per process, so compute which shards got keys)
    used = {ts._shard_of(f"k{i}") for i in range(64)}
    assert set(ts.cold_shards(threshold_s=3600.0)) == \
        set(range(16)) - used
    # with a zero threshold everything is "cold"
    assert len(ts.cold_shards(threshold_s=-1.0)) == 16
