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
