"""Concurrency stress tests (reference: stress_tests/, 128-thread runs).

Scaled to CI size but structurally the same: many threads hammering the
same engine, asserting no exceptions, no lost writes, and consistent
counts under the engines' locking.
"""

import threading

import numpy as np
import pytest

from neumann_tpu.engines.graph import GraphEngine
from neumann_tpu.engines.relational import Column, RelationalEngine
from neumann_tpu.engines.vector import VectorEngine
from neumann_tpu.store import TensorData, TensorStore

THREADS = 16
OPS = 40


def run_threads(fn):
    errors = []

    def wrap(tid):
        try:
            fn(tid)
        except Exception as e:  # noqa: BLE001
            errors.append((tid, repr(e)))

    ts = [threading.Thread(target=wrap, args=(i,))
          for i in range(THREADS)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors[:3]


def test_store_concurrent_put_get_delete():
    store = TensorStore()

    def work(tid):
        for i in range(OPS):
            key = f"t{tid}:k{i}"
            store.put(key, TensorData.with_values(v=i, owner=tid))
            got = store.get(key)
            assert got is not None and got.get("v").value == i
            if i % 3 == 0:
                store.delete(key)

    run_threads(work)
    # every surviving key belongs to its writer
    for key in store.keys():
        tid = int(key.split(":")[0][1:])
        assert store.get(key).get("owner").value == tid
    assert len(store) == THREADS * (OPS - (OPS + 2) // 3)


def test_vector_engine_concurrent_store_and_search(rng):
    eng = VectorEngine()
    base = rng.standard_normal((THREADS, 32)).astype(np.float32)

    def work(tid):
        for i in range(OPS // 2):
            eng.store_embedding(f"t{tid}:v{i}",
                                base[tid] + 0.001 * i)
            res = eng.search_similar(base[tid], 3)
            assert res  # searches interleaved with writes never fail

    run_threads(work)
    assert eng.count_embeddings() == THREADS * (OPS // 2)
    # every thread's own vectors dominate its neighborhood
    for tid in range(THREADS):
        top = eng.search_similar(base[tid], 1)[0]
        assert top.key.startswith(f"t{tid}:")


def test_relational_concurrent_inserts():
    eng = RelationalEngine()
    eng.create_table("t", [Column("tid", "int"), Column("i", "int")])

    def work(tid):
        for i in range(OPS):
            eng.insert("t", {"tid": tid, "i": i})

    run_threads(work)
    assert eng.row_count("t") == THREADS * OPS
    # no duplicated or torn rows
    from neumann_tpu.engines.condition import Condition as C

    for tid in range(THREADS):
        assert eng.count("t", C.eq("tid", tid)) == OPS


def test_graph_concurrent_node_edge_churn():
    g = GraphEngine()
    roots = [g.create_node("root", {"tid": i}) for i in range(THREADS)]

    def work(tid):
        mine = []
        for i in range(OPS // 2):
            nid = g.create_node("leaf", {"tid": tid, "i": i})
            g.create_edge(roots[tid], nid, "owns")
            mine.append(nid)
        for nid in mine[::2]:
            g.delete_node(nid)

    run_threads(work)
    for tid in range(THREADS):
        kept = g.neighbors(roots[tid], "out")
        assert len(kept) == (OPS // 2) - (OPS // 2 + 1) // 2
        for nid in kept:
            assert g.get_node(nid)["properties"]["tid"] == tid


def test_wal_concurrent_writers(tmp_path):
    store = TensorStore()
    store.open_durable(tmp_path / "wal.log", sync_mode="batched")

    def work(tid):
        for i in range(OPS):
            store.put(f"w{tid}:{i}", TensorData.with_values(v=i))

    run_threads(work)
    store.wal_flush()
    from neumann_tpu.store.wal import TensorWal

    replayed = list(TensorWal.replay(tmp_path / "wal.log"))
    assert len(replayed) == THREADS * OPS


# ------------------------------------------------- lock-order detection

def test_lock_order_tracker_detects_inversion():
    """Synthetic ABBA inversion must be reported even without an actual
    deadlock occurring."""
    from neumann_tpu.utils.lockcheck import LockOrderTracker, TrackedLock

    tracker = LockOrderTracker()
    a = TrackedLock(threading.Lock(), "lock-A", tracker)
    b = TrackedLock(threading.Lock(), "lock-B", tracker)

    def order_ab():
        with a:
            with b:
                pass

    def order_ba():
        with b:
            with a:
                pass

    t1 = threading.Thread(target=order_ab)
    t1.start()
    t1.join()
    t2 = threading.Thread(target=order_ba)
    t2.start()
    t2.join()
    v = tracker.violations()
    assert len(v) == 1
    assert {v[0]["order_a"], v[0]["order_b"]} == \
        {("lock-A", "lock-B"), ("lock-B", "lock-A")}
    assert "inversion" in tracker.report()


def test_engines_have_no_lock_order_inversions():
    """Run mixed multi-threaded engine traffic under the tracker: the
    framework's own locks must form a consistent order."""
    from neumann_tpu.utils.lockcheck import lock_order_tracking

    with lock_order_tracking() as tracker:
        # engines constructed INSIDE the patch so their locks are tracked
        from neumann_tpu.router import QueryRouter

        r = QueryRouter()
        r.execute("CREATE TABLE t (x INT)")
        r.init_vault("pw")

        def work(tid):
            for i in range(10):
                r.execute(f"INSERT INTO t VALUES ({tid * 100 + i})")
                r.execute(f"EMBED 'v{tid}:{i}' [1.0, {float(i)}]")
                r.execute(f"NODE CREATE n {{tid: {tid}}}")
                r.execute("SELECT COUNT(*) FROM t")
                r.execute(f"VAULT SET 's{tid}' 'v'")
            r.execute(f"SIMILAR 'v{tid}:0' TOP 2")

        run_threads(work)
    # the tracker must have actually seen nested engine locks
    assert len(tracker.edges) >= 3, tracker.edges
    assert not tracker.violations(), tracker.report()


def test_new_paths_have_no_lock_order_inversions():
    """Lock-order check over the paths added this round: bulk insert,
    columnar select, joins, subqueries, HNSW build/search, cache
    semantic layer, adjacency-cached traversals."""
    from neumann_tpu.utils.lockcheck import lock_order_tracking

    with lock_order_tracking() as tracker:
        from neumann_tpu.router import QueryRouter

        r = QueryRouter()
        r.execute("CREATE TABLE a (k INT, v INT)")
        r.execute("CREATE TABLE b (k INT, w INT)")
        r.execute("CACHE INIT")

        def work(tid):
            base = tid * 1000
            r.execute("INSERT INTO a VALUES " + ", ".join(
                f"({base + i}, {i})" for i in range(20)))
            r.execute(f"INSERT INTO b VALUES ({base}, 1)")
            r.execute("SELECT a.k, b.w FROM a JOIN b ON a.k = b.k")
            r.execute("SELECT * FROM a WHERE k IN "
                      "(SELECT k FROM b) LIMIT 3")
            r.execute(f"EMBED 'h{tid}' [1.0, {float(tid)}]")
            a = r.execute(f"NODE CREATE p {{ t: {tid} }}").value
            b = r.execute(f"NODE CREATE p {{ t: {tid} }}").value
            r.execute(f"EDGE CREATE {a} -> {b} : e")
            r.execute(f"NEIGHBORS {a} BOTH")
            r.execute(f"CACHE PUT 'q{tid}' 'resp{tid}'")
            r.execute(f"CACHE SEMANTIC GET 'q{tid}' THRESHOLD 0.5")

        run_threads(work)
        r.vector.build_hnsw_index()
        r.vector.search_with_hnsw([1.0, 0.0], 2)
    assert not tracker.violations(), tracker.report()
