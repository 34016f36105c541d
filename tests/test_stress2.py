"""Stress breadth, wave 2 — bounded CI versions of the reference's
stress_tests/tests/ families not yet covered by test_stress.py:
cache_stress, hnsw_concurrency_stress, tiered_store_stress,
crash_recovery_stress, mixed_workload_stress, query_router_stress,
partition_churn_stress, clock_drift_stress, tensor_chain_stress,
tensor_compress_stress."""

import os
import random
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest


def _pound(n_threads, fn, seconds=1.0):
    """Run fn(tid) concurrently for a bounded wall time; re-raise the
    first worker exception."""
    stop = time.monotonic() + seconds
    errors = []

    def work(tid):
        try:
            while time.monotonic() < stop:
                fn(tid)
        except Exception as e:      # noqa: BLE001 - reported below
            errors.append(e)

    ts = [threading.Thread(target=work, args=(i,))
          for i in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errors:
        raise errors[0]


def test_cache_stress_concurrent_put_get_evict():
    """cache_stress.rs: hammered from 8 threads at tiny capacity; stats
    stay consistent and every exact hit returns a value this test put."""
    from neumann_tpu.cache.llm_cache import LLMCache

    cache = LLMCache(capacity=32, eviction="hybrid")
    valid = {f"q{i}": f"r{i}" for i in range(100)}

    def op(tid):
        rng = random.Random(tid ^ int(time.monotonic() * 1e3))
        q = f"q{rng.randrange(100)}"
        if rng.random() < 0.5:
            cache.put(q, valid[q])
        else:
            got = cache.get_exact(q)
            assert got is None or got == valid[q]

    _pound(8, op, seconds=1.0)
    st = cache.stats
    assert st.insertions >= st.evictions


def test_hnsw_concurrent_insert_search(rng):
    """hnsw_concurrency_stress.rs: readers search while writers insert;
    results must only ever reference live ids."""
    from neumann_tpu.ops.hnsw import HNSWIndex

    ix = HNSWIndex(dim=16)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    for v in vecs[:50]:
        ix.insert(v)
    wlock = threading.Lock()
    n_inserted = [50]

    def writer(tid):
        with wlock:
            i = n_inserted[0]
            if i >= len(vecs):
                time.sleep(0.001)
                return
            n_inserted[0] = i + 1
        ix.insert(vecs[i])

    def reader(tid):
        res = ix.search(rng.standard_normal(16).astype(np.float32), 5)
        assert len(res) <= 5
        for node_id, score in res:
            assert 0 <= node_id < len(ix)
            assert np.isfinite(score)

    _pound(2, writer, seconds=0.8)
    _pound(6, reader, seconds=0.8)
    assert len(ix) == n_inserted[0]


def test_tiered_store_stress(tmp_path, rng):
    """tiered_store_stress.rs: churn hot tier, migrate cold, keep
    reading — values must never be lost or corrupted."""
    from neumann_tpu.store.tensor_store import TensorData, TensorValue
    from neumann_tpu.store.tiered import TieredStore

    ts = TieredStore(str(tmp_path))
    model = {}
    for round_ in range(4):
        for i in range(200):
            k = f"k{i}"
            v = round_ * 1000 + i
            ts.put(k, TensorData.with_values(v=TensorValue.scalar(v)))
            model[k] = v
        ts.migrate_cold(max_items=150)
        for i in range(0, 200, 7):
            k = f"k{i}"
            got = ts.get(k)
            assert got is not None and got.get("v").value == model[k]


def test_crash_recovery_stress(tmp_path):
    """crash_recovery_stress.rs: SIGKILL a writer mid-stream three
    times; every recovery must replay a clean prefix (no torn values),
    and acknowledged-before-kill keys must survive."""
    wal = tmp_path / "crash.wal"
    script = r"""
import sys, time
from neumann_tpu.store.tensor_store import TensorData, TensorStore, TensorValue
s = TensorStore(); s.open_durable(sys.argv[1], sync_mode="immediate")
i = int(sys.argv[2])
while True:
    td = TensorData.with_values(v=TensorValue.scalar(i))
    s.put(f"k{i}", td)
    print(i, flush=True)
    i += 1
"""
    start = 0
    for round_ in range(3):
        p = subprocess.Popen(
            [sys.executable, "-c", script, str(wal), str(start)],
            stdout=subprocess.PIPE, cwd="/root/repo")
        acked = start - 1
        t0 = time.monotonic()
        while time.monotonic() - t0 < 2.0:
            line = p.stdout.readline()
            if not line:
                break
            acked = int(line)
            if acked - start > 300:
                break
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        s = __import__("neumann_tpu.store.tensor_store",
                       fromlist=["TensorStore"]).TensorStore()
        n = s.recover(str(wal))
        assert n >= acked + 1
        for i in range(0, acked + 1, max(1, acked // 50)):
            got = s.get(f"k{i}")
            assert got is not None and got.get("v").value == i, i
        start = acked + 1


def test_mixed_workload_stress():
    """mixed_workload_stress.rs: SQL + graph + vector + cache ops from
    6 threads against ONE router; no exceptions other than domain
    errors, and the relational table stays countable."""
    from neumann_tpu.router.router import QueryRouter
    from neumann_tpu.utils.errors import NeumannError

    r = QueryRouter()
    r.execute("CREATE TABLE m (a INT, b TEXT)")
    counter = [0]
    lock = threading.Lock()

    def op(tid):
        rng = random.Random(tid * 7919 + counter[0])
        with lock:
            counter[0] += 1
            i = counter[0]
        try:
            c = rng.randrange(5)
            if c == 0:
                r.execute(f"INSERT INTO m VALUES ({i}, 't{i}')")
            elif c == 1:
                r.execute(f"SELECT * FROM m WHERE a > {i - 50} LIMIT 5")
            elif c == 2:
                r.execute(f"NODE CREATE p {{n: 'x{i}'}}")
            elif c == 3:
                r.execute(f"EMBED 'mw:{i % 40}' [0.1, 0.2, {i % 7}.0]")
            else:
                r.execute("COUNT EMBEDDINGS")
        except NeumannError:
            pass

    _pound(6, op, seconds=1.2)
    assert r.execute("SELECT COUNT(*) FROM m").rows is not None


def test_query_router_stress_statement_cache():
    """query_router_stress.rs: one hot statement + a rotating cold
    tail from several threads; the statement cache must stay coherent
    (same results as a fresh parse)."""
    from neumann_tpu.router.router import QueryRouter

    r = QueryRouter()
    r.execute("CREATE TABLE qs (a INT)")
    for i in range(50):
        r.execute(f"INSERT INTO qs VALUES ({i})")

    def op(tid):
        got = r.execute("SELECT COUNT(*) FROM qs").rows
        assert got[0]["count(*)"] == 50 or got[0].get("count") == 50

    _pound(6, op, seconds=0.8)


def test_partition_churn_stress(rng):
    """partition_churn_stress.rs: keys keep resolving while nodes come
    and go; each add/remove moves only the minimal key set."""
    from neumann_tpu.parallel.partitioner import ConsistentHashPartitioner

    nodes = [f"n{i}" for i in range(3)]
    keys = [f"key{i}" for i in range(500)]
    part = ConsistentHashPartitioner(list(nodes))
    for step in range(8):
        before = {k: part.assign(k) for k in keys}
        if step % 2 == 0:
            new = f"n{3 + step}"
            nodes.append(new)
        else:
            new = None
            nodes.pop(rng.integers(0, len(nodes)))
        part = ConsistentHashPartitioner(list(nodes))
        moved = 0
        for k in keys:
            now = part.assign(k)
            assert now in nodes
            if now != before[k]:
                moved += 1
                if new is not None:
                    assert now == new   # adds only pull keys
        assert moved < len(keys) * 0.75


def test_clock_drift_stress():
    """clock_drift_stress.rs: HLC under a jittery, occasionally
    backwards wall clock must stay strictly monotonic and merge
    remote timestamps without regressing."""
    from neumann_tpu.chain.hlc import HLC

    wall = [1000]
    rng = random.Random(5)

    def now():
        wall[0] += rng.randrange(-3, 6)   # drifts, sometimes backwards
        return wall[0]

    a = HLC("a", now_ms=now)
    b = HLC("b", now_ms=now)
    last = None
    for _ in range(2000):
        if rng.random() < 0.5:
            t = a.now()
        else:
            t = a.update(b.now())
        if last is not None:
            # strict monotonicity of a's stream, even under drift
            assert (t.wall_ms, t.logical) > (last.wall_ms, last.logical)
        last = t


def test_tensor_chain_stress():
    """tensor_chain_stress.rs: hundreds of commits from several
    threads; the chain must verify and heights must be gap-free."""
    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store.tensor_store import TensorData, TensorValue

    chain = TensorChain(embedding_dim=8)
    lock = threading.Lock()
    n_commits = [0]

    def op(tid):
        with lock:                      # commit path is single-writer
            tx = chain.begin()
            tx.put(f"s{tid}", TensorData.with_values(
                v=TensorValue.scalar(n_commits[0])))
            chain.commit(tx)
            n_commits[0] += 1

    _pound(4, op, seconds=1.0)
    assert chain.verify()
    assert chain.height >= n_commits[0]


def test_tensor_compress_stress(rng):
    """tensor_compress_stress.rs: TT-compress a batch of large vectors
    concurrently; every roundtrip must stay within tolerance."""
    from neumann_tpu.compress.tensor_train import (
        TTConfig, tt_decompose, tt_reconstruct)

    vecs = rng.standard_normal((12, 1024)).astype(np.float32)

    def op(tid):
        v = vecs[tid % len(vecs)]
        tt = tt_decompose(v, TTConfig.for_dim(1024, max_rank=24))
        back = tt_reconstruct(tt)
        err = np.linalg.norm(back - v) / np.linalg.norm(v)
        assert err < 0.6        # random data is worst-case for TT

    _pound(4, op, seconds=1.0)


def test_cache_background_eviction_under_churn():
    """Background eviction + TTL expiry racing concurrent put/get/
    invalidate from 8 threads: no exceptions, bounded size, consistent
    stats."""
    import threading

    from neumann_tpu.cache.llm_cache import LLMCache

    c = LLMCache(capacity=200, eviction="hybrid",
                 default_ttl_s=0.5)
    c.start_background_eviction(interval_s=0.005, low_watermark=0.5)
    errs = []

    def worker(wid):
        try:
            for i in range(300):
                q = f"w{wid} q{i % 60}"
                if i % 7 == 0:
                    c.invalidate(q)
                elif i % 3 == 0:
                    c.get(q)
                else:
                    c.put(q, f"r{i}", ttl_s=0.05 if i % 5 else None)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    c.stop_background_eviction()
    assert not errs, errs[:2]
    assert len(c) <= 200
    s = c.stats
    assert s.insertions > 0 and s.evictions + s.expirations >= 0


def test_peer_rate_limiter_under_threads():
    """Token buckets stay consistent under 8 concurrent senders: the
    total admitted across threads never exceeds bucket + refill."""
    import threading
    import time as _time

    from neumann_tpu.chain.transport import PeerRateLimiter

    rl = PeerRateLimiter(bucket_size=50, refill_rate=100.0)
    admitted = []
    t0 = _time.monotonic()

    def sender():
        n = 0
        while _time.monotonic() - t0 < 0.5:
            if rl.check("peer"):
                n += 1
        admitted.append(n)

    threads = [threading.Thread(target=sender) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = sum(admitted)
    elapsed = _time.monotonic() - t0
    # bucket (50) + refill for the elapsed window, with scheduling slack
    assert total <= 50 + 100.0 * elapsed + 5, (total, elapsed)
    assert total >= 40, total              # and tokens were spendable
    assert rl.limited > 0                  # pressure actually hit
