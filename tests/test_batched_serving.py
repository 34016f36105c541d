"""Router/server integration of the serving-side query batcher.

The reference serves each request on its own thread against a rayon
scan; our device analogue must NOT serialize per-query device calls —
NeumannServer enables router-level coalescing so concurrent SIMILAR
statements share padded bucketed batch_search calls
(server/batcher.py). These tests pin the wiring: routing equivalence,
coalescing under concurrency, lifecycle, the embedded default (off),
and the round-5 hardening — keyed (ns, dim, metric) buckets, filter
cohorts, submit-time validation, and failure isolation.
"""

import threading

import numpy as np
import pytest

from neumann_tpu.router import QueryRouter


@pytest.fixture
def router():
    r = QueryRouter()
    r.vector.config.mesh_auto = False
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((64, 16)).astype(np.float32)
    for i, v in enumerate(vecs):
        r.vector.store_embedding(f"e{i}", v,
                                 metadata={"grp": i % 2})
    yield r, vecs
    r.disable_batched_serving()


def _similar(vec, k=3):
    return "SIMILAR [" + ",".join(f"{x:.5f}" for x in vec) + f"] TOP {k}"


def test_embedded_default_is_unbatched(router):
    r, vecs = router
    assert r._batchers is None
    res = r.execute(_similar(vecs[5]))
    assert res.results[0]["key"] == "e5"


def test_batched_routing_matches_unbatched(router):
    r, vecs = router
    want = [r.execute(_similar(v)).results for v in vecs[:8]]
    r.enable_batched_serving(max_wait_ms=1.0)
    got = [r.execute(_similar(v)).results for v in vecs[:8]]
    assert got == want
    # a batcher was created for the query dim and actually served
    b = r._batchers[("", 16, "cosine")]
    assert b.queries_served >= 8


def test_concurrent_queries_coalesce(router):
    r, vecs = router
    r.enable_batched_serving(max_wait_ms=20.0)
    results = [None] * 12
    start = threading.Barrier(12)

    def worker(i):
        start.wait()
        results[i] = r.execute(_similar(vecs[i])).results

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(12):
        assert results[i][0]["key"] == f"e{i}"
    b = r._batchers[("", 16, "cosine")]
    assert b.queries_served >= 12
    # 12 concurrent callers inside a 20 ms window must share batches
    assert b.batches_run < 12


def test_metric_variants_coalesce_in_own_bucket(router):
    """Round 5: non-cosine metrics batch too, keyed separately."""
    r, vecs = router
    want = r.execute(_similar(vecs[2]) + " METRIC euclidean").results
    r.enable_batched_serving(max_wait_ms=1.0)
    res = r.execute(_similar(vecs[2]) + " METRIC euclidean")
    assert res.results[0]["key"] == "e2"
    assert res.results == want
    b = r._batchers[("", 16, "euclidean")]
    assert b.queries_served >= 1
    assert ("", 16, "cosine") not in r._batchers


def test_filtered_queries_coalesce_by_filter(router):
    """Concurrent identical WHERE filters share one masked scan."""
    r, vecs = router
    stmt = [_similar(vecs[i]) + " WHERE grp = " + str(i % 2)
            for i in range(8)]
    want = [r.execute(s).results for s in stmt]
    r.enable_batched_serving(max_wait_ms=20.0)
    results = [None] * 8
    start = threading.Barrier(8)

    def worker(i):
        start.wait()
        results[i] = r.execute(stmt[i]).results

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        # same hits in the same order; scores may differ in the last
        # bit between batch-shaped executables
        assert [h["key"] for h in results[i]] == \
            [h["key"] for h in want[i]]
        np.testing.assert_allclose(
            [h["score"] for h in results[i]],
            [h["score"] for h in want[i]], rtol=1e-5)
        assert results[i][0]["key"] == f"e{i}"
        assert all(int(h["key"][1:]) % 2 == i % 2
                   for h in results[i])
    b = r._batchers[("", 16, "cosine")]
    # two distinct filters -> at least 2 cohorts, but far fewer than 8
    assert b.queries_served >= 8
    assert b.batches_run < 8


def test_collection_queries_coalesce(router):
    r, vecs = router
    r.vector.create_collection("docs")
    for i in range(16):
        r.vector.store_in_collection("docs", f"d{i}", vecs[i])
    r.enable_batched_serving(max_wait_ms=1.0)
    res = r.execute(_similar(vecs[4]) + " IN docs")
    assert res.results[0]["key"] == "d4"
    b = r._batchers[("col/docs", 16, "cosine")]
    assert b.queries_served >= 1


def test_bad_request_fails_alone(router):
    """Submit-time validation: a wrong-dim query is rejected before it
    can join a cohort; concurrent good queries are unaffected."""
    r, vecs = router
    r.enable_batched_serving(max_wait_ms=5.0)
    b = r._batcher_for(16)
    with pytest.raises(ValueError):
        b.search(np.zeros(7, np.float32), 3)
    with pytest.raises(ValueError):
        b.search(vecs[0], 0)
    assert b.search(vecs[3], 3)[0].key == "e3"


def test_cohort_failure_isolation(router):
    """A device-call failure triggers per-request retry: only the
    poisoned request fails, the other 15 of the 16-way batch succeed
    (VERDICT r4 #6)."""
    r, vecs = router
    r.enable_batched_serving(max_wait_ms=30.0)
    b = r._batcher_for(16)
    real = r.vector.batch_search_ns
    poison = np.full(16, 7.25, np.float32)

    def flaky(q, k, metric=None, ns="", **kw):
        q = np.asarray(q)
        if q.shape[0] > 1 and bool((q == 7.25).all(axis=1).any()):
            raise RuntimeError("poisoned batch")
        if q.shape[0] == 1 and bool((q == 7.25).all()):
            raise RuntimeError("poisoned request")
        return real(q, k, metric, ns, **kw)

    r.vector.batch_search_ns = flaky
    try:
        results = [None] * 16
        errors = [None] * 16
        start = threading.Barrier(16)

        def worker(i):
            start.wait()
            try:
                results[i] = b.search(
                    poison if i == 7 else vecs[i], 3)
            except Exception as e:  # noqa: BLE001
                errors[i] = e

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert isinstance(errors[7], RuntimeError)
        for i in range(16):
            if i == 7:
                continue
            assert errors[i] is None
            assert results[i][0].key == f"e{i}"
    finally:
        r.vector.batch_search_ns = real


def test_close_drains_queue(router):
    """close() executes (or cleanly fails) queued requests instead of
    stranding them until the client timeout (advisor r4)."""
    from neumann_tpu.server.batcher import BatcherClosed

    r, vecs = router
    r.enable_batched_serving(max_wait_ms=1.0)
    b = r._batcher_for(16)
    got = []

    def worker():
        try:
            got.append(b.search(vecs[0], 3, timeout_s=5.0))
        except (BatcherClosed, TimeoutError) as e:
            got.append(e)

    t = threading.Thread(target=worker)
    t.start()
    b.close()
    t.join(timeout=6.0)
    assert not t.is_alive()
    assert len(got) == 1
    # either served during drain or failed fast — never a 30 s hang
    assert isinstance(got[0], (list, BatcherClosed))


def test_disable_closes_batchers(router):
    r, vecs = router
    r.enable_batched_serving(max_wait_ms=1.0)
    r.execute(_similar(vecs[0]))
    b = r._batchers[("", 16, "cosine")]
    r.disable_batched_serving()
    assert r._batchers is None
    assert b._stop.is_set()
    # and the router still serves unbatched
    assert r.execute(_similar(vecs[1])).results[0]["key"] == "e1"
