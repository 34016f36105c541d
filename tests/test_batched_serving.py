"""Router/server integration of the serving-side query batcher.

The reference serves each request on its own thread against a rayon
scan; our device analogue must NOT serialize per-query device calls —
NeumannServer enables router-level coalescing so concurrent plain
SIMILAR statements share one padded bucketed batch_search
(server/batcher.py). These tests pin the wiring: routing equivalence,
coalescing under concurrency, lifecycle, and the embedded default
(off).
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
        r.vector.store_embedding(f"e{i}", v)
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
    b = r._batchers[16]
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
    b = r._batchers[16]
    assert b.queries_served >= 12
    # 12 concurrent callers inside a 20 ms window must share batches
    assert b.batches_run < 12


def test_non_cosine_and_filtered_bypass_batcher(router):
    r, vecs = router
    r.enable_batched_serving(max_wait_ms=1.0)
    res = r.execute(_similar(vecs[2]) + " METRIC euclidean")
    assert res.results[0]["key"] == "e2"
    # euclidean went through the direct path: no batcher for the dim,
    # or the batcher saw no extra queries
    b = r._batchers.get(16)
    assert b is None or b.queries_served <= 0


def test_disable_closes_batchers(router):
    r, vecs = router
    r.enable_batched_serving(max_wait_ms=1.0)
    r.execute(_similar(vecs[0]))
    b = r._batchers[16]
    r.disable_batched_serving()
    assert r._batchers is None
    assert b._stop.is_set()
    # and the router still serves unbatched
    assert r.execute(_similar(vecs[1])).results[0]["key"] == "e1"
