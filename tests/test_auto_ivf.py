"""Auto IVF routing in the vector engine (VectorEngineConfig.ivf_auto).

Large cosine corpora route single/small-batch queries through a device
IVF-nprobe index (sub-linear HBM reads — the p99<5ms path at 10M rows,
BASELINE.md target block) instead of the brute MXU scan. Rows mutated
after the index build are rescanned exactly and merged, so results
always reflect current data (capability spec:
vector_engine/src/lib.rs:3429-3512 auto strategy pick)."""

import numpy as np
import pytest

from neumann_tpu.engines.vector import (
    SearchResult,
    VectorEngine,
    VectorEngineConfig,
)


def _clustered(n, d, k_clusters, rng):
    cents = rng.standard_normal((k_clusters, d)).astype(np.float32) * 3
    assign = rng.integers(0, k_clusters, n)
    v = cents[assign] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32)
    return v.astype(np.float32)


@pytest.fixture(scope="module")
def engine_and_data():
    rng = np.random.default_rng(42)
    n, d = 12_000, 64
    vecs = _clustered(n, d, 48, rng)
    cfg = VectorEngineConfig(
        ivf_auto_threshold=5_000, ivf_auto_clusters=48,
        ivf_auto_nprobe=12, ivf_auto_max_batch=8)
    eng = VectorEngine(config=cfg)
    eng.batch_store_embeddings(
        [(f"k{i}", vecs[i]) for i in range(n)])
    return eng, vecs


def _brute_top(vecs, q, k):
    vn = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    qn = q / max(np.linalg.norm(q), 1e-30)
    return np.argsort(-(vn @ qn))[:k]


def test_auto_route_triggers_and_recalls(engine_and_data):
    eng, vecs = engine_and_data
    hits = eng.search_similar(vecs[7], 10)
    # the index exists now: the corpus is over the threshold
    corpus = eng._corpora[""][64]
    assert getattr(corpus, "_auto_ivf", None) is not None
    assert hits[0].key == "k7" and hits[0].score > 0.98
    # recall@10 vs exact oracle over several queries
    recs = []
    for qi in (3, 1000, 5000, 11999):
        want = {f"k{i}" for i in _brute_top(vecs, vecs[qi], 10)}
        got = {h.key for h in eng.search_similar(vecs[qi], 10)}
        recs.append(len(want & got) / 10)
    assert np.mean(recs) >= 0.9, recs


def test_large_batches_ride_batched_ivf(engine_and_data):
    """Batches past ivf_auto_max_batch route through the probe-sharing
    batched kernel (each cluster window streamed once per batch) with
    near-oracle recall; ivf_auto_batched=False restores brute."""
    eng, vecs = engine_and_data
    out = eng.batch_search(vecs[:16], 5)
    assert len(out) == 16 and out[3][0].key == "k3"
    recs = []
    for qi in range(16):
        want = {f"k{i}" for i in _brute_top(vecs, vecs[qi], 5)}
        recs.append(len(want & {h.key for h in out[qi]}) / 5)
    assert np.mean(recs) >= 0.9, recs

    eng.config.ivf_auto_batched = False
    try:
        brute = eng.batch_search(vecs[:16], 5)
        assert brute[3][0].key == "k3"
    finally:
        eng.config.ivf_auto_batched = True


def test_mutations_after_build_are_exact(engine_and_data):
    eng, vecs = engine_and_data
    d = vecs.shape[1]
    q = np.asarray(vecs[100])
    # plant a new best match AFTER the index was built. Its score comes
    # from the exact f32 delta rescan; k100 (== q) scores ~1.0 through
    # the int8/bf16 index, so allow the tie either way round.
    eng.store_embedding("planted", q * 2.0)
    hits = eng.search_similar(q, 5)
    planted = next(h for h in hits[:2] if h.key == "planted")
    assert planted.score > 0.9999     # exact f32 rescan, not int8
    # update an existing row to become another best match
    eng.store_embedding("k500", q * 1.5)
    hits = eng.search_similar(q, 5)
    assert {"planted", "k500"} <= {h.key for h in hits[:3]}
    # delete them: neither may come back (stale candidates dropped)
    eng.delete_embedding("planted")
    eng.delete_embedding("k500")
    hits = eng.search_similar(q, 5)
    keys = {h.key for h in hits}
    assert "planted" not in keys and "k500" not in keys
    assert hits[0].key == "k100"


def test_rebuild_after_heavy_churn(engine_and_data):
    eng, vecs = engine_and_data
    corpus = eng._corpora[""][64]
    eng.search_similar(vecs[0], 3)
    old = corpus._auto_ivf
    # churn more than max(1024, rebuild_frac*n) rows -> rebuild
    rng = np.random.default_rng(1)
    upd = rng.standard_normal((1100, 64)).astype(np.float32)
    eng.batch_store_embeddings(
        [(f"k{i}", upd[j]) for j, i in enumerate(range(2000, 3100))])
    eng.search_similar(vecs[0], 3)
    assert corpus._auto_ivf is not old
    assert corpus.slab.watch_count("auto_ivf") == 0


def test_filtered_and_noncosine_fall_back(engine_and_data):
    eng, vecs = engine_and_data
    from neumann_tpu.engines.vector import FilterCondition

    # metadata filter -> brute path with fused mask (no metadata set,
    # so an exists-filter matches nothing)
    out = eng.search_similar_filtered(
        vecs[0], 5, FilterCondition.exists("tag"))
    assert out == []
    # euclidean metric never routes through the cosine IVF
    hits = eng.search_similar_with_metric(vecs[8], 3, "euclidean")
    assert hits[0].key == "k8"


def test_disabled_flag():
    cfg = VectorEngineConfig(ivf_auto=False, ivf_auto_threshold=10)
    eng = VectorEngine(config=cfg)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((50, 8)).astype(np.float32)
    eng.batch_store_embeddings([(f"x{i}", v[i]) for i in range(50)])
    assert eng.search_similar(v[4], 3)[0].key == "x4"
    assert getattr(eng._corpora[""][8], "_auto_ivf", None) is None


def test_auto_ivf_concurrent_search_and_writes():
    """Searches run while writers churn rows: no exceptions, results
    always map to live keys, and a freshly planted best match is
    visible once writes settle (delta-rescan correctness under
    threads)."""
    import threading

    rng = np.random.default_rng(9)
    n, d = 6000, 32
    vecs = _clustered(n, d, 16, rng)
    cfg = VectorEngineConfig(ivf_auto_threshold=2_000,
                             ivf_auto_clusters=16, ivf_auto_nprobe=8)
    eng = VectorEngine(config=cfg)
    eng.batch_store_embeddings([(f"k{i}", vecs[i]) for i in range(n)])
    eng.search_similar(vecs[0], 3)            # build the index
    errors = []
    stop = threading.Event()

    def searcher(tid):
        r = np.random.default_rng(tid)
        try:
            while not stop.is_set():
                q = vecs[int(r.integers(0, n))]
                hits = eng.search_similar(q, 5)
                for h in hits:
                    if eng.get_embedding(h.key) is None and \
                            not h.key.startswith("churn"):
                        # deleted concurrently is fine; a key that
                        # never existed is not
                        assert h.key.startswith(("k", "churn")), h.key
        except Exception as e:    # pragma: no cover
            errors.append((tid, repr(e)))

    def writer(tid):
        r = np.random.default_rng(100 + tid)
        try:
            i = 0
            while not stop.is_set():
                v = r.standard_normal(d).astype(np.float32)
                eng.store_embedding(f"churn{tid}-{i % 50}", v)
                if r.random() < 0.3:
                    eng.delete_embedding(
                        f"churn{tid}-{int(r.integers(0, 50))}")
                i += 1
        except Exception as e:    # pragma: no cover
            errors.append((tid, repr(e)))

    threads = [threading.Thread(target=searcher, args=(t,))
               for t in range(4)]
    threads += [threading.Thread(target=writer, args=(t,))
                for t in range(2)]
    for t in threads:
        t.start()
    import time

    time.sleep(1.5)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not errors, errors[:3]
    # settled correctness: plant an exact match and find it
    q = vecs[123]
    eng.store_embedding("planted-final", q * 3.0)
    hits = eng.search_similar(q, 3)
    assert any(h.key in ("planted-final", "k123") for h in hits[:2])


def test_angular_rides_auto_ivf(engine_and_data):
    """angular/geodesic order by cosine, so they take the same
    sub-linear IVF route; scores come back as -arccos(cos)."""
    eng, vecs = engine_and_data
    cos_hits = eng.search_similar_with_metric(vecs[7], 10, "cosine")
    for metric in ("angular", "geodesic"):
        hits = eng.search_similar_with_metric(vecs[7], 10, metric)
        assert [h.key for h in hits] == [h.key for h in cos_hits], metric
        for h, c in zip(hits, cos_hits):
            assert h.score == pytest.approx(
                -np.arccos(np.clip(c.score, -1, 1)), abs=1e-5)
        # distances: 0 >= score >= -pi, best first
        assert hits[0].score == pytest.approx(0.0, abs=5e-2)
        assert all(a.score >= b.score
                   for a, b in zip(hits, hits[1:]))
