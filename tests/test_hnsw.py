"""HNSW index tests: recall vs exact oracle, storage modes, metrics,
serialization, native/fallback parity, engine integration.

Mirrors the reference's HNSW test coverage (tensor_store/src/hnsw.rs
tests + integration_tests/tests/hnsw_index.rs): golden recall against a
NumPy oracle, per-node storage modes, config presets, save/load.
"""

import numpy as np
import pytest

import neumann_tpu.native as native
from neumann_tpu.ops.hnsw import HNSWConfig, HNSWIndex
from neumann_tpu.store.sparse import SparseVector


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture
def corpus(rng):
    return rng.standard_normal((1200, 48)).astype(np.float32)


def exact_topk(corpus, q, k, metric="cosine"):
    if metric == "cosine":
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        scores = cn @ (q / np.linalg.norm(q))
    elif metric == "dot":
        scores = corpus @ q
    else:
        scores = -np.linalg.norm(corpus - q, axis=1)
    return np.argsort(-scores)[:k]


def build(corpus, cfg=None, insert="insert"):
    ix = HNSWIndex(corpus.shape[1], cfg)
    for v in corpus:
        getattr(ix, insert)(v)
    return ix


def recall(ix, corpus, rng, k=10, ef=100, n_queries=40,
           metric="cosine"):
    hits = 0
    for qi in range(n_queries):
        q = corpus[qi] + 0.05 * rng.standard_normal(
            corpus.shape[1]).astype(np.float32)
        got = {i for i, _ in ix.search_with_ef(q, k, ef)}
        want = set(exact_topk(corpus, q, k, metric).tolist())
        hits += len(got & want)
    return hits / (n_queries * k)


def test_recall_vs_oracle(corpus, rng):
    ix = build(corpus)
    assert len(ix) == len(corpus)
    assert recall(ix, corpus, rng) >= 0.95


def test_self_query_top1(corpus):
    ix = build(corpus)
    top = ix.search(corpus[17], 5)
    assert top[0][0] == 17
    assert top[0][1] == pytest.approx(1.0, abs=1e-5)


def test_ef_tradeoff(corpus, rng):
    """Higher ef must not reduce recall (monotone search quality)."""
    ix = build(corpus, HNSWConfig.high_speed())
    lo = recall(ix, corpus, rng, ef=10)
    hi = recall(ix, corpus, rng, ef=200)
    assert hi >= lo
    assert hi >= 0.9


def test_metrics(corpus):
    for metric in ("euclidean", "dot"):
        ix = build(corpus[:300], HNSWConfig(metric=metric))
        top = ix.search(corpus[9], 3)
        assert top[0][0] == 9
        if metric == "euclidean":
            # similarity = 1/(1+d), self distance 0 => 1.0
            assert top[0][1] == pytest.approx(1.0, abs=1e-5)
        else:
            want = float(corpus[9] @ corpus[9])
            assert top[0][1] == pytest.approx(want, rel=1e-4)


def test_quantized_storage(corpus, rng):
    ix = build(corpus, insert="insert_quantized")
    stats = ix.memory_stats()
    assert stats["quantized_count"] == len(corpus)
    assert stats["dense_count"] == 0
    assert recall(ix, corpus, rng) >= 0.9
    # reconstruction error bounded by the u8 step size
    got = ix.get(3)
    step = (corpus[3].max() - corpus[3].min()) / 255
    assert np.max(np.abs(got - corpus[3])) <= step


def test_binary_storage(corpus):
    ix = build(corpus[:400], insert="insert_binary")
    assert ix.memory_stats()["binary_count"] == 400
    # sign pattern survives: searching with the stored vector's signs
    q = np.where(corpus[5] > 0, 1.0, -1.0).astype(np.float32)
    assert ix.search(q, 3)[0][0] == 5
    assert set(np.unique(ix.get(5))) <= {-1.0, 1.0}


def test_sparse_and_auto(rng):
    d = 64
    dense = rng.standard_normal((200, d)).astype(np.float32)
    sparse_mask = np.arange(d) % 4 == 0
    sparse_vecs = np.where(sparse_mask, dense, 0.0).astype(np.float32)
    ix = HNSWIndex(d)
    for v in sparse_vecs[:100]:
        ix.insert_auto(v)          # 75% zeros -> sparse storage
    for v in dense[100:150]:
        ix.insert_auto(v)          # dense
    stats = ix.memory_stats()
    assert stats["sparse_count"] == 100
    assert stats["dense_count"] == 50
    sp = SparseVector.from_dense(sparse_vecs[7])
    assert ix.search_sparse(sp, 3)[0][0] == 7


def test_tt_storage(corpus):
    ix = HNSWIndex(corpus.shape[1])
    for v in corpus[:50]:
        ix.insert(v)
    tid = ix.insert_tt(corpus[50])
    stats = ix.memory_stats()
    assert stats["tt_count"] == 1
    assert stats["dense_count"] == 50
    # TT reconstruction is lossy but close; self-query still wins
    assert ix.search(corpus[50], 1)[0][0] == tid


def test_max_nodes_capacity():
    ix = HNSWIndex(8, HNSWConfig(max_nodes=3))
    for i in range(3):
        ix.insert(np.full(8, float(i + 1), np.float32))
    with pytest.raises(OverflowError):
        ix.insert(np.ones(8, np.float32))


def test_input_validation():
    ix = HNSWIndex(8)
    with pytest.raises(ValueError):
        ix.insert(np.ones(9, np.float32))
    with pytest.raises(ValueError):
        ix.insert(np.full(8, np.nan, np.float32))
    with pytest.raises(ValueError):
        HNSWConfig(metric="hamming")
    with pytest.raises(ValueError):
        HNSWIndex(0)
    sp = SparseVector(np.array([99], np.int32),
                      np.array([1.0], np.float32), 100)
    with pytest.raises(ValueError):
        ix.insert_sparse(sp)


def test_config_presets():
    hr, hs = HNSWConfig.high_recall(), HNSWConfig.high_speed()
    assert (hr.m, hr.m0, hr.ef_construction, hr.ef_search) == (
        32, 64, 400, 200)
    assert (hs.m, hs.m0, hs.ef_construction, hs.ef_search) == (
        8, 16, 100, 20)
    assert HNSWConfig().m0 == 32            # default m0 = 2*m
    assert HNSWConfig(m=4).ml == pytest.approx(1 / np.log(4))
    assert HNSWConfig().with_metric("dot").metric == "dot"


def test_serialization_roundtrip(corpus, tmp_path):
    ix = HNSWIndex(corpus.shape[1])
    for i, v in enumerate(corpus[:200]):
        (ix.insert_quantized if i % 2 else ix.insert)(v)
    path = tmp_path / "ix.hnsw"
    ix.save(path)
    ix2 = HNSWIndex.load(path)
    assert len(ix2) == 200
    assert ix2.config.m == ix.config.m
    assert ix2.memory_stats()["quantized_count"] == 100
    assert ix.search(corpus[3], 5) == ix2.search(corpus[3], 5)


def test_from_bytes_rejects_garbage():
    with pytest.raises(ValueError):
        HNSWIndex.from_bytes(b"nonsense")
    with pytest.raises(ValueError):
        HNSWIndex.from_bytes(b"NHNW" + b"\x00" * 20 + b"garbage!")


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setattr(native, "load", lambda: None)


def test_fallback_matches_native(corpus, rng, no_native):
    """Pure-Python path implements the identical algorithm."""
    ix = build(corpus[:400])
    assert ix._py is not None
    assert recall(ix, corpus[:400], rng) >= 0.95


def test_cross_format_native_to_py(corpus, monkeypatch):
    if not native.available():
        pytest.skip("no native lib")
    ix = build(corpus[:150])
    blob = ix.to_bytes()
    want = ix.search(corpus[4], 5)
    monkeypatch.setattr(native, "load", lambda: None)
    ix2 = HNSWIndex.from_bytes(blob)
    assert ix2._py is not None
    got = ix2.search(corpus[4], 5)
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-5)


def test_cross_format_py_to_native(corpus, monkeypatch):
    if not native.available():
        pytest.skip("no native lib")
    monkeypatch.setattr(native, "load", lambda: None)
    ix = build(corpus[:150])
    blob = ix.to_bytes()
    want = ix.search(corpus[4], 5)
    monkeypatch.undo()
    ix2 = HNSWIndex.from_bytes(blob)
    assert ix2._py is None
    got = ix2.search(corpus[4], 5)
    assert [i for i, _ in got] == [i for i, _ in want]


# ---------------------------------------------------------------- engine

def test_engine_hnsw_index(rng, tmp_path):
    from neumann_tpu.engines.vector import VectorEngine, VectorError

    eng = VectorEngine()
    vecs = rng.standard_normal((300, 32)).astype(np.float32)
    eng.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(300)])
    n = eng.build_hnsw_index(m=16, ef_construction=100)
    assert n == 300
    res = eng.search_with_hnsw(vecs[17], 5)
    assert res[0].key == "v17"
    res_ef = eng.search_with_hnsw_ef(vecs[17], 5, ef=200)
    assert res_ef[0].key == "v17"
    # save/load roundtrip through the engine
    path = tmp_path / "index.npz"
    eng.save_index(path)
    eng2 = VectorEngine()
    eng2.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(300)])
    assert eng2.load_index(path) == 300
    assert eng2.search_with_hnsw(vecs[17], 3)[0].key == "v17"
    with pytest.raises(VectorError):
        eng.build_hnsw_index(storage="bogus")


def test_engine_hnsw_storage_modes(rng):
    from neumann_tpu.engines.vector import VectorEngine

    eng = VectorEngine()
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    eng.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(120)])
    eng.build_hnsw_index(storage="quantized")
    assert eng.search_with_hnsw(vecs[8], 3)[0].key == "v8"
    eng.build_hnsw_index(storage="binary")
    q = np.where(vecs[8] > 0, 1.0, -1.0).astype(np.float32)
    assert eng.search_with_hnsw(q, 3)[0].key == "v8"


def test_search_edge_inputs(corpus):
    ix = build(corpus[:100])
    assert ix.search(corpus[0], 0) == []            # k = 0
    empty = HNSWIndex(corpus.shape[1])
    assert empty.search(corpus[0], 5) == []         # empty index
    sp = SparseVector(np.array([corpus.shape[1]], np.int32),
                      np.array([1.0], np.float32), corpus.shape[1] + 1)
    with pytest.raises(ValueError):                 # position == dim
        ix.insert_sparse(sp)


def test_fallback_exact_with_exhaustive_ef(corpus, rng, no_native):
    """With ef = n the walk is exhaustive, so results must EXACTLY
    match the brute-force oracle — kills ranking/heap mutants in the
    pure-Python search."""
    n = 150
    ix = build(corpus[:n])
    for qi in range(30):
        q = corpus[qi] + 0.05 * rng.standard_normal(
            corpus.shape[1]).astype(np.float32)
        got = [i for i, _ in ix.search_with_ef(q, 5, n)]
        want = exact_topk(corpus[:n], q, 5).tolist()
        assert got == want, qi


def test_fallback_storage_modes(corpus, no_native):
    ix = HNSWIndex(corpus.shape[1])
    for v in corpus[:60]:
        ix.insert_quantized(v)
    got = ix.get(3)
    step = (corpus[3].max() - corpus[3].min()) / 255
    assert np.max(np.abs(got - corpus[3])) <= step
    ib = HNSWIndex(corpus.shape[1])
    for v in corpus[:60]:
        ib.insert_binary(v)
    assert set(np.unique(ib.get(5))) <= {-1.0, 1.0}
    q = np.where(corpus[5] > 0, 1.0, -1.0).astype(np.float32)
    assert ib.search(q, 3)[0][0] == 5


def test_cross_format_all_kinds(corpus, rng, monkeypatch):
    """Round-trip every storage kind (incl. binary/sparse payloads and
    multiple TT ids) through both serializers, both directions."""
    if not native.available():
        pytest.skip("no native lib")
    d = corpus.shape[1]

    def build_mixed():
        ix = HNSWIndex(d)
        for i, v in enumerate(corpus[:80]):
            if i % 4 == 0:
                ix.insert(v)
            elif i % 4 == 1:
                ix.insert_quantized(v)
            elif i % 4 == 2:
                ix.insert_binary(v)
            else:
                sparse = np.where(np.arange(d) % 3 == 0, v,
                                  0.0).astype(np.float32)
                ix.insert_sparse(SparseVector.from_dense(sparse))
        ix.insert_tt(corpus[80])
        ix.insert_tt(corpus[81])
        return ix

    native_ix = build_mixed()
    blob = native_ix.to_bytes()
    want = native_ix.search(corpus[7], 6)
    monkeypatch.setattr(native, "load", lambda: None)
    py_ix = HNSWIndex.from_bytes(blob)
    assert py_ix._py is not None
    assert py_ix.search(corpus[7], 6) == [
        (i, pytest.approx(s, abs=1e-5)) for i, s in want]
    assert py_ix.memory_stats()["tt_count"] == 2
    # reconstructions agree for every kind
    for nid in (0, 1, 2, 3, 80):
        assert np.allclose(py_ix.get(nid), native_ix.get(nid),
                           atol=1e-6)
    # py-serialized blob loads back in native with identical results
    py_built = build_mixed()
    blob2 = py_built.to_bytes()
    want2 = py_built.search(corpus[7], 6)
    monkeypatch.undo()
    native_back = HNSWIndex.from_bytes(blob2)
    assert native_back._py is None
    got2 = native_back.search(corpus[7], 6)
    assert [i for i, _ in got2] == [i for i, _ in want2]
    assert native_back.memory_stats()["tt_count"] == 2


def test_fallback_euclidean_and_dot(corpus, no_native):
    for metric in ("euclidean", "dot"):
        ix = build(corpus[:200], HNSWConfig(metric=metric))
        assert ix._py is not None
        top = ix.search(corpus[9], 3)
        assert top[0][0] == 9
        if metric == "euclidean":
            assert top[0][1] == pytest.approx(1.0, abs=1e-5)
            # ranking matches the oracle exhaustively
            got = [i for i, _ in ix.search_with_ef(corpus[2], 5, 200)]
            assert got == exact_topk(corpus[:200], corpus[2], 5,
                                     "euclidean").tolist()


def test_fallback_graph_degree_invariant(corpus, no_native):
    """Every neighbor list respects the layer cap (m0 at layer 0,
    m above) after pruning."""
    cfg = HNSWConfig(m=6, ef_construction=40)
    ix = build(corpus[:300], cfg)
    py = ix._py
    for nid in range(len(py.dense)):
        for layer, lst in enumerate(py.nbrs[nid]):
            cap = cfg.m0 if layer == 0 else cfg.m
            assert len(lst) <= cap, (nid, layer, len(lst))


def test_cross_format_binary_dim64(rng, monkeypatch):
    """words = ceil(dim/64) padding: exact at the 64-dim boundary."""
    if not native.available():
        pytest.skip("no native lib")
    vecs = rng.standard_normal((60, 64)).astype(np.float32)
    monkeypatch.setattr(native, "load", lambda: None)
    ix = HNSWIndex(64)
    for v in vecs:
        ix.insert_binary(v)
    blob = ix.to_bytes()
    q = np.where(vecs[7] > 0, 1.0, -1.0).astype(np.float32)
    want = ix.search(q, 3)
    monkeypatch.undo()
    back = HNSWIndex.from_bytes(blob)
    assert back._py is None
    assert [i for i, _ in back.search(q, 3)] == [i for i, _ in want]
    assert np.allclose(back.get(7), ix.get(7))


def test_access_stats(corpus):
    ix = build(corpus)                  # 1200 nodes
    assert ix.access_stats()["total_inserts"] == len(corpus)
    for _ in range(10):
        ix.search(corpus[0], 5)
    st = ix.access_stats()
    assert st["total_searches"] == 10
    assert st["distance_calculations"] > 0
    assert st["avg_distances_per_search"] > 0
    # the walk beats one brute-force pass per search (random high-dim
    # data at small N is HNSW's worst case; the margin grows with N)
    assert st["avg_distances_per_search"] < len(corpus)


def test_access_stats_fallback(corpus, no_native):
    ix = build(corpus[:100])
    ix.search(corpus[1], 3)
    st = ix.access_stats()
    assert st["total_inserts"] == 100 and st["total_searches"] == 1
    assert st["distance_calculations"] > 0


@pytest.mark.parametrize("force_fallback", [False, True])
def test_corrupt_blob_hardening(corpus, monkeypatch, force_fallback):
    """Hostile/corrupt blobs must fail FAST and cleanly on both
    deserializers (a fuzzed level byte previously demanded a ~48GB
    allocation)."""
    import time

    if force_fallback:
        monkeypatch.setattr(native, "load", lambda: None)
    elif not native.available():
        pytest.skip("no native lib")
    ix = HNSWIndex(16)
    for v in corpus[:20, :16]:
        ix.insert(np.ascontiguousarray(v))
    blob = bytearray(ix.to_bytes())
    rng = np.random.default_rng(11)
    worst = 0.0
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 8))):
            b[int(rng.integers(len(b)))] = int(rng.integers(256))
        t0 = time.perf_counter()
        try:
            HNSWIndex.from_bytes(bytes(b))
        except (ValueError, OverflowError):
            pass                          # clean refusal only
        worst = max(worst, time.perf_counter() - t0)
    assert worst < 0.5, worst
