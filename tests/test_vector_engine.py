"""Vector engine tests: CRUD, metrics, filters, collections, quantization.

Mirrors vector_engine's unit-test strategy (search_with_metric_*,
filtered search, collections — vector_engine/src/lib.rs tests)."""

import numpy as np
import pytest

from neumann_tpu.engines import (
    FilterCondition,
    VectorCollectionConfig,
    VectorEngine,
    VectorEngineConfig,
)
from neumann_tpu.store import TensorStore
from neumann_tpu.utils.errors import VectorError


@pytest.fixture
def eng():
    return VectorEngine()


def unit(d, i):
    v = np.zeros(d, np.float32)
    v[i] = 1.0
    return v


def test_store_get_delete(eng):
    eng.store_embedding("a", [1.0, 2.0, 3.0])
    np.testing.assert_allclose(eng.get_embedding("a"), [1, 2, 3])
    assert eng.embedding_exists("a")
    assert eng.count_embeddings() == 1
    assert eng.delete_embedding("a")
    assert eng.get_embedding("a") is None
    assert eng.count_embeddings() == 0


def test_search_similar_basic(eng):
    for i in range(8):
        eng.store_embedding(f"v{i}", unit(16, i))
    res = eng.search_similar(unit(16, 3), 3)
    assert res[0].key == "v3"
    assert res[0].score == pytest.approx(1.0, abs=1e-5)
    assert len(res) == 3


def test_search_by_key(eng):
    eng.store_embedding("a", [1.0, 0.0])
    eng.store_embedding("b", [0.9, 0.1])
    eng.store_embedding("c", [0.0, 1.0])
    res = eng.search_by_key("a", 2)
    assert res[0].key == "a" and res[1].key == "b"
    with pytest.raises(VectorError):
        eng.search_by_key("missing", 2)


def test_metrics(eng):
    eng.store_embedding("x", [1.0, 0.0])
    eng.store_embedding("y", [3.0, 0.0])
    cos = eng.search_similar_with_metric([2.0, 0.0], 2, "cosine")
    assert cos[0].score == pytest.approx(1.0, abs=1e-5)
    dot = eng.search_similar_with_metric([2.0, 0.0], 2, "dot")
    assert dot[0].key == "y" and dot[0].score == pytest.approx(6.0)
    euc = eng.search_similar_with_metric([1.0, 0.0], 2, "euclidean")
    assert euc[0].key == "x"
    assert euc[0].score == pytest.approx(1.0)  # 1/(1+0)
    assert euc[1].score == pytest.approx(1.0 / 3.0)  # 1/(1+2)


def test_zero_query_cosine_returns_empty(eng):
    eng.store_embedding("x", [1.0, 0.0])
    assert eng.search_similar([0.0, 0.0], 1) == []
    # but euclidean works with zero query
    res = eng.search_similar_with_metric([0.0, 0.0], 1, "euclidean")
    assert res[0].key == "x"


def test_bad_args(eng):
    with pytest.raises(VectorError):
        eng.store_embedding("a", [])
    eng.store_embedding("a", [1.0])
    with pytest.raises(VectorError):
        eng.search_similar([1.0], 0)
    with pytest.raises(VectorError):
        eng.search_similar_with_metric([1.0], 1, "nope")


def test_dimension_enforcement():
    eng = VectorEngine(config=VectorEngineConfig(default_dimension=4))
    eng.store_embedding("a", [1, 2, 3, 4])
    with pytest.raises(VectorError):
        eng.store_embedding("b", [1, 2, 3])


def test_max_dimension():
    eng = VectorEngine(config=VectorEngineConfig(max_dimension=8))
    with pytest.raises(VectorError):
        eng.store_embedding("a", np.ones(9, np.float32))


def test_mixed_dimensions_coexist(eng):
    eng.store_embedding("d2", [1.0, 0.0])
    eng.store_embedding("d3", [1.0, 0.0, 0.0])
    res2 = eng.search_similar([1.0, 0.0], 5)
    assert [r.key for r in res2] == ["d2"]
    res3 = eng.search_similar([1.0, 0.0, 0.0], 5)
    assert [r.key for r in res3] == ["d3"]


def test_update_embedding_moves_result(eng):
    eng.store_embedding("a", [1.0, 0.0])
    eng.store_embedding("b", [0.5, 0.5])
    assert eng.search_similar([0.0, 1.0], 1)[0].key == "b"
    eng.store_embedding("a", [0.0, 1.0])
    assert eng.search_similar([0.0, 1.0], 1)[0].key == "a"


def test_filtered_search(eng):
    for i in range(10):
        eng.store_embedding(
            f"v{i}", unit(8, i % 8),
            metadata={"category": "even" if i % 2 == 0 else "odd",
                      "rank": i})
    f = FilterCondition.eq("category", "odd")
    res = eng.search_similar_filtered(unit(8, 1), 5, f)
    assert all(int(r.key[1:]) % 2 == 1 for r in res)
    assert res[0].key == "v1"
    # range + and
    f2 = FilterCondition.ge("rank", 5).and_(FilterCondition.lt("rank", 8))
    res2 = eng.search_similar_filtered(unit(8, 6), 10, f2)
    assert sorted(r.key for r in res2) == ["v5", "v6", "v7"]
    # no match
    f3 = FilterCondition.eq("category", "none")
    assert eng.search_similar_filtered(unit(8, 0), 5, f3) == []


def test_filter_condition_variants():
    md = {"name": "alice smith", "age": 30, "active": True}
    F = FilterCondition
    assert F.eq("age", 30).evaluate(md)
    assert F.ne("age", 31).evaluate(md)
    assert F.lt("age", 31).evaluate(md)
    assert F.le("age", 30).evaluate(md)
    assert F.gt("age", 29).evaluate(md)
    assert F.ge("age", 30).evaluate(md)
    assert F.exists("name").evaluate(md)
    assert not F.exists("missing").evaluate(md)
    assert F.contains("name", "smith").evaluate(md)
    assert F.starts_with("name", "alice").evaluate(md)
    assert F.in_("age", [29, 30]).evaluate(md)
    assert F.true().evaluate({})
    assert F.eq("age", 30).or_(F.eq("age", 99)).evaluate(md)
    assert not F.eq("missing", 1).evaluate(md)
    assert not F.lt("name", 5).evaluate(md)  # type mismatch -> False


def test_pagination(eng):
    for i in range(10):
        eng.store_embedding(f"v{i}", [1.0, i * 0.1])
    page1 = eng.search_similar_paginated([1.0, 0.0], 3, 0)
    page2 = eng.search_similar_paginated([1.0, 0.0], 3, 3)
    assert len(page1) == 3 and len(page2) == 3
    assert {r.key for r in page1}.isdisjoint({r.key for r in page2})


def test_batch_ops(eng):
    n = eng.batch_store_embeddings([(f"k{i}", unit(4, i % 4))
                                    for i in range(8)])
    assert n == 8 and eng.count_embeddings() == 8
    res = eng.batch_search(np.eye(4, dtype=np.float32), 2)
    assert len(res) == 4
    for qi in range(4):
        assert res[qi][0].score == pytest.approx(1.0, abs=1e-5)


def test_collections(eng):
    eng.create_collection("docs", VectorCollectionConfig(dimension=4))
    with pytest.raises(VectorError):
        eng.create_collection("docs")
    eng.store_in_collection("docs", "a", [1, 0, 0, 0], {"lang": "en"})
    eng.store_in_collection("docs", "b", [0, 1, 0, 0], {"lang": "de"})
    with pytest.raises(VectorError):
        eng.store_in_collection("docs", "c", [1, 0])  # wrong dim
    res = eng.search_in_collection("docs", [1, 0, 0, 0], 2)
    assert res[0].key == "a"
    fres = eng.search_filtered_in_collection(
        "docs", [1, 0, 0, 0], 2, FilterCondition.eq("lang", "de"))
    assert [r.key for r in fres] == ["b"]
    # collection separate from default namespace
    assert eng.search_similar([1, 0, 0, 0], 5) == []
    stats = eng.collection_stats("docs")
    assert stats["count"] == 2 and stats["dimension"] == 4
    assert eng.list_collections() == ["docs"]
    assert eng.drop_collection("docs")
    assert not eng.drop_collection("docs")
    with pytest.raises(VectorError):
        eng.search_in_collection("docs", [1, 0, 0, 0], 1)


def test_quantized_collections(rng, eng):
    eng.create_collection("q8", VectorCollectionConfig(
        dimension=64, quantization="int8"))
    eng.create_collection("qb", VectorCollectionConfig(
        dimension=64, quantization="binary"))
    vecs = rng.standard_normal((50, 64)).astype(np.float32)
    for i, v in enumerate(vecs):
        eng.store_in_collection("q8", f"v{i}", v)
        eng.store_in_collection("qb", f"v{i}", v)
    r8 = eng.search_in_collection("q8", vecs[7], 5)
    assert r8[0].key == "v7"
    rb = eng.search_in_collection("qb", vecs[7], 5)
    assert rb[0].key == "v7"


def test_collection_snapshot_roundtrip(tmp_path, eng):
    eng.create_collection("c", VectorCollectionConfig(dimension=3))
    eng.store_in_collection("c", "a", [1, 0, 0], {"x": 1})
    eng.store_in_collection("c", "b", [0, 1, 0])
    path = tmp_path / "c.npz"
    assert eng.snapshot_collection("c", path) == 2
    eng2 = VectorEngine()
    assert eng2.load_collection_snapshot("c", path) == 2
    res = eng2.search_in_collection("c", [1, 0, 0], 1)
    assert res[0].key == "a"


def test_entity_embeddings(eng):
    eng.store_entity_embedding("alice", [1.0, 0.0])
    eng.store_entity_embedding("bob", [0.0, 1.0])
    np.testing.assert_allclose(eng.get_entity_embedding("alice"), [1, 0])
    res = eng.search_entities([1.0, 0.1], 2)
    assert res[0].key == "alice"
    # entity namespace is separate from emb: namespace
    assert eng.search_similar([1.0, 0.0], 5) == []


def test_wal_recovery_rebuilds_corpus(tmp_path):
    store = TensorStore()
    eng = VectorEngine(store)
    store.open_durable(tmp_path / "wal.log", sync_mode="immediate")
    eng.store_embedding("a", [1.0, 0.0])
    eng.store_embedding("b", [0.0, 1.0])
    eng.delete_embedding("a")
    # fresh store+engine, replay WAL -> device corpus rebuilt via hooks
    store2 = TensorStore()
    eng2 = VectorEngine(store2)
    store2.recover(tmp_path / "wal.log")
    res = eng2.search_similar([0.0, 1.0], 5)
    assert [r.key for r in res] == ["b"]


def test_metadata_access(eng):
    eng.store_embedding("a", [1.0], metadata={"source": "web", "n": 3})
    assert eng.get_metadata("a") == {"source": "web", "n": 3}
    assert eng.get_metadata("missing") is None


def test_ivf_index_api(rng, eng, tmp_path):
    vecs = rng.standard_normal((300, 32)).astype(np.float32)
    eng.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(300)])
    n = eng.build_ivf_index(n_clusters=8, nprobe=8)
    assert n == 300
    res = eng.search_with_ivf_nprobe(vecs[17], 5, nprobe=8)
    assert res[0].key == "v17"
    # hnsw-named compatibility entry points hit the same index
    res2 = eng.search_with_hnsw(vecs[17], 5)
    assert res2[0].key == "v17"
    # save/load roundtrip
    path = tmp_path / "index.npz"
    eng.save_index(path)
    eng2 = VectorEngine()
    eng2.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(300)])
    assert eng2.load_index(path) == 300
    res3 = eng2.search_with_hnsw(vecs[17], 3)
    assert res3[0].key == "v17"
    with pytest.raises(VectorError):
        VectorEngine().search_with_hnsw(vecs[0], 3)
    with pytest.raises(VectorError):
        VectorEngine().build_ivf_index()


def test_pq_collection(rng, eng):
    eng.create_collection("pqc", VectorCollectionConfig(
        dimension=64, quantization="pq"))
    vecs = rng.standard_normal((300, 64)).astype(np.float32)
    for i, v in enumerate(vecs):
        eng.store_in_collection("pqc", f"v{i}", v)
    res = eng.search_in_collection("pqc", vecs[11], 5)
    assert res and res[0].key == "v11"
    # metadata filter still fuses
    eng.create_collection("pqf", VectorCollectionConfig(
        dimension=64, quantization="pq"))
    for i in range(100):
        eng.store_in_collection("pqf", f"k{i}", vecs[i],
                                {"grp": i % 2})
    hits = eng.search_filtered_in_collection(
        "pqf", vecs[10], 5, FilterCondition.eq("grp", 0))
    assert all(int(h.key[1:]) % 2 == 0 for h in hits)


def test_search_with_composite_metric(rng):
    eng = VectorEngine()
    base = rng.standard_normal((20, 24)).astype(np.float32)
    base[rng.random((20, 24)) < 0.4] = 0.0
    for i, v in enumerate(base):
        eng.store_embedding(f"v{i}", v)
    res = eng.search_similar_with_metric(base[3], 5, "composite")
    assert res[0].key == "v3"
    assert 0.0 <= res[-1].score <= res[0].score <= 1.0 + 1e-6


def test_composite_on_int8_collection_falls_back_to_float(rng):
    eng = VectorEngine()
    eng.create_collection("c", VectorCollectionConfig(
        dimension=16, quantization="int8"))
    vecs = rng.standard_normal((10, 16)).astype(np.float32)
    for i, v in enumerate(vecs):
        eng.store_in_collection("c", f"v{i}", v)
    res = eng.search_in_collection("c", vecs[4], 3, metric="composite")
    assert res[0].key == "v4"


def test_tt_collection_mode(rng):
    eng = VectorEngine()
    eng.create_collection("tt", VectorCollectionConfig(
        dimension=64, quantization="tt"))
    vecs = rng.standard_normal((30, 64)).astype(np.float32)
    for i, v in enumerate(vecs):
        eng.store_in_collection("tt", f"v{i}", v)
    res = eng.search_in_collection("tt", vecs[7], 5)
    assert res[0].key == "v7"
    # TT reconstruction error is small: top score near 1 for cosine
    assert res[0].score > 0.95
    # against the fp32 oracle, recall@5 stays high
    oracle = VectorEngine()
    for i, v in enumerate(vecs):
        oracle.store_embedding(f"v{i}", v)
    for qi in (0, 13, 29):
        got = {r.key for r in eng.search_in_collection("tt", vecs[qi], 5)}
        exp = {r.key for r in oracle.search_similar(vecs[qi], 5)}
        assert len(got & exp) >= 4, (qi, got, exp)
    # deletes drop out of TT search results too (version-cached codes)
    eng.delete_from_collection("tt", "v7")
    res = eng.search_in_collection("tt", vecs[7], 5)
    assert all(r.key != "v7" for r in res)


def test_load_index_corruption_hardening(rng, eng, tmp_path):
    """Corrupt index files always fail with VectorError, never raw
    zipfile/struct/key errors."""
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    eng.batch_store_embeddings([(f"v{i}", vecs[i]) for i in range(200)])
    eng.build_ivf_index(n_clusters=4)
    path = tmp_path / "ix.npz"
    eng.save_index(path)
    blob = bytearray(path.read_bytes())
    r = np.random.default_rng(2)
    for _ in range(60):
        b = bytearray(blob)
        for _ in range(int(r.integers(1, 6))):
            b[int(r.integers(len(b)))] = int(r.integers(256))
        (tmp_path / "c.npz").write_bytes(bytes(b))
        try:
            eng.load_index(tmp_path / "c.npz")
        except VectorError:
            pass


def test_unsupported_int8_metrics_fall_back_to_float(rng):
    """int8 collections accept every METRICS value: metrics without an
    int8 kernel form route through the exact f32 path instead of
    raising (ops/quant.py only implements cosine/dot/euclidean);
    angular/geodesic ride the int8 COSINE kernel with the reported
    scores mapped to -arccos."""
    eng = VectorEngine()
    eng.create_collection("c8", VectorCollectionConfig(
        dimension=16, quantization="int8"))
    vecs = rng.standard_normal((12, 16)).astype(np.float32)
    vecs[rng.random((12, 16)) < 0.3] = 0.0
    for i, v in enumerate(vecs):
        eng.store_in_collection("c8", f"v{i}", v)
    for metric in ("manhattan", "weighted_jaccard", "jaccard", "overlap",
                   "angular", "geodesic"):
        res = eng.search_in_collection("c8", vecs[4], 3, metric=metric)
        assert res and res[0].key == "v4", metric
