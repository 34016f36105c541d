"""Columnar mass ingest (VectorEngine.ingest_matrix + slab adoption).

The product-path answer to the reference's 2.0M/s in-memory writes
(README.md:264): one [N, d] matrix through store map + entity index +
device slab with vectorized/bulk operations, optionally adopting the
caller's buffer zero-copy. These tests pin equivalence with the
per-row path, upsert semantics, fallbacks (WAL / foreign hooks /
duplicate keys), and the adoption guards."""

import numpy as np
import pytest

from neumann_tpu.engines.vector import VectorEngine
from neumann_tpu.store.embedding_slab import EmbeddingSlab
from neumann_tpu.store.entity_index import EntityIndex
from neumann_tpu.utils.errors import VectorError


@pytest.fixture
def eng():
    e = VectorEngine()
    e.config.mesh_auto = False
    return e


def _mat(n, d=16, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, d)).astype(np.float32)


def test_basic_ingest_and_search(eng):
    m = _mat(300)
    eng.ingest_matrix([f"k{i}" for i in range(300)], m)
    assert eng.count_embeddings() == 300
    assert np.array_equal(eng.get_embedding("k123"), m[123])
    assert eng.search_similar(m[7], 3)[0].key == "k7"
    # store entries look exactly like per-row puts
    data = eng.store.get("emb:k5")
    assert data.get("embedding").kind == "vector"
    assert "emb:k5" in eng.store.scan("emb:")


def test_matches_per_row_path(eng):
    m = _mat(64)
    eng.ingest_matrix([f"a{i}" for i in range(64)], m)
    other = VectorEngine()
    other.config.mesh_auto = False
    other.batch_store_embeddings([(f"a{i}", m[i]) for i in range(64)])
    q = m[3] + 0.01
    got = [(h.key, round(h.score, 5)) for h in eng.search_similar(q, 5)]
    want = [(h.key, round(h.score, 5))
            for h in other.search_similar(q, 5)]
    assert got == want


def test_upsert_existing_keys(eng):
    m = _mat(50)
    eng.ingest_matrix([f"k{i}" for i in range(50)], m)
    m2 = _mat(10, seed=9)
    eng.ingest_matrix([f"k{i}" for i in range(10)], m2)
    assert eng.count_embeddings() == 50
    assert np.array_equal(eng.get_embedding("k3"), m2[3])
    assert np.array_equal(eng.get_embedding("k30"), m[30])


def test_duplicate_keys_in_batch_last_wins(eng):
    m = _mat(4)
    eng.ingest_matrix(["x", "y", "x", "z"], m)
    assert eng.count_embeddings() == 3
    assert np.array_equal(eng.get_embedding("x"), m[2])


def test_delete_then_ingest_reuses_free_ids(eng):
    m = _mat(20)
    eng.ingest_matrix([f"k{i}" for i in range(20)], m)
    eng.delete_embedding("k5")
    eng.ingest_matrix(["n1", "n2"], _mat(2, seed=3))
    assert eng.count_embeddings() == 21
    assert eng.search_similar(eng.get_embedding("n1"), 1)[0].key == "n1"


def test_zero_copy_adoption(eng):
    n, d = 2048, 128   # d == dim_pad -> adoptable
    m = _mat(n, d)
    eng.ingest_matrix([f"k{i}" for i in range(n)], m, copy=False)
    corpus = eng._corpora[""][d]
    # the slab host buffer IS the caller's matrix (no copy)
    assert corpus.slab._host is m
    assert eng.search_similar(m[17], 1)[0].key == "k17"
    # later single-row writes still work (they mutate the adopted buf)
    eng.store_embedding("k0", np.ones(d, np.float32))
    assert eng.search_similar(np.ones(d, np.float32), 1)[0].key == "k0"


def test_adoption_refused_on_nonempty_slab():
    slab = EmbeddingSlab(dim=128)
    slab.set_row(0, np.ones(128, np.float32))
    assert slab.adopt_matrix(np.zeros((2048, 128), np.float32)) is False
    # wrong dtype / non-contiguous / too small also refused
    slab2 = EmbeddingSlab(dim=128)
    assert slab2.adopt_matrix(
        np.zeros((2048, 128), np.float64)) is False
    assert slab2.adopt_matrix(
        np.zeros((4096, 256), np.float32)[:, ::2]) is False
    assert slab2.adopt_matrix(np.zeros((4, 128), np.float32)) is False


def test_padded_dim_not_adopted_but_correct(eng):
    n, d = 2048, 20    # dim_pad 128 != 20 -> copy path
    m = _mat(n, d)
    eng.ingest_matrix([f"k{i}" for i in range(n)], m, copy=False)
    corpus = eng._corpora[""][d]
    assert corpus.slab._host is not m
    assert eng.search_similar(m[5], 1)[0].key == "k5"


def test_wal_falls_back_to_per_row(tmp_path, eng):
    eng.store.open_durable(str(tmp_path / "wal.log"))
    m = _mat(40)
    eng.ingest_matrix([f"k{i}" for i in range(40)], m)
    eng.store.wal_flush()
    assert eng.count_embeddings() == 40
    # recovery replays the ingested rows
    from neumann_tpu.store.tensor_store import TensorStore

    st2 = TensorStore()
    e2 = VectorEngine(st2)
    e2.config.mesh_auto = False
    st2.recover(str(tmp_path / "wal.log"))
    assert st2.get("emb:k3") is not None


def test_foreign_hook_falls_back(eng):
    seen = []
    eng.store.on_put(lambda k, d: seen.append(k))
    m = _mat(8)
    eng.ingest_matrix([f"k{i}" for i in range(8)], m)
    assert len(seen) == 8          # the chain-style observer saw puts
    assert eng.count_embeddings() == 8


def test_entity_namespace(eng):
    m = _mat(32)
    eng.ingest_matrix([f"e{i}" for i in range(32)], m, ns="entity")
    assert eng.get_entity_embedding("e4") is not None
    assert eng.search_entities(m[4], 1)[0].key == "e4"


def test_bad_inputs(eng):
    with pytest.raises(VectorError):
        eng.ingest_matrix(["a"], _mat(2))            # length mismatch
    with pytest.raises(VectorError):
        eng.ingest_matrix(["a"], np.zeros(3))        # not 2-D
    with pytest.raises(VectorError):
        eng.ingest_matrix(["a"], _mat(1), ns="col/x")  # unsupported ns


def test_get_or_insert_many_mixed():
    ix = EntityIndex()
    first = ix.get_or_insert_many(["a", "b", "c"])
    assert first.tolist() == [0, 1, 2]
    # mixed existing + new + duplicate-in-batch takes the slow path
    out = ix.get_or_insert_many(["b", "d", "d", "a"])
    assert out[0] == 1 and out[3] == 0
    assert out[1] == out[2] == 3     # same key -> same id
    assert len(ix) == 4
    ix.remove("a")
    out2 = ix.get_or_insert_many(["x"])   # free list -> slow path
    assert out2[0] == 0                    # reused id
