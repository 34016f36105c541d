"""Bulk-ingest mode (VectorEngine.bulk_ingest / batch_store_embeddings).

Store semantics stay per-key (WAL, map, other hooks); only the device-
corpus mirror defers, flushed as one vectorized set_rows. These tests
pin equivalence with per-row ingestion, read-triggered flushes,
delete ordering, reentrancy, and multi-namespace grouping.
"""

import numpy as np

from neumann_tpu.engines.vector import VectorEngine


def _mk(n=32, d=8, seed=0):
    eng = VectorEngine()
    eng.config.mesh_auto = False
    vecs = np.random.default_rng(seed).standard_normal(
        (n, d)).astype(np.float32)
    return eng, vecs


def test_batch_matches_per_row():
    eng, vecs = _mk()
    eng.batch_store_embeddings([(f"b{i}", v) for i, v in enumerate(vecs)])
    eng2, _ = _mk()
    for i, v in enumerate(vecs):
        eng2.store_embedding(f"b{i}", v)
    for i in (0, 7, 31):
        a = eng.search_similar(vecs[i], 3)
        b = eng2.search_similar(vecs[i], 3)
        assert [r.key for r in a] == [r.key for r in b]
        assert a[0].key == f"b{i}"


def test_search_inside_bulk_sees_all_puts():
    eng, vecs = _mk()
    with eng.bulk_ingest():
        for i, v in enumerate(vecs):
            eng.store_embedding(f"k{i}", v)
        # a read mid-bulk flushes, then later puts keep batching
        assert eng.search_similar(vecs[4], 1)[0].key == "k4"
        eng.store_embedding("late", vecs[0] * 0.5)
        assert eng._bulk is not None and len(eng._bulk) == 1
    assert eng.search_similar(vecs[0], 2)[0].key in ("k0", "late")
    assert eng.count_embeddings() == 33


def test_delete_after_queued_put_wins():
    eng, vecs = _mk()
    with eng.bulk_ingest():
        eng.store_embedding("gone", vecs[0])
        eng.delete_embedding("gone")
    assert eng.get_embedding("gone") is None
    assert eng.search_similar(vecs[0], 1) == [] or \
        eng.search_similar(vecs[0], 1)[0].key != "gone"


def test_duplicate_key_last_wins():
    eng, vecs = _mk()
    with eng.bulk_ingest():
        eng.store_embedding("dup", vecs[1])
        eng.store_embedding("dup", vecs[2])
    got = eng.get_embedding("dup")
    np.testing.assert_allclose(got, vecs[2], rtol=1e-6)
    assert eng.search_similar(vecs[2], 1)[0].key == "dup"


def test_reentrant_and_metadata():
    eng, vecs = _mk()
    with eng.bulk_ingest():
        with eng.bulk_ingest():       # inner block is a no-op
            eng.store_embedding("m0", vecs[0], {"tag": "x"})
        eng.store_embedding("m1", vecs[1])
        assert eng._bulk is not None  # outer still active
    assert eng.get_metadata("m0") == {"tag": "x"}
    assert eng.get_metadata("m1") == {}


def test_mixed_namespaces_and_dims_group():
    eng, vecs = _mk()
    small = vecs[:4, :4].copy()
    with eng.bulk_ingest():
        for i, v in enumerate(vecs[:8]):
            eng.store_embedding(f"d8_{i}", v)
        for i, v in enumerate(small):
            eng.store_embedding(f"d4_{i}", v)
    assert eng.search_similar(vecs[3], 1)[0].key == "d8_3"
    assert eng.search_similar(small[2], 1)[0].key == "d4_2"
