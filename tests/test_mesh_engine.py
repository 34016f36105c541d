"""Mesh-sharded serving reachable from the product (round-3 item #2).

The reference wires distributed execution into the router
(query_router/src/lib.rs:1751-1773); here the engine itself places big
corpora over the device mesh (VectorEngine._mesh_search), so a plain
``SIMILAR`` through QueryRouter.execute runs shard-local scan + ICI
all-gather merge. These tests run on the conftest's 8 virtual CPU
devices with the threshold dropped so tiny corpora shard.
"""

import numpy as np
import pytest

from neumann_tpu.engines.vector import (
    FilterCondition,
    VectorCollectionConfig,
    VectorEngine,
    VectorEngineConfig,
)
from neumann_tpu.router import QueryRouter


def _mesh_cfg(**kw):
    return VectorEngineConfig(mesh_auto=True, mesh_threshold=64, **kw)


def _fill(eng, n, d, rng, meta=False):
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    for i in range(n):
        md = {"team": "red" if i % 2 else "blue"} if meta else None
        eng.store_embedding(f"v{i}", vecs[i], md)
    return vecs


def _oracle(vecs, q, k, mask=None):
    vn = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    s = vn @ qn
    if mask is not None:
        s[~mask] = -np.inf
    return [f"v{i}" for i in np.argsort(-s)[:k]]


def test_mesh_search_matches_oracle(rng):
    eng = VectorEngine(config=_mesh_cfg())
    vecs = _fill(eng, 256, 32, rng)
    q = vecs[7] + 0.01 * rng.standard_normal(32).astype(np.float32)
    got = [h.key for h in eng.search_similar(q, 5)]
    assert got == _oracle(vecs, q, 5)
    # the sharded placement actually served the query
    corpus = eng._corpora[""][32]
    assert corpus._sharded is not None
    assert corpus._sharded[1].n_shards == 8


def test_mesh_filtered_search(rng):
    eng = VectorEngine(config=_mesh_cfg())
    vecs = _fill(eng, 256, 32, rng, meta=True)
    q = vecs[8]
    hits = eng.search_similar_filtered(
        q, 6, FilterCondition.eq("team", "blue"))
    mask = np.arange(256) % 2 == 0
    assert [h.key for h in hits] == _oracle(vecs, q, 6, mask)
    assert all(int(h.key[1:]) % 2 == 0 for h in hits)


def test_mesh_placement_mutation_freshness(rng):
    """Mutations after placement are served at CURRENT values via the
    watcher + exact delta rescan — WITHOUT rebuilding the placement
    (a per-write full host_snapshot + device_put reload would be a
    multi-hundred-MB cliff at real mesh scale)."""
    eng = VectorEngine(config=_mesh_cfg())
    vecs = _fill(eng, 128, 16, rng)
    q = vecs[3]
    eng.search_similar(q, 3)
    corpus = eng._corpora[""][16]
    v0 = corpus._sharded[0]
    # a new row that is the exact query must surface immediately
    eng.store_embedding("new", q)
    got = [h.key for h in eng.search_similar(q, 1)]
    assert got in (["new"], ["v3"])  # tie between q and v3's perturbed
    assert corpus._sharded[0] == v0  # throttled: no per-write rebuild
    # deletes drop out of results too, and clean rows BACKFILL the
    # freed slots (full-k completeness after mutations)
    eng.delete_embedding("v3")
    eng.delete_embedding("new")
    got = [h.key for h in eng.search_similar(q, 3)]
    assert "v3" not in got and "new" not in got
    assert len(got) == 3


def test_mesh_int8_collection(rng):
    eng = VectorEngine(config=_mesh_cfg())
    eng.create_collection("qc", VectorCollectionConfig(
        dimension=24, quantization="int8"))
    vecs = rng.standard_normal((200, 24)).astype(np.float32)
    for i in range(200):
        eng.store_in_collection("qc", f"v{i}", vecs[i])
    q = vecs[11]
    hits = eng.search_in_collection("qc", q, 4)
    assert hits[0].key == "v11"
    corpus = eng._corpora["col/qc"][24]
    assert corpus._sharded is not None and corpus._sharded[1].quantized


def test_mesh_sharded_ivf_routing(rng):
    """Unfiltered cosine past ivf_auto_threshold rides the cluster-
    sharded IVF placement (probes fan out across all shards)."""
    eng = VectorEngine(config=_mesh_cfg(
        ivf_auto_threshold=128, ivf_auto_clusters=16,
        ivf_auto_nprobe=16))
    vecs = _fill(eng, 256, 32, rng)
    q = vecs[21]
    got = [h.key for h in eng.search_similar(q, 5)]
    corpus = eng._corpora[""][32]
    assert corpus._sharded_ivf is not None
    assert got[0] == "v21"
    # full-probe IVF == oracle
    assert set(got) == set(_oracle(vecs, q, 5))


def test_router_similar_runs_on_mesh(rng):
    """SIMILAR through QueryRouter.execute uses the mesh placement —
    the reference's try_execute_distributed integration point."""
    r = QueryRouter()
    r.vector.config.mesh_auto = True
    r.vector.config.mesh_threshold = 64
    vecs = rng.standard_normal((128, 8)).astype(np.float32)
    for i in range(128):
        r.execute(f"EMBED STORE 'v{i}' {list(map(float, vecs[i]))}")
    q = vecs[5]
    res = r.execute(f"SIMILAR {list(map(float, q))} TOP 3")
    assert res.kind == "similar"
    assert res.results[0]["key"] == "v5"
    corpus = r.vector._corpora[""][8]
    assert corpus._sharded is not None, \
        "router SIMILAR did not reach the mesh placement"
    assert [h["key"] for h in res.results] == _oracle(vecs, q, 3)


def test_mesh_sharded_ivf_mutation_freshness(rng):
    """Rows mutated after the mesh IVF placement serve their CURRENT
    values (exact delta rescan merged over index results), and the
    placement does NOT rebuild on every version bump — the rebuild is
    throttled by the mutation watcher like the single-chip auto-IVF."""
    eng = VectorEngine(config=_mesh_cfg(
        ivf_auto_threshold=128, ivf_auto_clusters=16,
        ivf_auto_nprobe=16))
    vecs = _fill(eng, 256, 32, rng)
    q = vecs[21].copy()
    assert [h.key for h in eng.search_similar(q, 3)][0] == "v21"
    corpus = eng._corpora[""][32]
    placed = corpus._sharded_ivf
    assert placed is not None
    # flip v21 away from itself: the index's copy is now stale
    eng.store_embedding("v21", -q)
    hits = [h.key for h in eng.search_similar(q, 3)]
    assert hits[0] != "v21", "stale index copy served after mutation"
    # a single mutation must NOT have rebuilt the whole placement
    assert corpus._sharded_ivf is placed or \
        corpus._sharded_ivf[1] is placed[1]
    # completeness: stale-masked slots must BACKFILL from clean rows
    # ranked just past k (the search is oversampled before the mask),
    # so a full k results always come back after mutations
    assert len(hits) == 3 and "v21" not in hits
    # and the mutated row is findable at its new value
    hits2 = [h.key for h in eng.search_similar(-q, 3)]
    assert hits2[0] == "v21"
