"""Tests for the pooled-bits int8 cosine scan (ops.quant.int8_pooled_topk)
and its engine routing.

Golden-oracle strategy per SURVEY.md §4: compare against the exact fp32
NumPy/int8 scan on random corpora; pooling's only legitimate miss is two
true top-k rows sharing a pool, so recall thresholds are set from the
collision odds of each configuration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neumann_tpu.ops.quant import (
    _pick_pool_blocks,
    int8_pooled_topk,
    int8_topk_scan,
    scalar_quantize,
)


def _random_corpus(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    q, scale = scalar_quantize(jnp.asarray(x))
    return x, q, scale


class TestPickPoolBlocks:
    def test_divisible(self):
        assert _pick_pool_blocks(1 << 20, 10, 4096, 1 << 20) == \
            (4096, 256, 1)

    def test_reduces_pool_for_small_n(self):
        pool, g, nb = _pick_pool_blocks(1024, 10, 4096, 1 << 20)
        assert pool <= 102 and 1024 % pool == 0 and 1024 // pool >= 10
        assert g * nb * pool == 1024

    def test_none_when_k_too_big(self):
        assert _pick_pool_blocks(64, 60, 4096, 1 << 20) is None

    def test_non_power_of_two_n(self):
        assert _pick_pool_blocks(1001, 10, 4096, 1 << 20) is None

    def test_block_split_even(self):
        pool, g, nb = _pick_pool_blocks(1 << 18, 10, 256, 1 << 15)
        assert pool == 256
        assert g * nb == (1 << 18) // 256
        assert (1 << 18) % nb == 0


class TestPooledTopk:
    def test_matches_exact_int8_scan(self):
        n, d, k = 8192, 64, 10
        x, cq, scale = _random_corpus(n, d)
        queries = jnp.asarray(
            np.random.default_rng(7).normal(size=(8, d)).astype(np.float32))
        es, ei = int8_topk_scan(cq, scale, queries, k, "cosine")
        ps, pi = int8_pooled_topk(cq, scale, queries, k, pool=64)
        ei, pi = np.asarray(ei), np.asarray(pi)
        es, ps = np.asarray(es), np.asarray(ps)
        recalls = [len(set(ei[r].tolist()) & set(pi[r].tolist())) / k
                   for r in range(8)]
        # 128 pools, k=10 -> expected loss ~ C(10,2)/128/10 = 3.5%
        assert np.mean(recalls) >= 0.85
        # scores of agreeing ids match up to mantissa truncation (6 low
        # bits cleared at pool=64 -> ~1e-6 on [1,3)) + fp noise
        for r in range(8):
            common = set(ei[r].tolist()) & set(pi[r].tolist())
            for cid in common:
                e = es[r][list(ei[r]).index(cid)]
                p = ps[r][list(pi[r]).index(cid)]
                assert abs(e - p) < 5e-4

    def test_top1_always_found(self):
        # the global argmax can never collide away
        n, d, k = 4096, 32, 5
        x, cq, scale = _random_corpus(n, d, seed=3)
        queries = jnp.asarray(
            np.random.default_rng(9).normal(size=(4, d)).astype(np.float32))
        _, ei = int8_topk_scan(cq, scale, queries, 1, "cosine")
        _, pi = int8_pooled_topk(cq, scale, queries, k, pool=128)
        for r in range(4):
            assert int(np.asarray(ei)[r, 0]) == int(np.asarray(pi)[r, 0])

    def test_mask_excludes_rows(self):
        n, d, k = 2048, 32, 8
        x, cq, scale = _random_corpus(n, d, seed=5)
        queries = jnp.asarray(x[:3])  # self-queries
        mask = np.ones(n, bool)
        mask[:3] = False              # exclude the exact matches
        ps, pi = int8_pooled_topk(cq, scale, queries, k, pool=64,
                                  mask=jnp.asarray(mask))
        pi = np.asarray(pi)
        assert not (set(pi.ravel().tolist()) & {0, 1, 2})

    def test_n_valid_excludes_tail(self):
        n, d, k = 2048, 32, 8
        x, cq, scale = _random_corpus(n, d, seed=6)
        queries = jnp.asarray(x[-2:])  # tail rows are the best matches
        ps, pi = int8_pooled_topk(cq, scale, queries, k, pool=64,
                                  n_valid=n - 2)
        pi = np.asarray(pi)
        assert pi.max() < n - 2

    def test_fewer_valid_than_k(self):
        n, d, k = 512, 16, 8
        x, cq, scale = _random_corpus(n, d, seed=8)
        mask = np.zeros(n, bool)
        mask[:3] = True
        queries = jnp.asarray(x[:1])
        ps, pi = int8_pooled_topk(cq, scale, queries, k, pool=16,
                                  mask=jnp.asarray(mask))
        ps, pi = np.asarray(ps), np.asarray(pi)
        assert (pi[0] >= 0).sum() <= 3
        assert np.isneginf(ps[0][pi[0] < 0]).all()

    def test_raises_without_layout(self):
        x, cq, scale = _random_corpus(1001, 16)
        with pytest.raises(ValueError):
            int8_pooled_topk(cq, scale, jnp.asarray(x[:1]), 10)


class TestEnginePooledRouting:
    def test_collection_search_uses_pooled(self, monkeypatch):
        monkeypatch.setenv("NEUMANN_POOLED_MIN_ROWS", "512")
        monkeypatch.setenv("NEUMANN_POOLED_MIN_POOLS", "4")
        from neumann_tpu.engines.vector import (
            VectorCollectionConfig,
            VectorEngine,
        )
        from neumann_tpu.store.tensor_store import TensorStore

        eng = VectorEngine(TensorStore())
        eng.create_collection("docs", VectorCollectionConfig(
            dimension=16, quantization="int8"))
        rng = np.random.default_rng(11)
        base = np.eye(16, dtype=np.float32)
        for i in range(1000):
            v = base[i % 16] * 4.0 + rng.normal(size=16).astype(
                np.float32) * 0.05
            eng.store_in_collection("docs", f"doc{i}", v)
        # capacity 1024, 1000 valid rows: dense enough for the pooled
        # path; k=2 needs max(4, 8)=8 pools and pick gives 1024/128=8
        res = eng.search_in_collection("docs", base[3] * 4.0, top_k=2,
                                       metric="cosine")
        assert len(res) == 2
        # all results should be docs congruent to 3 mod 16
        for r in res:
            assert int(r.key[3:]) % 16 == 3
            assert r.score > 0.9


class TestF32Pooled:
    def test_matches_exact_scan(self):
        from neumann_tpu.ops.quant import f32_pooled_topk
        from neumann_tpu.ops.scan import topk_scan

        n, d, k = 8192, 64, 10
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        queries = jnp.asarray(
            rng.normal(size=(6, d)).astype(np.float32))
        es, ei = topk_scan(x, queries, k, "cosine")
        ps, pi = f32_pooled_topk(x, queries, k, pool=64)
        ei, pi = np.asarray(ei), np.asarray(pi)
        es, ps = np.asarray(es), np.asarray(ps)
        for r in range(6):
            assert int(ei[r, 0]) == int(pi[r, 0])   # top-1 exact
            assert abs(es[r, 0] - ps[r, 0]) < 5e-4
        rec = np.mean([len(set(ei[r].tolist()) & set(pi[r].tolist())) / k
                       for r in range(6)])
        assert rec >= 0.85

    def test_engine_flat_collection_pooled(self, monkeypatch):
        monkeypatch.setenv("NEUMANN_POOLED_MIN_ROWS", "512")
        monkeypatch.setenv("NEUMANN_POOLED_MIN_POOLS", "4")
        from neumann_tpu.engines.vector import (
            VectorCollectionConfig,
            VectorEngine,
        )
        from neumann_tpu.store.tensor_store import TensorStore

        eng = VectorEngine(TensorStore())
        eng.create_collection("flat", VectorCollectionConfig(dimension=16))
        rng = np.random.default_rng(13)
        base = np.eye(16, dtype=np.float32)
        for i in range(1000):
            v = base[i % 16] * 4.0 + rng.normal(size=16).astype(
                np.float32) * 0.05
            eng.store_in_collection("flat", f"d{i}", v)
        res = eng.search_in_collection("flat", base[5] * 4.0, top_k=2,
                                       metric="cosine")
        assert len(res) == 2
        for r in res:
            assert int(r.key[1:]) % 16 == 5 and r.score > 0.9
        # non-cosine metric must keep the exact path and stay correct
        res2 = eng.search_in_collection("flat", base[5] * 4.0, top_k=2,
                                        metric="dot")
        assert int(res2[0].key[1:]) % 16 == 5


def test_masked_pooled_gate_occupancy(rng, monkeypatch):
    """The pooled gate admits filters by pool OCCUPANCY: a spread-out
    sparse mask rides the pooled scan with exact-vs-oracle results; an
    adversarial contiguous mask falls back to the exact path."""
    from neumann_tpu.engines import vector as V
    from neumann_tpu.engines.vector import FilterCondition, VectorEngine

    monkeypatch.setenv("NEUMANN_POOLED_MIN_ROWS", "1024")
    # test-sized corpus: relax the collision-safety pool floor (default
    # 2048 pools needs >= 16K rows)
    monkeypatch.setenv("NEUMANN_POOLED_MIN_POOLS", "256")
    n, d = 8192, 32
    eng = VectorEngine()
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    for i in range(n):
        eng.store_embedding(f"v{i}", vecs[i],
                            metadata={"grp": i % 10})

    corpus = eng._corpora[""][d]
    # spread mask (10%): occupancy high -> pooled path admitted
    spread = np.zeros(corpus.slab.capacity, bool)
    spread[: n][np.arange(n) % 10 == 3] = True
    assert V._pooled_pool(corpus, 5, "cosine", spread) is not None
    # contiguous mask: few pools -> gate refuses
    tight = np.zeros(corpus.slab.capacity, bool)
    tight[:200] = True
    assert V._pooled_pool(corpus, 5, "cosine", tight) is None

    # end-to-end: filtered results match the oracle on the masked set
    res = eng.search_similar_filtered(vecs[3], 5,
                                      FilterCondition.eq("grp", 3))
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = vecs[3] / np.linalg.norm(vecs[3])
    scores = vn @ qn
    eligible = np.arange(n) % 10 == 3
    scores = np.where(eligible, scores, -np.inf)
    want = [f"v{i}" for i in np.argsort(-scores)[:5]]
    got = [h.key for h in res]
    assert len(set(got) & set(want)) >= 4   # pooled may drop 1 collision
    assert all(int(k[1:]) % 10 == 3 for k in got)  # mask never leaks


class TestApproxSelector:
    """selector="approx" swaps the final exact top_k over the [Q, N/pool]
    winner bits for lax.approx_max_k on an order-preserving bitcast view.
    Larger entries are retained preferentially, so the true top rows must
    keep surviving the candidate cut."""

    def test_top_rows_survive_the_cut(self):
        n, d, k = 8192, 64, 10
        x, cq, scale = _random_corpus(n, d, seed=11)
        queries = jnp.asarray(np.random.default_rng(13).normal(
            size=(8, d)).astype(np.float32))
        # wide candidate cut (C=64), compare coverage of the exact
        # pooled top-10 — approx selection must not lose them
        ts, ti = int8_pooled_topk(cq, scale, queries, k, pool=64)
        aps, api = int8_pooled_topk(cq, scale, queries, 64, pool=64,
                                    selector="approx")
        ti, api = np.asarray(ti), np.asarray(api)
        for r in range(8):
            got = set(api[r].tolist())
            assert all(i in got for i in ti[r].tolist())

    def test_scores_and_rows_decode_identically(self):
        # where both selectors return the same row, the decoded score
        # must be bit-identical (same packed pattern, same unpacking)
        n, d, k = 4096, 32, 8
        x, cq, scale = _random_corpus(n, d, seed=5)
        queries = jnp.asarray(np.random.default_rng(6).normal(
            size=(4, d)).astype(np.float32))
        es, ei = int8_pooled_topk(cq, scale, queries, k, pool=64)
        as_, ai = int8_pooled_topk(cq, scale, queries, k, pool=64,
                                   selector="approx")
        es, ei = np.asarray(es), np.asarray(ei)
        as_, ai = np.asarray(as_), np.asarray(ai)
        for r in range(4):
            exact = dict(zip(ei[r].tolist(), es[r].tolist()))
            for row, sc in zip(ai[r].tolist(), as_[r].tolist()):
                if row in exact:
                    assert sc == exact[row]

    def test_rerank_chain_accepts_selector(self):
        from neumann_tpu.ops.rerank import int8_pooled_rerank_topk
        n, d, k = 4096, 32, 10
        x, cq, scale = _random_corpus(n, d, seed=9)
        queries = jnp.asarray(np.random.default_rng(10).normal(
            size=(4, d)).astype(np.float32))
        ts, ti = int8_pooled_rerank_topk(cq, scale, queries, k,
                                         pool=64)
        os_, oi = int8_pooled_rerank_topk(cq, scale, queries, k,
                                          pool=64, selector="approx")
        ti, oi = np.asarray(ti), np.asarray(oi)
        recalls = [len(set(ti[r].tolist()) & set(oi[r].tolist())) / k
                   for r in range(4)]
        assert np.mean(recalls) >= 0.9

    def test_engine_pooled_selector_config(self, monkeypatch):
        # pooled_selector="approx:0.99" must route through the same
        # pooled path and return the same neighbors on a separable
        # corpus (the cut is oversampled; the exact rerank stays)
        monkeypatch.setenv("NEUMANN_POOLED_MIN_ROWS", "512")
        monkeypatch.setenv("NEUMANN_POOLED_MIN_POOLS", "4")
        from neumann_tpu.engines.vector import (
            VectorCollectionConfig,
            VectorEngine,
            VectorEngineConfig,
        )
        from neumann_tpu.store.tensor_store import TensorStore

        eng = VectorEngine(
            TensorStore(),
            config=VectorEngineConfig(pooled_selector="approx:0.99"))
        eng.create_collection("flat", VectorCollectionConfig(dimension=16))
        rng = np.random.default_rng(29)
        base = np.eye(16, dtype=np.float32)
        for i in range(1000):
            v = base[i % 16] * 4.0 + rng.normal(size=16).astype(
                np.float32) * 0.05
            eng.store_in_collection("flat", f"d{i}", v)
        res = eng.search_in_collection("flat", base[7] * 4.0, top_k=3,
                                       metric="cosine")
        assert len(res) == 3
        for r in res:
            assert int(r.key[1:]) % 16 == 7 and r.score > 0.9
