"""Golden tests for the device scan kernels against a NumPy oracle.

Mirrors the reference's kernel-correctness strategy: exact-scan semantics of
vector_engine::search_similar_with_metric (vector_engine/src/lib.rs:2049)
checked for every metric, with masks, and for quantized corpora.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from neumann_tpu.ops import (
    topk_scan,
    score_all,
    scalar_quantize,
    scalar_dequantize,
    binary_quantize,
    hamming_topk,
    int8_topk_scan,
)


def np_scores(corpus, queries, metric):
    c = corpus.astype(np.float64)
    q = queries.astype(np.float64)
    dots = q @ c.T
    if metric == "dot":
        return dots
    if metric == "cosine":
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        cn = np.linalg.norm(c, axis=1)
        out = np.where(
            (qn <= 0) | (cn[None, :] <= 0), 0.0,
            dots / np.maximum(qn * cn[None, :], 1e-30))
        return out
    if metric == "euclidean":
        d2 = (q * q).sum(1)[:, None] - 2 * dots + (c * c).sum(1)[None, :]
        return -np.sqrt(np.maximum(d2, 0))
    if metric == "manhattan":
        return -np.abs(q[:, None, :] - c[None, :, :]).sum(-1)
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["cosine", "dot", "euclidean", "manhattan"])
def test_topk_matches_oracle(rng, metric):
    corpus = rng.standard_normal((500, 64)).astype(np.float32)
    queries = rng.standard_normal((7, 64)).astype(np.float32)
    k = 10
    s, i = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), k, metric)
    oracle = np_scores(corpus, queries, metric)
    want = np.argsort(-oracle, axis=1)[:, :k]
    got = np.asarray(i)
    for q in range(queries.shape[0]):
        # compare score sets (ties may permute indices)
        np.testing.assert_allclose(
            np.sort(oracle[q, got[q]]), np.sort(oracle[q, want[q]]),
            rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(s),
        np.take_along_axis(oracle, got, axis=1), rtol=3e-3, atol=3e-3)


def test_topk_blockwise_exact(rng):
    corpus = rng.standard_normal((1000, 32)).astype(np.float32)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    s_flat, i_flat = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 5)
    s_blk, i_blk = topk_scan(
        jnp.asarray(corpus), jnp.asarray(queries), 5, block_rows=128)
    np.testing.assert_allclose(
        np.asarray(s_flat), np.asarray(s_blk), rtol=1e-5, atol=1e-5)
    assert (np.asarray(i_flat) == np.asarray(i_blk)).mean() > 0.95


def test_topk_blockwise_nondivisible(rng):
    corpus = rng.standard_normal((997, 32)).astype(np.float32)
    queries = rng.standard_normal((2, 32)).astype(np.float32)
    s_flat, _ = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 7)
    s_blk, _ = topk_scan(
        jnp.asarray(corpus), jnp.asarray(queries), 7, block_rows=256)
    np.testing.assert_allclose(
        np.asarray(s_flat), np.asarray(s_blk), rtol=1e-5, atol=1e-5)


def test_mask_fused(rng):
    corpus = rng.standard_normal((100, 16)).astype(np.float32)
    queries = rng.standard_normal((1, 16)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[10:20] = True
    s, i = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 5,
                     mask=jnp.asarray(mask))
    i = np.asarray(i)[0]
    assert all(10 <= x < 20 for x in i)


def test_mask_fewer_than_k(rng):
    corpus = rng.standard_normal((50, 8)).astype(np.float32)
    queries = rng.standard_normal((1, 8)).astype(np.float32)
    mask = np.zeros(50, bool)
    mask[3] = mask[7] = True
    s, i = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 5,
                     mask=jnp.asarray(mask))
    i = np.asarray(i)[0]
    s = np.asarray(s)[0]
    assert set(i[:2]) == {3, 7}
    assert (i[2:] == -1).all()
    assert np.isneginf(s[2:]).all()


def test_mask_fused_blockwise(rng):
    corpus = rng.standard_normal((512, 16)).astype(np.float32)
    queries = rng.standard_normal((2, 16)).astype(np.float32)
    mask = rng.random(512) < 0.3
    s1, i1 = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 9,
                       mask=jnp.asarray(mask))
    s2, i2 = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 9,
                       mask=jnp.asarray(mask), block_rows=128)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
    for q in range(2):
        assert mask[np.asarray(i2)[q]].all()


def test_single_query_vector(rng):
    corpus = rng.standard_normal((64, 8)).astype(np.float32)
    q = rng.standard_normal(8).astype(np.float32)
    s, i = topk_scan(jnp.asarray(corpus), jnp.asarray(q), 3)
    assert s.shape == (1, 3) and i.shape == (1, 3)


def test_zero_query_cosine(rng):
    corpus = rng.standard_normal((10, 8)).astype(np.float32)
    q = np.zeros(8, np.float32)
    s = score_all(jnp.asarray(corpus), jnp.asarray(q), "cosine")
    np.testing.assert_allclose(np.asarray(s), 0.0)


def test_int8_quant_roundtrip(rng):
    x = rng.standard_normal((20, 32)).astype(np.float32)
    q, scale = scalar_quantize(jnp.asarray(x))
    back = scalar_dequantize(q, scale)
    np.testing.assert_allclose(np.asarray(back), x, atol=np.abs(x).max()/100)


def test_int8_topk_recall(rng):
    corpus = rng.standard_normal((2000, 128)).astype(np.float32)
    queries = rng.standard_normal((5, 128)).astype(np.float32)
    cq, cs = scalar_quantize(jnp.asarray(corpus))
    s, i = int8_topk_scan(cq, cs, jnp.asarray(queries), 10, "cosine")
    oracle = np_scores(corpus, queries, "cosine")
    want = np.argsort(-oracle, axis=1)[:, :10]
    got = np.asarray(i)
    recall = np.mean([
        len(set(got[q]) & set(want[q])) / 10 for q in range(5)])
    assert recall >= 0.9, f"int8 recall@10 {recall}"


def test_binary_quant_hamming(rng):
    corpus = rng.standard_normal((300, 64)).astype(np.float32)
    queries = corpus[:3] + 0.01 * rng.standard_normal((3, 64)).astype(
        np.float32)
    cb = binary_quantize(jnp.asarray(corpus))
    qb = binary_quantize(jnp.asarray(queries))
    s, i = hamming_topk(cb, qb, 5)
    i = np.asarray(i)
    # the near-identical vector should be the top hit
    for q in range(3):
        assert i[q, 0] == q


def test_binary_quantize_nondivisible_dim(rng):
    x = rng.standard_normal((10, 50)).astype(np.float32)
    bits = binary_quantize(jnp.asarray(x))
    assert bits.shape == (10, 2)


def test_int8_blockwise_matches_flat(rng):
    corpus = rng.standard_normal((3000, 64)).astype(np.float32)
    queries = rng.standard_normal((4, 64)).astype(np.float32)
    cq, cs = scalar_quantize(jnp.asarray(corpus))
    s1, i1 = int8_topk_scan(cq, cs, jnp.asarray(queries), 8)
    s2, i2 = int8_topk_scan(cq, cs, jnp.asarray(queries), 8,
                            block_rows=512)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)
    mask = np.zeros(3000, bool)
    mask[100:200] = True
    s3, i3 = int8_topk_scan(cq, cs, jnp.asarray(queries), 8,
                            mask=jnp.asarray(mask), block_rows=512)
    assert mask[np.asarray(i3)].all()


# ------------------------------------------------- composite metric

def test_composite_metric_matches_scalar_reference(rng):
    from neumann_tpu.ops.scan import COMPOSITE_DEFAULT

    c = rng.standard_normal((150, 16)).astype(np.float32)
    c[rng.random((150, 16)) < 0.5] = 0.0  # sparse supports for Jaccard
    q = c[7:8] + 0.01

    def scalar(a, b, w=COMPOSITE_DEFAULT):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        cos = 0.5 if na == 0 or nb == 0 else (a @ b / (na * nb) + 1) / 2
        sa, sb = a != 0, b != 0
        jac = np.sum(sa & sb) / max(np.sum(sa | sb), 1)
        mag = 1 / (1 + np.linalg.norm(a - b))
        return (w[0] * cos + w[1] * jac + w[2] * mag) / sum(w)

    s, i = topk_scan(jnp.asarray(c), jnp.asarray(q), 150, "composite")
    expect = np.sort([scalar(q[0], row) for row in c])[::-1]
    np.testing.assert_allclose(np.asarray(s[0]), expect, atol=1e-5)
    assert int(i[0, 0]) == 7


def test_composite_weights_and_blockwise(rng):
    from neumann_tpu.ops.scan import COMPOSITE_STRUCTURAL_HEAVY

    c = rng.standard_normal((300, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    flat_s, flat_i = topk_scan(jnp.asarray(c), jnp.asarray(q), 5,
                               "composite",
                               weights=COMPOSITE_STRUCTURAL_HEAVY)
    blk_s, blk_i = topk_scan(jnp.asarray(c), jnp.asarray(q), 5,
                             "composite", block_rows=64,
                             weights=COMPOSITE_STRUCTURAL_HEAVY)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(blk_s),
                               atol=1e-5)
    # all scores land in [0, 1]
    assert float(jnp.min(flat_s)) >= 0.0 and float(jnp.max(flat_s)) <= 1.0


def test_composite_zero_weights_and_mask(rng):
    c = rng.standard_normal((50, 8)).astype(np.float32)
    q = c[:1]
    s, i = topk_scan(jnp.asarray(c), jnp.asarray(q), 3, "composite",
                     weights=(0.0, 0.0, 0.0))
    assert np.all(np.asarray(s) == 0.0)
    mask = np.zeros(50, bool)
    mask[10] = True
    s, i = topk_scan(jnp.asarray(c), jnp.asarray(q), 3, "composite",
                     mask=jnp.asarray(mask))
    assert int(i[0, 0]) == 10 and np.all(np.asarray(i[0, 1:]) == -1)


def test_weighted_jaccard_metric(rng):
    c = np.abs(rng.standard_normal((80, 12))).astype(np.float32)
    c[rng.random((80, 12)) < 0.5] = 0.0
    q = c[5:6]

    def scalar(a, b):
        mx = np.sum(np.maximum(np.abs(a), np.abs(b)))
        return 1.0 if mx == 0 else \
            float(np.sum(np.minimum(np.abs(a), np.abs(b))) / mx)

    s, i = topk_scan(jnp.asarray(c), jnp.asarray(q), 80,
                     "weighted_jaccard")
    expect = np.sort([scalar(q[0], row) for row in c])[::-1]
    np.testing.assert_allclose(np.asarray(s[0]), expect, atol=1e-6)
    assert int(i[0, 0]) == 5 and abs(float(s[0, 0]) - 1.0) < 1e-6
    # blockwise path agrees
    bs, _ = topk_scan(jnp.asarray(c), jnp.asarray(q), 5,
                      "weighted_jaccard", block_rows=32)
    np.testing.assert_allclose(np.asarray(bs[0]), expect[:5], atol=1e-6)
    # negative values compare by magnitude (reference abs semantics)
    a = np.array([[1.0, -2.0]], np.float32)
    b = np.array([[-1.0, 2.0]], np.float32)
    s2, _ = topk_scan(jnp.asarray(b), jnp.asarray(a), 1,
                      "weighted_jaccard")
    assert abs(float(s2[0, 0]) - 1.0) < 1e-6


def test_composite_unnormalized_weights(rng):
    """Weights that do NOT sum to 1 must still normalize (the /total
    term is live — caught by mutation testing)."""
    c = rng.standard_normal((40, 8)).astype(np.float32)
    q = rng.standard_normal((1, 8)).astype(np.float32)
    s1, i1 = topk_scan(jnp.asarray(c), jnp.asarray(q), 40, "composite",
                       weights=(1.0, 0.6, 0.4))
    s2, i2 = topk_scan(jnp.asarray(c), jnp.asarray(q), 40, "composite",
                       weights=(0.5, 0.3, 0.2))
    # same ratios -> identical normalized scores
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    # and the scores stay in [0, 1] (unnormalized sums would exceed 1)
    assert float(jnp.max(s1)) <= 1.0 + 1e-6


def test_blockwise_underfilled_mask_sentinels(rng):
    """Blockwise path with fewer valid rows than k: losers must carry
    index -1 and score -inf (caught by mutation testing)."""
    c = rng.standard_normal((300, 8)).astype(np.float32)
    mask = np.zeros(300, bool)
    mask[7] = mask[205] = True  # 2 valid rows, k=5, multiple blocks
    s, i = topk_scan(jnp.asarray(c), jnp.asarray(c[7:8]), 5, "cosine",
                     mask=jnp.asarray(mask), block_rows=64)
    idx = np.asarray(i[0])
    assert set(idx[:2]) == {7, 205}
    assert np.all(idx[2:] == -1)
    assert np.all(np.isneginf(np.asarray(s[0])[2:]))


def test_int8_euclidean_matches_oracle(rng):
    """int8 euclidean WITHOUT precomputed norms (the cn2-recompute
    branch; mutation-found gap)."""
    from neumann_tpu.ops.quant import scalar_quantize

    c = rng.standard_normal((200, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    cq, cs = scalar_quantize(jnp.asarray(c))
    s, i = int8_topk_scan(cq, cs, jnp.asarray(q), 5, "euclidean")
    # oracle on the dequantized corpus AND dequantized query (the scan
    # quantizes queries too; q-quantization error is ~0.3% relative)
    deq = np.asarray(cq, np.float32) * np.asarray(cs)[:, None]
    qq, qs = scalar_quantize(jnp.asarray(q))
    dq = np.asarray(qq, np.float32) * np.asarray(qs)[:, None]
    for qi in range(2):
        d = np.linalg.norm(deq - q[qi][None, :], axis=1)
        exp_idx = np.argsort(d)[:5]
        np.testing.assert_array_equal(np.asarray(i[qi]), exp_idx)
        d2 = np.sqrt(np.maximum(
            np.sum(dq[qi] ** 2) - 2 * deq[np.asarray(i[qi])] @ dq[qi]
            + np.sum(deq[np.asarray(i[qi])] ** 2, axis=1), 0))
        np.testing.assert_allclose(np.asarray(s[qi]), -d2, rtol=1e-4,
                                   atol=1e-4)


def test_hamming_blockwise_with_padding(rng):
    """Blockwise hamming with n NOT a multiple of block_rows exercises
    the pad branch (mutation-found gap)."""
    from neumann_tpu.ops.quant import binary_quantize, hamming_topk

    c = rng.standard_normal((150, 64)).astype(np.float32)
    q = c[33:36]  # Q=3: not a power of two, catches shape mutants
    cb = binary_quantize(jnp.asarray(c))
    qb = binary_quantize(jnp.asarray(q))
    s_blk, i_blk = hamming_topk(cb, qb, 4, block_rows=64)  # 150 = 2*64+22
    s_flat, i_flat = hamming_topk(cb, qb, 4, block_rows=512)
    np.testing.assert_array_equal(np.asarray(i_blk), np.asarray(i_flat))
    np.testing.assert_array_equal(np.asarray(s_blk), np.asarray(s_flat))
    assert [int(i_blk[j, 0]) for j in range(3)] == [33, 34, 35]


def test_blockwise_euclidean_and_approx_selection(rng):
    """Blockwise scan for the euclidean metric + approx_max_k
    selection merge exactly across blocks."""
    corpus = rng.standard_normal((1500, 32)).astype(np.float32)
    queries = rng.standard_normal((2, 32)).astype(np.float32)
    s_flat, i_flat = topk_scan(jnp.asarray(corpus), jnp.asarray(queries),
                               5, "euclidean")
    s_blk, i_blk = topk_scan(jnp.asarray(corpus), jnp.asarray(queries),
                             5, "euclidean", block_rows=256)
    np.testing.assert_allclose(np.asarray(s_flat), np.asarray(s_blk),
                               rtol=1e-4, atol=1e-4)
    s_ap, i_ap = topk_scan(jnp.asarray(corpus), jnp.asarray(queries),
                           5, "cosine", block_rows=256,
                           selection="approx", recall_target=0.95)
    s_ex, i_ex = topk_scan(jnp.asarray(corpus), jnp.asarray(queries),
                           5, "cosine")
    # approx selection: high overlap with the exact result
    overlap = np.mean([
        len(set(np.asarray(i_ap)[q]) & set(np.asarray(i_ex)[q])) / 5
        for q in range(2)])
    assert overlap >= 0.6


def test_topk_scan_jit_wrapper(rng):
    from neumann_tpu.ops.scan import topk_scan_jit

    corpus = rng.standard_normal((600, 16)).astype(np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    s1, i1 = topk_scan_jit(jnp.asarray(corpus), jnp.asarray(q), 4)
    s2, i2 = topk_scan(jnp.asarray(corpus), jnp.asarray(q), 4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    assert (np.asarray(i1) == np.asarray(i2)).all()


def test_unknown_metric_raises(rng):
    corpus = rng.standard_normal((10, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="unknown metric"):
        topk_scan(jnp.asarray(corpus),
                  jnp.asarray(corpus[0]), 3, "chebyshev")


def test_blockwise_mask_and_int8_cross_check(rng):
    """Masked blockwise agrees with masked flat on every row."""
    corpus = rng.standard_normal((1100, 24)).astype(np.float32)
    queries = rng.standard_normal((3, 24)).astype(np.float32)
    mask = rng.random(1100) < 0.3
    s_f, i_f = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 6,
                         "cosine", jnp.asarray(mask))
    s_b, i_b = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 6,
                         "cosine", jnp.asarray(mask), block_rows=128)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_b),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(i_f) == np.asarray(i_b)).all()


def test_jaccard_overlap_match_sparse_oracle(rng):
    """Dense support-set metrics vs the scalar SparseVector oracle
    (sparse_vector.rs:816-866 semantics)."""
    from neumann_tpu.store.sparse import SparseVector

    corpus = rng.standard_normal((60, 24)).astype(np.float32)
    corpus[rng.random((60, 24)) < 0.5] = 0.0
    corpus[7] = 0.0  # one fully-empty row
    queries = rng.standard_normal((4, 24)).astype(np.float32)
    queries[rng.random((4, 24)) < 0.5] = 0.0
    queries[2] = 0.0  # one fully-empty query

    sc = [SparseVector.from_dense(r) for r in corpus]
    for metric, fn in (("jaccard", SparseVector.jaccard),
                       ("overlap", SparseVector.overlap)):
        got = np.asarray(score_all(jnp.asarray(corpus),
                                   jnp.asarray(queries), metric=metric))
        for qi in range(queries.shape[0]):
            sq = SparseVector.from_dense(queries[qi])
            want = np.array([fn(sq, c) for c in sc], dtype=np.float32)
            np.testing.assert_allclose(got[qi], want, rtol=1e-6, atol=1e-6)
        # topk agrees with the full matrix ordering (allowing ties)
        s, i = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 5, metric)
        full = np.asarray(score_all(jnp.asarray(corpus),
                                    jnp.asarray(queries), metric=metric))
        np.testing.assert_allclose(
            np.asarray(s), -np.sort(-full, axis=1)[:, :5], rtol=1e-6)


def test_jaccard_blockwise_matches_flat(rng):
    corpus = rng.standard_normal((130, 16)).astype(np.float32)
    corpus[rng.random((130, 16)) < 0.6] = 0.0
    queries = rng.standard_normal((3, 16)).astype(np.float32)
    for metric in ("jaccard", "overlap"):
        sf, _ = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 7, metric)
        sb, _ = topk_scan(jnp.asarray(corpus), jnp.asarray(queries), 7, metric,
                          block_rows=32)
        np.testing.assert_allclose(np.asarray(sf), np.asarray(sb), rtol=1e-6)
