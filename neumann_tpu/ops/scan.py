"""Exact brute-force similarity scan as MXU matmul + top-k.

This is the TPU-native replacement for the reference's hot loop
(vector_engine/src/lib.rs:2144-2168: rayon par_iter over keys with per-key
store.get + f32x8 SIMD dot). Instead of N scalar loads we do one batched
matmul ``queries @ corpus.T`` on the MXU, apply validity/predicate masks as
-inf in-register, and select top-k.

Two execution strategies, both exact:

* **flat**: one matmul producing the full ``[Q, N]`` score matrix, then
  ``lax.top_k``. Best for corpora that fit a few hundred MB of scores.
* **blockwise**: ``lax.scan`` over row-blocks with a running top-k carry.
  Never materializes more than ``[Q, block]`` scores, so HBM traffic stays
  at reading the corpus once. Exact because the global top-k is a subset of
  the union of per-block top-ks.

All functions are pure and traceable; callers wrap them in ``jax.jit`` with
static ``k`` / ``metric`` / ``block_rows``.

Score conventions match the reference (vector_engine/src/lib.rs:2040-2045):
cosine in [-1, 1], dot unbounded, euclidean returned here as **negative
distance** (higher = closer); the engine layer converts to the reference's
1/(1+dist) display form.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Metrics supported by the device scan. "manhattan" uses a broadcast path
# (no matmul form exists for L1); everything else rides the MXU.
# "composite" is the reference's weighted geometric score
# (tensor_store/src/distance.rs GeometricConfig): cosine mapped to [0,1]
# + Jaccard support overlap + inverted euclidean, weighted. On TPU the
# Jaccard term is a SECOND indicator matmul, so it stays on the MXU.
METRICS = ("cosine", "dot", "euclidean", "manhattan", "composite",
           "weighted_jaccard", "angular", "geodesic", "jaccard", "overlap")

# GeometricConfig presets (distance.rs:140-168): (cosine, structural,
# magnitude) weights.
COMPOSITE_DEFAULT = (0.5, 0.3, 0.2)
COMPOSITE_ANGULAR_HEAVY = (0.8, 0.1, 0.1)
COMPOSITE_STRUCTURAL_HEAVY = (0.2, 0.7, 0.1)
COMPOSITE_CONFLICT_DETECTION = (0.4, 0.5, 0.1)

# numpy scalar, NOT a jnp array: creating a device array at import time
# would initialize the backend before the caller can configure it.
NEG_INF = np.float32(-np.inf)

# Above this many rows the flat [Q, N] score matrix is avoided in favor of
# the blockwise scan. 256K rows * 64 queries * 4B = 64 MB of scores.
_FLAT_MAX_ROWS = 256 * 1024
_DEFAULT_BLOCK_ROWS = 64 * 1024


def _as2d(queries: jnp.ndarray) -> jnp.ndarray:
    return queries if queries.ndim == 2 else queries[None, :]


def _dot_scores(queries, corpus_block):
    """[Q, d] x [B, d] -> [Q, B] on the MXU, f32 accumulation."""
    return lax.dot_general(
        queries,
        corpus_block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _block_scores(queries, corpus_block, metric, q_sqnorm, c_sqnorm_block,
                  weights=COMPOSITE_DEFAULT):
    """Similarity scores (higher = better) for one corpus block.

    q_sqnorm: [Q, 1] squared query norms; c_sqnorm_block: [B] squared corpus
    row norms (both precomputed once per call, not per block).
    """
    if metric == "composite":
        return _composite_scores(queries, corpus_block, q_sqnorm,
                                 c_sqnorm_block, weights)
    if metric == "manhattan":
        # [Q, 1, d] - [1, B, d] -> sum |.| ; no MXU form, VPU broadcast.
        diff = jnp.abs(queries[:, None, :] - corpus_block[None, :, :])
        return -jnp.sum(diff, axis=-1)
    if metric == "weighted_jaccard":
        # sum(min(|a|,|b|)) / sum(max(|a|,|b|)) in one broadcast pass
        # (sparse_vector.rs:886-930); min+max = |a|+|b| and
        # max = (|a|+|b|+||a|-|b||)/2, so one |a-b|-style pass suffices.
        qa = jnp.abs(queries)[:, None, :]
        ca = jnp.abs(corpus_block)[None, :, :]
        tot = jnp.sum(qa, axis=-1) + jnp.sum(ca, axis=-1)  # [Q,B]
        diff = jnp.sum(jnp.abs(qa - ca), axis=-1)
        max_sum = (tot + diff) * 0.5
        min_sum = (tot - diff) * 0.5
        return jnp.where(max_sum > 0.0, min_sum / max_sum, 1.0)
    if metric in ("jaccard", "overlap"):
        # Support-set metrics (sparse_vector.rs:816-866) as ONE indicator
        # matmul: |A∩B| = nz(q) @ nz(c).T on the MXU. jaccard divides by
        # the union (both-empty rows count as identical, 1.0); overlap by
        # the smaller support (any empty side -> 0.0).
        nz_q = (queries != 0.0).astype(jnp.float32)
        nz_c = (corpus_block != 0.0).astype(jnp.float32)
        inter = _dot_scores(nz_q, nz_c)
        nq = jnp.sum(nz_q, axis=1, keepdims=True)       # [Q, 1]
        nc = jnp.sum(nz_c, axis=1)[None, :]             # [1, B]
        if metric == "jaccard":
            union = nq + nc - inter
            return jnp.where(union > 0.0, inter / jnp.maximum(union, 1.0),
                             1.0)
        smaller = jnp.minimum(nq, nc)
        return jnp.where(smaller > 0.0,
                         inter / jnp.maximum(smaller, 1.0), 0.0)
    dots = _dot_scores(queries, corpus_block)
    if metric == "dot":
        return dots
    if metric in ("cosine", "angular", "geodesic"):
        # angular/geodesic distance = arccos(cos) is a monotone
        # transform of cosine (distance.rs:22-31, geodesic == angular
        # on the hypersphere, sparse_vector.rs:805-808), so the scan
        # orders by cosine and _finalize maps the k winners.
        metric = "cosine"
    if metric == "cosine":
        q_inv = lax.rsqrt(jnp.maximum(q_sqnorm, 1e-30))
        c_inv = lax.rsqrt(jnp.maximum(c_sqnorm_block, 1e-30))
        # Zero-magnitude rows (padding / deleted) get score 0 like the
        # reference's zero-magnitude handling; masking later sets -inf.
        scores = dots * q_inv * c_inv[None, :]
        qz = (q_sqnorm <= 0.0)
        cz = (c_sqnorm_block <= 0.0)[None, :]
        return jnp.where(qz | cz, 0.0, scores)
    if metric == "euclidean":
        # -dist^2 has the same ordering as -dist; sqrt applied to the
        # final k results only.
        d2 = q_sqnorm - 2.0 * dots + c_sqnorm_block[None, :]
        return -jnp.maximum(d2, 0.0)
    raise ValueError(f"unknown metric: {metric}")


def _composite_scores(queries, corpus_block, q_sqnorm, c_sqnorm_block,
                      weights):
    """Weighted composite geometric score in [0, 1].

    Parity with the reference's GeometricConfig.compute
    (tensor_store/src/distance.rs:169-210): cosine similarity mapped to
    [0, 1], Jaccard overlap of the nonzero supports, and 1/(1+euclidean).
    Both the dot products and the support-intersection counts are MXU
    matmuls; one extra indicator matmul is the entire added cost.
    """
    w_cos, w_struct, w_mag = (float(w) for w in weights)
    total = w_cos + w_struct + w_mag
    if total <= 0.0:
        q = queries.shape[0]
        b = corpus_block.shape[0]
        return jnp.zeros((q, b), jnp.float32)

    dots = _dot_scores(queries, corpus_block)

    # cosine -> [0, 1]
    q_inv = lax.rsqrt(jnp.maximum(q_sqnorm, 1e-30))
    c_inv = lax.rsqrt(jnp.maximum(c_sqnorm_block, 1e-30))
    cos = dots * q_inv * c_inv[None, :]
    qz = (q_sqnorm <= 0.0)
    cz = (c_sqnorm_block <= 0.0)[None, :]
    cos01 = jnp.where(qz | cz, 0.5, (cos + 1.0) * 0.5)

    # Jaccard of nonzero supports: |A∩B| / |A∪B| via an indicator matmul.
    nz_q = (queries != 0.0).astype(jnp.float32)
    nz_c = (corpus_block != 0.0).astype(jnp.float32)
    inter = _dot_scores(nz_q, nz_c)
    union = (jnp.sum(nz_q, axis=1, keepdims=True)
             + jnp.sum(nz_c, axis=1)[None, :] - inter)
    jac = inter / jnp.maximum(union, 1.0)

    # magnitude: 1 / (1 + euclidean distance)
    d2 = jnp.maximum(q_sqnorm - 2.0 * dots + c_sqnorm_block[None, :], 0.0)
    mag = 1.0 / (1.0 + jnp.sqrt(d2))

    return (w_cos * cos01 + w_struct * jac + w_mag * mag) / total


def _finalize(scores, metric):
    """Convert internal ordering scores to reportable scores."""
    if metric == "euclidean":
        # internal score is -dist^2 -> report -dist (engine maps to 1/(1+d))
        return -jnp.sqrt(jnp.maximum(-scores, 0.0))
    if metric in ("angular", "geodesic"):
        # internal score is cosine; report -arccos(cos) so that higher
        # is still better (distance 0 == identical direction)
        finite = jnp.isfinite(scores)
        safe = jnp.clip(jnp.where(finite, scores, 0.0), -1.0, 1.0)
        return jnp.where(finite, -jnp.arccos(safe), scores)
    return scores


def score_all(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    metric: str = "cosine",
    mask: Optional[jnp.ndarray] = None,
    weights=COMPOSITE_DEFAULT,
) -> jnp.ndarray:
    """Full [Q, N] score matrix (flat path). Masked entries are -inf."""
    queries = _as2d(queries).astype(jnp.float32)
    corpus = corpus.astype(jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    c_sq = jnp.sum(corpus * corpus, axis=1)
    scores = _block_scores(queries, corpus, metric, q_sq, c_sq, weights)
    if mask is not None:
        scores = jnp.where(mask[None, :], scores, NEG_INF)
    return scores


def _block_topk(scores, k, selection, recall_target):
    """Per-block k-selection: exact sort-based top_k, or the TPU-optimized
    approximate PartialReduce (lax.approx_max_k) — measured ~3x faster at
    recall_target=0.95 on v5e (805 vs 208 GB/s effective scan bandwidth).
    The final cross-block merge is always exact."""
    if selection == "approx":
        return lax.approx_max_k(scores, k, recall_target=recall_target)
    return lax.top_k(scores, k)


def topk_scan(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    mask: Optional[jnp.ndarray] = None,
    block_rows: int = _DEFAULT_BLOCK_ROWS,
    selection: str = "exact",
    recall_target: float = 0.95,
    weights=COMPOSITE_DEFAULT,
):
    """Exact top-k similarity search.

    Args:
      corpus: [N, d] float array (rows may include padding; mask them out).
      queries: [Q, d] or [d] float array.
      k: number of neighbors (static).
      metric: one of METRICS (static).
      mask: optional [N] bool — validity AND any predicate/graph constraint,
        fused into the scan as -inf (the reference post-filters instead:
        tensor_unified/src/lib.rs:918-927).
      block_rows: row-block size for the scan path (static).

    Returns:
      (scores [Q, k] f32, indices [Q, k] int32), sorted descending by score.
      Masked/padded slots that make it into the k results (when fewer than k
      valid rows exist) carry score -inf and index -1.
    """
    queries = _as2d(queries)
    if queries.shape[-1] != corpus.shape[-1]:
        raise ValueError(
            f"query dim {queries.shape[-1]} != corpus dim "
            f"{corpus.shape[-1]} (corpus may be lane-padded; pad the query "
            f"with zeros to match)")
    n = corpus.shape[0]
    k = min(k, n)

    # flat path: corpus fits one scoring block. An EXPLICIT block_rows
    # below the default forces the scan path even for small corpora
    # (tests exercise the lax.scan machinery at toy sizes; production
    # callers leave the default and stay flat up to _FLAT_MAX_ROWS)
    flat = (n <= block_rows
            or (block_rows >= _DEFAULT_BLOCK_ROWS
                and n <= _FLAT_MAX_ROWS))
    if flat or corpus.ndim != 2:
        scores = score_all(corpus, queries, metric, mask, weights)
        top_s, top_i = _block_topk(scores, k, selection, recall_target)
        top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
        return _finalize(top_s, metric), top_i.astype(jnp.int32)

    return _blockwise_topk(corpus, queries, k, metric, mask, block_rows,
                           selection, recall_target, weights)


def _blockwise_topk(corpus, queries, k, metric, mask, block_rows,
                    selection="exact", recall_target=0.95,
                    weights=COMPOSITE_DEFAULT):
    queries = queries.astype(jnp.float32)
    n, d = corpus.shape
    q = queries.shape[0]
    nblocks = -(-n // block_rows)
    n_pad = nblocks * block_rows

    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)

    if n_pad != n:
        pad = n_pad - n
        corpus = jnp.concatenate(
            [corpus, jnp.zeros((pad, d), corpus.dtype)], axis=0
        )
        pad_mask = jnp.concatenate(
            [jnp.ones((n,), bool) if mask is None else mask,
             jnp.zeros((pad,), bool)],
            axis=0,
        )
    else:
        pad_mask = mask

    corpus_b = corpus.reshape(nblocks, block_rows, d)
    mask_b = None if pad_mask is None else pad_mask.reshape(nblocks, block_rows)

    init_s = jnp.full((q, k), NEG_INF, jnp.float32)
    init_i = jnp.full((q, k), -1, jnp.int32)
    block_iota = lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    def step(carry, xs):
        best_s, best_i = carry
        if mask_b is None:
            block_idx, block = xs
            bmask = None
        else:
            block_idx, block, bmask = xs
        c_sq = jnp.sum(
            block.astype(jnp.float32) * block.astype(jnp.float32), axis=1
        )
        s = _block_scores(queries, block, metric, q_sq, c_sq, weights)
        if bmask is not None:
            s = jnp.where(bmask[None, :], s, NEG_INF)
        bs, bi = _block_topk(s, k, selection, recall_target)
        ids = jnp.take_along_axis(
            jnp.broadcast_to(block_iota + block_idx * block_rows,
                             s.shape), bi, axis=1)
        cand_s = jnp.concatenate([best_s, bs], axis=1)
        cand_i = jnp.concatenate([best_i, ids], axis=1)
        new_s, pos = lax.top_k(cand_s, k)
        new_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (new_s, new_i), None

    xs = (jnp.arange(nblocks, dtype=jnp.int32), corpus_b)
    if mask_b is not None:
        xs = xs + (mask_b,)
    (best_s, best_i), _ = lax.scan(step, (init_s, init_i), xs)
    best_i = jnp.where(jnp.isneginf(best_s), -1, best_i)
    return _finalize(best_s, metric), best_i


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows",
                                              "selection", "recall_target",
                                              "weights"))
def topk_scan_jit(corpus, queries, k, metric="cosine", mask=None,
                  block_rows=_DEFAULT_BLOCK_ROWS, selection="exact",
                  recall_target=0.95, weights=COMPOSITE_DEFAULT):
    """jit-wrapped topk_scan for direct use."""
    return topk_scan(corpus, queries, k, metric, mask, block_rows,
                     selection, recall_target, weights)


def host_pull(*arrays):
    """Transfer several device arrays to host with ONE latency floor.

    ``np.asarray(a); np.asarray(b)`` pays the device->host round-trip
    serially per array (the dev tunnel's sync floor is ~25 ms, so a
    (scores, ids) result costs 2 floors). Starting non-blocking D2H
    copies for every array first overlaps the transfers, so the total
    is max(transfer) + one floor. numpy inputs pass through untouched.
    Returns a tuple of np.ndarray in argument order.
    """
    for a in arrays:
        f = getattr(a, "copy_to_host_async", None)
        if f is not None:
            try:
                f()
            except Exception:   # backend without async D2H: serial
                pass            # np.asarray below still works
    return tuple(np.asarray(a) for a in arrays)
