"""Second-pass rerank: exact f32 rescoring of scan-selected candidates.

The single-pass quantized scans trade per-score precision for HBM
bandwidth: the pooled-bits scan quantizes the *query* to int8 and
truncates log2(pool) mantissa bits of every score, and the windowed-IVF
core scores in bf16. Measured on the 10M x 768 clustered corpus, the
SELECTION those scans make is nearly perfect (candidate-set recall
0.997) while the final ordering is not (recall@10 vs f32 0.945) — i.e.
almost all the loss is score precision, not candidate coverage.

This module is the fix, mirroring the two-pass shape of the reference's
exact path (vector_engine/src/lib.rs:1950-2036 scores every row in f32;
we only re-score the few candidates that survive selection):

  1. first pass (elsewhere): bandwidth-optimal quantized scan selects
     C = O(k) candidate positions;
  2. second pass (here): gather those C rows — a few MB against the
     multi-GB scan — reconstruct them at the highest stored precision
     (int8, or int8 + int8 residual ~= int16), and rescore in f32
     against the UNQUANTIZED query;
  3. duplicate positions (overlapping IVF windows) are collapsed on
     device — sort by position, mask equal-neighbor runs — so callers
     get k distinct rows with no host-side dedup loop.

Everything is shape-static and jit-safe; the gather cost is
Q x C x d bytes, invisible next to the first-pass corpus read.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from neumann_tpu.ops.scan import NEG_INF


def residual_quantize(x: jnp.ndarray, q: jnp.ndarray,
                      scale: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize the int8 reconstruction error as a second int8 array.

    x [N, d] f32 original rows, (q, scale) their first-pass int8 form.
    Returns (rq int8 [N, d], rscale f32 [N]) with
    ``x ~= q * scale + rq * rscale`` — two int8 planes give ~14-15 bits
    of effective mantissa, enough that rerank ordering matches f32. The
    residual plane costs the same bytes as the corpus plane but is only
    ever *gathered* (candidates), never scanned.
    """
    res = x - q.astype(jnp.float32) * scale[..., None]
    am = jnp.max(jnp.abs(res), axis=-1)
    rscale = jnp.where(am > 0, am / 127.0, 1.0)
    rq = jnp.clip(jnp.round(res / rscale[..., None]), -127, 127
                  ).astype(jnp.int8)
    return rq, rscale.astype(jnp.float32)


def _dedup_sorted(scores: jnp.ndarray, pos: jnp.ndarray):
    """Mask duplicate positions per row: sort by position, -inf every
    element equal to its left neighbor. Returns (scores, pos) sorted by
    position with dups (and -1 sentinels) at -inf."""
    order = jnp.argsort(pos, axis=1)
    ps = jnp.take_along_axis(pos, order, axis=1)
    sc = jnp.take_along_axis(scores, order, axis=1)
    prev = jnp.concatenate(
        [jnp.full((ps.shape[0], 1), -2, ps.dtype), ps[:, :-1]], axis=1)
    dead = (ps == prev) | (ps < 0)
    return jnp.where(dead, NEG_INF, sc), ps


def gather_rerank_topk(
    corpus_q: jnp.ndarray,
    pos: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    scale: Optional[jnp.ndarray] = None,
    residual_q: Optional[jnp.ndarray] = None,
    residual_scale: Optional[jnp.ndarray] = None,
    first_scores: Optional[jnp.ndarray] = None,
    dedup: bool = True,
    row_mult: Optional[jnp.ndarray] = None,
    valid_rows: Optional[jnp.ndarray] = None,
):
    """Exact f32 top-k over gathered candidate rows.

    corpus_q   [N, d] int8 or f32 corpus (the gather source).
    pos        [Q, C] int32 candidate positions; -1 = empty slot;
               duplicates allowed (overlapping IVF windows).
    queries    [Q, d] f32 UNQUANTIZED queries.
    scale      [N] f32 per-row scale for int8 corpora. For cosine it
               cancels algebraically and may be omitted *when no
               residual plane is given*.
    residual_* optional second int8 plane (see residual_quantize).
    first_scores  optional [Q, C] first-pass scores: slots already at
               -inf there (masked rows) stay -inf after rerank.
    row_mult   [N] f32 precomputed cosine multipliers (scale/||row||,
               0 = invalid — ops.quant.int8_cosine_row_mult). Cosine
               fast path: score = dots * row_mult[pos] / ||q||, one
               f32 pass over the gather instead of three (scale
               multiply + dots + norm recompute) — same f32 numbers,
               the norms were just computed once at ingest.
    valid_rows [N] row-validity plane (<= 0 = dead: tombstoned or
               padding). Needed when candidates can include rows the
               FIRST pass never scored — pool expansion copies a
               winner's first-pass score onto every pool-mate, so a
               tombstone in the pool would otherwise be rescored live.
    Returns (scores [Q, k] f32, positions [Q, k] int32, -1 for empty).
    """
    if residual_q is not None and scale is None:
        raise ValueError("residual rerank needs the first-pass scale")
    qf = queries.astype(jnp.float32)
    safe = jnp.maximum(pos, 0)
    if (row_mult is not None and metric == "cosine"
            and residual_q is None):
        cand = corpus_q[safe].astype(jnp.float32)      # [Q, C, d]
        dots = jnp.einsum("qcd,qd->qc", cand, qf,
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)
        qn = jnp.sqrt(jnp.maximum(
            jnp.sum(qf * qf, axis=-1, keepdims=True), 1e-60))
        scores = dots * row_mult[safe] / qn
        dead = pos < 0
        if valid_rows is not None:
            dead = dead | (valid_rows[safe] <= 0)
        if first_scores is not None:
            dead = dead | jnp.isneginf(first_scores)
        scores = jnp.where(dead, NEG_INF, scores)
        if dedup:
            scores, pos = _dedup_sorted(scores, pos)
        k = min(k, scores.shape[1])
        s, i = lax.top_k(scores, k)
        out_pos = jnp.take_along_axis(pos, i, axis=1)
        out_pos = jnp.where(jnp.isneginf(s), -1, out_pos)
        return s, out_pos.astype(jnp.int32)
    cand = corpus_q[safe].astype(jnp.float32)          # [Q, C, d]
    if scale is not None:
        cand = cand * scale[safe][..., None]
    if residual_q is not None:
        cand = cand + (residual_q[safe].astype(jnp.float32)
                       * residual_scale[safe][..., None])
    # HIGHEST: TPU matmuls default to bf16 INPUT precision (preferred_
    # element_type only sets the accumulator) — the entire point of
    # this pass is exact f32 scoring, so force full-precision passes;
    # the candidate set is tiny, the cost is invisible
    dots = jnp.einsum("qcd,qd->qc", cand, qf,
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)
    if metric == "dot":
        scores = dots
    elif metric == "cosine":
        cn2 = jnp.sum(cand * cand, axis=-1)
        qn = jnp.sqrt(jnp.maximum(
            jnp.sum(qf * qf, axis=-1, keepdims=True), 1e-60))
        scores = jnp.where(
            cn2 > 0, dots * lax.rsqrt(jnp.maximum(cn2, 1e-60)) / qn, 0.0)
    elif metric == "euclidean":
        cn2 = jnp.sum(cand * cand, axis=-1)
        qn2 = jnp.sum(qf * qf, axis=-1, keepdims=True)
        scores = -jnp.maximum(qn2 - 2.0 * dots + cn2, 0.0)
    else:
        raise ValueError(f"unsupported rerank metric: {metric}")
    dead = pos < 0
    if valid_rows is not None:
        dead = dead | (valid_rows[safe] <= 0)
    if first_scores is not None:
        dead = dead | jnp.isneginf(first_scores)
    scores = jnp.where(dead, NEG_INF, scores)
    if dedup:
        scores, pos = _dedup_sorted(scores, pos)
    k = min(k, scores.shape[1])
    s, i = lax.top_k(scores, k)
    out_pos = jnp.take_along_axis(pos, i, axis=1)
    out_pos = jnp.where(jnp.isneginf(s), -1, out_pos)
    if metric == "euclidean":
        s = -jnp.sqrt(jnp.maximum(-s, 0.0))
    return s, out_pos.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "dedup"))
def gather_rerank_topk_jit(corpus_q, pos, queries, k, metric="cosine",
                           scale=None, residual_q=None,
                           residual_scale=None, first_scores=None,
                           dedup=True, row_mult=None):
    return gather_rerank_topk(corpus_q, pos, queries, k, metric, scale,
                              residual_q, residual_scale, first_scores,
                              dedup, row_mult)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "dedup", "chunk",
                                    "pre_select", "expand_pool",
                                    "expand_window"))
def gather_rerank_topk_chunked(corpus_q, pos, queries, k,
                               metric="cosine", scale=None,
                               residual_q=None, residual_scale=None,
                               first_scores=None, dedup=True,
                               chunk=128, pre_select=None,
                               expand_pool=1, row_mult=None,
                               expand_window=0, valid_rows=None):
    """gather_rerank_topk with the query axis streamed in chunks.

    The plain rerank materializes the [Q, C, d] f32 candidate gather —
    at throughput batch sizes (Q=1024, C~=1000 candidates) that is
    gigabytes. lax.map over query chunks bounds live memory to one
    chunk's gather while staying inside a single jit.

    pre_select: keep only the top-``pre_select`` candidates per query
    by FIRST-pass score before gathering. Corpus row gathers cost ~µs
    each on TPU, so gathering all nprobe*m batched-IVF candidates
    (1000+/query) dominates the whole batch; the first pass's bf16
    ordering is easily good enough to cut to O(8k) before paying the
    gather. Requires first_scores.

    expand_pool=p: each surviving candidate is a POOL WINNER from the
    pooled-bits batched core (ops/ivf._batched_core selection=p) —
    expand it to all p rows of its pool before rescoring. A true top-k
    row lost to a pool collision is by definition a pool-mate of a
    HIGHER-scoring winner (which therefore pre-selects), so expansion
    makes pooled selection collision-exact for ~p x the (tiny) gather.
    Positions must come from aligned disjoint pools (fixed windows)."""
    if (pre_select is not None and first_scores is not None
            and pos.shape[1] > pre_select):
        # wide candidate lists (pooled batched IVF emits nprobe *
        # window/pool per query): exact top_k is a full VPU sort —
        # approx_max_k suffices because order does not matter here
        # (the rerank below re-scores and re-sorts whatever survives).
        # recall_target=0.99: the default 0.95 lets the tiled reduce
        # drop ~5% of true winners, which showed up as end-to-end
        # recall@10 fluctuating 0.984-0.995 run-to-run at presel 16-32
        # — selection losses here are unrecoverable downstream.
        if pos.shape[1] > 4 * pre_select:
            fs, ci = lax.approx_max_k(first_scores, pre_select,
                                      recall_target=0.99)
        else:
            fs, ci = lax.top_k(first_scores, pre_select)
        pos = jnp.take_along_axis(pos, ci, axis=1)
        first_scores = fs
    if expand_pool > 1:
        p = expand_pool
        off = jnp.arange(p, dtype=pos.dtype)
        if expand_window:
            # STRIDED pools (the pallas fused core's partition): a
            # winner at fixed-window position w*W + i*128 + b has
            # pool-mates w*W + j*128 + b for all j < p
            W = expand_window
            wstart = jnp.where(pos >= 0, (pos // W) * W, -1)
            lane = jnp.where(pos >= 0, (pos % W) % 128, 0)
            pos = jnp.where(
                wstart[:, :, None] >= 0,
                wstart[:, :, None] + lane[:, :, None]
                + off[None, None, :] * 128,
                -1).reshape(pos.shape[0], -1)
        else:
            base = jnp.where(pos >= 0, pos - (pos % p), -1)
            pos = jnp.where(base[:, :, None] >= 0,
                            base[:, :, None] + off[None, None, :],
                            -1).reshape(pos.shape[0], -1)
        if first_scores is not None:
            first_scores = jnp.repeat(first_scores, p, axis=1)
    q_total = pos.shape[0]
    n_chunks = -(-q_total // chunk)
    q_pad = n_chunks * chunk
    if q_pad != q_total:
        pad = q_pad - q_total
        pos = jnp.concatenate(
            [pos, jnp.full((pad, pos.shape[1]), -1, pos.dtype)])
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, queries.shape[1]),
                                queries.dtype)])
        if first_scores is not None:
            first_scores = jnp.concatenate(
                [first_scores,
                 jnp.full((pad, first_scores.shape[1]), NEG_INF,
                          first_scores.dtype)])

    pos_r = pos.reshape(n_chunks, chunk, -1)
    q_r = queries.reshape(n_chunks, chunk, -1)
    if first_scores is None:
        s, p = lax.map(
            lambda a: gather_rerank_topk(
                corpus_q, a[0], a[1], k, metric, scale, residual_q,
                residual_scale, None, dedup, row_mult, valid_rows),
            (pos_r, q_r))
    else:
        s, p = lax.map(
            lambda a: gather_rerank_topk(
                corpus_q, a[0], a[1], k, metric, scale, residual_q,
                residual_scale, a[2], dedup, row_mult, valid_rows),
            (pos_r, q_r, first_scores.reshape(n_chunks, chunk, -1)))
    kk = s.shape[-1]
    return (s.reshape(q_pad, kk)[:q_total],
            p.reshape(q_pad, kk)[:q_total])


def int8_pooled_rerank_topk(
    corpus_q: jnp.ndarray,
    corpus_scale: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    oversample: int = 8,
    pool: int = 4096,
    block_rows: int = 1 << 20,
    mask: Optional[jnp.ndarray] = None,
    n_valid=None,
    row_mult: Optional[jnp.ndarray] = None,
    residual_q: Optional[jnp.ndarray] = None,
    residual_scale: Optional[jnp.ndarray] = None,
    selector: str = "topk",
):
    """Pooled-bits selection + exact rerank, fused in one traceable fn.

    First pass: ``int8_pooled_topk`` selects C = max(oversample*k, 64)
    candidates (distinct by construction — one row per pool). Second
    pass: exact f32 rescore of those rows against the unquantized
    query. Restores recall@10 to candidate-coverage level (~0.997+ at
    10M x 768) at ~the single-pass scan rate: the rerank gather touches
    Q x C rows vs the N-row scan.
    """
    from neumann_tpu.ops.quant import int8_pooled_topk

    c = min(max(oversample * k, 64), corpus_q.shape[0])
    s1, pos = int8_pooled_topk(corpus_q, corpus_scale, queries, c,
                               pool=pool, block_rows=block_rows,
                               mask=mask, n_valid=n_valid,
                               row_mult=row_mult, selector=selector)
    # cosine fast path: reuse the precomputed row multipliers so the
    # rerank makes ONE f32 pass over the gathered rows (no scale
    # multiply, no norm recompute) — same f32 numbers, ~8% of the
    # whole chained scan recovered (BENCH r3 610 -> target 660+ GB/s)
    return gather_rerank_topk(
        corpus_q, pos, queries, k, "cosine", corpus_scale,
        residual_q, residual_scale, first_scores=s1, dedup=False,
        row_mult=row_mult if residual_q is None else None)


def f32_pooled_rerank_topk(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    oversample: int = 8,
    pool: int = 4096,
    block_rows: int = 1 << 20,
    mask: Optional[jnp.ndarray] = None,
    n_valid=None,
    row_mult: Optional[jnp.ndarray] = None,
    selector: str = "topk",
):
    """f32 pooled-bits selection + exact rerank.

    The f32 pooled scan's only loss vs the exact scan is the
    log2(pool) mantissa bits the argmax packing truncates (~1e-4 score
    steps — comparable to neighbor gaps on clustered corpora) plus
    pool collisions; reranking the C candidates in full f32 removes
    the truncation term at negligible cost.
    """
    from neumann_tpu.ops.quant import f32_pooled_topk

    c = min(max(oversample * k, 64), corpus.shape[0])
    s1, pos = f32_pooled_topk(corpus, queries, c, pool=pool,
                              block_rows=block_rows, mask=mask,
                              n_valid=n_valid, row_mult=row_mult,
                              selector=selector)
    return gather_rerank_topk(
        corpus, pos, queries, k, "cosine",
        first_scores=s1, dedup=False)
