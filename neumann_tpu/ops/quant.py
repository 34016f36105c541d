"""Quantized corpus storage modes and their scan kernels.

The reference's compression ladder (SURVEY.md §2.1): int8 scalar quant (4x),
binary sign quant (32x, hamming via popcount), PQ/ADC, sparse, delta-vs-
archetype. Here each mode is just a different dtype/layout of the same
HBM-resident corpus, scanned by the same matmul+top-k pattern with
in-register dequantization — mirroring EmbeddingStorage variants
(tensor_store/src/hnsw.rs:564-1225) without the per-node dispatch.

int8: per-row symmetric scale (absmax/127). The MXU multiplies int8
natively on v5e; scores rescale by the row scale after the matmul, so
dequantization never touches HBM. Corpora bigger than `block_rows` stream
through a lax.scan with a running top-k carry (exact merge), so the score
matrix never materializes.

binary: sign bits packed 32/dim into uint32; hamming distance via XOR +
popcount on the VPU. Matches BinaryVector
(tensor_store/src/binary_quantization.rs:27-210).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from neumann_tpu.ops.scan import NEG_INF, _as2d


# ---------------------------------------------------------------------------
# int8 scalar quantization
# ---------------------------------------------------------------------------

def scalar_quantize(x: jnp.ndarray):
    """Quantize [N, d] f32 -> (int8 [N, d], per-row scale [N] f32)."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def scalar_dequantize(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale[..., None]


def corpus_sqnorms(corpus_q, corpus_scale):
    """Precompute per-row squared L2 norms of an int8 corpus ([N] f32).

    Passing this into int8_topk_scan avoids re-reading the whole corpus
    for norms on every cosine/euclidean scan (a 2x HBM traffic saving
    measured on v5e)."""
    return jnp.sum(corpus_q.astype(jnp.float32) ** 2, axis=1) \
        * corpus_scale ** 2


def _row_multiplier(corpus_scale, cn2, metric):
    """Per-row score multiplier folding scale and (for cosine) inverse
    norm into ONE factor, so the hot [Q, B] elementwise stage is just
    dots * qmult * row_mult — 3 VPU ops/element instead of ~8. Rows with
    zero norm get multiplier 0 (score 0, matching the reference's
    zero-magnitude handling)."""
    if metric == "cosine":
        inv = lax.rsqrt(jnp.maximum(cn2, 1e-30))
        return jnp.where(cn2 > 0, corpus_scale * inv, 0.0)
    return corpus_scale


def _int8_block_scores(qq, q_scale, q_norm, block_q, block_scale, metric,
                       cn2=None, row_mult=None):
    """Scores for one int8 corpus block. qq [Q,d] int8, q_scale [Q],
    q_norm [Q,1] dequantized query L2 norms, cn2/row_mult optional
    precomputed per-row terms."""
    dots = lax.dot_general(
        qq, block_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    if metric == "dot":
        return dots * q_scale[:, None] * block_scale[None, :]
    if metric == "cosine":
        if row_mult is None:
            if cn2 is None:
                cn2 = jnp.sum(block_q.astype(jnp.float32) ** 2, axis=1) \
                    * block_scale ** 2
            row_mult = _row_multiplier(block_scale, cn2, metric)
        q_inv = lax.rsqrt(jnp.maximum(q_norm * q_norm, 1e-30))
        qmult = jnp.where(q_norm > 0, q_scale[:, None] * q_inv, 0.0)
        return dots * qmult * row_mult[None, :]
    if metric == "euclidean":
        if cn2 is None:
            cn2 = jnp.sum(block_q.astype(jnp.float32) ** 2, axis=1) \
                * block_scale ** 2
        dots = dots * q_scale[:, None] * block_scale[None, :]
        d2 = q_norm ** 2 - 2.0 * dots + cn2[None, :]
        return -jnp.maximum(d2, 0.0)
    raise ValueError(f"unsupported int8 metric: {metric}")


def int8_topk_scan(
    corpus_q: jnp.ndarray,
    corpus_scale: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    metric: str = "cosine",
    mask: Optional[jnp.ndarray] = None,
    block_rows: int = 512 * 1024,
    selection: str = "exact",
    recall_target: float = 0.95,
    corpus_sqnorm: Optional[jnp.ndarray] = None,
):
    """Top-k scan over an int8 corpus with in-register dequantization.

    Queries are quantized per-query so the matmul runs int8 x int8 ->
    int32 on the MXU; both scales rescale the scores afterwards. Exact up
    to the stored corpus's quantization error (recall@10 parity verified
    in tests against the f32 oracle).
    """
    queries = _as2d(queries).astype(jnp.float32)
    if queries.shape[-1] != corpus_q.shape[-1]:
        raise ValueError(
            f"query dim {queries.shape[-1]} != corpus dim "
            f"{corpus_q.shape[-1]}")
    qq, q_scale = scalar_quantize(queries)
    q_norm = jnp.sqrt(jnp.sum(
        (qq.astype(jnp.float32) * q_scale[:, None]) ** 2, axis=1,
        keepdims=True))
    n, d = corpus_q.shape
    k = min(k, n)

    from neumann_tpu.ops.scan import _block_topk

    if n <= block_rows:
        scores = _int8_block_scores(qq, q_scale, q_norm, corpus_q,
                                    corpus_scale, metric, corpus_sqnorm)
        if mask is not None:
            scores = jnp.where(mask[None, :], scores, NEG_INF)
        top_s, top_i = _block_topk(scores, k, selection, recall_target)
        top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
        if metric == "euclidean":
            top_s = -jnp.sqrt(jnp.maximum(-top_s, 0.0))
        return top_s, top_i.astype(jnp.int32)

    # -- blockwise: stream the corpus, carry a running top-k -------------
    q = queries.shape[0]
    nblocks = -(-n // block_rows)
    n_pad = nblocks * block_rows
    if n_pad != n:
        pad = n_pad - n
        corpus_q = jnp.concatenate(
            [corpus_q, jnp.zeros((pad, d), corpus_q.dtype)], axis=0)
        corpus_scale = jnp.concatenate(
            [corpus_scale, jnp.ones((pad,), corpus_scale.dtype)], axis=0)
        pad_mask = jnp.concatenate(
            [jnp.ones((n,), bool) if mask is None else mask,
             jnp.zeros((pad,), bool)], axis=0)
    else:
        pad_mask = mask  # None = fully valid, masking skipped entirely

    if corpus_sqnorm is None and metric != "dot":
        corpus_sqnorm = corpus_sqnorms(corpus_q, corpus_scale)
    if corpus_sqnorm is not None and corpus_sqnorm.shape[0] != n_pad:
        corpus_sqnorm = jnp.concatenate(
            [corpus_sqnorm,
             jnp.zeros((n_pad - corpus_sqnorm.shape[0],), jnp.float32)])
    if metric == "cosine":
        row_aux = _row_multiplier(corpus_scale, corpus_sqnorm, metric)
    elif metric == "euclidean":
        row_aux = corpus_sqnorm
    else:
        row_aux = jnp.zeros((n_pad,), jnp.float32)
    corpus_b = corpus_q.reshape(nblocks, block_rows, d)
    scale_b = corpus_scale.reshape(nblocks, block_rows)
    aux_b = row_aux.reshape(nblocks, block_rows)
    mask_b = (pad_mask.reshape(nblocks, block_rows)
              if pad_mask is not None else
              jnp.ones((nblocks, 1), bool))  # broadcast dummy
    block_iota = lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    init = (jnp.full((q, k), NEG_INF, jnp.float32),
            jnp.full((q, k), -1, jnp.int32))

    masked = pad_mask is not None

    def step(carry, xs):
        best_s, best_i = carry
        block_idx, block, bscale, baux, bmask = xs
        if metric == "cosine":
            s = _int8_block_scores(qq, q_scale, q_norm, block, bscale,
                                   metric, row_mult=baux)
        elif metric == "euclidean":
            s = _int8_block_scores(qq, q_scale, q_norm, block, bscale,
                                   metric, cn2=baux)
        else:
            s = _int8_block_scores(qq, q_scale, q_norm, block, bscale,
                                   metric)
        if masked:
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

    (best_s, best_i), _ = lax.scan(
        step, init,
        (jnp.arange(nblocks, dtype=jnp.int32), corpus_b, scale_b, aux_b,
         mask_b))
    best_i = jnp.where(jnp.isneginf(best_s), -1, best_i)
    if metric == "euclidean":
        best_s = -jnp.sqrt(jnp.maximum(-best_s, 0.0))
    return best_s, best_i


# ---------------------------------------------------------------------------
# pooled-bits cosine scan (the fastest int8 path on TPU)
# ---------------------------------------------------------------------------

def _pick_pool_blocks(n: int, k: int, pool: int, block_rows: int):
    """Largest power-of-two pool <= `pool` that divides n with n/pool >= k,
    plus an even block split. Returns (pool, g_per_block, nblocks) or None
    when no pooled layout fits (caller falls back to the plain scan)."""
    p = 1 << (max(pool, 1).bit_length() - 1)   # round down to a power of 2
    while p >= 8:
        if n % p == 0 and n // p >= k:
            break
        p //= 2
    else:
        return None
    g_total = n // p
    g_target = max(1, min(g_total, block_rows // p))
    nblocks = max(1, g_total // g_target)
    while g_total % nblocks:
        nblocks += 1
    return p, g_total // nblocks, nblocks


def _pooled_bits_select(allbits, pool: int, k: int, q_orig: int,
                        selector: str):
    """Final candidate cut over the packed [Q, N/pool] winner bits.

    selector="topk": exact lax.top_k (bit-pattern order == score order).
    selector="approx": candidate selection only needs the true top-k to
    SURVIVE the cut, not an exact ranking — the packed patterns are
    positive ints whose ordering equals that of the positive floats
    they bitcast to, so ``lax.approx_max_k`` (bucketed reduction, far
    cheaper than an exact sort on the [Q, N/pool] plane) runs directly
    on a bitcast view. Larger entries are retained preferentially, so
    top-10-in-top-80 coverage stays ~1 even at recall_target 0.95.
    """
    if selector.startswith("approx"):
        # "approx" or "approx:<target>" (e.g. "approx:0.98") — the
        # target trades cut sharpness for time in approx_max_k's
        # bucketed reduction; top-ranked entries survive preferentially
        # either way, so top-10 coverage exceeds the per-entry target
        target = float(selector.split(":")[1]) if ":" in selector \
            else 0.95
        fb = lax.bitcast_convert_type(allbits, jnp.float32)
        tf, pos = lax.approx_max_k(fb, k, recall_target=target)
        tb = lax.bitcast_convert_type(tf, jnp.int32)
    else:
        tb, pos = lax.top_k(allbits, k)
    local = tb & (pool - 1)
    score = lax.bitcast_convert_type(tb & ~(pool - 1), jnp.float32) - 2.0
    rows = pos * pool + local
    # dead rows carry negative bit patterns (the -1e30 bias); a pool
    # that was never written stays at the int 0 init — both are <= 0,
    # any live score is >= 1.0 so its bits are a positive int
    dead = tb <= 0
    return (jnp.where(dead, NEG_INF, score)[:q_orig],
            jnp.where(dead, -1, rows).astype(jnp.int32)[:q_orig])


def int8_pooled_topk(
    corpus_q: jnp.ndarray,
    corpus_scale: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    pool: int = 4096,
    block_rows: int = 1 << 20,
    mask: Optional[jnp.ndarray] = None,
    n_valid=None,
    row_mult: Optional[jnp.ndarray] = None,
    selector: str = "topk",
):
    """Cosine top-k over an int8 corpus via the pooled-bits scan.

    The fastest selection scheme measured on v5e (677 GB/s at Q=256 vs 658
    for per-block ``lax.approx_max_k`` and 208 for exact ``lax.top_k``):

    1. ``dot_general(qq [Q,d], corpus [G, pool, d]) -> [Q, G, pool]`` —
       pooling expressed as a free dot dimension so XLA fuses the reduce
       into the matmul consumer instead of materializing scores (a
       reshape-then-reduce materializes [Q, B] and collapses to ~420 GB/s).
    2. scores are shifted to [1, 3), bitcast to int32, and the low
       log2(pool) mantissa bits are replaced by the within-pool row index:
       positive-float ordering == int ordering, so ONE max per pool carries
       both the (slightly truncated) score and its argmax.
    3. a final cut over the tiny [Q, N/pool] candidate matrix recovers
       global rows — exact ``lax.top_k`` by default, or
       ``selector="approx"`` for ``approx_max_k`` on the bit patterns
       (saves ~0.7 ms/pass on a 10M x 768 chain at Q=256 — see
       tools/exp_pool_sweep.py — at ~0.998 candidate coverage; use it
       when an oversampled exact rerank follows).

    Exactness: per-row scores are exact up to int8 quantization and
    ~2^(10-log2(pool)) relative mantissa truncation; the only recall loss
    is two true top-k rows sharing a pool (expected loss ~ C(k,2)/(N/pool)
    per result — 0.2% at N=10M, pool=4096, k=10). Replaces the reference's
    SIMD scan loop (vector_engine/src/lib.rs:2144-2168) and its HNSW
    approximate path (tensor_store/src/hnsw.rs:1845-2238) in one shot.

    Requires n % pool == 0 and n/pool >= k (use ``_pick_pool_blocks`` /
    fall back to ``int8_topk_scan`` otherwise). ``mask``/``n_valid`` rows
    are excluded exactly. Cosine only.
    """
    queries = _as2d(queries).astype(jnp.float32)
    n, d = corpus_q.shape
    picked = _pick_pool_blocks(n, k, pool, block_rows)
    if picked is None:
        raise ValueError(
            f"no pooled layout for n={n}, k={k}, pool<={pool}")
    pool, g, nblocks = picked

    # pad tiny batches to a full 8-sublane tile: a [1, d] query makes
    # XLA tile the [Q, G, pool] product pathologically (measured 15.4ms
    # vs 10.4ms at Q=8 over 10M x 768 — tools/exp_q1_latency.py); the
    # zero rows cost nothing and are sliced off below
    q_orig = queries.shape[0]
    if q_orig < 8:
        queries = jnp.concatenate(
            [queries, jnp.zeros((8 - q_orig, d), queries.dtype)])

    if row_mult is None:
        cn2 = corpus_sqnorms(corpus_q, corpus_scale)
        row_mult = _row_multiplier(corpus_scale, cn2, "cosine")
    qq, q_scale = scalar_quantize(queries)
    q_norm2 = jnp.sum((qq.astype(jnp.float32) * q_scale[:, None]) ** 2,
                      axis=1, keepdims=True)
    q_inv = lax.rsqrt(jnp.maximum(q_norm2, 1e-30))
    qmult = jnp.where(q_norm2 > 0, q_scale[:, None] * q_inv, 0.0)

    block_rows = g * pool
    corpus_b = corpus_q.reshape(nblocks, g, pool, d)
    rm_b = row_mult.reshape(nblocks, g, pool)

    # Dead rows (index >= n_valid, or mask False) are excluded by a
    # per-ROW additive bias instead of a per-ELEMENT alive test: the
    # "+2.0" score shift becomes "+bias[row]" with bias -1e30 on dead
    # rows, so their scores bitcast to negative ints and can never win
    # a pool max (any live score is >= 1.0 -> positive bits). This
    # moves an iota+compare+select off the hot [Q, G, pool] plane onto
    # one O(N) vector prepared outside the matmul loop (~0.4 ms/pass
    # on the 10M chain, tools/exp_pool_sweep.py).
    dead_bias = (n_valid is not None) or (mask is not None)
    if dead_bias:
        live = (jnp.ones(n, bool) if n_valid is None
                else jnp.arange(n, dtype=jnp.int32)
                < jnp.asarray(n_valid, jnp.int32))
        if mask is not None:
            live = live & mask
        bias_b = jnp.where(live, 2.0, -1e30).astype(
            jnp.float32).reshape(nblocks, g, pool)

    def step(carry, xs):
        if dead_bias:
            block3, rm2, b2 = xs
            shift = b2[None, :, :]
        else:
            block3, rm2 = xs
            shift = 2.0
        dots = lax.dot_general(
            qq, block3,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        s = dots * qmult[:, :, None] * rm2[None, :, :] + shift
        pi = lax.broadcasted_iota(jnp.int32, s.shape, 2)
        bits = (lax.bitcast_convert_type(s, jnp.int32) & ~(pool - 1)) | pi
        return carry, jnp.max(bits, axis=2)

    xs = (corpus_b, rm_b)
    if dead_bias:
        xs = xs + (bias_b,)
    _, allbits = lax.scan(step, 0, xs)
    allbits = jnp.swapaxes(allbits, 0, 1).reshape(queries.shape[0], -1)
    return _pooled_bits_select(allbits, pool, k, q_orig, selector)


def int8_cosine_row_mult(corpus_q, corpus_scale):
    """Precompute the per-row cosine multiplier for int8_pooled_topk."""
    return _row_multiplier(corpus_scale,
                           corpus_sqnorms(corpus_q, corpus_scale),
                           "cosine")


def int8_exact_topk(
    corpus_q: jnp.ndarray,
    row_mult: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    block_rows: int = 256 * 1024,
):
    """Exact-oracle cosine top-k over an int8 corpus with UNQUANTIZED
    f32 queries and f32 math throughout.

    The serving scans (int8_topk_scan, int8_pooled_topk) quantize the
    query to ride the int8 MXU; this converts each corpus block to f32
    instead, so the only deviation from the reference's all-f32 scan
    (vector_engine/src/lib.rs:1950-2036) is the stored corpus's own
    quantization. ~2x slower than the int8 scans (f32 block converts) —
    recall oracles and tests only, never the serving path. row_mult =
    int8_cosine_row_mult (0 marks invalid rows).
    """
    queries = _as2d(queries).astype(jnp.float32)
    n, d = corpus_q.shape
    k = min(k, n)
    qn = jnp.maximum(jnp.linalg.norm(queries, axis=1, keepdims=True),
                     1e-30)
    qf = queries / qn
    nblocks = -(-n // block_rows)
    n_pad = nblocks * block_rows
    if n_pad != n:
        corpus_q = jnp.concatenate(
            [corpus_q, jnp.zeros((n_pad - n, d), corpus_q.dtype)])
        row_mult = jnp.concatenate(
            [row_mult, jnp.zeros(n_pad - n, row_mult.dtype)])
    corpus_b = corpus_q.reshape(nblocks, block_rows, d)
    rm_b = row_mult.reshape(nblocks, block_rows)
    block_iota = lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
    q = queries.shape[0]
    init = (jnp.full((q, k), NEG_INF, jnp.float32),
            jnp.full((q, k), -1, jnp.int32))

    def step(carry, xs):
        best_s, best_i = carry
        bi, block, rm = xs
        # HIGHEST: TPU matmuls default to bf16 input precision, which
        # would corrupt the oracle itself (preferred_element_type only
        # sets the accumulator)
        dots = lax.dot_general(
            qf, block.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        s = jnp.where(rm[None, :] > 0, dots * rm[None, :], NEG_INF)
        bs, bidx = lax.top_k(s, k)
        ids = jnp.take_along_axis(
            jnp.broadcast_to(block_iota + bi * block_rows, s.shape),
            bidx, axis=1)
        cand_s = jnp.concatenate([best_s, bs], axis=1)
        cand_i = jnp.concatenate([best_i, ids], axis=1)
        ns, pos = lax.top_k(cand_s, k)
        return (ns, jnp.take_along_axis(cand_i, pos, axis=1)), None

    (best_s, best_i), _ = lax.scan(
        step, init,
        (jnp.arange(nblocks, dtype=jnp.int32), corpus_b, rm_b))
    return best_s, jnp.where(jnp.isneginf(best_s), -1, best_i)


def f32_pooled_topk(
    corpus: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    pool: int = 4096,
    block_rows: int = 1 << 20,
    mask: Optional[jnp.ndarray] = None,
    n_valid=None,
    row_mult: Optional[jnp.ndarray] = None,
    selector: str = "topk",
):
    """Cosine top-k over an f32 corpus via the pooled-bits scan.

    Same selection scheme as int8_pooled_topk (free-dim dot_general so
    XLA fuses the pooled max into the matmul consumer; argmax packed in
    the low mantissa bits), with an f32 matmul. Replaces per-block exact
    ``lax.top_k`` (the slowest selection measured on v5e) for large
    unquantized corpora. row_mult defaults to rsqrt of the row norms
    (precompute it once per corpus version to skip a full extra pass).
    """
    queries = _as2d(queries).astype(jnp.float32)
    n, d = corpus.shape
    picked = _pick_pool_blocks(n, k, pool, block_rows)
    if picked is None:
        raise ValueError(
            f"no pooled layout for n={n}, k={k}, pool<={pool}")
    pool, g, nblocks = picked

    # pad tiny batches to a full 8-sublane tile (see int8_pooled_topk)
    q_orig = queries.shape[0]
    if q_orig < 8:
        queries = jnp.concatenate(
            [queries, jnp.zeros((8 - q_orig, d), queries.dtype)])

    if row_mult is None:
        cn2 = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=1)
        row_mult = jnp.where(cn2 > 0,
                             lax.rsqrt(jnp.maximum(cn2, 1e-30)), 0.0)
    q_norm2 = jnp.sum(queries * queries, axis=1, keepdims=True)
    qmult = jnp.where(q_norm2 > 0,
                      lax.rsqrt(jnp.maximum(q_norm2, 1e-30)), 0.0)

    block_rows = g * pool
    corpus_b = corpus.reshape(nblocks, g, pool, d)
    rm_b = row_mult.reshape(nblocks, g, pool)

    # per-row dead bias instead of per-element alive test — see
    # int8_pooled_topk
    dead_bias = (n_valid is not None) or (mask is not None)
    if dead_bias:
        live = (jnp.ones(n, bool) if n_valid is None
                else jnp.arange(n, dtype=jnp.int32)
                < jnp.asarray(n_valid, jnp.int32))
        if mask is not None:
            live = live & mask
        bias_b = jnp.where(live, 2.0, -1e30).astype(
            jnp.float32).reshape(nblocks, g, pool)

    def step(carry, xs):
        if dead_bias:
            block3, rm2, b2 = xs
            shift = b2[None, :, :]
        else:
            block3, rm2 = xs
            shift = 2.0
        dots = lax.dot_general(
            queries, block3,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = dots * qmult[:, :, None] * rm2[None, :, :] + shift
        pi = lax.broadcasted_iota(jnp.int32, s.shape, 2)
        bits = (lax.bitcast_convert_type(s, jnp.int32) & ~(pool - 1)) | pi
        return carry, jnp.max(bits, axis=2)

    xs = (corpus_b, rm_b)
    if dead_bias:
        xs = xs + (bias_b,)
    _, allbits = lax.scan(step, 0, xs)
    allbits = jnp.swapaxes(allbits, 0, 1).reshape(queries.shape[0], -1)
    return _pooled_bits_select(allbits, pool, k, q_orig, selector)


# ---------------------------------------------------------------------------
# binary (1-bit) quantization
# ---------------------------------------------------------------------------

def binary_quantize(x: jnp.ndarray) -> jnp.ndarray:
    """Pack sign bits of [N, d] into uint32 [N, ceil(d/32)].

    Bit j of word w is sign(x[:, 32*w + j] > 0), matching the reference's
    1-bit-per-dim layout (binary_quantization.rs:27-80).
    """
    n, d = x.shape
    words = -(-d // 32)
    pad = words * 32 - d
    bits = (x > 0)
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((n, pad), bool)], axis=1)
    bits = bits.reshape(n, words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)


def hamming_topk(
    corpus_bits: jnp.ndarray,
    query_bits: jnp.ndarray,
    k: int,
    mask: Optional[jnp.ndarray] = None,
    block_rows: int = 128 * 1024,
):
    """Top-k by smallest hamming distance (returned score = -distance).

    XOR + popcount on the VPU, streamed in row blocks so the [Q, B, W]
    intermediate stays bounded (a flat formulation would materialize
    [Q, N, W]). For an explicitly fused kernel see
    ops.pallas_kernels.hamming_topk_pallas."""
    query_bits = query_bits if query_bits.ndim == 2 else query_bits[None, :]
    n, w = corpus_bits.shape
    q = query_bits.shape[0]
    k = min(k, n)

    def block_scores(block):
        x = lax.population_count(block[None, :, :]
                                 ^ query_bits[:, None, :])
        return -jnp.sum(x.astype(jnp.int32), axis=-1).astype(jnp.float32)

    if n <= block_rows:
        scores = block_scores(corpus_bits)
        if mask is not None:
            scores = jnp.where(mask[None, :], scores, NEG_INF)
        top_s, top_i = lax.top_k(scores, k)
        top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
        return top_s, top_i.astype(jnp.int32)

    nblocks = -(-n // block_rows)
    n_pad = nblocks * block_rows
    if n_pad != n:
        corpus_bits = jnp.concatenate(
            [corpus_bits,
             jnp.zeros((n_pad - n, w), corpus_bits.dtype)], axis=0)
        pad_mask = jnp.concatenate(
            [jnp.ones((n,), bool) if mask is None else mask,
             jnp.zeros((n_pad - n,), bool)], axis=0)
    else:
        pad_mask = mask if mask is not None else jnp.ones((n,), bool)
    corpus_b = corpus_bits.reshape(nblocks, block_rows, w)
    mask_b = pad_mask.reshape(nblocks, block_rows)
    block_iota = lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
    init = (jnp.full((q, k), NEG_INF, jnp.float32),
            jnp.full((q, k), -1, jnp.int32))

    def step(carry, xs):
        best_s, best_i = carry
        bidx, block, bmask = xs
        s = jnp.where(bmask[None, :], block_scores(block), NEG_INF)
        bs, bi = lax.top_k(s, k)
        ids = jnp.take_along_axis(
            jnp.broadcast_to(block_iota + bidx * block_rows, s.shape),
            bi, axis=1)
        cand_s = jnp.concatenate([best_s, bs], axis=1)
        cand_i = jnp.concatenate([best_i, ids], axis=1)
        ns, pos = lax.top_k(cand_s, k)
        return (ns, jnp.take_along_axis(cand_i, pos, axis=1)), None

    (best_s, best_i), _ = lax.scan(
        step, init,
        (jnp.arange(nblocks, dtype=jnp.int32), corpus_b, mask_b))
    best_i = jnp.where(jnp.isneginf(best_s), -1, best_i)
    return best_s, best_i


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows",
                                              "selection", "recall_target"))
def int8_topk_scan_jit(corpus_q, corpus_scale, queries, k, metric="cosine",
                       mask=None, block_rows=512 * 1024,
                       selection="exact", recall_target=0.95,
                       corpus_sqnorm=None):
    return int8_topk_scan(corpus_q, corpus_scale, queries, k, metric, mask,
                          block_rows, selection, recall_target,
                          corpus_sqnorm)
