"""Pallas TPU kernels for the scan hot path.

Two kernels here; both follow the playbook in the Pallas guide (grid +
BlockSpec pipelining handles HBM->VMEM double buffering automatically):

* ``hamming_scores``: packed-bit hamming distances. The XLA broadcast
  formulation materializes a [Q, B, W] popcount intermediate per block;
  this kernel keeps a [Q, TILE] accumulator in VMEM and streams the W
  bit-words with a fori_loop — one XOR+popcount+add per word, nothing
  spilled to HBM.
* ``int8_dot_scores``: int8 x int8 -> f32 scores for one corpus tile
  with the per-row multiplier fused, as a building block for serving
  paths that want explicit control over tiling.

Both run in interpret mode off-TPU so the CPU test mesh exercises them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# hamming
# ---------------------------------------------------------------------------

def _hamming_kernel(q_ref, ct_ref, out_ref):
    """q_ref [Q, W] u32, ct_ref [W, TILE] u32 -> out_ref [Q, TILE] i32.

    The corpus tile arrives TRANSPOSED (word-major) so every slice in
    the word loop is lane-aligned: Mosaic rejects 1-wide column memory
    loads (vector<Qx1xi32>) and lane<->sublane value transposes, but a
    [Q, 1] sublane slice XORed against a [1, TILE] lane row broadcasts
    cleanly. W is small (d/32, e.g. 24 for 768d), so the static unroll
    stays compact. Verified on v5e hardware.
    """
    q = q_ref[:]                          # [Q, W] in registers
    ct = ct_ref[:]                        # [W, TILE]
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for w in range(q_ref.shape[1]):       # static unroll
        qcol = lax.slice_in_dim(q, w, w + 1, axis=1)    # [Q, 1]
        crow = lax.slice_in_dim(ct, w, w + 1, axis=0)   # [1, TILE]
        x = lax.population_count(qcol ^ crow)
        acc = acc + x.astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile",))
def hamming_scores(corpus_bits: jnp.ndarray, query_bits: jnp.ndarray,
                   tile: int = 2048) -> jnp.ndarray:
    """[Q, N] hamming distances via the Pallas kernel.

    corpus_bits [N, W] uint32 (N a multiple of `tile` — callers pad),
    query_bits [Q, W] uint32. The corpus transposes once outside the
    kernel (one XLA pass) into the word-major layout the kernel needs.
    """
    n, w = corpus_bits.shape
    q = query_bits.shape[0]
    grid = (n // tile,)
    corpus_t = corpus_bits.T              # [W, N], word-major
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(query_bits, corpus_t)


def hamming_topk_pallas(corpus_bits, query_bits, k,
                        mask=None, block_rows: int = 1024 * 1024,
                        tile: int = 2048, selection: str = "exact",
                        recall_target: float = 0.95):
    """Blockwise hamming top-k using the Pallas distance kernel.

    Exact merge across blocks; score = -distance (matches
    ops.quant.hamming_topk).
    """
    from neumann_tpu.ops.scan import NEG_INF

    query_bits = query_bits if query_bits.ndim == 2 else \
        query_bits[None, :]
    n, w = corpus_bits.shape
    q = query_bits.shape[0]
    k = min(k, n)
    # pad rows to a tile multiple
    block_rows = min(block_rows, max(tile, (n + tile - 1) // tile * tile))
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
        pad_mask = mask

    corpus_b = corpus_bits.reshape(nblocks, block_rows, w)
    mask_b = (pad_mask.reshape(nblocks, block_rows)
              if pad_mask is not None else None)
    block_iota = lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    init = (jnp.full((q, k), NEG_INF, jnp.float32),
            jnp.full((q, k), -1, jnp.int32))

    def step(carry, xs):
        best_s, best_i = carry
        if mask_b is None:
            bidx, block = xs
            bmask = None
        else:
            bidx, block, bmask = xs
        from neumann_tpu.ops.scan import _block_topk

        dist = hamming_scores(block, query_bits, tile=tile)
        s = -dist.astype(jnp.float32)
        if bmask is not None:
            s = jnp.where(bmask[None, :], s, NEG_INF)
        bs, bi = _block_topk(s, k, selection, recall_target)
        ids = jnp.take_along_axis(
            jnp.broadcast_to(block_iota + bidx * block_rows, s.shape),
            bi, axis=1)
        cand_s = jnp.concatenate([best_s, bs], axis=1)
        cand_i = jnp.concatenate([best_i, ids], axis=1)
        ns, pos = lax.top_k(cand_s, k)
        return (ns, jnp.take_along_axis(cand_i, pos, axis=1)), None

    xs = (jnp.arange(nblocks, dtype=jnp.int32), corpus_b)
    if mask_b is not None:
        xs = xs + (mask_b,)
    (best_s, best_i), _ = lax.scan(step, init, xs)
    best_i = jnp.where(jnp.isneginf(best_s), -1, best_i)
    return best_s, best_i


# ---------------------------------------------------------------------------
# int8 tile scores
# ---------------------------------------------------------------------------

def _int8_kernel(q_ref, c_ref, qmult_ref, rmult_ref, out_ref):
    """q [Q, d] i8, c [TILE, d] i8, qmult [Q, 1] f32, rmult [1, TILE] f32
    -> out [Q, TILE] f32."""
    dots = lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out_ref[:] = dots * qmult_ref[:] * rmult_ref[:]


@functools.partial(jax.jit, static_argnames=("tile",))
def int8_dot_scores(corpus_q, row_mult, queries_q, q_mult,
                    tile: int = 2048) -> jnp.ndarray:
    """[Q, N] fused-dequant scores: (q . c) * q_mult * row_mult."""
    n, d = corpus_q.shape
    q = queries_q.shape[0]
    grid = (n // tile,)
    return pl.pallas_call(
        _int8_kernel,
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(queries_q, corpus_q, q_mult, row_mult)


# ---------------------------------------------------------------------------
# windowed-IVF probe scoring (the p99 single-query path)
# ---------------------------------------------------------------------------
#
# The XLA path (ops/ivf.windowed_ivf_topk) gathers [nprobe, window, d]
# int8 candidates with vmapped dynamic_slice and materializes a bf16
# convert of the whole gather before the matvec — ~3x the fundamental
# HBM traffic. This kernel uses scalar-prefetch block indexing: the
# probe list drives WHICH 128-row corpus blocks stream into VMEM, and
# the dot + dequant-multiplier + mask all fuse in registers. Only the
# int8 bytes ever leave HBM.

def _ivf_probe_kernel(sb_ref, q_ref, c_ref, rm_ref, out_ref):
    """sb_ref: scalar-prefetched [nprobe] block starts (drives the
    index maps). q_ref [1, d] f32 (ONE query — multi-query callers
    unroll; Mosaic rejects both (1, d) blocks of a [Q, d] array and
    1-D outputs with 128-blocks, and a vmapped pallas_call measured
    ~4x slower). c_ref [128, d] i8, rm_ref [1, 128] f32 ->
    out_ref [1, 128] f32."""
    dots = lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), c_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rm = rm_ref[:]
    out_ref[:] = jnp.where(rm > 0, dots * rm, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("window",))
def _probe_scores_one(buf, rmult2d, start_blocks, query_row,
                      window: int):
    """[1, nprobe*window] scores for ONE query (see kernel docstring)."""
    n, d = buf.shape
    nprobe = start_blocks.shape[0]
    wb = window // 128
    grid = (nprobe, wb)
    return pl.pallas_call(
        _ivf_probe_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, d), lambda p, j, sb: (0, 0)),
                pl.BlockSpec((128, d), lambda p, j, sb: (sb[p] + j, 0)),
                pl.BlockSpec((1, 128), lambda p, j, sb: (0, sb[p] + j)),
            ],
            out_specs=pl.BlockSpec(
                (1, 128), lambda p, j, sb, wb=wb: (0, p * wb + j)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, nprobe * window),
                                       jnp.float32),
        interpret=not _on_tpu(),
    )(start_blocks, query_row, buf, rmult2d)


def ivf_probe_scores_pallas(buf, rmult2d, start_blocks, queries,
                            window: int):
    """Scores for every probed window row. start_blocks [Q, nprobe]
    (or [nprobe]) int32 window starts // 128; queries [Q, d] f32.
    Returns [Q, nprobe * window] f32 with invalid rows at -inf.
    Queries unroll at trace time (Q is small on the latency path)."""
    if start_blocks.ndim == 1:
        start_blocks = start_blocks[None, :]
    q = queries.shape[0]
    rows = [
        _probe_scores_one(buf, rmult2d, start_blocks[i],
                          queries[i: i + 1].astype(jnp.float32),
                          window)
        for i in range(q)
    ]
    return jnp.concatenate(rows, axis=0)


def ivf_windowed_topk_pallas(buf, rmult, cents, starts, queries,
                             k: int, nprobe: int, window: int):
    """Drop-in for ops.ivf.windowed_ivf_topk via the Pallas kernel.

    Requires starts to be 128-aligned and window a multiple of 128
    (DeviceIVFInt8 lays the corpus out that way; the generic layout
    falls back to the XLA path otherwise). Returns (scores [Q, k],
    positions [Q, k]) like the XLA core. Final selection: approx_max_k
    (measured free vs +0.2 ms for exact top_k over ~200K scores) with
    4x oversampling, then an exact top_k over the tiny candidate set —
    approx loss concentrates at the tail, so the true top-k land in
    the 4k pool with ~0.999 probability and recall matches the exact
    core."""
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    _, probe = lax.top_k(qn @ cents.T, nprobe)          # [Q, nprobe]
    sb = (starts[probe] // 128).astype(jnp.int32)       # [Q, nprobe]
    scores = ivf_probe_scores_pallas(buf, rmult[None, :], sb, qn,
                                     window)            # [Q, P*W]
    pos = ((sb * 128)[:, :, None]
           + lax.broadcasted_iota(jnp.int32,
                                  (qn.shape[0], nprobe, window), 2)
           ).reshape(qn.shape[0], -1)
    k_over = min(max(4 * k, 64), scores.shape[1])
    s_a, i_a = lax.approx_max_k(scores, k_over, recall_target=0.995)
    s, i = lax.top_k(s_a, k)
    i = jnp.take_along_axis(i_a, i, axis=1)
    return s, jnp.take_along_axis(pos, i, axis=1)


# ---------------------------------------------------------------------------
# batched IVF: fused window-scoring + pooled-bits selection
# ---------------------------------------------------------------------------
#
# The XLA fused batched core (ops/ivf._batched_core fused=True) runs the
# whole first pass as one batched s8 x s8 dot_general but XLA
# MATERIALIZES the [C, q_cap, window] int32 dot output before the pool
# max (2.6 GB at 10M/q_cap=64 — measured 45 ms core; OOM at q_cap=256).
# This kernel fuses the reduction in VMEM: one grid step per window
# streams the [window, d] int8 block from HBM (double-buffered by the
# BlockSpec pipeline), does the [q_cap, d] x [d, window] MXU matmul,
# and reduces scores to one packed winner per (slot, pool) before
# anything leaves VMEM. HBM traffic = the corpus read + tiny outputs,
# the roofline the brute scan already achieves.
#
# Pools are STRIDED (pool member i of pool b = window row i*128 + b):
# a consecutive-pool reduction would need a lane-splitting reshape of
# the [q_cap, window] score tile (Mosaic-hostile); strided pools make
# the reduction `pool` unrolled maxes over static 128-lane slices, and
# the within-pool index is a compile-time constant per slice — no iota.
# Pool membership is an arbitrary partition, so recall semantics match
# the consecutive-pool XLA path. Score bits: shift to [1, 3), bitcast,
# pack the local index into the low log2(pool) mantissa bits (bits 0 =
# dead row — below any valid pattern).


def _batched_probe_kernel(pool: int, top2: bool = False):
    mask = ~(pool - 1)

    def kernel(qsel_ref, buf_ref, mult_ref, rm_ref, out_ref):
        """qsel [1, q_cap, d] i8, buf [window, d] i8, mult
        [1, 1, q_cap] f32, rm [1, 1, window] f32 -> out
        [1, q_cap, 128] i32 (top2: [1, q_cap, 256] — second-best per
        pool in lanes 128:). (mult/rm ride as 3D blocks whose last two
        dims equal the array dims — Mosaic's block-shape rule.)"""
        dots = lax.dot_general(
            qsel_ref[0], buf_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                       # [q_cap, window]
        rm = rm_ref[0]                              # [1, window]
        s = dots * (mult_ref[0][0][:, None] * rm) + 2.0
        s = jnp.where(rm > 0, s, 0.0)
        q_cap = s.shape[0]
        wb = jnp.zeros((q_cap, 128), jnp.int32)
        if not top2:
            for a in range(pool):                   # static unroll
                chunk = s[:, a * 128:(a + 1) * 128]
                bits = (lax.bitcast_convert_type(chunk, jnp.int32)
                        & mask) | a
                wb = jnp.maximum(wb, bits)
            out_ref[0] = wb
            return
        # streaming top-2 per pool: nm1 = max(m1, x), nm2 =
        # max(m2, min(m1, x)). Two winners per pool make pooled
        # selection exact under <= 2-way collisions WITHOUT the
        # pool-expansion rerank gather (expansion reads pool x the
        # survivor rows; two extra VPU maxes here are free next to
        # the MXU matmul).
        wb2 = jnp.zeros((q_cap, 128), jnp.int32)
        for a in range(pool):                       # static unroll
            chunk = s[:, a * 128:(a + 1) * 128]
            bits = (lax.bitcast_convert_type(chunk, jnp.int32)
                    & mask) | a
            wb2 = jnp.maximum(wb2, jnp.minimum(wb, bits))
            wb = jnp.maximum(wb, bits)
        out_ref[0] = jnp.concatenate([wb, wb2], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "top2"))
def batched_probe_pallas(buf, rmult2d, qsel, scmult, window: int,
                         top2: bool = False):
    """Fused batched-IVF first pass over ALL windows.

    buf     [C*window, d] int8 fixed-window corpus (row count must be
            exactly C*window).
    rmult2d [C, window] f32 cosine row multipliers (0 = dead row).
    qsel    [C, q_cap, d] int8 per-window selected queries (the
            one-hot matmul product, ops/ivf._batched_core fused path).
    scmult  [C, q_cap] f32 per-slot query scales (0 = empty slot).
    Returns packed winner bits [C, q_cap, 128] int32: 128 strided
    pools of `window//128` rows each; decode with
    decode_strided_pool_bits. top2=True: [C, q_cap, 256] with each
    pool's SECOND-best winner in lanes 128: (position decode is
    lane % 128).
    """
    C, q_cap, d = qsel.shape
    pool = window // 128
    lanes = 256 if top2 else 128
    assert C * window == buf.shape[0]
    return pl.pallas_call(
        _batched_probe_kernel(pool, top2),
        out_shape=jax.ShapeDtypeStruct((C, q_cap, lanes), jnp.int32),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, q_cap, d), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((window, d), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_cap), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, window), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_cap, lanes), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(qsel, buf, scmult[:, None, :], rmult2d[:, None, :])


def decode_strided_pool_bits(wb, window: int):
    """(scores f32, within-window positions i32, -1 = dead) from the
    packed strided-pool winner bits (last axis = 128 pools, or 256
    for top-2 kernels — lanes 128: are the per-pool runners-up, so
    the lane index wraps mod 128)."""
    pool = window // 128
    dead = wb < 0x3F800000                  # below bitcast(1.0)
    scores = jnp.where(
        dead, -jnp.inf,
        lax.bitcast_convert_type(wb & ~(pool - 1), jnp.float32) - 2.0)
    local = wb & (pool - 1)
    lane = lax.broadcasted_iota(jnp.int32, wb.shape, wb.ndim - 1) % 128
    pos = jnp.where(dead, -1, local * 128 + lane)
    return scores, pos
