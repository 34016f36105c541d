"""Batched-IVF fused cores: XLA one-shot and the Pallas VMEM-fused
kernel (interpret mode on the CPU mesh) against the scan core.

The three variants partition work differently (per-window scan /
batched dot_general with consecutive pools / Pallas with STRIDED
pools), so raw candidate multisets differ — parity is asserted where
it is meaningful: identical reranked top-k, and identical raw outputs
between scan and XLA-fused (same pool partition).
"""

import numpy as np
import pytest


@pytest.fixture
def layout(rng):
    import jax
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import window_mean_centroids
    from neumann_tpu.ops.quant import (
        int8_cosine_row_mult,
        scalar_quantize,
    )

    n, d, window = 8192, 64, 256
    modes = rng.standard_normal((8, d)).astype(np.float32) * 3
    assign = np.sort(rng.integers(0, 8, n))
    v = (modes[assign]
         + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    cq, sc = scalar_quantize(jnp.asarray(v))
    rm = jax.jit(int8_cosine_row_mult)(cq, sc)
    cents = window_mean_centroids(cq, rm, window)
    starts = jnp.arange(n // window, dtype=jnp.int32) * window
    qs = jnp.asarray(v[rng.choice(n, 48)] + 0.05 * rng.standard_normal(
        (48, d)).astype(np.float32))
    return cq, rm, cents, starts, qs, window, v


def _rerank_top10(cq, pos, qs, sc, pool, window, strided):
    from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

    _, p = gather_rerank_topk_chunked(
        cq, pos, qs, 10, "cosine", first_scores=sc, dedup=False,
        chunk=48, pre_select=96, expand_pool=pool,
        expand_window=window if strided else 0)
    return np.asarray(p)


def test_fused_xla_matches_scan_core(layout):
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import batched_ivf_topk

    cq, rm, cents, starts, qs, window, _ = layout
    pool, nprobe, q_cap = 16, 8, 32
    s1, p1, o1 = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                  window, 16, q_cap, selection=pool,
                                  stream=True)
    s2, p2, o2 = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                  window, 16, q_cap, selection=pool,
                                  fused=True)
    assert int(o1) == int(o2) == 0
    # same pool partition -> identical outputs
    assert bool(jnp.allclose(jnp.sort(s1, axis=1),
                             jnp.sort(s2, axis=1), atol=1e-5))
    for r in range(p1.shape[0]):
        assert (set(np.asarray(p1)[r].tolist())
                == set(np.asarray(p2)[r].tolist()))


def test_fused_pallas_top10_parity(layout):
    from neumann_tpu.ops.ivf import batched_ivf_topk

    cq, rm, cents, starts, qs, window, _ = layout
    pool, nprobe, q_cap = window // 128, 8, 32
    s1, p1, _ = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                 window, 16, q_cap, selection=pool,
                                 stream=True)
    s2, p2, _ = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                 window, 16, q_cap, selection=pool,
                                 fused="pallas")
    pa = _rerank_top10(cq, p1, qs, s1, pool, window, strided=False)
    pb = _rerank_top10(cq, p2, qs, s2, pool, window, strided=True)
    same = np.mean([len(set(pa[r]) & set(pb[r])) / 10
                    for r in range(pa.shape[0])])
    assert same == 1.0, same


def test_fused_pallas_recall_vs_oracle(layout):
    import jax

    from neumann_tpu.ops.ivf import batched_ivf_topk
    from neumann_tpu.ops.quant import int8_exact_topk

    cq, rm, cents, starts, qs, window, _ = layout
    pool = window // 128
    nprobe = int(cents.shape[0])          # full probe: selection-only
    q_cap = 64
    s2, p2, _ = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                 window, 16, q_cap, selection=pool,
                                 fused="pallas")
    got = _rerank_top10(cq, p2, qs, s2, pool, window, strided=True)
    _, oi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        cq, rm, qs, 10, block_rows=16384)
    oi = np.asarray(oi)
    rec = np.mean([len(set(oi[r].tolist()) & set(got[r].tolist())) / 10
                   for r in range(got.shape[0])])
    # full probe + pool expansion: selection is collision-exact; the
    # residue is int8-vs-f32 near-tie ordering
    assert rec >= 0.99, rec


def test_fused_requires_pool_and_alignment():
    from neumann_tpu.ops.ivf import _batched_core

    with pytest.raises(ValueError, match="pooled-bits"):
        _batched_core(16, 8, 256, 32, 8, "approx", False, True)
    with pytest.raises(ValueError, match="strided"):
        _batched_core(16, 8, 256, 32, 8, 8, False, "pallas")
    with pytest.raises(ValueError, match="presel"):
        _batched_core(16, 8, 256, 32, 8, 2, False, True, "exact", 32)


def test_top2_kernel_matches_numpy_top2(layout):
    """The streaming top-2 reduction returns each strided pool's two
    best rows (bit-exact packed scores, both positions)."""
    import jax.numpy as jnp

    from neumann_tpu.ops.pallas_kernels import (
        batched_probe_pallas,
        decode_strided_pool_bits,
    )
    from neumann_tpu.ops.quant import scalar_quantize

    cq, rm, cents, starts, qs, window, _ = layout
    C = int(cents.shape[0])
    q_cap = 4
    pool = window // 128
    qn = qs / jnp.maximum(
        jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
    qq, qsc = scalar_quantize(qn)
    tbl = np.full((C, q_cap), -1, np.int32)
    for c in range(C):                  # every window: queries c%3...
        for r in range(q_cap):
            tbl[c, r] = (c + r) % qs.shape[0]
    qsel = jnp.asarray(np.asarray(qq)[tbl.reshape(-1)]).reshape(
        C, q_cap, qq.shape[1])
    scm = jnp.asarray(np.asarray(qsc)[tbl])
    rm2 = rm.reshape(C, window)
    wb = batched_probe_pallas(cq, rm2, qsel, scm, window, top2=True)
    assert wb.shape == (C, q_cap, 256)
    s, p = decode_strided_pool_bits(wb, window)
    s, p = np.asarray(s), np.asarray(p)

    # numpy oracle: exact int8 scores per (window, slot, pool)
    cqn = np.asarray(cq, np.int64).reshape(C, window, -1)
    rmn = np.asarray(rm2)
    qqn = np.asarray(qq, np.int64)
    qscn = np.asarray(qsc)
    for c in range(0, C, 7):
        dots = qqn[tbl[c]] @ cqn[c].T           # [q_cap, window]
        sc_full = dots * (qscn[tbl[c]][:, None] * rmn[c][None, :])
        for r in range(q_cap):
            for b in range(0, 128, 17):
                rows = b + 128 * np.arange(pool)
                vals = sc_full[r, rows]
                order = np.argsort(-vals)
                # top-1 exact (scores match after mantissa truncation)
                got1, got2 = s[c, r, b], s[c, r, 128 + b]
                exp1, exp2 = vals[order[0]], vals[order[1]]
                assert abs(got1 - exp1) < 2e-3, (c, r, b)
                assert abs(got2 - exp2) < 2e-3, (c, r, b)
                assert p[c, r, b] == rows[order[0]] or \
                    abs(vals[order[0]] - sc_full[r, p[c, r, b]]) < 2e-3
                pb2 = p[c, r, 128 + b]
                assert pb2 != p[c, r, b] and pb2 % 128 == b


def test_presel_core_matches_expansion_rerank(layout):
    """The packed-bits presel path (top-2 kernel + approx_max_k on raw
    bits) reranks to the same top-10 as the pool-expansion path."""
    from neumann_tpu.ops.ivf import batched_ivf_topk
    from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

    cq, rm, cents, starts, qs, window, _ = layout
    pool, nprobe, q_cap = window // 128, 8, 32
    s1, p1, _ = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                 window, 16, q_cap, selection=pool,
                                 fused="pallas")
    pa = _rerank_top10(cq, p1, qs, s1, pool, window, strided=True)
    s2, p2, o2 = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                  window, 16, q_cap, selection=pool,
                                  fused="pallas", presel=64)
    assert p2.shape == (qs.shape[0], 64)
    assert int(o2) == 0
    _, pb = gather_rerank_topk_chunked(
        cq, p2, qs, 10, "cosine", first_scores=s2, dedup=False,
        chunk=48)
    pb = np.asarray(pb)
    same = np.mean([len(set(pa[r]) & set(pb[r])) / 10
                    for r in range(pa.shape[0])])
    # expansion rescores all pool-mates; top-2 only the best two.
    # >= 3-way collisions are possible at this tiny scale, so demand
    # near-identity rather than equality
    assert same >= 0.99, same


def test_block_tril_scan_branch_matches_cumsum(layout):
    """Q=512 rides the block-triangular MXU scan for the probe-rank
    table; Q=48 rides the plain cumsum. Padding a batch to 512 must
    not change any real query's candidates."""
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import batched_ivf_topk

    cq, rm, cents, starts, qs, window, _ = layout
    pool, nprobe = 16, 8
    s1, p1, o1 = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                  window, 16, 64, selection=pool,
                                  fused=True)
    qpad = jnp.concatenate(
        [qs, jnp.zeros((512 - qs.shape[0], qs.shape[1]), qs.dtype)])
    valid = jnp.arange(512) < qs.shape[0]
    s2, p2, o2 = batched_ivf_topk(cq, rm, cents, starts, qpad, nprobe,
                                  window, 16, 64, selection=pool,
                                  fused=True, valid_q=valid)
    assert int(o1) == int(o2) == 0
    for r in range(qs.shape[0]):
        assert (set(np.asarray(p1)[r].tolist())
                == set(np.asarray(p2)[r].tolist())), r


def test_pool_probe_mode_recall(layout):
    """probe_mode='pool' (one winner per strided pool of the centroid
    scores, no sort) probes a perturbed top-nprobe: end-to-end top-10
    stays near the exact-probe result."""
    from neumann_tpu.ops.ivf import batched_ivf_topk
    from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

    cq, rm, cents, starts, qs, window, _ = layout
    pool, nprobe, q_cap = window // 128, 8, 32
    outs = {}
    for pm in ("exact", "pool"):
        s, p, o = batched_ivf_topk(cq, rm, cents, starts, qs, nprobe,
                                   window, 16, q_cap, selection=pool,
                                   fused="pallas", probe_mode=pm,
                                   presel=64)
        assert int(o) == 0
        _, pb = gather_rerank_topk_chunked(
            cq, p, qs, 10, "cosine", first_scores=s, dedup=False,
            chunk=48)
        outs[pm] = np.asarray(pb)
    same = np.mean([len(set(outs["exact"][r]) & set(outs["pool"][r]))
                    / 10 for r in range(qs.shape[0])])
    assert same >= 0.9, same


def test_search_batched_fast_presel_exact(layout):
    """DeviceIVFInt8.search_batched (fast path, auto) at full probe
    == the exact int8 oracle."""
    import jax

    from neumann_tpu.ops.ivf import DeviceIVFInt8
    from neumann_tpu.ops.quant import int8_exact_topk

    cq, rm, cents, starts, qs, window, v = layout
    import jax.numpy as jnp

    from neumann_tpu.ops.quant import scalar_quantize

    cq2, sc2 = scalar_quantize(jnp.asarray(v))
    ix = DeviceIVFInt8(v.shape[1], n_clusters=8, nprobe=32, iters=4)
    ix.build(np.asarray(cq2), np.asarray(sc2), sample_rows=2048,
             fixed_window=256)
    s, ids = ix.search_batched(np.asarray(qs), 10,
                               nprobe=ix.n_clusters)
    _, oi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        cq2, jax.jit(__import__("neumann_tpu.ops.quant",
                                fromlist=["int8_cosine_row_mult"]
                                ).int8_cosine_row_mult)(cq2, sc2),
        qs, 10, block_rows=16384)
    oi = np.asarray(oi)
    rec = np.mean([len(set(oi[r].tolist()) & set(ids[r].tolist())) / 10
                   for r in range(ids.shape[0])])
    assert rec >= 0.97, rec


def test_shapes_utils(rng):
    from neumann_tpu.utils.shapes import cdiv, pad_cols, pad_rows

    a = rng.standard_normal((5, 3)).astype(np.float32)
    assert pad_rows(a, 5) is a
    assert pad_rows(a, 8).shape == (8, 3)
    assert (pad_rows(a, 8)[5:] == 0).all()
    with pytest.raises(ValueError):
        pad_rows(a, 4)
    assert pad_cols(a, 3) is a
    p = pad_cols(a, 128)
    assert p.shape == (5, 128) and (p[:, 3:] == 0).all()
    with pytest.raises(ValueError):
        pad_cols(a, 2)
    assert cdiv(7, 3) == 3 and cdiv(6, 3) == 2
