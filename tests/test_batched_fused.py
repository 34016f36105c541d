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
