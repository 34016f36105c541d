"""Pallas kernel tests (interpret mode on the CPU mesh) vs oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from neumann_tpu.ops.pallas_kernels import (
    hamming_scores,
    hamming_topk_pallas,
    int8_dot_scores,
)
from neumann_tpu.ops.quant import binary_quantize, hamming_topk


def test_hamming_scores_matches_oracle(rng):
    corpus = rng.standard_normal((4096, 64)).astype(np.float32)
    queries = rng.standard_normal((8, 64)).astype(np.float32)
    cb = np.asarray(binary_quantize(jnp.asarray(corpus)))
    qb = np.asarray(binary_quantize(jnp.asarray(queries)))
    got = np.asarray(hamming_scores(jnp.asarray(cb), jnp.asarray(qb),
                                    tile=1024))
    want = np.zeros((8, 4096), np.int64)
    for w in range(cb.shape[1]):
        x = np.bitwise_xor(qb[:, w][:, None], cb[:, w][None, :])
        want += np.vectorize(lambda v: bin(v).count("1"))(x)
    np.testing.assert_array_equal(got, want)


def test_hamming_topk_pallas_matches_xla(rng):
    corpus = rng.standard_normal((5000, 96)).astype(np.float32)
    queries = corpus[:4] + 0.01 * rng.standard_normal(
        (4, 96)).astype(np.float32)
    cb = binary_quantize(jnp.asarray(corpus))
    qb = binary_quantize(jnp.asarray(queries))
    s1, i1 = hamming_topk(cb, qb, 7)
    s2, i2 = hamming_topk_pallas(cb, qb, 7, tile=512, block_rows=2048)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # self-hits survive
    assert (np.asarray(i2)[:, 0] == np.arange(4)).all()


def test_hamming_topk_pallas_masked(rng):
    corpus = rng.standard_normal((1000, 32)).astype(np.float32)
    cb = binary_quantize(jnp.asarray(corpus))
    qb = binary_quantize(jnp.asarray(corpus[:2]))
    mask = np.zeros(1000, bool)
    mask[500:600] = True
    s, i = hamming_topk_pallas(cb, qb, 5, mask=jnp.asarray(mask),
                               tile=256, block_rows=512)
    i = np.asarray(i)
    assert ((i >= 500) & (i < 600) | (i == -1)).all()


def test_int8_dot_scores(rng):
    corpus = rng.standard_normal((2048, 128)).astype(np.float32)
    queries = rng.standard_normal((8, 128)).astype(np.float32)
    from neumann_tpu.ops.quant import scalar_quantize

    cq, cs = scalar_quantize(jnp.asarray(corpus))
    qq, qs = scalar_quantize(jnp.asarray(queries))
    row_mult = np.asarray(cs)[None, :]
    q_mult = np.asarray(qs)[:, None]
    got = np.asarray(int8_dot_scores(
        cq, jnp.asarray(row_mult), qq, jnp.asarray(q_mult), tile=512))
    want = (np.asarray(cq, np.float32) @ np.zeros(0).reshape(0)) \
        if False else \
        (np.asarray(qq, np.int64) @ np.asarray(cq, np.int64).T
         ).astype(np.float32) * q_mult * row_mult
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ivf_probe_kernel_matches_xla_core():
    """The Pallas probe kernel must agree with the XLA windowed core
    on the 128-aligned layout (interpret mode on the CPU mesh)."""
    import jax.numpy as jnp
    import numpy as np

    from neumann_tpu.ops.ivf import DeviceIVFInt8, _windowed_core
    from neumann_tpu.ops.pallas_kernels import ivf_windowed_topk_pallas

    rng = np.random.default_rng(0)
    n, d, kc = 4096, 128, 8
    cents = rng.standard_normal((kc, d)).astype(np.float32) * 3
    assign = rng.integers(0, kc, n)
    v = (cents[assign] + 0.3 * rng.standard_normal((n, d))).astype(
        np.float32)
    am = np.max(np.abs(v), axis=1)
    scale = np.where(am > 0, am / 127.0, 1.0).astype(np.float32)
    q8 = np.clip(np.round(v / scale[:, None]), -127, 127).astype(np.int8)

    ivf = DeviceIVFInt8(d, n_clusters=kc, nprobe=4)
    ivf.build(q8, scale)
    assert ivf._window % 128 == 0
    assert int(np.asarray(ivf._starts).max()) % 128 == 0

    queries = jnp.asarray(v[:3])
    s_x, p_x = _windowed_core(10, 4, ivf._window)(
        ivf._buf, ivf._rmult, ivf.centroids, ivf._starts, queries)
    s_p, p_p = ivf_windowed_topk_pallas(
        ivf._buf, ivf._rmult, ivf.centroids, ivf._starts, queries,
        10, 4, ivf._window)
    s_x, p_x = np.asarray(s_x), np.asarray(p_x)
    s_p, p_p = np.asarray(s_p), np.asarray(p_p)
    for r in range(3):
        # same candidates (scores may differ in bf16 ulps)
        assert set(p_p[r].tolist()) == set(p_x[r].tolist()), r
    np.testing.assert_allclose(s_p, s_x, atol=5e-3)


def test_ivf_search_with_pallas_flag(monkeypatch):
    import numpy as np

    from neumann_tpu.ops.ivf import DeviceIVFInt8

    rng = np.random.default_rng(1)
    n, d = 2048, 64
    v = rng.standard_normal((n, d)).astype(np.float32)
    am = np.max(np.abs(v), axis=1)
    scale = (am / 127.0).astype(np.float32)
    q8 = np.clip(np.round(v / scale[:, None]), -127, 127).astype(np.int8)
    ivf = DeviceIVFInt8(d, n_clusters=8, nprobe=8)   # probe all
    ivf.build(q8, scale)
    monkeypatch.setenv("NEUMANN_PALLAS", "1")
    s, ids = ivf.search(v[5], 5)
    assert ids[0][0] == 5 and s[0][0] > 0.98


def test_hamming_topk_1d_query_and_exact_tile(rng):
    """1-D query promotion + the no-padding branch (n a multiple of
    block_rows) + explicit mask threading in the block scan."""
    corpus = rng.standard_normal((4096, 64)).astype(np.float32)
    cb = binary_quantize(jnp.asarray(corpus))
    qb1 = binary_quantize(jnp.asarray(corpus[7:8]))[0]   # 1-D bits
    s, i = hamming_topk_pallas(cb, qb1, 3, tile=512, block_rows=2048)
    assert i.shape == (1, 3) and int(i[0, 0]) == 7
    # masked, padding-free
    mask = jnp.asarray(np.arange(4096) % 2 == 0)
    s2, i2 = hamming_topk_pallas(cb, qb1, 3, mask=mask, tile=512,
                                 block_rows=2048)
    assert (np.asarray(i2) % 2 == 0).all()


def test_probe_scores_1d_starts(rng):
    """ivf_probe_scores_pallas accepts a single shared probe list."""
    from neumann_tpu.ops.pallas_kernels import ivf_probe_scores_pallas

    corpus = rng.standard_normal((1024, 128)).astype(np.float32)
    from neumann_tpu.ops.quant import scalar_quantize

    cq, sc = scalar_quantize(jnp.asarray(corpus))
    rm = (sc / np.maximum(np.linalg.norm(
        np.asarray(cq, np.float32) * np.asarray(sc)[:, None],
        axis=1), 1e-30)).astype(np.float32)
    qs = jnp.asarray(corpus[:2])
    starts = jnp.asarray(np.array([0, 2], np.int32))   # 1-D: shared
    out = ivf_probe_scores_pallas(cq, jnp.asarray(rm)[None, :],
                                  starts, qs, 128)
    assert out.shape == (2, 2 * 128)
