"""TT compression, codecs, delta vectors, IVF index tests."""

import numpy as np
import pytest

from neumann_tpu.compress import (
    TTConfig,
    delta_decode_ids,
    delta_encode_ids,
    rle_decode,
    rle_encode,
    tt_cosine_similarity,
    tt_decompose,
    tt_dot,
    tt_reconstruct,
    varint_decode,
    varint_encode,
)
from neumann_tpu.compress.tensor_train import (
    load_tt,
    save_tt,
    tt_dot_dense,
    tt_norm,
)
from neumann_tpu.ops.ivf import IVFConfig, IVFIndex
from neumann_tpu.store.delta_vector import (
    ArchetypeRegistry,
    DeltaVector,
    KMeansConfig,
)


def smooth_vec(rng, d, components: int = 2):
    """Low-frequency vector — compressible, like real embeddings."""
    t = np.linspace(0, 6 * np.pi, d)
    coef = rng.standard_normal(components)
    return sum(c * np.sin((i + 1) * t) for i, c in enumerate(coef)).astype(
        np.float32)


def test_tt_roundtrip_accuracy(rng):
    v = smooth_vec(rng, 1024)
    tt = tt_decompose(v, TTConfig.for_dim(1024))
    back = tt_reconstruct(tt)
    rel = np.linalg.norm(back - v) / np.linalg.norm(v)
    assert rel < 0.01
    assert tt.compression_ratio() > 2.0


def test_tt_high_compression_vs_accuracy(rng):
    v = smooth_vec(rng, 1024)
    hc = tt_decompose(v, TTConfig.high_compression(1024))
    ha = tt_decompose(v, TTConfig.high_accuracy(1024))
    assert hc.n_params < ha.n_params
    err_hc = np.linalg.norm(tt_reconstruct(hc) - v)
    err_ha = np.linalg.norm(tt_reconstruct(ha) - v)
    assert err_ha <= err_hc + 1e-5


def test_tt_dot_and_cosine(rng):
    a = smooth_vec(rng, 512)
    b = smooth_vec(rng, 512)
    ta = tt_decompose(a, TTConfig.high_accuracy(512))
    tb = tt_decompose(b, TTConfig.high_accuracy(512))
    assert tt_dot(ta, tb) == pytest.approx(float(np.dot(a, b)), rel=1e-3)
    assert tt_norm(ta) == pytest.approx(float(np.linalg.norm(a)), rel=1e-3)
    want = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert tt_cosine_similarity(ta, tb) == pytest.approx(want, abs=1e-3)
    assert tt_dot_dense(ta, b) == pytest.approx(float(np.dot(a, b)),
                                                rel=1e-2)


def test_tt_odd_dimension(rng):
    v = smooth_vec(rng, 768)
    tt = tt_decompose(v)
    assert tt_reconstruct(tt).shape == (768,)
    v2 = smooth_vec(rng, 97)  # prime
    tt2 = tt_decompose(v2)
    np.testing.assert_allclose(tt_reconstruct(tt2), v2, atol=1e-3)


def test_tt_save_load(tmp_path, rng):
    vs = [("a", tt_decompose(smooth_vec(rng, 256))),
          ("b", tt_decompose(smooth_vec(rng, 256)))]
    path = tmp_path / "tts.npz"
    save_tt(path, vs)
    loaded = load_tt(path)
    assert [k for k, _ in loaded] == ["a", "b"]
    np.testing.assert_allclose(tt_reconstruct(loaded[0][1]),
                               tt_reconstruct(vs[0][1]), atol=1e-6)


def test_varint_roundtrip():
    vals = [0, 1, 127, 128, 300, 2 ** 40, 5]
    assert varint_decode(varint_encode(vals)) == vals
    with pytest.raises(ValueError):
        varint_encode([-1])
    with pytest.raises(ValueError):
        varint_decode(b"\x80")  # truncated


def test_delta_ids():
    ids = [3, 4, 10, 1000, 1001]
    enc = delta_encode_ids(ids)
    assert delta_decode_ids(enc) == ids
    assert len(enc) < len(varint_encode(ids))
    with pytest.raises(ValueError):
        delta_encode_ids([5, 3])


def test_rle():
    data = b"\x00" * 300 + b"abc" + b"\xff" * 10
    enc = rle_encode(data)
    assert rle_decode(enc) == data
    assert len(enc) < len(data)
    with pytest.raises(ValueError):
        rle_decode(b"\x01")


def test_delta_vector_roundtrip(rng):
    ref = rng.standard_normal(64).astype(np.float32)
    v = ref.copy()
    v[5] += 1.0
    v[20] -= 0.5
    dv = DeltaVector.from_dense_with_reference(v, ref, 0, threshold=0.01)
    assert dv.nnz() == 2
    np.testing.assert_allclose(dv.to_dense(ref), v, atol=1e-6)


def test_archetype_registry(rng):
    centers = rng.standard_normal((3, 32)).astype(np.float32) * 10
    data = np.concatenate([
        centers[i] + 0.05 * rng.standard_normal((40, 32)).astype(np.float32)
        for i in range(3)])
    reg = ArchetypeRegistry(threshold=0.001)
    n = reg.discover_archetypes(data, KMeansConfig(k=3))
    assert n == 3
    dvs = reg.encode_batch(data)
    # small deltas, good compression
    nnz_frac, ratio = reg.compression_stats(dvs)
    # decode reproduces inputs
    for i in (0, 50, 100):
        np.testing.assert_allclose(reg.decode(dvs[i]), data[i], atol=1e-3)
    # same-cluster points share an archetype
    assert len({dv.archetype for dv in dvs[:40]}) == 1


def test_ivf_index(rng):
    n, d = 2000, 64
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx = IVFIndex(d, IVFConfig(n_clusters=16, nprobe=16))
    idx.train(data[:1000])
    idx.add(data)
    assert idx.n_vectors == n
    queries = data[:5]
    s, ids = idx.search(queries, 10)
    # nprobe = all clusters -> exact: self is top-1
    for qi in range(5):
        assert ids[qi, 0] == qi
    # recall with fewer probes still decent for self-queries
    s2, ids2 = idx.search(queries, 10, nprobe=4)
    assert (ids2[:, 0] == np.arange(5)).mean() >= 0.8


def test_ivf_errors(rng):
    idx = IVFIndex(8)
    with pytest.raises(ValueError):
        idx.add(rng.standard_normal((10, 8)).astype(np.float32))
    with pytest.raises(ValueError):
        idx.search(np.zeros(8, np.float32), 3)


# ---------------------------------------------------------------- PQ

def test_pq_roundtrip(rng):
    from neumann_tpu.ops.pq import PQCodebook, PQConfig

    data = rng.standard_normal((500, 64)).astype(np.float32)
    pq = PQCodebook(64, PQConfig(n_subspaces=8, iters=8))
    pq.train(data)
    codes = pq.encode(data)
    assert codes.shape == (500, 8) and codes.dtype == np.uint8
    back = pq.decode(codes)
    # reconstruction error bounded (random data, 256 cents/subspace)
    err = np.linalg.norm(back - data, axis=1) / np.linalg.norm(
        data, axis=1)
    assert err.mean() < 0.6


def test_pq_adc_matches_decode_distance(rng):
    from neumann_tpu.ops.pq import PQCodebook, PQConfig

    data = rng.standard_normal((200, 32)).astype(np.float32)
    pq = PQCodebook(32, PQConfig(n_subspaces=4, iters=8))
    pq.train(data)
    codes = pq.encode(data)
    q = rng.standard_normal(32).astype(np.float32)
    table = pq.compute_adc_table(q)
    d_adc = pq.adc_distance(table, codes[7])
    d_real = float(np.sum((pq.decode(codes[7:8])[0] - q) ** 2))
    assert d_adc == pytest.approx(d_real, rel=1e-4)


def test_pq_topk_search(rng):
    from neumann_tpu.ops.pq import PQCodebook, PQConfig, pq_topk

    data = rng.standard_normal((1000, 64)).astype(np.float32)
    pq = PQCodebook(64, PQConfig(n_subspaces=16, iters=10))
    pq.train(data[:500])
    codes = pq.encode(data)
    queries = data[:5]
    s, i = pq_topk(pq, codes, queries, 10)
    # PQ recall vs exact euclidean oracle
    d2 = (np.sum(queries**2, 1)[:, None] - 2 * queries @ data.T
          + np.sum(data**2, 1)[None, :])
    want = np.argsort(d2, axis=1)[:, :10]
    recall = np.mean([len(set(i[r]) & set(want[r])) / 10
                      for r in range(5)])
    assert recall >= 0.5  # 16 subspaces on random 64d
    # self is (almost always) found
    assert (i[:, 0] == np.arange(5)).mean() >= 0.8
    # mask respected
    mask = np.zeros(1000, bool)
    mask[100:200] = True
    s2, i2 = pq_topk(pq, codes, queries, 5, mask)
    assert ((i2 >= 100) & (i2 < 200) | (i2 == -1)).all()


def test_pq_bad_dims():
    from neumann_tpu.ops.pq import PQCodebook, PQConfig

    with pytest.raises(ValueError):
        PQCodebook(65, PQConfig(n_subspaces=8))
    pq = PQCodebook(64, PQConfig(n_subspaces=8))
    with pytest.raises(ValueError):
        pq.encode(np.zeros((2, 64), np.float32))


def test_ivf_pq_and_binary_storage(rng):
    """IVFConfig::{pq,binary} parity: quantized list storage still finds
    true neighbors through the probe + quantized-scan path."""
    from neumann_tpu.ops.ivf import IVFConfig, IVFIndex

    n, d = 600, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    for cfg in (IVFConfig.pq(n_clusters=8, n_subspaces=8),
                IVFConfig.binary(n_clusters=8)):
        ix = IVFIndex(d, cfg)
        ix.train(vecs)
        ix.add(vecs)
        s, ids = ix.search_with_nprobe(vecs[:5], 5, nprobe=8)
        # full probe => the exact row must appear in the quantized top-5
        for r in range(5):
            assert r in set(ids[r].tolist()), (cfg.storage, ids[r])
        # low nprobe still returns k live results
        s2, ids2 = ix.search(vecs[:3], 3, nprobe=2)
        assert (ids2 >= 0).all()


def test_device_ivf_int8(rng):
    """DeviceIVFInt8: host ingestion, device layout, recall vs brute."""
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import DeviceIVFInt8
    from neumann_tpu.ops.quant import int8_topk_scan_jit, scalar_quantize

    n, d, k = 4000, 64, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    cq, scale = scalar_quantize(jnp.asarray(vecs))
    cq_h, scale_h = np.asarray(cq), np.asarray(scale)
    # legacy layout: one window per k-means cluster (probe centroid =
    # assignment centroid, so a row's own cluster always probes first)
    ix = DeviceIVFInt8(d, n_clusters=16, nprobe=16, iters=8)
    ix.build(cq_h, scale_h, sample_rows=1000, fixed_window=None)
    # full probe == brute force over int8: exact match expected
    qs = vecs[:6]
    s, ids = ix.search(qs, k, nprobe=16)
    es, ei = int8_topk_scan_jit(cq, scale, jnp.asarray(qs), k, "cosine")
    ei = np.asarray(ei)
    for r in range(6):
        # the oracle quantizes QUERIES to int8 while DeviceIVFInt8 keeps
        # them f32, so deep ranks may flip on near-ties
        assert len(set(ids[r].tolist()) & set(ei[r].tolist())) >= k - 1, r
        assert ids[r][0] == ei[r][0], r
    # low nprobe still finds the self-match (its own cluster probes first)
    s2, ids2 = ix.search(vecs[:6], 1, nprobe=2)
    assert list(ids2[:, 0]) == list(range(6))


def test_device_ivf_int8_fixed_window(rng):
    """Fixed-window layout: disjoint windows, window-mean probe
    centroids; full probe == brute force, partial probe ~= brute on
    clustered data (a mode spans whole windows, so its windows rank
    high under the query's top-nprobe)."""
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import DeviceIVFInt8
    from neumann_tpu.ops.quant import int8_topk_scan_jit, scalar_quantize

    n, d, k = 4096, 64, 5
    # clustered corpus: 16 well-separated modes
    modes = rng.standard_normal((16, d)).astype(np.float32) * 3
    assign = rng.integers(0, 16, n)
    vecs = (modes[assign]
            + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    cq, scale = scalar_quantize(jnp.asarray(vecs))
    cq_h, scale_h = np.asarray(cq), np.asarray(scale)
    ix = DeviceIVFInt8(d, n_clusters=16, nprobe=16, iters=8)
    ix.build(cq_h, scale_h, sample_rows=1500, fixed_window=256)
    assert ix._fixed and ix._window == 256
    n_w = ix.n_clusters
    assert n_w == ix._buf.shape[0] // 256
    # starts are the disjoint window grid
    assert list(np.asarray(ix._starts)) == [256 * i for i in range(n_w)]
    # window centroids are unit (or zero for padding-only windows)
    cn = np.linalg.norm(np.asarray(ix.centroids), axis=1)
    assert ((np.abs(cn - 1) < 1e-4) | (cn == 0)).all()

    qs = vecs[:6]
    es, ei = int8_topk_scan_jit(cq, scale, jnp.asarray(qs), k, "cosine")
    ei = np.asarray(ei)
    # full probe == brute force over int8
    _, ids = ix.search(qs, k, nprobe=n_w)
    for r in range(6):
        assert len(set(ids[r].tolist()) & set(ei[r].tolist())) >= k - 1
    # partial probe: reading ~1/4 of the corpus keeps high recall on
    # clustered data
    _, ids4 = ix.search(qs, k, nprobe=max(2, n_w // 4))
    hits = sum(len(set(ids4[r].tolist()) & set(ei[r].tolist()))
               for r in range(6))
    assert hits >= 6 * (k - 1)
    # batched path agrees with the per-query path
    _, idsb = ix.search_batched(qs, k, nprobe=max(2, n_w // 4))
    agree = sum(len(set(idsb[r].tolist()) & set(ids4[r].tolist()))
                for r in range(6))
    assert agree >= 6 * (k - 1)


def test_streaming_tt_roundtrip(tmp_path, rng):
    """NTTS append/stream: bounded-memory archive at TT compression."""
    from neumann_tpu.compress.streaming_tt import (
        StreamingTTWriter, stream_dense, stream_tt)
    from neumann_tpu.utils.errors import NeumannError

    d = 256
    # low-rank structured vectors (outer products) compress under TT;
    # full-rank noise would not (tensor_train.py docstring)
    vecs = np.stack([
        np.outer(rng.standard_normal(16),
                 rng.standard_normal(16)).ravel()
        for _ in range(20)]).astype(np.float32)
    path = tmp_path / "arch.ntts"
    with StreamingTTWriter(path, d) as w:
        for i in range(12):
            w.add(f"v{i}", vecs[i])
    # append mode continues the same file
    with StreamingTTWriter(path, d) as w:
        for i in range(12, 20):
            w.add(f"v{i}", vecs[i])
        w.flush()
    got = list(stream_dense(path))
    assert [k for k, _ in got] == [f"v{i}" for i in range(20)]
    for i, (_, dense) in enumerate(got):
        cos = float(dense @ vecs[i] / (np.linalg.norm(dense)
                                       * np.linalg.norm(vecs[i])))
        assert cos > 0.98, (i, cos)
    # compressed footprint beats raw f32
    assert path.stat().st_size < vecs.nbytes
    # torn tail: truncate mid-record, stream stops cleanly
    raw = path.read_bytes()
    path.write_bytes(raw[: len(raw) - 7])
    assert len(list(stream_tt(path))) == 19
    # corrupt a crc: stream stops at the bad record
    bad = bytearray(raw)
    bad[-1] ^= 0xFF
    path.write_bytes(bytes(bad))
    assert len(list(stream_tt(path))) == 19
    # dim mismatch on append refused
    with pytest.raises(NeumannError):
        StreamingTTWriter(path, d + 1)


def test_streaming_tt_corruption_hardening(tmp_path, rng):
    """Corrupt NTTS bytes stop the stream cleanly and fast — a corrupt
    core shape must not demand a giant allocation."""
    import time

    from neumann_tpu.compress.streaming_tt import (
        StreamingTTWriter, stream_tt)

    with StreamingTTWriter(tmp_path / "t.ntts", 64) as w:
        for i in range(8):
            w.add(f"v{i}", np.outer(np.ones(8),
                                    np.arange(8)).ravel()
                  .astype(np.float32))
    blob = (tmp_path / "t.ntts").read_bytes()
    r = np.random.default_rng(9)
    for _ in range(150):
        b = bytearray(blob)
        for _ in range(int(r.integers(1, 6))):
            b[int(r.integers(len(b)))] = int(r.integers(256))
        (tmp_path / "c.ntts").write_bytes(bytes(b))
        t0 = time.perf_counter()
        try:
            list(stream_tt(tmp_path / "c.ntts"))
        except Exception as e:
            from neumann_tpu.utils.errors import NeumannError

            assert isinstance(e, (NeumannError, ValueError)), e
        assert time.perf_counter() - t0 < 0.5


def test_device_ivf_incremental_add_delete(rng):
    """Incremental mutation contract (ivf.rs:276 `add` + tombstone
    deletes): build at N, add 10% more, delete 5% — recall stays
    within 0.005 of a FRESH build over the same final corpus, adds
    cost O(added) (delta plane, no relayout), and compact() folds the
    delta back in with ids preserved."""
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import DeviceIVFInt8
    from neumann_tpu.ops.quant import scalar_quantize

    n, d, k = 8192, 64, 10
    modes = rng.standard_normal((16, d)).astype(np.float32) * 3
    assign = rng.integers(0, 16, n + n // 10)
    allv = (modes[assign] + 0.3 * rng.standard_normal(
        (n + n // 10, d))).astype(np.float32)
    base, extra = allv[:n], allv[n:]
    cq, scale = scalar_quantize(jnp.asarray(base))
    ix = DeviceIVFInt8(d, n_clusters=16, nprobe=16, iters=8)
    ix.build(np.asarray(cq), np.asarray(scale), sample_rows=2000,
             fixed_window=256)
    n_before = ix._buf.shape[0]

    new_ids = ix.add(extra)                       # +10%
    assert list(new_ids) == list(range(n, n + len(extra)))
    assert ix._buf.shape[0] == n_before           # no relayout
    dead = rng.choice(n + len(extra), size=(n + len(extra)) // 20,
                      replace=False)              # -5%
    assert ix.delete(dead) == len(dead)
    assert ix.delete(dead[:3]) == 0               # idempotent
    assert ix.n_live == n + len(extra) - len(dead)

    # exact f32 oracle over the LIVE final corpus
    live = np.setdiff1d(np.arange(n + len(extra)), dead)
    nq = 128
    qs = allv[rng.choice(live, nq, replace=False)] \
        + 0.05 * rng.standard_normal((nq, d)).astype(np.float32)
    lv = allv[live]
    ln = lv / np.maximum(np.linalg.norm(lv, axis=1, keepdims=True),
                         1e-30)
    qn = qs / np.maximum(np.linalg.norm(qs, axis=1, keepdims=True),
                         1e-30)
    oracle = live[np.argsort(-(qn @ ln.T), axis=1)[:, :k]]

    def recall(ids):
        return float(np.mean([len(set(ids[r].tolist())
                                  & set(oracle[r].tolist())) / k
                              for r in range(len(qs))]))

    _, ids_inc = ix.search(qs, k, nprobe=8)
    # deleted rows never surface; added rows do
    assert not np.isin(ids_inc, dead).any()
    r_inc = recall(ids_inc)

    # fresh build over the same final live corpus
    cq2, scale2 = scalar_quantize(jnp.asarray(lv))
    fresh = DeviceIVFInt8(d, n_clusters=16, nprobe=16, iters=8)
    fresh.build(np.asarray(cq2), np.asarray(scale2), sample_rows=2000,
                fixed_window=256)
    _, ids_f = fresh.search(qs, k, nprobe=8)
    r_fresh = recall(np.where(ids_f >= 0,
                              live[np.maximum(ids_f, 0)], -1))
    # the residual systematic gap is tombstone dilution (dead rows
    # still occupy window slots and skew the build-time window means)
    # — measured ~0.002 at this probe fraction; compact() removes it
    assert r_inc >= r_fresh - 0.005, (r_inc, r_fresh)

    # batched path merges the delta too
    _, ids_b = ix.search_batched(qs, k, nprobe=8)
    assert not np.isin(ids_b, dead).any()
    assert recall(ids_b) >= r_fresh - 0.01

    # compact folds delta + tombstones back; ids preserved
    n_live = ix.compact(sample_rows=2000)
    assert n_live == len(live)
    assert ix._dn == 0
    _, ids_c = ix.search(qs, k, nprobe=8)
    assert not np.isin(ids_c, dead).any()
    assert recall(ids_c) >= r_fresh - 0.01


@pytest.mark.parametrize("storage", ["flat", "pq", "binary"])
def test_ivf_index_incremental_add(rng, storage):
    """IVFIndex.add appends to a trained index (ivf.rs:276) — slack
    slots first, amortized stride-doubling relayout on overflow — and
    appended rows are immediately searchable in every storage mode."""
    from neumann_tpu.ops.ivf import IVFConfig, IVFIndex

    d = 32
    cfg = {"flat": IVFConfig.flat(8), "pq": IVFConfig.pq(8, 4),
           "binary": IVFConfig.binary(8)}[storage]
    cfg.nprobe = 8
    idx = IVFIndex(d, cfg)
    base = rng.standard_normal((400, d)).astype(np.float32)
    idx.train(base)
    ids0 = idx.add(base)
    assert list(ids0) == list(range(400))
    # single-vector add returns its id (reference add -> usize)
    v = rng.standard_normal(d).astype(np.float32)
    rid = idx.add(v)
    assert rid == 400
    # batch adds keep numbering and force at least one relayout
    more = rng.standard_normal((200, d)).astype(np.float32)
    ids2 = idx.add(more)
    assert list(ids2) == list(range(401, 601))
    assert idx.n_vectors == 601
    # every appended row is findable (full probe == exhaustive)
    s, got = idx.search(np.concatenate([v[None], more[:4]]), 1,
                        nprobe=8)
    want = [400, 401, 402, 403, 404]
    if storage == "flat":
        assert list(got[:, 0]) == want
    else:   # quantized storages: self-match lands in the top-3
        s3, got3 = idx.search(np.concatenate([v[None], more[:4]]), 3,
                              nprobe=8)
        assert all(want[i] in got3[i].tolist() for i in range(5))
