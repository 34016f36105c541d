"""Tensor store, codec, WAL, snapshot, entity index, embedding slab tests."""

import numpy as np
import pytest

from neumann_tpu.store import (
    EmbeddingSlab,
    EntityIndex,
    SparseVector,
    TensorData,
    TensorStore,
    TensorValue,
)
from neumann_tpu.store.wal import TensorWal
from neumann_tpu.utils.errors import StoreError


def test_put_get_delete():
    s = TensorStore()
    s.put("user:alice", TensorData.with_values(name="alice", age=30))
    got = s.get("user:alice")
    assert got.get("name").value == "alice"
    assert got.get("age").value == 30
    assert s.exists("user:alice")
    assert s.delete("user:alice")
    assert not s.delete("user:alice")
    assert s.get("user:alice") is None


def test_scan_prefix():
    s = TensorStore()
    for i in range(5):
        s.put(f"emb:k{i}", TensorData.with_values(v=[1.0, 2.0]))
    s.put("node:a", TensorData())
    assert s.scan("emb:") == [f"emb:k{i}" for i in range(5)]
    assert s.scan_count("emb:") == 5
    assert s.scan_count("") == 6
    assert len(s) == 6


def test_empty_key_rejected():
    with pytest.raises(StoreError):
        TensorStore().put("", TensorData())


def test_value_model():
    v = TensorValue.vector([1, 2, 3])
    assert v.dimension() == 3
    sv = TensorValue.sparse(SparseVector.from_dense([0, 0, 5.0, 0]))
    assert sv.dimension() == 4
    assert v.is_vector() and sv.is_vector()
    assert TensorValue.pointer("a:b").kind == "pointer"
    d = TensorValue.vector([1.0, 0.0])
    e = TensorValue.vector([1.0, 0.0])
    assert d.cosine_similarity(e) == pytest.approx(1.0)
    assert d.dot(e) == pytest.approx(1.0)


def test_from_embedding_auto():
    dense = TensorValue.from_embedding([0.5, 0.3, 0.8, 0.2])
    assert dense.kind == "vector"
    sp = TensorValue.from_embedding([0.0] * 8 + [0.5, 0.3])
    assert sp.kind == "sparse"


def test_sparse_ops():
    a = SparseVector.from_dense([0, 1.0, 0, 2.0])
    b = SparseVector.from_dense([0, 3.0, 0, 0])
    assert a.dot(b) == pytest.approx(3.0)
    assert a.dot_dense([0, 1, 0, 1]) == pytest.approx(3.0)
    assert a.nnz == 2 and a.sparsity() == pytest.approx(0.5)
    np.testing.assert_allclose(a.to_dense(), [0, 1, 0, 2])
    assert 0 < a.cosine_similarity(b) <= 1
    assert a.jaccard(b) == pytest.approx(0.5)
    assert a.overlap(b) == pytest.approx(1.0)


def test_snapshot_roundtrip(tmp_path):
    s = TensorStore()
    s.put("a:1", TensorData.with_values(
        x=1, y=2.5, s="hi", b=True, n=None,
        v=[1.0, 2.0], raw=b"\x00\x01"))
    s.put("a:2", TensorData.with_values(
        sp=SparseVector.from_dense([0, 0, 7.0]),
        p=TensorValue.pointer("a:1"),
        ps=TensorValue.pointers(["a:1", "a:2"])))
    path = tmp_path / "snap.ntpu"
    s.save_snapshot(path)
    s2 = TensorStore()
    s2.load_snapshot(path)
    assert len(s2) == 2
    got = s2.get("a:1")
    assert got.get("x").value == 1
    assert got.get("y").value == 2.5
    assert got.get("b").value is True
    assert got.get("n").value is None
    assert got.get("raw").value == b"\x00\x01"
    np.testing.assert_allclose(got.get("v").value, [1.0, 2.0])
    got2 = s2.get("a:2")
    assert got2.get("p").value == "a:1"
    assert got2.get("ps").value == ["a:1", "a:2"]
    np.testing.assert_allclose(got2.get("sp").value.to_dense(), [0, 0, 7.0])


def test_wal_replay(tmp_path):
    wal_path = tmp_path / "wal.log"
    s = TensorStore()
    s.open_durable(wal_path, sync_mode="immediate")
    s.put("k:1", TensorData.with_values(a=1))
    s.put("k:2", TensorData.with_values(a=2))
    s.delete("k:1")
    s2 = TensorStore()
    n = s2.recover(wal_path)
    assert n == 3
    assert s2.get("k:1") is None
    assert s2.get("k:2").get("a").value == 2


def test_wal_torn_tail(tmp_path):
    wal_path = tmp_path / "wal.log"
    wal = TensorWal(wal_path, sync_mode="immediate")
    wal.log_put("k:1", TensorData.with_values(a=1))
    wal.log_put("k:2", TensorData.with_values(a=2))
    wal.close()
    # corrupt the tail
    with open(wal_path, "r+b") as fh:
        fh.seek(-3, 2)
        fh.write(b"\xff\xff\xff")
    ops = list(TensorWal.replay(wal_path))
    assert len(ops) == 1
    assert ops[0][1] == "k:1"


def test_wal_group_commit(tmp_path):
    wal_path = tmp_path / "wal.log"
    wal = TensorWal(wal_path, sync_mode="manual")
    wal.append_batch([
        ("put", "k:1", TensorData.with_values(a=1)),
        ("put", "k:2", TensorData.with_values(a=2)),
        ("delete", "k:1", None),
    ])
    wal.close()
    assert len(list(TensorWal.replay(wal_path))) == 3


def test_checkpoint_truncates_wal(tmp_path):
    wal_path = tmp_path / "wal.log"
    snap = tmp_path / "snap.ntpu"
    s = TensorStore()
    s.open_durable(wal_path, sync_mode="immediate")
    s.put("k:1", TensorData.with_values(a=1))
    s.checkpoint(snap)
    assert list(TensorWal.replay(wal_path)) == []
    s.put("k:2", TensorData.with_values(a=2))
    s.wal_flush()
    s2 = TensorStore()
    s2.recover(wal_path, snapshot_path=snap)
    assert s2.get("k:1") is not None and s2.get("k:2") is not None


def test_entity_index():
    ix = EntityIndex()
    a = ix.get_or_insert("a")
    b = ix.get_or_insert("b")
    assert a != b
    assert ix.get_or_insert("a") == a
    assert ix.lookup("b") == b
    assert ix.key_of(a) == "a"
    assert len(ix) == 2
    freed = ix.remove("a")
    assert freed == a
    assert ix.lookup("a") is None
    c = ix.get_or_insert("c")
    assert c == a  # free slot reused
    assert ix.capacity == 2


def test_embedding_slab(rng):
    slab = EmbeddingSlab(dim=100)
    assert slab.dim_pad == 128
    v0 = rng.standard_normal(100).astype(np.float32)
    slab.set_row(0, v0)
    slab.set_row(5, v0 * 2)
    np.testing.assert_allclose(slab.get_row(0), v0)
    assert slab.get_row(1) is None
    assert slab.valid_count() == 2
    emb, valid = slab.device_view()
    assert emb.shape == (slab.capacity, 128)
    assert np.asarray(valid).sum() == 2
    np.testing.assert_allclose(np.asarray(emb[5, :100]), v0 * 2, rtol=1e-6)
    assert np.asarray(emb[0, 100:]).sum() == 0
    # incremental update uses scatter path
    slab.set_row(1, v0 * 3)
    emb2, valid2 = slab.device_view()
    np.testing.assert_allclose(np.asarray(emb2[1, :100]), v0 * 3, rtol=1e-6)
    assert np.asarray(valid2).sum() == 3
    slab.clear_row(0)
    _, valid3 = slab.device_view()
    assert np.asarray(valid3).sum() == 2


def test_embedding_slab_growth(rng):
    slab = EmbeddingSlab(dim=16, min_capacity=4)
    vecs = rng.standard_normal((3000, 16)).astype(np.float32)
    slab.set_rows(np.arange(3000), vecs)
    assert slab.capacity >= 3000
    emb, valid = slab.device_view()
    assert np.asarray(valid).sum() == 3000
    np.testing.assert_allclose(np.asarray(emb[2999, :16]), vecs[2999],
                               rtol=1e-6)


def test_embedding_slab_dim_mismatch():
    slab = EmbeddingSlab(dim=8)
    with pytest.raises(ValueError):
        slab.set_row(0, np.zeros(9, np.float32))


def test_quantized_views(rng):
    slab = EmbeddingSlab(dim=64)
    vecs = rng.standard_normal((50, 64)).astype(np.float32)
    slab.set_rows(np.arange(50), vecs)
    q, scale, valid = slab.quantized_view("int8")
    assert q.dtype.name == "int8"
    bits, _ = slab.quantized_view("binary")
    assert bits.dtype.name == "uint32"
    # cache hit: same objects until version changes
    q2, _, _ = slab.quantized_view("int8")
    assert q2 is q
    slab.set_row(0, vecs[0] * 2)
    q3, _, _ = slab.quantized_view("int8")
    assert q3 is not q


def test_compressed_snapshot_roundtrip(tmp_path):
    s = TensorStore()
    for i in range(50):
        s.put(f"k:{i}", TensorData.with_values(v=[0.0] * 64, n=i))
    plain = tmp_path / "a.ntpu"
    comp = tmp_path / "b.ntpu"
    s.save_snapshot(plain)
    s.save_snapshot_compressed(comp)
    import os
    assert os.path.getsize(comp) < os.path.getsize(plain)
    s2 = TensorStore()
    s2.load_snapshot(comp)  # transparent sniffing
    assert len(s2) == 50 and s2.get("k:7").get("n").value == 7


# ------------------------------------------------- regional store

def test_regional_store_locality_reads(tmp_path, rng):
    from neumann_tpu.parallel.partitioner import VoronoiPartitioner
    from neumann_tpu.store.regional import RegionalStore

    seeds = np.array([[0, 0], [10, 0], [0, 10]], np.float32)
    rs = RegionalStore(str(tmp_path / "rgn"), VoronoiPartitioner(seeds),
                       flush_threshold=8)
    # 30 vectors clustered around each seed
    for c, seed in enumerate(seeds):
        for i in range(10):
            v = seed + rng.standard_normal(2).astype(np.float32) * 0.1
            region = rs.put(f"c{c}i{i}", v, f"payload-{c}-{i}".encode())
            assert region == c
    rs.flush()
    # region-aware read: exactly one cluster's keys, payloads intact
    entries = rs.load_region(1)
    assert len(entries) == 10
    assert all(k.startswith("c1") for k, _ in entries)
    assert dict(entries)["c1i3"] == b"payload-1-3"
    # knn candidate read pulls the geometrically nearest region(s)
    cands = rs.knn_candidates(np.array([9.5, 0.2], np.float32), nprobe=1)
    assert {k[:2] for k, _ in cands} == {"c1"}
    assert rs.stats()["runs"] >= 2  # multiple flushed runs so far
    rs.close()


def test_regional_store_compaction_and_reopen(tmp_path, rng):
    from neumann_tpu.parallel.partitioner import VoronoiPartitioner
    from neumann_tpu.store.regional import RegionalStore

    seeds = np.array([[0.0], [100.0]], np.float32)
    d = str(tmp_path / "rgn2")
    rs = RegionalStore(d, VoronoiPartitioner(seeds), flush_threshold=4)
    for i in range(10):
        rs.put(f"k{i}", np.array([float(i)], np.float32), b"v1-%d" % i)
    rs.flush()
    # overwrite some keys in a later run: later run must win
    for i in range(3):
        rs.put(f"k{i}", np.array([float(i)], np.float32), b"v2-%d" % i)
    rs.flush()
    removed = rs.compact()
    assert removed >= 2 and rs.stats()["runs"] == 1
    got = dict(rs.load_region(0))
    assert got["k0"] == b"v2-0" and got["k9"] == b"v1-9"
    rs.close()
    # reopen from disk: runs rediscovered
    rs2 = RegionalStore(d, VoronoiPartitioner(seeds))
    assert dict(rs2.load_region(0))["k1"] == b"v2-1"
    rs2.close()


def test_sparse_weighted_jaccard():
    from neumann_tpu.store.sparse import SparseVector

    a = SparseVector.from_dense([1.0, 2.0, 3.0])
    assert abs(a.weighted_jaccard(a) - 1.0) < 1e-6
    b = SparseVector.from_dense([0.0, 0.0, 0.0])
    assert abs(b.weighted_jaccard(b) - 1.0) < 1e-6  # both empty
    c = SparseVector.from_dense([1.0, 0.0, 0.0])
    d = SparseVector.from_dense([0.0, 1.0, 0.0])
    assert c.weighted_jaccard(d) == 0.0  # disjoint support
    e = SparseVector.from_dense([2.0, 2.0, 0.0])
    f = SparseVector.from_dense([1.0, 2.0, 0.0])
    assert abs(e.weighted_jaccard(f) - 3.0 / 4.0) < 1e-6


def test_snapshot_corruption_hardening(tmp_path):
    """Any corrupted snapshot byte (including the header fields outside
    the CRC-covered body) fails fast with StoreError, never a raw
    struct/zlib/unicode error."""
    import time

    import numpy as np

    from neumann_tpu.store import snapshot

    store = TensorStore()
    for i in range(40):
        store.put(f"k:{i}", TensorData.with_values(
            a=TensorValue.scalar(i),
            b=TensorValue.vector(np.ones(8, np.float32))))
    store.save_snapshot(tmp_path / "s.ntpu")
    store.save_snapshot(tmp_path / "s.ntpz", compressed=True)
    rng = np.random.default_rng(3)
    for name in ("s.ntpu", "s.ntpz"):
        blob = (tmp_path / name).read_bytes()
        for _ in range(120):
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(len(b)))] = int(rng.integers(256))
            (tmp_path / "c").write_bytes(bytes(b))
            t0 = time.perf_counter()
            try:
                snapshot.load(tmp_path / "c")
            except StoreError:
                pass
            assert time.perf_counter() - t0 < 0.5


# -- native codec extension parity -------------------------------------

def _force_python_codec(monkeypatch):
    from neumann_tpu.store import codec

    monkeypatch.setattr(codec, "_native", lambda: None)


def _rich_data(i=0):
    return TensorData.with_values(
        name=f"entity-{i}", score=float(i), count=i, flag=True,
        nothing=TensorValue.scalar(None), blob=TensorValue.scalar(b"\xff\x00"),
        vec=TensorValue.vector(np.arange(6, dtype=np.float32)),
        sp=TensorValue.sparse(SparseVector(
            np.array([1, 4], np.int32),
            np.array([0.5, -2.0], np.float32), 8)),
        ptr=TensorValue.pointer("doc:1"),
        ptrs=TensorValue.pointers(["a:1", "b:2"]))


def _assert_same_data(a, b):
    assert set(a.fields) == set(b.fields)
    for k in a.fields:
        va, vb = a.fields[k], b.fields[k]
        assert va.kind == vb.kind
        if va.kind == "vector":
            np.testing.assert_array_equal(va.value, vb.value)
            assert vb.value.dtype == np.float32
        elif va.kind == "sparse":
            np.testing.assert_array_equal(va.value.positions,
                                          vb.value.positions)
            np.testing.assert_array_equal(va.value.values, vb.value.values)
            assert va.value.dim == vb.value.dim
        else:
            assert va.value == vb.value
            assert type(va.value) is type(vb.value)


def test_codec_native_python_byte_identical(monkeypatch):
    from neumann_tpu.native import pycodec
    from neumann_tpu.store import codec

    if pycodec.load() is None:
        pytest.skip("no toolchain")
    td = _rich_data(7)
    native_bytes = codec.encode_data(td)
    _force_python_codec(monkeypatch)
    python_bytes = codec.encode_data(td)
    assert native_bytes == python_bytes
    _assert_same_data(codec.decode_data(native_bytes), td)


def test_codec_cross_decode(monkeypatch):
    """Python-encoded bytes decode natively and vice versa."""
    from neumann_tpu.native import pycodec
    from neumann_tpu.store import codec

    ext = pycodec.load()
    if ext is None:
        pytest.skip("no toolchain")
    td = _rich_data(3)
    _assert_same_data(ext.decode_data(codec.encode_data(td)), td)
    _force_python_codec(monkeypatch)
    _assert_same_data(codec.decode_data(ext.encode_data(td)), td)


def test_wal_cross_implementation(tmp_path, monkeypatch):
    """A WAL written by the native framer replays on the pure-Python
    path, and one written pure-Python replays natively."""
    from neumann_tpu.native import pycodec
    from neumann_tpu.store import codec

    if pycodec.load() is None:
        pytest.skip("no toolchain")
    w = TensorWal(tmp_path / "native.wal", sync_mode="manual")
    assert w._ext is not None
    w.log_put("k:1", _rich_data(1))
    w.log_delete("k:2")
    w.append_batch([("put", "k:3", _rich_data(3)), ("delete", "k:4", None)])
    w.flush()

    _force_python_codec(monkeypatch)
    w2 = TensorWal(tmp_path / "python.wal", sync_mode="manual")
    assert w2._ext is None
    w2.log_put("k:1", _rich_data(1))
    w2.log_delete("k:2")
    w2.append_batch([("put", "k:3", _rich_data(3)),
                     ("delete", "k:4", None)])
    w2.flush()

    assert (tmp_path / "native.wal").read_bytes() == \
        (tmp_path / "python.wal").read_bytes()

    # python replay of the native file (monkeypatch still active)
    ops_py = list(TensorWal.replay(tmp_path / "native.wal"))
    monkeypatch.undo()
    ops_native = list(TensorWal.replay(tmp_path / "python.wal"))
    assert [o[:2] for o in ops_py] == [o[:2] for o in ops_native] == [
        ("put", "k:1"), ("delete", "k:2"), ("put", "k:3"),
        ("delete", "k:4")]
    _assert_same_data(ops_py[0][2], ops_native[0][2])


def test_snapshot_cross_implementation(tmp_path, monkeypatch):
    from neumann_tpu.native import pycodec
    from neumann_tpu.store import codec, snapshot

    if pycodec.load() is None:
        pytest.skip("no toolchain")
    entries = {f"k:{i}": _rich_data(i) for i in range(20)}
    snapshot.save(entries, tmp_path / "n.snap")
    _force_python_codec(monkeypatch)
    snapshot.save(entries, tmp_path / "p.snap")
    assert (tmp_path / "n.snap").read_bytes() == \
        (tmp_path / "p.snap").read_bytes()
    loaded_py = snapshot.load(tmp_path / "n.snap")
    monkeypatch.undo()
    loaded_native = snapshot.load(tmp_path / "p.snap")
    assert set(loaded_py) == set(loaded_native) == set(entries)
    for k in entries:
        _assert_same_data(loaded_py[k], entries[k])
        _assert_same_data(loaded_native[k], entries[k])


def test_codec_native_error_mapping():
    from neumann_tpu.native import pycodec
    from neumann_tpu.store import codec

    if pycodec.load() is None:
        pytest.skip("no toolchain")
    with pytest.raises(StoreError):
        codec.decode_data(b"\xff\xff\xff\xff")
    with pytest.raises(StoreError):
        codec.encode_data(TensorData.with_values(
            bad=TensorValue("scalar", object())))
    with pytest.raises(StoreError):   # > 64-bit int overflows the i64 tag
        codec.encode_data(TensorData.with_values(big=1 << 80))


def test_ordered_index_newline_keys():
    """Keys containing newlines must survive the native scan protocol
    (they overflow to a Python-side sorted list) and match the pure-
    Python fallback's behavior."""
    from neumann_tpu.store.ordered_index import OrderedKeyIndex

    for use_native in (None, False):
        ix = OrderedKeyIndex(use_native=use_native)
        ix.insert_many(["a:1", "a:2", "a:mid\nend", "b:1"])
        assert ix.insert("c:\n\n")
        assert not ix.insert("c:\n\n")
        assert len(ix) == 5
        assert ix.count_prefix("a:") == 3
        assert ix.scan_prefix("a:") == ["a:1", "a:2", "a:mid\nend"]
        assert ix.scan_range("b:", None) == ["b:1", "c:\n\n"]
        assert ix.remove("a:mid\nend")
        assert ix.count_prefix("a:") == 2
        ix.clear()
        assert len(ix) == 0 and ix.scan_prefix("") == []


def test_store_newline_keys_roundtrip(tmp_path):
    s = TensorStore()
    s.put("weird\nkey", TensorData.with_values(v=1))
    s.put("plain", TensorData.with_values(v=2))
    assert s.scan_count("") == 2
    assert "weird\nkey" in s.scan("")
    s.save_snapshot(tmp_path / "s.snap")
    s2 = TensorStore()
    s2.load_snapshot(tmp_path / "s.snap")
    assert s2.get("weird\nkey").get("v").value == 1
    assert "weird\nkey" in s2.scan("weird")


def test_native_codec_corruption_fuzz():
    """The C decoders must survive random and mutated input with clean
    exceptions — never a crash or an unexpected exception type."""
    import random

    from neumann_tpu.native import pycodec

    m = pycodec.load()
    if m is None:
        pytest.skip("no toolchain")
    td = _rich_data(1)
    frame = m.encode_frame(0, "key:x", td)
    body = m.encode_snapshot_body([("k", td)] * 3)
    rng = random.Random(42)

    def attempt(fn, *a):
        try:
            fn(*a)
        except (ValueError, OverflowError):
            pass

    for _ in range(400):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 100)))
        attempt(m.decode_data, blob)
        attempt(m.decode_wal, blob)
        attempt(m.decode_snapshot_body, blob, rng.randrange(0, 8))
    for base in (frame, body):
        for _ in range(400):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            attempt(m.decode_data, bytes(b))
            attempt(m.decode_wal, bytes(b))
            attempt(m.decode_snapshot_body, bytes(b), 3)
        for cut in range(0, len(base), 7):
            attempt(m.decode_wal, base[:cut])
    attempt(m.decode_snapshot_body, body, 2**31 - 1)
    # encode-side hostility maps to StoreError via the wrappers
    from neumann_tpu.store import codec

    class Weird:
        pass

    for bad in (TensorData.with_values(x=Weird()),
                TensorData.with_values(big=1 << 200)):
        with pytest.raises(StoreError):
            codec.encode_data(bad)
