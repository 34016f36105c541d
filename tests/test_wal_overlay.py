"""WAL overlay recovery: C++ replay map + promote-on-read laziness
(the host path closing BASELINE.md's 25M records/s replay row; see
store/tensor_store.py recover)."""

import os

import numpy as np
import pytest

from neumann_tpu.store import codec
from neumann_tpu.store.tensor_store import (
    LazyTensorData,
    TensorData,
    TensorStore,
    TensorValue,
)
from neumann_tpu.store.wal import TensorWal

native = pytest.mark.skipif(codec._native() is None,
                            reason="no native codec")


def _write_wal(path, n=200, deletes=()):
    w = TensorWal(path, sync_mode="manual")
    for i in range(n):
        td = TensorData()
        td.set("v", TensorValue.scalar(i))
        td.set("embedding", TensorValue.vector(
            np.full(8, float(i), np.float32)))
        w.log_put(f"k{i}", td)
    for i in deletes:
        w.log_delete(f"k{i}")
    w.flush()
    w.close()


@native
def test_overlay_recover_semantics(tmp_path):
    p = str(tmp_path / "wal.log")
    _write_wal(p, 200, deletes=[0, 5, 7])
    s = TensorStore()
    n = s.recover(p)
    assert n == 203
    # overlay holds the records without materializing them
    assert s._ov_cap is not None
    assert len(s) == 197
    assert s.scan_count() == 197
    # promote-on-read
    d = s.get("k42")
    assert d.get("v").value == 42
    assert np.allclose(d.get("embedding").to_dense(), 42.0)
    assert s.get("k5") is None and not s.exists("k5")
    assert s.exists("k60")
    # scan sees unmaterialized keys
    keys = s.scan("k")
    assert len(keys) == 197 and "k42" in keys and "k5" not in keys
    # overwrite + delete interact with the overlay correctly
    s.put("k60", TensorData().set("v", TensorValue.scalar(-1)))
    assert s.get("k60").get("v").value == -1
    assert s.delete("k61") and s.get("k61") is None
    assert len(s) == 196
    # snapshot materializes everything and round-trips
    blob = s.snapshot_bytes()
    s2 = TensorStore()
    s2.restore_from_bytes(blob)
    assert len(s2) == 196
    assert s2.get("k42").get("v").value == 42


@native
def test_overlay_last_write_wins(tmp_path):
    p = str(tmp_path / "wal.log")
    w = TensorWal(p, sync_mode="manual")
    w.log_put("a", TensorData().set("v", TensorValue.scalar(1)))
    w.log_delete("a")
    w.log_put("a", TensorData().set("v", TensorValue.scalar(2)))
    w.log_put("b", TensorData().set("v", TensorValue.scalar(3)))
    w.log_delete("b")
    w.flush()
    w.close()
    s = TensorStore()
    assert s.recover(p) == 5
    assert s.get("a").get("v").value == 2
    assert s.get("b") is None
    assert len(s) == 1


@native
def test_overlay_torn_tail(tmp_path):
    p = str(tmp_path / "wal.log")
    _write_wal(p, 50)
    with open(p, "ab") as fh:
        fh.write(b"\x99\x88\x77")      # torn frame
    s = TensorStore()
    assert s.recover(p) == 50
    assert s.get("k49") is not None


@native
def test_recover_with_hooks_uses_lazy_records(tmp_path):
    """Engines registered before recovery still see every record (the
    lazy wal_apply path fires put hooks with decode-on-touch data)."""
    p = str(tmp_path / "wal.log")
    _write_wal(p, 30, deletes=[3])
    s = TensorStore()
    seen = {}
    s.on_put(lambda k, d: seen.__setitem__(k, d))
    n = s.recover(p)
    assert n == 31
    assert len(seen) == 29 and "k3" not in seen
    assert isinstance(seen["k7"], LazyTensorData)
    assert seen["k7"].get("v").value == 7     # decodes on touch
    assert len(s) == 29


@native
def test_lazy_tensor_data_mutation():
    td = TensorData().set("x", TensorValue.scalar(5))
    blob = codec.encode_data(td)
    lazy = LazyTensorData(blob, 0)
    assert lazy.get("x").value == 5
    lazy.set("y", TensorValue.scalar(6))
    assert lazy.get("y").value == 6 and lazy.get("x").value == 5
    # encodes like a normal TensorData
    rt = codec.decode_data(codec.encode_data(lazy))
    assert rt.get("y").value == 6


@native
def test_overlay_concurrent_promotion_stress(tmp_path):
    """16 threads hammer get/put/delete/scan/len while records are
    still unmaterialized in the C++ overlay: every read must see either
    the recovered value or a later write, never a crash or a miss."""
    import threading

    p = str(tmp_path / "wal.log")
    _write_wal(p, 2000)
    s = TensorStore()
    assert s.recover(p) == 2000
    errors = []
    stop = threading.Event()

    def reader(tid):
        rng = np.random.default_rng(tid)
        try:
            while not stop.is_set():
                i = int(rng.integers(0, 2000))
                d = s.get(f"k{i}")
                if d is not None:
                    v = d.get("v").value
                    if v != i and not isinstance(v, str):
                        errors.append((tid, i, v))
        except Exception as e:   # pragma: no cover
            errors.append((tid, repr(e)))

    def writer(tid):
        rng = np.random.default_rng(100 + tid)
        try:
            while not stop.is_set():
                i = int(rng.integers(0, 2000))
                r = rng.random()
                if r < 0.4:
                    s.put(f"k{i}", TensorData().set(
                        "v", TensorValue.scalar(f"w{tid}")))
                elif r < 0.6:
                    s.delete(f"k{i}")
                elif r < 0.8:
                    s.scan_count("k")
                else:
                    len(s)
        except Exception as e:   # pragma: no cover
            errors.append((tid, repr(e)))

    threads = [threading.Thread(target=reader, args=(t,))
               for t in range(10)]
    threads += [threading.Thread(target=writer, args=(t,))
                for t in range(6)]
    for t in threads:
        t.start()
    import time as _t

    _t.sleep(1.5)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    assert not errors, errors[:5]
    # the store remains coherent: every surviving key materializes
    for k in s.scan("k"):
        assert s.get(k) is not None


@native
def test_lazy_crc_recover_matches_eager(tmp_path):
    """verify='lazy' defers payload CRC to first access; the recovered
    data is byte-identical to eager recovery."""
    p = str(tmp_path / "wal.log")
    _write_wal(p, 150, deletes=[3, 4])
    eager = TensorStore()
    eager.recover(p)
    lazy = TensorStore()
    n = lazy.recover(p, verify="lazy")
    assert n == 152
    for i in range(150):
        a, b = eager.get(f"k{i}"), lazy.get(f"k{i}")
        if i in (3, 4):
            assert a is None and b is None
        else:
            assert a.get("v").value == b.get("v").value == i
            np.testing.assert_array_equal(
                a.get("embedding").to_dense(),
                b.get("embedding").to_dense())


@native
def test_lazy_crc_detects_corruption_on_access(tmp_path):
    """A mid-log bit flip: eager replay truncates at the bad frame
    (later records lost); lazy replay keeps later records and raises
    StoreError only when the damaged key is touched."""
    from neumann_tpu.utils.errors import StoreError

    p = str(tmp_path / "wal.log")
    _write_wal(p, 100)
    raw = bytearray(open(p, "rb").read())
    # find frame 50's payload and flip one bit inside its value bytes
    pos, idx = 0, 0
    while idx < 50:
        flen = int.from_bytes(raw[pos:pos + 4], "little")
        pos += 8 + flen
        idx += 1
    flen = int.from_bytes(raw[pos:pos + 4], "little")
    raw[pos + 8 + flen - 1] ^= 0x40
    open(p, "wb").write(bytes(raw))

    eager = TensorStore()
    assert eager.recover(p) == 50            # truncated at corruption
    assert eager.get("k49") is not None
    assert eager.get("k51") is None          # lost

    lazy = TensorStore()
    assert lazy.recover(p, verify="lazy") == 100
    assert lazy.get("k51").get("v").value == 51   # preserved
    with pytest.raises(StoreError):
        lazy.get("k50")                      # verified before use


@native
def test_lazy_crc_torn_tail_still_truncates(tmp_path):
    """The final frame is always eagerly checked (torn buffered
    writes land there), even in lazy mode."""
    p = str(tmp_path / "wal.log")
    _write_wal(p, 20)
    raw = bytearray(open(p, "rb").read())
    raw[-2] ^= 0xFF                           # corrupt final payload
    open(p, "wb").write(bytes(raw))
    s = TensorStore()
    assert s.recover(p, verify="lazy") == 19
    assert s.get("k18") is not None
    assert s.get("k19") is None


@native
@pytest.mark.parametrize("damage", ["flen", "op"])
def test_lazy_crc_malformed_midlog_truncates(tmp_path, damage):
    """A mid-log bit flip in a frame's length/op byte desyncs the
    frame chain and lands in the malformed path. Lazy mode skips the
    per-frame CRC, so this is its corruption signal — it must behave
    like eager's CRC failure (truncate, keep the parsed prefix), not
    raise and fail the ENTIRE recovery."""
    p = str(tmp_path / "wal.log")
    _write_wal(p, 60)
    raw = bytearray(open(p, "rb").read())
    pos, idx = 0, 0
    while idx < 30:
        flen = int.from_bytes(raw[pos:pos + 4], "little")
        pos += 8 + flen
        idx += 1
    if damage == "flen":
        raw[pos:pos + 4] = (2).to_bytes(4, "little")   # flen < 5
    else:
        raw[pos + 8] = 7                               # op > 1
    open(p, "wb").write(bytes(raw))
    s = TensorStore()
    assert s.recover(p, verify="lazy") == 30           # prefix kept
    assert s.get("k29") is not None
    assert s.get("k30") is None                        # truncated


@native
def test_lazy_crc_key_update(tmp_path):
    """Updated keys: the overlay's lazy-CRC must verify the LATEST
    frame. A stale frame pointer made it check the first frame's bytes
    against the first frame's CRC using the latest frame's length —
    a spurious failure when the update changed the payload length, and
    a silently UNVERIFIED decode when it didn't (regression)."""
    p = str(tmp_path / "wal.log")
    w = TensorWal(p, sync_mode="manual")
    td1 = TensorData()
    td1.set("v", TensorValue.scalar(1))
    td1.set("pad", TensorValue.scalar("x"))          # longer frame
    w.log_put("k", td1)
    td2 = TensorData()
    td2.set("v", TensorValue.scalar(2))              # shorter frame
    w.log_put("k", td2)
    w.flush()
    w.close()
    s = TensorStore()
    assert s.recover(p, verify="lazy") == 2
    assert s.get("k").get("v").value == 2            # was StoreError


@native
def test_lazy_crc_same_length_update_detects_corruption(tmp_path):
    """Same-length update with a bit flip in the SECOND frame: the
    deferred CRC must verify the frame actually decoded (the stale
    pointer verified the intact first frame and decoded the corrupt
    second one unchecked)."""
    from neumann_tpu.utils.errors import StoreError

    p = str(tmp_path / "wal.log")
    w = TensorWal(p, sync_mode="manual")
    for key, val in (("k", 11), ("k", 22), ("tail", 3)):
        # k's frames have identical lengths; "tail" keeps the corrupt
        # frame mid-log (the FINAL frame is always eagerly verified as
        # torn-tail handling, which would truncate instead)
        td = TensorData()
        td.set("v", TensorValue.scalar(val))
        w.log_put(key, td)
    w.flush()
    w.close()
    raw = bytearray(open(p, "rb").read())
    flen0 = int.from_bytes(raw[0:4], "little")
    pos1 = 8 + flen0                     # second frame header
    flen1 = int.from_bytes(raw[pos1:pos1 + 4], "little")
    raw[pos1 + 8 + flen1 - 1] ^= 0x10    # corrupt second payload
    open(p, "wb").write(bytes(raw))
    s = TensorStore()
    assert s.recover(p, verify="lazy") == 3
    assert s.get("tail").get("v").value == 3
    with pytest.raises(StoreError):
        s.get("k")
