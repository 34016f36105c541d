"""SnapshotBuffer spill semantics + spilled snapshot streaming.

Mirrors tensor_chain/src/snapshot_buffer.rs tests: memory mode below
threshold, transparent file spill above it, incremental SHA-256,
zero-copy slices, cleanup, and the receiver assembling a large stream
through the spill path with resume.
"""
import hashlib
import os

import pytest

from neumann_tpu.chain.snapshot_buffer import (
    SnapshotBuffer,
    SnapshotBufferConfig,
)
from neumann_tpu.chain.snapshot_streaming import (
    SnapshotReceiver,
    stream_snapshot,
    stream_snapshot_buffer,
)
from neumann_tpu.utils.errors import ChainError


def make(threshold=1024, tmp=None):
    return SnapshotBuffer(SnapshotBufferConfig(memory_threshold=threshold,
                                               temp_dir=tmp))


def test_memory_mode_below_threshold():
    with make(threshold=1024) as b:
        b.write(b"x" * 100)
        assert not b.spilled
        assert b.temp_path() is None
        b.finalize()
        assert bytes(b.as_bytes()) == b"x" * 100


def test_spills_above_threshold(tmp_path):
    data = os.urandom(5000)
    with make(threshold=1024, tmp=str(tmp_path)) as b:
        for i in range(0, len(data), 512):
            b.write(data[i: i + 512])
        assert b.spilled
        path = b.temp_path()
        assert path and os.path.exists(path)
        b.finalize()
        assert bytes(b.as_bytes()) == data
        assert b.read_chunk(4000, 512) == data[4000:4512]
        assert bytes(b.as_slice(100, 50)) == data[100:150]
    assert not os.path.exists(path)  # context exit cleaned up


def test_incremental_hash_matches_hashlib():
    data = os.urandom(3000)
    b = make(threshold=512)
    for i in range(0, len(data), 700):
        b.write(data[i: i + 700])
    assert b.hash_hex() == hashlib.sha256(data).hexdigest()
    b.cleanup()


def test_write_after_finalize_rejected():
    b = make()
    b.write(b"a")
    b.finalize()
    with pytest.raises(ChainError):
        b.write(b"b")
    b.cleanup()


def test_read_before_finalize_rejected():
    b = make()
    b.write(b"a")
    with pytest.raises(ChainError):
        b.as_bytes()
    b.cleanup()


def test_slice_out_of_bounds():
    b = make()
    b.write(b"abc")
    b.finalize()
    with pytest.raises(ChainError):
        b.as_slice(1, 10)
    b.cleanup()


def test_chunks_iterator_with_resume():
    b = make()
    b.write(bytes(range(10)) * 10)  # 100 bytes
    b.finalize()
    got = b"".join(b.chunks(32, resume_from=32))
    assert got == bytes(b.as_bytes())[32:]
    b.cleanup()


# -- streaming through the spill path ------------------------------------------

def test_receiver_spills_large_snapshot():
    blob = os.urandom(8000)
    recv = SnapshotReceiver(memory_threshold=1000)
    out = None
    for chunk in stream_snapshot("s1", blob, chunk_size=512):
        assert out is None
        out = recv.receive(chunk)
    assert out == blob
    assert recv._spill == {}  # spill buffer cleaned up


def test_receiver_spill_resume_after_interruption():
    blob = os.urandom(6000)
    recv = SnapshotReceiver(memory_threshold=1000)
    chunks = list(stream_snapshot("s1", blob, chunk_size=512))
    for chunk in chunks[:5]:
        assert recv.receive(chunk) is None
    off = recv.resume_offset("s1")
    assert off == 5 * 512
    out = None
    for chunk in stream_snapshot("s1", blob, chunk_size=512,
                                 resume_from=off):
        out = recv.receive(chunk)
    assert out == blob


def test_receiver_spill_duplicate_chunks_ignored():
    blob = os.urandom(4000)
    recv = SnapshotReceiver(memory_threshold=1000)
    chunks = list(stream_snapshot("s1", blob, chunk_size=512))
    out = None
    for chunk in chunks[:-1]:
        recv.receive(chunk)                      # first delivery
        assert recv.receive(chunk) is None       # duplicate: no-op
    out = recv.receive(chunks[-1])
    # duplicates overlapped entirely; the final digest still verifies
    assert out == blob


def test_receiver_spill_gap_rejected():
    blob = os.urandom(4000)
    recv = SnapshotReceiver(memory_threshold=1000)
    chunks = list(stream_snapshot("s1", blob, chunk_size=512))
    recv.receive(chunks[0])
    with pytest.raises(ChainError, match="gap"):
        recv.receive(chunks[3])


def test_receiver_spill_corruption_detected():
    blob = bytearray(os.urandom(4000))
    recv = SnapshotReceiver(memory_threshold=1000)
    chunks = list(stream_snapshot("s1", bytes(blob), chunk_size=512))
    bad = chunks[-1]
    bad.data = bytes(len(bad.data))  # zeroed tail
    for chunk in chunks[:-1]:
        recv.receive(chunk)
    with pytest.raises(ChainError, match="SHA-256"):
        recv.receive(bad)


def test_stream_from_buffer_end_to_end():
    data = os.urandom(5000)
    buf = make(threshold=1024)
    buf.write(data)
    buf.finalize()
    recv = SnapshotReceiver(memory_threshold=1000)
    out = None
    for chunk in stream_snapshot_buffer("s2", buf, chunk_size=700):
        out = recv.receive(chunk)
    assert out == data
    buf.cleanup()


def test_small_snapshot_keeps_memory_path():
    blob = os.urandom(500)
    recv = SnapshotReceiver(memory_threshold=100000)
    out = None
    for chunk in stream_snapshot("s3", blob, chunk_size=128):
        out = recv.receive(chunk)
    assert out == blob
    assert recv._spill == {}


# -- mutation-gap tests ----------------------------------------------------------

def test_spill_boundary_exactly_at_threshold():
    """Spill happens strictly ABOVE the threshold, not at it."""
    b = make(threshold=100)
    b.write(b"x" * 100)
    assert not b.spilled
    b.write(b"y")
    assert b.spilled
    b.cleanup()


def test_read_chunk_at_end_is_empty():
    b = make()
    b.write(b"abc")
    b.finalize()
    assert b.read_chunk(3, 100) == b""
    assert b.read_chunk(2, 100) == b"c"
    b.cleanup()
