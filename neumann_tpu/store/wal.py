"""Write-ahead log with CRC32 framing, sync modes, and group commit.

Parity with tensor_store::TensorWal (tensor_store/src/wal.rs:142-392):
CRC32-checked binary records, SyncMode Immediate / Batched{max_entries} /
Manual, append_batch group commit, truncation and replay that stops at the
first corrupt record.

Record framing: [len u32][crc32 u32][payload]; payload = op u8 (0=put,
1=delete) + key + (TensorData for put).
"""

from __future__ import annotations

import os
import struct
import threading
import zlib
from typing import Iterator, Tuple

from neumann_tpu.store import codec
from neumann_tpu.store.tensor_store import TensorData
from neumann_tpu.utils.errors import StoreError

_HDR = struct.Struct("<II")

SYNC_MODES = ("immediate", "batched", "manual")


class TensorWal:
    def __init__(self, path, sync_mode: str = "batched",
                 batch_max_entries: int = 64):
        if sync_mode not in SYNC_MODES:
            raise StoreError(f"bad sync mode {sync_mode}")
        self.path = os.fspath(path)
        self.sync_mode = sync_mode
        self.batch_max_entries = batch_max_entries
        self._lock = threading.Lock()
        self._pending = 0
        self._ext = codec._native()   # None -> pure-Python framing
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        # C-side frame buffer: append is ONE C call (encode + buffer);
        # frames drain to the file at every sync barrier, so what is
        # durable after flush()/fsync is identical — only the
        # per-record Python frame stack is gone.
        self._fb = (self._ext.framebuf_new()
                    if self._ext is not None
                    and hasattr(self._ext, "framebuf_new") else None)
        # With the C buffer batching frames, the file is unbuffered
        # (one write syscall per ~1MB drain; a BufferedWriter would
        # memcpy every drain a second time). Without it, a 1MB
        # userspace buffer amortizes the per-frame write syscalls.
        self._fh = open(self.path, "ab",
                        buffering=0 if self._fb is not None
                        else 1 << 20)

    # -- append -----------------------------------------------------------
    @staticmethod
    def _frame(payload: bytes) -> bytes:
        # zlib.crc32 is the same IEEE CRC the native module computes;
        # for per-record framing the ctypes round-trip (buffer cast +
        # array alloc + bytes copy) measured 3x slower than these two C
        # calls, so the native framer is reserved for bulk replay scans.
        return _HDR.pack(len(payload), zlib.crc32(payload)) + payload

    def _append_frame(self, frame: bytes) -> None:
        with self._lock:
            self._fh.write(frame)
            self._pending += 1
            if self.sync_mode == "immediate":
                self._sync_locked()
            elif (self.sync_mode == "batched"
                  and self._pending >= self.batch_max_entries):
                self._sync_locked()

    def _append(self, payload: bytes) -> None:
        self._append_frame(self._frame(payload))

    def log_put(self, key: str, data: TensorData) -> None:
        ext = self._ext
        if self._fb is not None:
            try:
                with self._lock:
                    nbytes = ext.framebuf_append(self._fb, 0, key, data)
                    self._pending += 1
                    if self.sync_mode == "immediate":
                        self._sync_locked()
                    elif (self.sync_mode == "batched"
                          and self._pending >= self.batch_max_entries):
                        self._sync_locked()
                    elif nbytes >= (1 << 20):    # bound manual-mode RAM
                        self._drain_locked()
            except (ValueError, OverflowError, TypeError) as e:
                raise StoreError(str(e)) from None
            return
        if ext is not None:
            try:
                frame = ext.encode_frame(0, key, data)
            except (ValueError, OverflowError, TypeError) as e:
                raise StoreError(str(e)) from None
            self._append_frame(frame)
            return
        out = bytearray([0])
        kb = key.encode("utf-8")
        out += struct.pack("<I", len(kb))
        out += kb
        out += codec.encode_data(data)
        self._append(bytes(out))

    def log_delete(self, key: str) -> None:
        ext = self._ext
        if self._fb is not None:
            with self._lock:
                ext.framebuf_append(self._fb, 1, key)
                self._pending += 1
                if self.sync_mode == "immediate" or (
                        self.sync_mode == "batched"
                        and self._pending >= self.batch_max_entries):
                    self._sync_locked()
            return
        if ext is not None:
            self._append_frame(ext.encode_frame(1, key))
            return
        kb = key.encode("utf-8")
        self._append(bytes(bytearray([1]) + struct.pack("<I", len(kb)) + kb))

    def append_batch(self, entries) -> None:
        """Group commit: one write + one fsync for many records."""
        ext = self._ext
        if ext is not None:
            try:
                frames = ext.encode_frames(
                    [(0 if op == "put" else 1, key, data)
                     for op, key, data in entries])
            except (ValueError, OverflowError, TypeError) as e:
                raise StoreError(str(e)) from None
        else:
            frames = bytearray()
            for op, key, data in entries:
                out = bytearray([0 if op == "put" else 1])
                kb = key.encode("utf-8")
                out += struct.pack("<I", len(kb))
                out += kb
                if op == "put":
                    out += codec.encode_data(data)
                frames += self._frame(bytes(out))
        with self._lock:
            self._drain_locked()        # keep frame order
            self._fh.write(frames)
            self._sync_locked()

    # -- sync ----------------------------------------------------------------
    def _drain_locked(self) -> None:
        if self._fb is not None:
            b = self._ext.framebuf_take(self._fb)
            if b:
                self._fh.write(b)

    def _sync_locked(self) -> None:
        self._drain_locked()
        self._fh.flush()
        os.fsync(self._fh.fileno())
        self._pending = 0

    def flush(self) -> None:
        with self._lock:
            self._sync_locked()

    def truncate(self) -> None:
        with self._lock:
            if self._fb is not None:
                self._ext.framebuf_take(self._fb)    # discard
            self._fh.close()
            self._fh = open(self.path, "wb")
            self._pending = 0

    def close(self) -> None:
        with self._lock:
            self._drain_locked()
            self._fh.flush()
            self._fh.close()

    def size_bytes(self) -> int:
        with self._lock:
            self._drain_locked()
            self._fh.flush()
            return os.path.getsize(self.path)

    # -- replay ---------------------------------------------------------------
    @staticmethod
    def replay(path) -> Iterator[Tuple[str, str, TensorData]]:
        """Yield (op, key, data) tuples; stops at first corrupt record
        (torn tail after a crash), like the reference's recovery."""
        path = os.fspath(path)
        if not os.path.exists(path):
            return
        with open(path, "rb") as fh:
            buf = fh.read()

        ext = codec._native()
        if ext is not None:
            # one C pass: framing + CRC + record decode. A CRC-valid
            # but malformed record raises before any entry is yielded
            # (the pure-Python path yields the prefix first; both end
            # in StoreError and such records never come from our
            # writer — only from crafted input).
            try:
                yield from ext.decode_wal(buf)
            except ValueError as e:
                raise StoreError(
                    f"malformed WAL record: {e}") from None
            return

        from neumann_tpu import native

        if native.available():
            # C++ scan validates framing + CRC in one pass
            records = [buf[off: off + length]
                       for off, length in native.wal_scan(buf)]
        else:
            records = []
            pos = 0
            while pos + _HDR.size <= len(buf):
                length, crc = _HDR.unpack_from(buf, pos)
                start = pos + _HDR.size
                end = start + length
                if end > len(buf):
                    break  # torn write
                payload = buf[start:end]
                if zlib.crc32(payload) != crc:
                    break  # corruption — stop replay here
                records.append(payload)
                pos = end
        for payload in records:
            yield decode_record(payload)


def decode_record(payload: bytes) -> Tuple[str, str, "TensorData"]:
    """Decode one CRC-valid WAL payload to (op, key, data).

    A record that passes the CRC but is structurally malformed (hand-
    crafted or bit-rotted in a way CRC32 missed) must fail with a clean
    StoreError, never an IndexError/struct.error — found by the
    coverage fuzzer, mirroring the reference's wal fuzz targets."""
    try:
        op = payload[0]
        (klen,) = struct.unpack_from("<I", payload, 1)
        key = payload[5: 5 + klen].decode("utf-8")
        if len(payload) < 5 + klen:
            raise StoreError("WAL record key truncated")
        if op == 0:
            return ("put", key, codec.decode_data(payload, 5 + klen))
        if op == 1:
            return ("delete", key, None)
        raise StoreError(f"unknown WAL op {op}")
    except StoreError:
        raise
    except Exception as e:
        raise StoreError(f"malformed WAL record: "
                         f"{type(e).__name__}: {e}") from e
