"""Chunked snapshot transfer with SHA-256 validation.

Parity with tensor_chain/src/snapshot_streaming.rs: a large state
snapshot streams to a lagging follower as fixed-size chunks, each
carrying (offset, total, chunk-digest); the receiver reassembles,
verifies the whole-snapshot SHA-256 before applying, and can resume
from the last contiguous offset after an interruption.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

from neumann_tpu.utils.errors import ChainError

CHUNK = 256 * 1024


@dataclass
class SnapshotChunk:
    snapshot_id: str
    offset: int
    total: int
    sha256: str           # digest of the WHOLE snapshot
    data: bytes

    def to_payload(self) -> dict:
        return {"id": self.snapshot_id, "offset": self.offset,
                "total": self.total, "sha256": self.sha256,
                "data": self.data.hex()}

    @staticmethod
    def from_payload(p: dict) -> "SnapshotChunk":
        return SnapshotChunk(p["id"], p["offset"], p["total"],
                             p["sha256"], bytes.fromhex(p["data"]))


def stream_snapshot(snapshot_id: str, blob: bytes,
                    chunk_size: int = CHUNK,
                    resume_from: int = 0) -> Iterator[SnapshotChunk]:
    digest = hashlib.sha256(blob).hexdigest()
    for off in range(resume_from, max(len(blob), 1), chunk_size):
        yield SnapshotChunk(snapshot_id, off, len(blob), digest,
                            blob[off: off + chunk_size])


class SnapshotReceiver:
    def __init__(self):
        self._buffers: Dict[str, bytearray] = {}
        self._meta: Dict[str, dict] = {}

    def receive(self, chunk: SnapshotChunk) -> Optional[bytes]:
        """Feed a chunk; returns the verified snapshot when complete."""
        meta = self._meta.get(chunk.snapshot_id)
        if meta is None:
            meta = {"total": chunk.total, "sha256": chunk.sha256,
                    "received": 0}
            self._meta[chunk.snapshot_id] = meta
            self._buffers[chunk.snapshot_id] = bytearray(chunk.total)
        if chunk.total != meta["total"] or chunk.sha256 != meta["sha256"]:
            raise ChainError("snapshot metadata changed mid-stream")
        buf = self._buffers[chunk.snapshot_id]
        end = chunk.offset + len(chunk.data)
        if end > len(buf):
            raise ChainError("snapshot chunk out of bounds")
        buf[chunk.offset: end] = chunk.data
        meta["received"] = max(meta["received"], end)
        if meta["received"] >= meta["total"]:
            blob = bytes(buf)
            if hashlib.sha256(blob).hexdigest() != meta["sha256"]:
                self.abort(chunk.snapshot_id)
                raise ChainError("snapshot SHA-256 mismatch")
            self.abort(chunk.snapshot_id)  # clear buffers
            return blob
        return None

    def resume_offset(self, snapshot_id: str) -> int:
        """Next offset to request after an interruption."""
        meta = self._meta.get(snapshot_id)
        return meta["received"] if meta else 0

    def abort(self, snapshot_id: str) -> None:
        self._buffers.pop(snapshot_id, None)
        self._meta.pop(snapshot_id, None)
