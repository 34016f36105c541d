"""Microbench: wal_overlay parse rate on an in-memory WAL image.

Isolates the C++ replay loop (frame walk + open-addressing upsert)
from disk, mmap, and store wiring — the numbers BENCHMARKS.md's host
table contextualizes. Builds a synthetic WAL of n records with
128d-embedding-sized payloads (~570B, the reference's WAL bench shape)
and distinct keys, then times wal_overlay with eager and lazy CRC.
"""

import json
import os
import struct
import sys
import time
import zlib

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_wal(n: int, payload_len: int) -> bytes:
    frames = []
    body = b"\x00" * payload_len          # vector bytes (op payload)
    for i in range(n):
        key = f"emb:k{i:07d}".encode()
        payload = b"\x00" + struct.pack("<I", len(key)) + key + body
        frames.append(struct.pack("<II", len(payload),
                                  zlib.crc32(payload) & 0xFFFFFFFF)
                      + payload)
    return b"".join(frames)


def main():
    from neumann_tpu.native import pycodec

    ext = pycodec.load()
    if ext is None:
        print(json.dumps({"error": "no native codec"}))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    payload_len = 128 * 4 + 37           # ~570B/frame like bench_host
    buf = build_wal(n, payload_len)
    print(f"# {n} records, {len(buf) / 1e6:.0f} MB",
          file=sys.stderr)
    for lazy in (0, 1):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            cap, cnt = ext.wal_overlay(buf, lazy)
            dt = time.perf_counter() - t0
            assert cnt == n, cnt
            del cap
            best = min(best, dt)
        print(json.dumps({
            "metric": f"wal_overlay parse ({'lazy' if lazy else 'eager'}"
                      " crc)",
            "value": round(n / best / 1e6, 2), "unit": "M records/s",
            "GBps": round(len(buf) / best / 1e9, 2)}))


if __name__ == "__main__":
    main()
