"""Device-resident embedding slab: the corpus IS a device array.

Replaces the reference's EmbeddingSlab (tensor_store/src/embedding_slab.rs:
contiguous chunks, O(1) by EntityId, free-slot reuse) with a TPU-native
design:

* authoritative host mirror: numpy [capacity, dim_pad] f32 + valid bitmap,
  with dim padded to the 128-lane tile so matmuls hit the MXU unrelayouted;
* lazily-synced device view in HBM. Mutations mark rows dirty; the next
  search flushes either a scatter of dirty rows or a full upload, so the
  host<->device boundary batches instead of the reference's per-key
  clone-on-read loop (vector_engine/src/lib.rs:2150-2153);
* cached quantized views (int8 per-row scale / packed sign bits) recomputed
  on device only when the corpus version changes — the compression ladder
  as alternate dtypes of the same buffer.

Capacity grows by doubling, so jit caches see O(log N) distinct shapes.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import numpy as np

from neumann_tpu.utils.shapes import LANE, round_up

_MIN_CAPACITY = 1024
# below this fraction of dirty rows, update the device copy by scatter
_SCATTER_FRACTION = 0.125


class EmbeddingSlab:
    def __init__(self, dim: int, min_capacity: int = _MIN_CAPACITY):
        if dim <= 0:
            raise ValueError("dim must be positive")
        self.dim = dim
        self.dim_pad = round_up(dim, LANE)
        self._capacity = max(_MIN_CAPACITY, min_capacity)
        self._host = np.zeros((self._capacity, self.dim_pad), np.float32)
        self._valid = np.zeros(self._capacity, bool)
        self._lock = threading.RLock()
        self._dirty: set[int] = set()
        self._full_dirty = True
        self._version = 0          # bumps on every mutation
        self._device = None        # jnp [capacity, dim_pad]
        self._device_valid = None  # jnp [capacity] bool
        self._device_version = -1
        self._quant_cache = {}     # mode -> (version, arrays)
        # named watchers: rows mutated since watch(name) was (re)armed.
        # Lets an index built at version V know exactly which rows went
        # stale (auto-IVF routing) without diffing the whole slab.
        self._watchers: dict = {}

    # -- watchers ----------------------------------------------------------
    def watch(self, name: str) -> int:
        """(Re)arm a watcher; returns the version it starts from."""
        with self._lock:
            self._watchers[name] = set()
            return self._version

    def watched(self, name: str) -> np.ndarray:
        """Sorted row ids mutated since watch(name). Empty if unarmed."""
        with self._lock:
            rows = self._watchers.get(name)
            if not rows:
                return np.empty(0, np.int64)
            return np.fromiter(sorted(rows), np.int64, count=len(rows))

    def watch_count(self, name: str) -> int:
        with self._lock:
            return len(self._watchers.get(name, ()))

    # -- host mutations ----------------------------------------------------
    @property
    def capacity(self) -> int:
        return self._capacity

    def valid_count(self) -> int:
        with self._lock:
            return int(self._valid.sum())

    def _ensure_capacity(self, row: int) -> None:
        if row < self._capacity:
            return
        new_cap = self._capacity
        while new_cap <= row:
            new_cap *= 2
        host = np.zeros((new_cap, self.dim_pad), np.float32)
        host[: self._capacity] = self._host
        valid = np.zeros(new_cap, bool)
        valid[: self._capacity] = self._valid
        self._host, self._valid = host, valid
        self._capacity = new_cap
        self._full_dirty = True
        self._device = None
        self._device_valid = None

    def set_row(self, row: int, vec: np.ndarray) -> None:
        vec = np.asarray(vec, dtype=np.float32)
        if vec.shape != (self.dim,):
            raise ValueError(
                f"dimension mismatch: expected {self.dim}, got {vec.shape}")
        with self._lock:
            self._ensure_capacity(row)
            self._host[row, : self.dim] = vec
            self._host[row, self.dim:] = 0.0
            self._valid[row] = True
            self._dirty.add(row)
            for w in self._watchers.values():
                w.add(row)
            self._version += 1

    def set_rows(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        """Batch insert: rows [B] int, vecs [B, dim]."""
        vecs = np.asarray(vecs, dtype=np.float32)
        rows = np.asarray(rows, dtype=np.int64)
        if vecs.shape != (len(rows), self.dim):
            raise ValueError("batch shape mismatch")
        with self._lock:
            if len(rows):
                self._ensure_capacity(int(rows.max()))
                start = int(rows[0])
                if rows.size > 1 and int(rows[-1]) - start == \
                        rows.size - 1 and bool((np.diff(rows) == 1).all()):
                    # contiguous ascending range: one slice memcpy
                    # instead of fancy indexing (columnar ingest path)
                    end = start + rows.size
                    self._host[start:end, : self.dim] = vecs
                    self._host[start:end, self.dim:] = 0.0
                    self._valid[start:end] = True
                else:
                    self._host[rows, : self.dim] = vecs
                    self._host[rows, self.dim:] = 0.0
                    self._valid[rows] = True
                row_list = rows.tolist()    # C loop, not a genexpr
                self._dirty.update(row_list)
                for w in self._watchers.values():
                    w.update(row_list)
                self._version += 1

    def adopt_matrix(self, matrix: np.ndarray) -> bool:
        """Zero-copy bulk load into an EMPTY slab: take ownership of a
        C-contiguous [N, dim_pad] f32 buffer as rows 0..N-1 instead of
        memcpying it in (~2.8 µs/row at 768d on the bench VM — the
        dominant ingest cost). The caller must not mutate the buffer
        afterwards. Returns False (and changes nothing) when the slab
        already has rows or the buffer shape/layout doesn't match."""
        if (matrix.dtype != np.float32
                or not matrix.flags["C_CONTIGUOUS"]
                or not matrix.flags["WRITEABLE"]
                or matrix.ndim != 2
                or matrix.shape[1] != self.dim_pad
                or matrix.shape[0] < _MIN_CAPACITY):
            return False
        with self._lock:
            if self._valid.any():
                return False
            n = matrix.shape[0]
            self._host = matrix
            self._valid = np.ones(n, bool)
            self._capacity = n
            self._full_dirty = True
            self._device = None
            self._device_valid = None
            rows = range(n)
            for w in self._watchers.values():
                w.update(rows)
            self._version += 1
            return True

    def clear_row(self, row: int) -> None:
        with self._lock:
            if 0 <= row < self._capacity and self._valid[row]:
                self._valid[row] = False
                self._host[row] = 0.0
                self._dirty.add(row)
                for w in self._watchers.values():
                    w.add(row)
                self._version += 1

    def get_row(self, row: int) -> Optional[np.ndarray]:
        with self._lock:
            if 0 <= row < self._capacity and self._valid[row]:
                return self._host[row, : self.dim].copy()
            return None

    def valid_mask_host(self) -> np.ndarray:
        with self._lock:
            return self._valid.copy()

    def rows_matrix(self, rows: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Snapshot (matrix [m, dim_pad] f32, valid [m]) of given rows."""
        rows = np.asarray(rows, np.int64)
        with self._lock:
            rows = rows[rows < self._capacity]
            return self._host[rows].copy(), self._valid[rows].copy()

    def host_int8(self, chunk_rows: int = 1 << 20, residual: bool = False
                  ) -> Tuple[np.ndarray, ...]:
        """Host-side int8 quantization of the whole slab (for IVF
        builds: the f32 corpus never has to be materialized in HBM).
        Invalid rows are zero -> scale 1, all-zero codes.

        With ``residual=True`` also returns a second int8 plane of the
        quantization error (ops.rerank.residual_quantize semantics):
        (q, scale, rq, rscale). Two int8 planes reconstruct to ~int16
        fidelity, letting a rerank pass restore near-f32 ordering
        without ever putting the f32 corpus on device."""
        with self._lock:
            host = self._host
            n = self._capacity
        q = np.empty((n, self.dim_pad), np.int8)
        scale = np.empty(n, np.float32)
        rq = np.empty((n, self.dim_pad), np.int8) if residual else None
        rscale = np.empty(n, np.float32) if residual else None
        # native single-pass path: ~10x the chained numpy ops on the
        # single-core build VM (2.2 s vs 23 s per 300K x 768 with
        # residual), bit-exact incl. round-half-even
        from neumann_tpu import native as _native

        if host.flags.c_contiguous and _native.available() and \
                _native.quantize_int8(host[:n], q, scale, rq, rscale):
            if residual:
                return q, scale, rq, rscale
            return q, scale
        for s in range(0, n, chunk_rows):
            e = min(n, s + chunk_rows)
            blk = host[s:e]
            am = np.max(np.abs(blk), axis=1)
            sc = np.where(am > 0, am / 127.0, 1.0).astype(np.float32)
            q[s:e] = np.clip(np.round(blk / sc[:, None]), -127,
                             127).astype(np.int8)
            scale[s:e] = sc
            if residual:
                res = blk - q[s:e].astype(np.float32) * sc[:, None]
                ram = np.max(np.abs(res), axis=1)
                rsc = np.where(ram > 0, ram / 127.0, 1.0).astype(
                    np.float32)
                rq[s:e] = np.clip(np.round(res / rsc[:, None]), -127,
                                  127).astype(np.int8)
                rscale[s:e] = rsc
        if residual:
            return q, scale, rq, rscale
        return q, scale

    def host_snapshot(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """Consistent copy (matrix [capacity, dim_pad] f32, valid
        [capacity] bool, version) for mesh placement: the sharded
        corpus is rebuilt from this when the slab version moves."""
        with self._lock:
            return self._host.copy(), self._valid.copy(), self._version

    @property
    def version(self) -> int:
        return self._version

    # -- device views --------------------------------------------------------
    def device_view(self) -> Tuple["jnp.ndarray", "jnp.ndarray"]:
        """Return (embeddings [capacity, dim_pad] f32, valid [capacity] bool)
        on device, flushing pending host mutations."""
        import jax.numpy as jnp

        with self._lock:
            if self._device_version == self._version and \
                    self._device is not None:
                return self._device, self._device_valid
            if (
                self._device is not None
                and not self._full_dirty
                and len(self._dirty) <= self._capacity * _SCATTER_FRACTION
            ):
                rows = np.fromiter(self._dirty, np.int32,
                                   count=len(self._dirty))
                self._device = self._device.at[rows].set(
                    jnp.asarray(self._host[rows]))
                self._device_valid = self._device_valid.at[rows].set(
                    jnp.asarray(self._valid[rows]))
            else:
                self._device = jnp.asarray(self._host)
                self._device_valid = jnp.asarray(self._valid)
            self._dirty.clear()
            self._full_dirty = False
            self._device_version = self._version
            return self._device, self._device_valid

    def quantized_view(self, mode: str):
        """Device view in a quantized storage mode.

        mode="int8" -> (values int8 [cap, dim_pad], scale f32 [cap], valid)
        mode="binary" -> (bits uint32 [cap, dim_pad/32], valid)
        """
        with self._lock:
            cached = self._quant_cache.get(mode)
            if cached is not None and cached[0] == self._version:
                return cached[1]
        emb, valid = self.device_view()
        from neumann_tpu.ops.quant import binary_quantize, scalar_quantize

        if mode == "int8":
            import jax

            q, scale = jax.jit(scalar_quantize)(emb)
            out = (q, scale, valid)
        elif mode == "int8c":
            import jax

            from neumann_tpu.ops.quant import int8_cosine_row_mult

            q, scale, valid = self.quantized_view("int8")
            rmult = jax.jit(int8_cosine_row_mult)(q, scale)
            out = (q, scale, rmult, valid)
        elif mode == "f32c":
            import jax
            import jax.numpy as jnp
            from jax import lax

            @jax.jit
            def _rmult(e):
                cn2 = jnp.sum(e * e, axis=1)
                return jnp.where(
                    cn2 > 0, lax.rsqrt(jnp.maximum(cn2, 1e-30)), 0.0)

            out = (emb, _rmult(emb), valid)
        elif mode == "binary":
            import jax

            bits = jax.jit(binary_quantize)(emb)
            out = (bits, valid)
        else:
            raise ValueError(f"unknown quantization mode: {mode}")
        with self._lock:
            self._quant_cache[mode] = (self._version, out)
        return out
