"""Vector engine: embedding CRUD + device-scan similarity search.

Capability parity with vector_engine (vector_engine/src/lib.rs:1369-3980):
store/get/delete embeddings, batch ops, metric-variant search, metadata +
filtered search, named collections with per-collection config (including a
quantization storage mode), entity embeddings, pagination, and
collection snapshots.

TPU-native differences from the reference:

* The corpus is a device array (EmbeddingSlab); SIMILAR is one MXU matmul
  + top-k instead of a rayon loop over per-key store reads
  (vector_engine/src/lib.rs:2144-2168).
* Filters become a row bitmask ANDed with validity and applied inside the
  scan as -inf, rather than the reference's pre/post-filter strategy
  switch (vector_engine/src/lib.rs:3429-3512). Selectivity no longer
  matters: the masked scan costs the same as the unmasked one.
* Quantized collections scan int8/binary views of the same slab with
  in-register dequantization.

The TensorStore remains authoritative (keys ``emb:{key}``,
``entity:{key}``, ``col:{name}:{key}``); the engine mirrors puts/deletes
into device corpora via store hooks, so WAL replay and snapshot loads
rebuild the device state automatically.
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from neumann_tpu.store.embedding_slab import EmbeddingSlab
from neumann_tpu.store.entity_index import EntityIndex
from neumann_tpu.store.sparse import SparseVector
from neumann_tpu.ops.scan import METRICS
from neumann_tpu.store.tensor_store import TensorData, TensorStore, TensorValue
from neumann_tpu.utils.errors import VectorError

EMB_PREFIX = "emb:"
ENTITY_PREFIX = "entity:"
COLLECTION_PREFIX = "col:"
_EMBEDDING_FIELD = "embedding"

QUANTIZATIONS = ("none", "int8", "binary", "pq", "tt")


# ---------------------------------------------------------------------------
# results / filters
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SearchResult:
    """Key + similarity score, like SearchResult (vector_engine/src/lib.rs:253)."""

    key: str
    score: float


FilterValue = Union[None, bool, int, float, str]


@dataclass(frozen=True)
class FilterCondition:
    """Metadata filter tree, parity with FilterCondition's 14 variants
    (vector_engine/src/lib.rs:297-324)."""

    op: str
    fieldname: Optional[str] = None
    value: object = None
    left: Optional["FilterCondition"] = None
    right: Optional["FilterCondition"] = None

    # -- constructors ---------------------------------------------------
    @staticmethod
    def eq(f, v):
        return FilterCondition("eq", f, v)

    @staticmethod
    def ne(f, v):
        return FilterCondition("ne", f, v)

    @staticmethod
    def lt(f, v):
        return FilterCondition("lt", f, v)

    @staticmethod
    def le(f, v):
        return FilterCondition("le", f, v)

    @staticmethod
    def gt(f, v):
        return FilterCondition("gt", f, v)

    @staticmethod
    def ge(f, v):
        return FilterCondition("ge", f, v)

    @staticmethod
    def exists(f):
        return FilterCondition("exists", f)

    @staticmethod
    def contains(f, s):
        return FilterCondition("contains", f, s)

    @staticmethod
    def starts_with(f, s):
        return FilterCondition("starts_with", f, s)

    @staticmethod
    def in_(f, values):
        return FilterCondition("in", f, tuple(values))

    @staticmethod
    def true():
        return FilterCondition("true")

    def and_(self, other):
        return FilterCondition("and", left=self, right=other)

    def or_(self, other):
        return FilterCondition("or", left=self, right=other)

    # -- evaluation --------------------------------------------------------
    def evaluate(self, metadata: Dict[str, object]) -> bool:
        op = self.op
        if op == "true":
            return True
        if op == "and":
            return self.left.evaluate(metadata) and self.right.evaluate(metadata)
        if op == "or":
            return self.left.evaluate(metadata) or self.right.evaluate(metadata)
        if op == "exists":
            return self.fieldname in metadata
        have = self.fieldname in metadata
        val = metadata.get(self.fieldname)
        if op == "eq":
            return have and val == self.value
        if op == "ne":
            return have and val != self.value
        if op in ("lt", "le", "gt", "ge"):
            if not have:
                return False
            try:
                if op == "lt":
                    return val < self.value
                if op == "le":
                    return val <= self.value
                if op == "gt":
                    return val > self.value
                return val >= self.value
            except TypeError:
                return False
        if op == "contains":
            return have and isinstance(val, str) and self.value in val
        if op == "starts_with":
            return have and isinstance(val, str) and val.startswith(self.value)
        if op == "in":
            return have and val in self.value
        raise VectorError(f"unknown filter op {op}")


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

@dataclass
class VectorEngineConfig:
    """Parity with VectorEngineConfig (vector_engine/src/lib.rs:626-710)."""

    default_dimension: Optional[int] = None
    sparse_threshold: float = 0.5
    default_metric: str = "cosine"
    max_dimension: Optional[int] = None
    max_keys_per_scan: Optional[int] = None
    search_timeout_s: Optional[float] = None
    # Auto IVF routing: cosine queries against corpora at least this
    # large go through a device IVF-nprobe index instead of the brute
    # MXU scan (sub-linear HBM reads -> single-query p99 < 5 ms at 10M;
    # mirrors the reference's automatic strategy pick in
    # vector_engine/src/lib.rs:3429-3512). Results are int8-quantized
    # approximate (like the int8 scan path); rows mutated since the
    # index build are rescanned exactly and merged, so results always
    # reflect current data. Set ivf_auto=False for exact-only.
    ivf_auto: bool = True
    ivf_auto_threshold: int = 4_000_000
    ivf_auto_max_batch: int = 32
    # Batches past ivf_auto_max_batch ride the probe-sharing batched
    # kernel (ops/ivf.batched_ivf_topk: each cluster window streams
    # from HBM once per batch and is scored only against the queries
    # that probed it) instead of falling back to the brute scan — the
    # brute path is FLOP-bound at large Q and caps throughput. Set
    # False to restore exact brute scans for large batches.
    ivf_auto_batched: bool = True
    ivf_auto_clusters: int = 1024
    ivf_auto_nprobe: int = 64
    ivf_auto_rebuild_frac: float = 0.02
    # store a second int8 plane of the quantization error alongside the
    # auto-IVF corpus (+1 byte/dim): the rerank pass reconstructs rows
    # at ~int16 fidelity, so IVF results track the f32 ordering instead
    # of the int8 one (ops/rerank.py residual_quantize)
    ivf_auto_residual: bool = True
    # ...but not past this plane size: the residual DOUBLES device HBM
    # (two int8 planes) and the build's host->device traffic — at
    # 10M x 768 the two planes alone are 15.4 GB, which does not leave
    # working memory on a 16 GB chip. Beyond this many bytes the index
    # builds without the residual plane (exact-f32 rerank of the int8
    # selection still runs; measured recall@10 0.9969 at 10M x 768)
    ivf_auto_residual_max_bytes: int = 4 << 30
    # Candidate cut of the pooled-bits brute scan: "topk" = exact
    # lax.top_k over the winner bits; "approx" / "approx:<target>" =
    # lax.approx_max_k on the packed patterns — measured +10% chain
    # throughput at recall@10 0.9984 vs 0.9996 on a 10M x 768 corpus
    # (tools/exp_pool_sweep.py; the exact rerank stays either way)
    pooled_selector: str = "topk"
    # Mesh placement: when more than one device is visible, corpora at
    # least mesh_threshold rows are placed row-sharded over the device
    # mesh (parallel.ShardedCorpus) and SIMILAR runs shard-local scan +
    # ICI all-gather merge — the engine-reachable form of the
    # reference's scatter-gather path (query_router/src/distributed.rs
    # :126-208,342-500 + lib.rs:1751-1773, which the reference wires
    # into the router itself). Unfiltered cosine corpora past
    # ivf_auto_threshold use cluster-sharded IVF (ShardedIVFCorpus).
    mesh_auto: bool = True
    mesh_threshold: int = 262_144

    @staticmethod
    def high_throughput() -> "VectorEngineConfig":
        return VectorEngineConfig()

    @staticmethod
    def low_memory() -> "VectorEngineConfig":
        return VectorEngineConfig(
            sparse_threshold=0.3, max_dimension=4096,
            max_keys_per_scan=10_000, search_timeout_s=30.0)

    def validate(self) -> None:
        if self.default_metric not in METRICS:
            raise VectorError(f"bad metric {self.default_metric}")
        if not (0.0 <= self.sparse_threshold <= 1.0):
            raise VectorError("sparse_threshold must be in [0,1]")
        if self.max_dimension is not None and self.max_dimension <= 0:
            raise VectorError("max_dimension must be positive")


@dataclass
class VectorCollectionConfig:
    """Per-collection config (dimension enforced, metric, storage mode)."""

    dimension: Optional[int] = None
    metric: str = "cosine"
    quantization: str = "none"  # none | int8 | binary

    def validate(self) -> None:
        if self.metric not in METRICS:
            raise VectorError(f"bad metric {self.metric}")
        if self.quantization not in QUANTIZATIONS:
            raise VectorError(f"bad quantization {self.quantization}")
        if self.dimension is not None and self.dimension <= 0:
            raise VectorError("dimension must be positive")


# ---------------------------------------------------------------------------
# corpus: one device-searchable namespace
# ---------------------------------------------------------------------------

class _Corpus:
    """EntityIndex + EmbeddingSlab + host metadata for one namespace+dim."""

    def __init__(self, dim: int):
        self.dim = dim
        self.index = EntityIndex()
        self.slab = EmbeddingSlab(dim)
        self.meta: Dict[int, Dict[str, object]] = {}
        self.lock = threading.RLock()
        # serializes auto-IVF (re)builds so concurrent batcher workers
        # never run two multi-second builds of the same corpus
        self.build_lock = threading.Lock()
        # mesh placements, rebuilt when the slab version moves:
        # (version, ShardedCorpus) and (version, ShardedIVFCorpus,
        # row_map) — see VectorEngine._mesh_search
        self._sharded = None
        self._sharded_ivf = None

    def upsert(self, key: str, vec: np.ndarray,
               metadata: Optional[Dict[str, object]] = None) -> int:
        with self.lock:
            row = self.index.get_or_insert(key)
            self.slab.set_row(row, vec)
            if metadata is not None:
                self.meta[row] = dict(metadata)
            else:
                self.meta.pop(row, None)
            return row

    def remove(self, key: str) -> bool:
        with self.lock:
            row = self.index.remove(key)
            if row is None:
                return False
            self.slab.clear_row(row)
            self.meta.pop(row, None)
            return True

    def count(self) -> int:
        return len(self.index)

    def filter_mask(self, cond: FilterCondition) -> np.ndarray:
        """Host-evaluated metadata filter -> row bitmask (fused on device)."""
        mask = np.zeros(self.slab.capacity, dtype=bool)
        with self.lock:
            for key, row in self.index.items():
                md = self.meta.get(row, {})
                if cond.evaluate(md):
                    mask[row] = True
        return mask


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

def _euclid_report(score: float) -> float:
    """Internal -dist -> reference's 1/(1+dist) display score."""
    return 1.0 / (1.0 + max(-score, 0.0))


@functools.lru_cache(maxsize=None)
def _jitted_topk():
    import jax

    from neumann_tpu.ops.scan import topk_scan

    return jax.jit(topk_scan, static_argnames=("k", "metric", "block_rows"))


@functools.lru_cache(maxsize=None)
def _jitted_int8_topk():
    import jax

    from neumann_tpu.ops.quant import int8_topk_scan

    return jax.jit(int8_topk_scan, static_argnames=("k", "metric",
                                                    "block_rows"))


@functools.lru_cache(maxsize=None)
def _jitted_int8_pooled():
    import jax

    from neumann_tpu.ops.rerank import int8_pooled_rerank_topk

    # two-pass: pooled int8 selection + exact f32 rerank of the
    # gathered candidates — restores the recall lost to query-side
    # int8 quantization and pooled mantissa truncation (ops/rerank.py)
    return jax.jit(int8_pooled_rerank_topk,
                   static_argnames=("k", "oversample", "pool",
                                    "block_rows", "selector"))


@functools.lru_cache(maxsize=None)
def _jitted_f32_pooled():
    import jax

    from neumann_tpu.ops.rerank import f32_pooled_rerank_topk

    return jax.jit(f32_pooled_rerank_topk,
                   static_argnames=("k", "oversample", "pool",
                                    "block_rows", "selector"))


def _pooled_pool(corpus, k: int, metric: str, extra_mask) -> Optional[int]:
    """Gate + pool size for the pooled-bits scan, or None to fall back.

    Pooled selection returns at most one row per pool, so it needs a
    dense corpus (valid rows cluster in the slab prefix) and plenty of
    pools. Metadata filters are computed host-side, so their density is
    known: selective filters (which could cluster all matches into few
    pools) keep the approx path; dense ones ride the pooled scan.
    """
    import os

    from neumann_tpu.ops.quant import _pick_pool_blocks

    if metric != "cosine":
        return None
    cap = corpus.slab.capacity
    used = corpus.slab.valid_count()
    pooled_min = int(os.environ.get("NEUMANN_POOLED_MIN_ROWS",
                                    256 * 1024))
    # pooled selection keeps ONE row per pool, so a true top-k row is
    # lost iff a better one shares its pool: expected loss fraction
    # ~(k-1)/(2*npools). 2048+ pools keeps that under ~0.25% at k=10;
    # the rerank pass then fixes ordering but can't resurrect a row
    # the pool argmax dropped.
    min_pools = max(int(os.environ.get("NEUMANN_POOLED_MIN_POOLS",
                                       2048)),
                    32 * k)
    if used < pooled_min or used * 2 < cap:
        return None
    pool_cap = min(4096, max(8, cap // max(min_pools, 1)))
    picked = _pick_pool_blocks(cap, k, pool_cap, 1 << 20)
    if not picked or cap // picked[0] < min_pools:
        return None
    pool = picked[0]
    if extra_mask is not None:
        # pooled selection yields ONE candidate per pool, so a filter
        # is safe exactly when its matches spread over enough pools —
        # check the actual occupancy, not the density (a 10%-selective
        # random filter still fills every pool; an adversarial
        # contiguous one doesn't)
        m = np.asarray(extra_mask, bool)[:cap]
        nonempty = int(m.reshape(-1, pool).any(axis=1).sum())
        if nonempty < max(min_pools, 8 * k):
            return None
    return pool


@functools.lru_cache(maxsize=None)
def _jitted_hamming():
    import jax

    from neumann_tpu.ops.quant import hamming_topk

    return jax.jit(hamming_topk, static_argnames=("k",))


class VectorEngine:
    def __init__(self, store: Optional[TensorStore] = None,
                 config: Optional[VectorEngineConfig] = None):
        self.store = store if store is not None else TensorStore()
        self.config = config or VectorEngineConfig()
        self.config.validate()
        # namespace -> dim -> corpus; namespaces: "" (default), "entity",
        # and "col/{name}"
        self._corpora: Dict[str, Dict[int, _Corpus]] = {}
        self._collections: Dict[str, VectorCollectionConfig] = {}
        self._lock = threading.RLock()
        self._mesh_cache = "unset"   # resolved lazily on first search
        # bulk-ingest mode: when not None, the put hook appends
        # (ns, key, vec, metadata) here instead of per-row slab writes;
        # flushed as ONE vectorized set_rows per (ns, dim)
        self._bulk: Optional[list] = None
        self.store.on_put(self._on_store_put)
        self.store.on_delete(self._on_store_delete)

    # ------------------------------------------------------------------
    # store-hook mirroring (also replays WAL/snapshot loads into devices)
    # ------------------------------------------------------------------
    def _parse_key(self, key: str) -> Optional[Tuple[str, str]]:
        if key.startswith(EMB_PREFIX):
            return "", key[len(EMB_PREFIX):]
        if key.startswith(ENTITY_PREFIX):
            return "entity", key[len(ENTITY_PREFIX):]
        if key.startswith(COLLECTION_PREFIX):
            rest = key[len(COLLECTION_PREFIX):]
            name, sep, inner = rest.partition(":")
            if sep:
                return f"col/{name}", inner
        return None

    def _on_store_put(self, key: str, data: TensorData) -> None:
        parsed = self._parse_key(key)
        if parsed is None:
            return
        ns, inner = parsed
        emb = data.get(_EMBEDDING_FIELD)
        if emb is None or not emb.is_vector():
            return
        vec = emb.to_dense()
        metadata = {
            n: v.value for n, v in data.fields.items()
            if n != _EMBEDDING_FIELD and v.kind == "scalar"
        }
        with self._lock:
            if self._bulk is not None:
                self._bulk.append((ns, inner, vec, metadata or None))
                return
        corpus = self._corpus_for(ns, len(vec), create=True)
        corpus.upsert(inner, vec, metadata or None)

    def bulk_ingest(self):
        """Context manager: defer slab writes during mass ingestion.

        Per-row ``set_row`` costs ~2 numpy slice writes + watcher/dirty
        bookkeeping per key; under bulk mode puts only queue, and exit
        flushes ONE vectorized ``set_rows`` per (namespace, dim) —
        measured ~5x ingest throughput at 1M x 768. Store semantics
        (WAL, map, other engines' hooks) are unchanged; only THIS
        engine's device-corpus mirror is deferred, and any search/read
        entering the engine flushes first, so visibility matches the
        non-bulk path. Reentrant (inner blocks are no-ops)."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            with self._lock:
                nested = self._bulk is not None
                if not nested:
                    self._bulk = []
            try:
                yield self
            finally:
                if not nested:
                    self._flush_bulk(end=True)

        return _cm()

    def _flush_bulk(self, end: bool = False) -> None:
        with self._lock:
            pending = self._bulk
            # a mid-bulk flush (concurrent search) drains but keeps
            # bulk mode on; only the context exit ends it
            self._bulk = None if (end or pending is None) else []
        if not pending:
            return
        groups: Dict[Tuple[str, int], list] = {}
        for item in pending:
            groups.setdefault((item[0], len(item[2])), []).append(item)
        for (ns, dim), items in groups.items():
            corpus = self._corpus_for(ns, dim, create=True)
            with corpus.lock:
                rows = np.fromiter(
                    (corpus.index.get_or_insert(it[1]) for it in items),
                    np.int64, count=len(items))
                corpus.slab.set_rows(rows, np.stack(
                    [it[2] for it in items]))
                for row, it in zip(rows, items):
                    if it[3] is not None:
                        corpus.meta[int(row)] = dict(it[3])
                    else:
                        corpus.meta.pop(int(row), None)

    def _flush_bulk_if_pending(self) -> None:
        if self._bulk is not None:
            self._flush_bulk()

    def _on_store_delete(self, key: str) -> None:
        parsed = self._parse_key(key)
        if parsed is None:
            return
        # ordering: a queued bulk put of this key must land BEFORE the
        # delete, or the delete would be undone at flush
        self._flush_bulk_if_pending()
        ns, inner = parsed
        with self._lock:
            for corpus in self._corpora.get(ns, {}).values():
                corpus.remove(inner)

    def _corpus_for(self, ns: str, dim: int, create: bool) -> _Corpus:
        with self._lock:
            by_dim = self._corpora.setdefault(ns, {})
            corpus = by_dim.get(dim)
            if corpus is None:
                if not create:
                    raise VectorError(f"no embeddings of dimension {dim}")
                corpus = by_dim[dim] = _Corpus(dim)
            return corpus

    # ------------------------------------------------------------------
    # embedding CRUD (default namespace, emb:{key})
    # ------------------------------------------------------------------
    def _validate_vec(self, embedding, dim_hint: Optional[int] = None
                      ) -> np.ndarray:
        if isinstance(embedding, SparseVector):
            embedding = embedding.to_dense()
        vec = np.asarray(embedding, dtype=np.float32)
        if vec.ndim != 1 or vec.size == 0:
            raise VectorError("embedding must be a non-empty 1-D vector")
        if self.config.max_dimension and vec.size > self.config.max_dimension:
            raise VectorError(
                f"dimension {vec.size} exceeds max {self.config.max_dimension}")
        want = dim_hint or self.config.default_dimension
        if want and vec.size != want:
            raise VectorError(
                f"dimension mismatch: expected {want}, got {vec.size}")
        return vec

    def store_embedding(self, key: str, embedding,
                        metadata: Optional[Dict[str, object]] = None) -> None:
        vec = self._validate_vec(embedding)
        data = TensorData()
        data.set(_EMBEDDING_FIELD,
                 TensorValue.from_embedding(
                     vec, sparsity_threshold=1.01
                     if self.config.sparse_threshold >= 1.0
                     else max(self.config.sparse_threshold, 0.0)))
        for n, v in (metadata or {}).items():
            data.set(n, TensorValue.scalar(v))
        self.store.put(EMB_PREFIX + key, data)

    def batch_store_embeddings(
            self, items: Sequence[Tuple[str, object]]) -> int:
        with self.bulk_ingest():
            for key, emb in items:
                self.store_embedding(key, emb)
        return len(items)

    _INGEST_SAFE_HOOKS = frozenset((
        # hooks that provably ignore (or are superseded by) a direct
        # emb:* columnar write; anything else forces the exact per-row
        # path so e.g. a chain delta-capture hook never misses a put
        "VectorEngine._on_store_put",
        "RelationalEngine._on_store_put",
        "GraphEngine._on_store_put",
    ))

    def ingest_matrix(self, keys: Sequence[str], matrix,
                      ns: str = "", copy: bool = True) -> int:
        """Columnar mass ingest: one [N, d] matrix + N keys through the
        PRODUCT path (store map + entity index + device slab) with
        vectorized everything — the TPU-side answer to the reference's
        2.0M/s in-memory writes (README.md:264). Equivalent to
        batch_store_embeddings(zip(keys, matrix)) without per-row
        metadata; embeddings are stored dense (no sparse auto-detect).

        With ``copy=False`` and a fresh corpus whose padded dim equals
        d, the slab ADOPTS the buffer zero-copy (the caller must not
        mutate it afterwards) — skipping the 3 KB/row memcpy that
        dominates at 768d (restore/bench path).

        Falls back to the per-row path when the store has a WAL, a
        recovery overlay, or any put hook that isn't one of the three
        engines' namespace-filtered mirrors — those observers must see
        every put."""
        matrix = np.ascontiguousarray(matrix, dtype=np.float32)
        if matrix.ndim != 2 or len(keys) != matrix.shape[0]:
            raise VectorError("ingest_matrix expects keys + [N, d]")
        store = self.store
        hooks_ok = all(
            getattr(getattr(h, "__func__", None), "__qualname__", "")
            in self._INGEST_SAFE_HOOKS for h in store._put_hooks)
        if (store._wal is not None or store._ov_cap is not None
                or not hooks_ok):
            with self.bulk_ingest():
                for i, key in enumerate(keys):
                    self.store_embedding(key, matrix[i])
            return len(keys)
        if ns == "":
            prefix = EMB_PREFIX
        elif ns == "entity":
            prefix = ENTITY_PREFIX
        else:
            raise VectorError(f"ingest_matrix: unsupported ns {ns!r}")
        self._flush_bulk_if_pending()
        keys = keys if isinstance(keys, list) else list(keys)
        corpus = self._corpus_for(ns, matrix.shape[1], create=True)
        with corpus.lock:
            rows = corpus.index.get_or_insert_many(keys)
            adopted = False
            if not copy and rows.size and int(rows[0]) == 0 and \
                    int(rows[-1]) == rows.size - 1:
                adopted = corpus.slab.adopt_matrix(matrix)
            if not adopted:
                corpus.slab.set_rows(rows, matrix)
        # store map entries: TensorData per key (views into the matrix,
        # like the per-row path which also keeps the caller's buffer);
        # built at C speed when the codec extension is loaded
        m = store._map
        pend = store._pending_keys
        key_list = keys if isinstance(keys, list) else list(keys)
        fast = None
        try:
            from neumann_tpu.native import pycodec

            fast = pycodec.load()
        except Exception:   # noqa: BLE001 — pure-Python fallback below
            pass
        if fast is not None and hasattr(fast, "bulk_embed_entries"):
            fast.bulk_embed_entries(m, pend, prefix, key_list, matrix,
                                    _EMBEDDING_FIELD)
            return len(key_list)
        td, tv = TensorData, TensorValue
        for i, key in enumerate(key_list):
            full = prefix + key
            m[full] = td({_EMBEDDING_FIELD: tv("vector", matrix[i])})
            pend.append(full)
        return len(key_list)

    def get_embedding(self, key: str) -> Optional[np.ndarray]:
        data = self.store.get(EMB_PREFIX + key)
        if data is None:
            return None
        emb = data.get(_EMBEDDING_FIELD)
        return None if emb is None else emb.to_dense()

    def get_metadata(self, key: str) -> Optional[Dict[str, object]]:
        data = self.store.get(EMB_PREFIX + key)
        if data is None:
            return None
        return {n: v.value for n, v in data.fields.items()
                if n != _EMBEDDING_FIELD and v.kind == "scalar"}

    def delete_embedding(self, key: str) -> bool:
        return self.store.delete(EMB_PREFIX + key)

    def embedding_exists(self, key: str) -> bool:
        return self.store.exists(EMB_PREFIX + key)

    def count_embeddings(self) -> int:
        return self.store.scan_count(EMB_PREFIX)

    def list_embeddings(self, limit: Optional[int] = None) -> List[str]:
        keys = [k[len(EMB_PREFIX):] for k in self.store.scan(EMB_PREFIX)]
        return keys[:limit] if limit else keys

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------
    def _device_search(
        self,
        corpus: _Corpus,
        queries: np.ndarray,
        top_k: int,
        metric: str,
        extra_mask: Optional[np.ndarray] = None,
        quantization: str = "none",
    ) -> List[List[SearchResult]]:
        import jax.numpy as jnp

        # angular/geodesic order by cosine (arccos is monotone), so they
        # ride every cosine fast path — pooled bits, int8, auto-IVF —
        # and only the reported scores are mapped to -arccos(cos).
        angular = metric in ("angular", "geodesic")
        if angular:
            metric = "cosine"

        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != corpus.dim:
            raise VectorError(
                f"query dimension {q.shape[1]} != corpus dimension "
                f"{corpus.dim}")
        qp = np.zeros((q.shape[0], corpus.slab.dim_pad), np.float32)
        qp[:, : corpus.dim] = q
        k = max(1, min(top_k, corpus.slab.capacity))

        mesh_got = None
        if quantization in ("none", "int8") and metric in (
                "cosine", "dot", "euclidean"):
            mesh_got = self._mesh_search(corpus, qp, k, metric,
                                         extra_mask, quantization)
        if mesh_got is not None:
            scores, idx = mesh_got
        elif quantization == "pq":
            import jax.numpy as jnp

            from neumann_tpu.ops.pq import PQCodebook, PQConfig, pq_topk

            with corpus.lock:
                pq_state = getattr(corpus, "_pq", None)
                version = corpus.slab.version
            if pq_state is None or pq_state[0] != version:
                rows, vecs = [], []
                for key, row in corpus.index.items():
                    v = corpus.slab.get_row(row)
                    if v is not None:
                        rows.append(row)
                        vecs.append(v)
                mat = np.zeros((len(vecs), corpus.slab.dim_pad),
                               np.float32)
                for i, v in enumerate(vecs):
                    mat[i, : corpus.dim] = v
                book = PQCodebook(corpus.slab.dim_pad, PQConfig(
                    n_subspaces=max(8, corpus.slab.dim_pad // 8)))
                book.train(mat)
                codes = book.encode(mat)
                pq_state = (version, book, codes, np.asarray(rows))
                with corpus.lock:
                    corpus._pq = pq_state
            _, book, codes, row_map = pq_state
            # translate the row mask to the PQ code ordering
            code_mask = None
            if extra_mask is not None:
                code_mask = np.asarray(extra_mask)[row_map]
            valid_np = corpus.slab.valid_mask_host()[row_map]
            code_mask = valid_np if code_mask is None \
                else (code_mask & valid_np)
            s_pq, i_pq = pq_topk(book, codes, qp,
                                 min(top_k, len(row_map)), code_mask)
            scores = s_pq
            idx = np.where(i_pq >= 0, row_map[np.maximum(i_pq, 0)], -1)
            out: List[List[SearchResult]] = []
            for qi in range(qp.shape[0]):
                row_hits: List[SearchResult] = []
                for score, rid in zip(scores[qi], idx[qi]):
                    if rid < 0:
                        continue
                    key = corpus.index.key_of(int(rid))
                    if key is not None:
                        # ADC gives squared distance; report 1/(1+d)
                        row_hits.append(SearchResult(
                            key, 1.0 / (1.0 + float(np.sqrt(
                                max(-score, 0.0))))))
                out.append(row_hits)
            return out
        elif quantization == "tt":
            # tensor-train storage (tensor_compress TensorMode::
            # TensorTrain): vectors live as TT cores (10-20x smaller);
            # search reconstructs the corpus (cheap core matmuls, the
            # SVD decompose step is version-cached) and runs the normal
            # device scan, so scores carry TT reconstruction error the
            # same way int8 mode carries quantization error.
            from neumann_tpu.compress.tensor_train import (
                TTConfig,
                tt_decompose,
                tt_reconstruct,
            )

            with corpus.lock:
                tt_state = getattr(corpus, "_tt", None)
                version = corpus.slab.version
            if tt_state is None or tt_state[0] != version:
                cfg = TTConfig.for_dim(corpus.slab.dim_pad)
                rows, tts = [], []
                for key, row in corpus.index.items():
                    v = corpus.slab.get_row(row)
                    if v is not None:
                        padded = np.zeros(corpus.slab.dim_pad, np.float32)
                        padded[: corpus.dim] = v
                        rows.append(row)
                        tts.append(tt_decompose(padded, cfg))
                tt_state = (version, tts, np.asarray(rows, np.int32))
                with corpus.lock:
                    corpus._tt = tt_state
            _, tts, row_map = tt_state
            if not tts:
                return [[] for _ in range(qp.shape[0])]
            mat = np.stack([tt_reconstruct(t) for t in tts])
            tt_mask = None
            if extra_mask is not None:
                tt_mask = np.asarray(extra_mask)[row_map]
            valid_np = corpus.slab.valid_mask_host()[row_map]
            tt_mask = valid_np if tt_mask is None                 else (tt_mask & valid_np)
            s_tt, i_tt = _jitted_topk()(
                jnp.asarray(mat), jnp.asarray(qp),
                min(k, len(row_map)), metric, jnp.asarray(tt_mask))
            scores = np.asarray(s_tt)
            idx = np.asarray(i_tt)
            idx = np.where(idx >= 0, row_map[np.maximum(idx, 0)], -1)
        elif quantization == "binary":
            import os

            from neumann_tpu.ops.quant import binary_quantize

            bits, valid = corpus.slab.quantized_view("binary")
            mask = valid
            if extra_mask is not None:
                mask = jnp.logical_and(mask, jnp.asarray(extra_mask))
            import jax

            qbits = jax.jit(binary_quantize)(jnp.asarray(qp))
            if os.environ.get("NEUMANN_PALLAS") == "1":
                # fused Pallas kernel: ~1.8x the XLA path on v5e, but
                # Mosaic compiles are slow on the dev tunnel, so opt-in
                from neumann_tpu.ops.pallas_kernels import (
                    hamming_topk_pallas,
                )

                scores, idx = hamming_topk_pallas(bits, qbits, k, mask)
            else:
                scores, idx = _jitted_hamming()(bits, qbits, k, mask)
        elif quantization == "int8" and metric in ("cosine", "dot",
                                                   "euclidean"):
            # the int8 kernel only has dot/cosine/euclidean forms
            # (ops/quant.py:_int8_block_scores); other metrics fall
            # through to the exact f32 path below instead of tracing
            # into an unsupported-metric error
            pool = _pooled_pool(corpus, k, metric, extra_mask)
            if pool is not None:
                # pooled-bits scan: fastest cosine path at scale
                # (677 GB/s vs 658 approx / 208 exact on v5e)
                cq, cs, rmult, valid = corpus.slab.quantized_view("int8c")
                mask = valid
                if extra_mask is not None:
                    mask = jnp.logical_and(mask, jnp.asarray(extra_mask))
                scores, idx = _jitted_int8_pooled()(
                    cq, cs, jnp.asarray(qp), k, pool=pool, mask=mask,
                    row_mult=rmult,
                    selector=self.config.pooled_selector)
            else:
                cq, cs, valid = corpus.slab.quantized_view("int8")
                mask = valid
                if extra_mask is not None:
                    mask = jnp.logical_and(mask, jnp.asarray(extra_mask))
                scores, idx = _jitted_int8_topk()(
                    cq, cs, jnp.asarray(qp), k, metric, mask)
        else:
            pool = (_pooled_pool(corpus, k, metric, extra_mask)
                    if quantization == "none" else None)
            if pool is not None:
                emb, rmult, valid = corpus.slab.quantized_view("f32c")
                mask = valid
                if extra_mask is not None:
                    mask = jnp.logical_and(mask, jnp.asarray(extra_mask))
                scores, idx = _jitted_f32_pooled()(
                    emb, jnp.asarray(qp), k, pool=pool, mask=mask,
                    row_mult=rmult,
                    selector=self.config.pooled_selector)
            else:
                emb, valid = corpus.slab.device_view()
                mask = valid
                if extra_mask is not None:
                    mask = jnp.logical_and(mask, jnp.asarray(extra_mask))
                scores, idx = _jitted_topk()(
                    emb, jnp.asarray(qp), k, metric, mask)

        from neumann_tpu.ops.scan import host_pull

        # one latency floor for both pulls (the serial pair costs two
        # ~25 ms tunnel syncs — the bulk of served p50)
        scores, idx = host_pull(scores, idx)
        # batch the key lookups: ONE index lock for the whole result
        # set instead of one per hit (measurable at serving batches)
        flat_ids = idx.reshape(-1).tolist()
        flat_keys = corpus.index.keys_of(flat_ids)
        kk_row = idx.shape[1]
        out: List[List[SearchResult]] = []
        for qi in range(q.shape[0]):
            row: List[SearchResult] = []
            base = qi * kk_row
            for j, score in enumerate(scores[qi].tolist()):
                if flat_ids[base + j] < 0:
                    continue
                key = flat_keys[base + j]
                if key is None:
                    continue
                s = score
                if metric == "euclidean" and quantization != "binary":
                    s = _euclid_report(s)
                elif angular and quantization != "binary":
                    # quantized cosine may slightly exceed [-1, 1]
                    s = float(-np.arccos(np.clip(s, -1.0, 1.0)))
                row.append(SearchResult(key, s))
            out.append(row)
        return out

    def _search_ns(self, ns: str, query, top_k: int, metric: Optional[str],
                   filter_cond: Optional[FilterCondition] = None,
                   quantization: str = "none",
                   dim_hint: Optional[int] = None
                   ) -> List[SearchResult]:
        self._flush_bulk_if_pending()   # bulk-mode reads see all puts
        if top_k <= 0:
            raise VectorError("top_k must be positive")
        q = self._validate_vec(query, dim_hint)
        metric = metric or self.config.default_metric
        if metric not in METRICS:
            raise VectorError(f"unknown metric {metric}")
        if metric in ("cosine", "dot", "angular", "geodesic") and \
                float(np.linalg.norm(q)) == 0.0:
            return []
        with self._lock:
            corpus = self._corpora.get(ns, {}).get(q.size)
        if corpus is None or corpus.count() == 0:
            return []
        if filter_cond is None:
            auto = self._auto_ivf_search(corpus, q[None, :], top_k,
                                         metric, quantization)
            if auto is not None:
                return auto[0]
        extra = corpus.filter_mask(filter_cond) if filter_cond else None
        return self._device_search(
            corpus, q, top_k, metric, extra, quantization)[0]

    # ------------------------------------------------------------------
    # mesh placement (multi-chip serving): corpora past mesh_threshold
    # are row-sharded over the device mesh, so SIMILAR through the
    # engine/router runs shard-local scan + ICI all-gather merge.
    # Engine-reachable analog of the reference's router-integrated
    # scatter-gather (query_router/src/lib.rs:1751-1773).
    # ------------------------------------------------------------------
    def _mesh(self):
        if not self.config.mesh_auto:
            return None
        if self._mesh_cache == "unset":
            import jax

            from neumann_tpu.parallel import make_mesh

            self._mesh_cache = (make_mesh()
                                if len(jax.devices()) > 1 else None)
        return self._mesh_cache

    def _mesh_search(self, corpus: _Corpus, qp: np.ndarray, k: int,
                     metric: str, extra_mask, quantization: str):
        """Sharded search when a mesh is available and the corpus is
        big enough; None falls back to the single-chip paths.
        Placements rebuild from a slab snapshot whenever the slab
        version moves (mutation-heavy namespaces fall back between
        rebuilds only in the sense of paying the reload, never in
        correctness)."""
        mesh = self._mesh()
        if mesh is None:
            return None
        cfg = self.config
        slab = corpus.slab
        n = corpus.count()
        if n < cfg.mesh_threshold:
            return None
        # large unfiltered cosine corpora: cluster-sharded IVF probes
        # (nprobe per shard in parallel) instead of full sharded scans
        if (extra_mask is None and metric == "cosine" and cfg.ivf_auto
                and n >= cfg.ivf_auto_threshold):
            got = self._sharded_ivf_search(corpus, qp, k)
            if got is not None:
                return got
        from neumann_tpu.parallel import ShardedCorpus

        want_quant = quantization == "int8"
        with corpus.lock:
            placed = corpus._sharded
        if placed is not None and placed[1].quantized != want_quant:
            placed = None       # storage mode changed: must rebuild
        # mutation-throttled rebuild (same contract as the sharded-IVF
        # path): a single EMBED STORE must NOT force a full
        # host_snapshot + device_put of the whole corpus on the next
        # search — rows mutated since the placement are served at
        # their CURRENT values via an exact delta rescan instead
        if placed is not None and placed[0] != slab.version and \
                slab.watch_count("sharded") > \
                max(1024, cfg.ivf_auto_rebuild_frac * n):
            placed = None       # too stale: rebuild the placement
        if placed is None:
            slab.watch("sharded")   # arm BEFORE reading
            mat, valid, version = slab.host_snapshot()
            sh = ShardedCorpus(mesh, slab.dim_pad, quantized=want_quant)
            sh.load(mat, valid)
            placed = (version, sh)
            with corpus.lock:
                corpus._sharded = placed
        _, sh = placed
        mask = (np.asarray(extra_mask, bool)
                if extra_mask is not None else None)
        dirty = slab.watched("sharded")
        # row ids survive placement: rows shard in slab order with
        # padding only at the tail
        if dirty.size == 0:
            return sh.search(qp, k, metric, mask=mask)
        # oversample so stale-masked hits can backfill from clean rows
        k_s = min(2 * k + 16, max(sh.n_rows, 1))
        s, ids = sh.search(qp, k_s, metric, mask=mask)
        ids = ids.astype(np.int64)
        stale = np.isin(ids, dirty)
        s = np.where(stale, -np.inf, s)
        s, ids = self._merge_delta_rescan(slab, qp, metric, s, ids,
                                          dirty, extra_mask)
        order = np.argsort(-s, axis=1)[:, :min(k, s.shape[1])]
        s = np.take_along_axis(s, order, axis=1)
        ids = np.take_along_axis(ids, order, axis=1)
        ids = np.where(np.isfinite(s), ids, -1)
        return s, ids

    @staticmethod
    def _merge_delta_rescan(slab, qp: np.ndarray, metric: str,
                            s: np.ndarray, ids: np.ndarray,
                            dirty: np.ndarray, extra_mask):
        """Score the mutated rows at their CURRENT values (any metric,
        honoring the filter mask) and append them to the (stale-masked)
        index results; callers re-sort and cut to k."""
        import jax

        from neumann_tpu.ops.scan import _finalize, score_all

        live_mask = np.ones(dirty.size, bool)
        if extra_mask is not None:
            em = np.asarray(extra_mask, bool)
            if em.size == 0:
                return s, ids
            inb = dirty < em.shape[0]
            live_mask &= inb & em[np.minimum(dirty, em.shape[0] - 1)]
        mat_d, valid_d = slab.rows_matrix(dirty)
        live_mask &= valid_d
        live = dirty[live_mask]
        if live.size == 0:
            return s, ids
        cur = mat_d[live_mask].astype(np.float32)
        ds = np.asarray(_finalize(
            jax.jit(score_all, static_argnames="metric")(
                cur, qp, metric), metric))      # [Q, |live|]
        kd = min(s.shape[1], live.size)
        top = np.argsort(-ds, axis=1)[:, :kd]
        s = np.concatenate(
            [s, np.take_along_axis(ds, top, axis=1)], axis=1)
        ids = np.concatenate([ids, live[top].astype(np.int64)], axis=1)
        return s, ids

    def _sharded_ivf_search(self, corpus: _Corpus, qp: np.ndarray,
                            k: int):
        """Mesh IVF placement with the same staleness contract as the
        single-chip auto-IVF: the k-means + relayout + device_put
        rebuild is throttled by a mutation watcher (rebuilding the
        whole placement per EMBED STORE would cost minutes at mesh
        scale), and rows mutated since the build are served at their
        CURRENT values via an exact delta rescan merged over the index
        results — never the index's stale copy."""
        cfg = self.config
        slab = corpus.slab
        with corpus.lock:
            placed = corpus._sharded_ivf
        n_valid = corpus.count()
        if placed is not None and placed[0] != slab.version and \
                slab.watch_count("sharded_ivf") > \
                max(1024, cfg.ivf_auto_rebuild_frac * n_valid):
            placed = None       # too stale: rebuild the placement
        if placed is None:
            from neumann_tpu.parallel import ShardedIVFCorpus

            slab.watch("sharded_ivf")   # arm BEFORE reading
            mat, valid, version = slab.host_snapshot()
            rows = np.flatnonzero(valid)
            if rows.size == 0:
                return None
            ivf = ShardedIVFCorpus(
                self._mesh(), slab.dim_pad,
                n_clusters=max(4, min(cfg.ivf_auto_clusters,
                                      max(1, rows.size // 64))),
                nprobe=cfg.ivf_auto_nprobe)
            ivf.load(mat[rows])
            placed = (version, ivf, rows)
            with corpus.lock:
                corpus._sharded_ivf = placed
        _, ivf, rows = placed
        # oversample: the stale-mask below can -inf index hits whose
        # rows were mutated, and without slack the clean rows ranked
        # just past k could never backfill — searches after mutations
        # would return <k live hits even though valid matches exist
        # (the single-chip auto-IVF oversamples for the same reason)
        k_ivf = min(2 * k + 16, rows.size)
        s, ids = ivf.search(qp, k_ivf)
        ids = np.where(ids >= 0, rows[np.maximum(ids, 0)], -1)
        ids = ids.astype(np.int64)
        dirty = slab.watched("sharded_ivf")
        if dirty.size:
            stale = np.isin(ids, dirty)
            s = np.where(stale, -np.inf, s)
            mat_d, valid_d = slab.rows_matrix(dirty)
            live = dirty[valid_d]
            if live.size:
                cur = mat_d[valid_d].astype(np.float32)
                nq = np.maximum(
                    np.linalg.norm(qp, axis=1, keepdims=True), 1e-30)
                nc = np.maximum(np.linalg.norm(cur, axis=1), 1e-30)
                ds = (qp / nq) @ (cur / nc[:, None]).T   # [Q, |live|]
                kd = min(k, live.size)
                top = np.argsort(-ds, axis=1)[:, :kd]
                s = np.concatenate(
                    [s, np.take_along_axis(ds, top, axis=1)], axis=1)
                ids = np.concatenate(
                    [ids, live[top].astype(np.int64)], axis=1)
        order = np.argsort(-s, axis=1)[:, :min(k, s.shape[1])]
        s = np.take_along_axis(s, order, axis=1)
        ids = np.take_along_axis(ids, order, axis=1)
        ids = np.where(np.isfinite(s), ids, -1)
        return s, ids

    # ------------------------------------------------------------------
    # auto IVF routing (sub-linear single-query path at large N)
    # ------------------------------------------------------------------
    def build_auto_ivf(self, ns: str = "",
                       dim: Optional[int] = None) -> int:
        """Build (or rebuild) the automatic IVF index for a namespace.
        Called lazily by the router when a corpus crosses
        ivf_auto_threshold; call it explicitly to prebuild (servers do
        this at load time so the first query is fast). Returns #rows."""
        dim = dim or self.config.default_dimension
        if dim is None:
            with self._lock:
                dims = list(self._corpora.get(ns, {}))
            if len(dims) != 1:
                raise VectorError("specify dim (namespace has "
                                  f"{len(dims)} dimensions)")
            dim = dims[0]
        with self._lock:
            corpus = self._corpora.get(ns, {}).get(dim)
        if corpus is None:
            raise VectorError(f"no corpus for dim {dim}")
        return self._build_auto_ivf(corpus)

    def _build_auto_ivf(self, corpus: _Corpus) -> int:
        from neumann_tpu.ops.ivf import DeviceIVFInt8

        cfg = self.config
        slab = corpus.slab
        n = corpus.count()
        # arm the watcher BEFORE reading the corpus: rows mutated during
        # the build land in the watcher set and get the exact-delta
        # treatment, so the snapshot below doesn't have to be atomic
        slab.watch("auto_ivf")
        import os as _os
        import sys as _sys
        import time as _time
        _dbg = _os.environ.get("NEUMANN_IVF_BUILD_DEBUG") == "1"
        _t0 = _time.time()

        def _stage(msg):
            if _dbg:
                print(f"[auto-ivf +{_time.time() - _t0:6.1f}s] {msg}",
                      file=_sys.stderr, flush=True)

        residual = None
        plane_bytes = slab.capacity * slab.dim_pad
        if cfg.ivf_auto_residual and \
                plane_bytes <= cfg.ivf_auto_residual_max_bytes:
            q8, scale, rq, rscale = slab.host_int8(residual=True)
            residual = (rq, rscale)
        else:
            q8, scale = slab.host_int8()
        _stage("host_int8 done")
        clusters = max(4, min(cfg.ivf_auto_clusters, max(1, n // 64)))
        ivf = DeviceIVFInt8(slab.dim_pad, n_clusters=clusters,
                            nprobe=min(cfg.ivf_auto_nprobe, clusters))
        ivf.build(q8, scale, sample_mask=slab.valid_mask_host(),
                  residual=residual)
        _stage("device build done")
        with corpus.lock:
            corpus._auto_ivf = ivf
            corpus._auto_ivf_delta = None
        return n

    def _auto_ivf_search(self, corpus: _Corpus, q: np.ndarray,
                         top_k: int, metric: str, quantization: str
                         ) -> Optional[List[List[SearchResult]]]:
        """Route through the auto IVF index when profitable; returns
        None to fall back to the brute scan."""
        import jax.numpy as jnp

        cfg = self.config
        angular = metric in ("angular", "geodesic")   # cosine ordering
        if angular:
            metric = "cosine"
        if not cfg.ivf_auto or metric != "cosine" or \
                quantization not in ("none", "int8"):
            return None
        n = corpus.count()
        if n < cfg.ivf_auto_threshold:
            return None
        throughput_batch = q.shape[0] > cfg.ivf_auto_max_batch
        if throughput_batch and not cfg.ivf_auto_batched:
            return None
        # multi-chip: the mesh placements (ShardedIVFCorpus under
        # _device_search) beat the single-chip auto index — defer
        if n >= cfg.mesh_threshold and self._mesh() is not None:
            return None
        slab = corpus.slab
        with corpus.lock:
            ivf = getattr(corpus, "_auto_ivf", None)
        if ivf is not None and slab.watch_count("auto_ivf") > \
                max(1024, cfg.ivf_auto_rebuild_frac * n):
            ivf = None          # too stale: rebuild
        if ivf is None:
            with corpus.build_lock:
                # another worker may have just (re)built: only build if
                # the index is still missing or still stale
                with corpus.lock:
                    ivf = getattr(corpus, "_auto_ivf", None)
                if ivf is None or slab.watch_count("auto_ivf") > \
                        max(1024, cfg.ivf_auto_rebuild_frac * n):
                    self._build_auto_ivf(corpus)
                with corpus.lock:
                    ivf = corpus._auto_ivf

        qp = np.zeros((q.shape[0], slab.dim_pad), np.float32)
        qp[:, : corpus.dim] = q
        k_ivf = min(2 * top_k + 16, n)
        if throughput_batch:
            scores, ids = ivf.search_batched(qp, k_ivf)
        else:
            scores, ids = ivf.search(qp, k_ivf)

        dirty = slab.watched("auto_ivf")
        if dirty.size:
            # candidates whose rows mutated after the build are stale
            # in the index: drop them, then rescan those rows at their
            # CURRENT values and merge (exact f32 over a small matrix)
            stale = np.isin(ids, dirty)
            scores = np.where(stale, -np.inf, scores)
            with corpus.lock:
                delta = getattr(corpus, "_auto_ivf_delta", None)
                version = slab.version
            if delta is None or delta[0] != version:
                mat, valid = slab.rows_matrix(dirty)
                rows = dirty[valid]
                delta = (version, rows,
                         jnp.asarray(mat[valid]) if rows.size else None)
                with corpus.lock:
                    corpus._auto_ivf_delta = delta
            _, rows, dmat = delta
            if rows.size:
                kd = min(top_k, rows.size)
                ds, di = _jitted_topk()(
                    dmat, jnp.asarray(qp), kd, "cosine",
                    jnp.ones(rows.size, bool))
                from neumann_tpu.ops.scan import host_pull

                ds, di = host_pull(ds, di)
                dids = np.where(di >= 0, rows[np.maximum(di, 0)], -1)
                scores = np.concatenate([scores, ds], axis=1)
                ids = np.concatenate([ids, dids], axis=1)

        order = np.argsort(-scores, axis=1)[:, : top_k + 8]
        cand_ids = np.take_along_axis(ids, order, axis=1)
        cand_sc = np.take_along_axis(scores, order, axis=1)
        flat_ids = cand_ids.reshape(-1).tolist()
        flat_keys = corpus.index.keys_of(flat_ids)   # one lock
        width = cand_ids.shape[1]
        out: List[List[SearchResult]] = []
        for qi in range(qp.shape[0]):
            row: List[SearchResult] = []
            base = qi * width
            for j, s in enumerate(cand_sc[qi].tolist()):
                if len(row) >= top_k or not np.isfinite(s):
                    break
                if flat_ids[base + j] < 0:
                    continue
                key = flat_keys[base + j]
                if key is not None:
                    if angular:
                        s = float(-np.arccos(np.clip(s, -1.0, 1.0)))
                    row.append(SearchResult(key, s))
            out.append(row)
        return out

    def search_similar(self, query, top_k: int) -> List[SearchResult]:
        return self._search_ns("", query, top_k, None)

    def search_similar_with_metric(self, query, top_k: int, metric: str
                                   ) -> List[SearchResult]:
        return self._search_ns("", query, top_k, metric)

    def search_similar_filtered(self, query, top_k: int,
                                filter_cond: FilterCondition,
                                metric: Optional[str] = None
                                ) -> List[SearchResult]:
        return self._search_ns("", query, top_k, metric, filter_cond)

    def search_similar_paginated(self, query, top_k: int, offset: int,
                                 metric: Optional[str] = None
                                 ) -> List[SearchResult]:
        results = self._search_ns("", query, top_k + offset, metric)
        return results[offset:]

    def search_by_key(self, key: str, top_k: int,
                      metric: Optional[str] = None) -> List[SearchResult]:
        """SIMILAR 'key' TOP k — query by an already-stored embedding."""
        vec = self.get_embedding(key)
        if vec is None:
            raise VectorError(f"no embedding for key '{key}'")
        return self._search_ns("", vec, top_k, metric)

    def batch_search(self, queries, top_k: int,
                     metric: Optional[str] = None
                     ) -> List[List[SearchResult]]:
        """Batched multi-query search: one device call for Q queries."""
        return self.batch_search_ns(queries, top_k, metric)

    def batch_search_ns(self, queries, top_k: int,
                        metric: Optional[str] = None, ns: str = "",
                        filter_cond: Optional[FilterCondition] = None,
                        quantization: Optional[str] = None
                        ) -> List[List[SearchResult]]:
        """Batched search against any namespace ("" | "entity" |
        "col/{name}"), with an optional shared metadata filter — the
        cohort primitive the serving batcher coalesces onto
        (server/batcher.py). Collections resolve their configured
        metric/quantization when not overridden."""
        self._flush_bulk_if_pending()
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim != 2:
            raise VectorError("batch_search expects [Q, d]")
        if ns.startswith("col/"):
            cfg = self.collection_config(ns[4:])
            metric = metric or cfg.metric
            if quantization is None:
                quantization = cfg.quantization
            if cfg.dimension and q.shape[1] != cfg.dimension:
                raise VectorError(
                    f"dimension mismatch: expected {cfg.dimension}, "
                    f"got {q.shape[1]}")
        metric = metric or self.config.default_metric
        if metric not in METRICS:
            raise VectorError(f"unknown metric {metric}")
        quantization = quantization or "none"
        with self._lock:
            corpus = self._corpora.get(ns, {}).get(q.shape[1])
        if corpus is None or corpus.count() == 0:
            return [[] for _ in range(q.shape[0])]
        if filter_cond is None:
            auto = self._auto_ivf_search(corpus, q, top_k, metric,
                                         quantization)
            if auto is not None:
                return auto
        extra = corpus.filter_mask(filter_cond) if filter_cond else None
        return self._device_search(corpus, q, top_k, metric, extra,
                                   quantization)

    def warmup(self, buckets: Sequence[int] = (1, 4, 16, 64, 256),
               top_ks: Sequence[int] = (10,)) -> int:
        """Precompile the serving executables (SURVEY §7 hard-part (f):
        p99 < 5 ms needs persistent compiled executables, and a cold
        first SIMILAR otherwise pays trace+compile — measured 591 ms on
        the mesh dryrun). Runs one synthetic search per (corpus,
        bucket, k): the default namespace through batch_search (the
        QueryBatcher's buckets — scan, auto-IVF, and mesh placements
        all compile through it), collections through their configured
        metric/quantization path. Returns the number of warm calls.

        Shapes are the unit of compilation: a later query only avoids
        the compile if its (bucket, k, metric) was warmed — servers
        pass their expected k values in ``top_ks``."""
        rng = np.random.default_rng(0)
        warmed = 0
        with self._lock:
            dims = list(self._corpora.get("", {}))
            cols = list(self._collections)
        for dim in dims:
            for b in buckets:
                q = rng.standard_normal((b, dim)).astype(np.float32)
                for k in top_ks:
                    self.batch_search(q, k)
                    warmed += 1
        for name in cols:
            cfg = self.collection_config(name)
            dim = cfg.dimension
            if dim is None:
                continue
            q1 = rng.standard_normal(dim).astype(np.float32)
            for k in top_ks:
                self.search_in_collection(name, q1, k)
                warmed += 1
        return warmed

    # ------------------------------------------------------------------
    # ANN indexes (API parity with build_hnsw_index / build_ivf_index /
    # search_with_hnsw / search_with_ivf_nprobe / save_index / load_index,
    # vector_engine/src/lib.rs)
    #
    # On TPU the exact MXU scan outruns graph-walk ANN well past 10M rows
    # (SURVEY.md §6 hard-parts (e)), so the sub-linear structure here is
    # IVF over a cluster-sorted device layout; the hnsw-named entry
    # points build the same index for drop-in compatibility.
    # ------------------------------------------------------------------
    def build_ivf_index(self, n_clusters: int = 64, nprobe: int = 8
                        ) -> int:
        """Build an IVF index over the default namespace. Returns #rows."""
        from neumann_tpu.ops.ivf import IVFConfig, IVFIndex

        dim, corpus, row_map, mat = self._gather_rows()
        idx = IVFIndex(dim, IVFConfig(
            n_clusters=min(n_clusters, len(mat)), nprobe=nprobe))
        idx.train(mat[: min(len(mat), 100_000)])
        idx.add(mat)
        with self._lock:
            self._ivf = (idx, corpus, row_map)
        return len(mat)

    def _gather_rows(self):
        """(dim, corpus, row_ids, matrix) over the default namespace."""
        with self._lock:
            corpora = self._corpora.get("", {})
            if not corpora:
                raise VectorError("no embeddings to index")
            dim, corpus = max(corpora.items(),
                              key=lambda kv: kv[1].count())
        rows, vecs = [], []
        for key, row in corpus.index.items():
            v = corpus.slab.get_row(row)
            if v is not None:
                rows.append(row)
                vecs.append(v)
        if not vecs:
            raise VectorError("no embeddings to index")
        return dim, corpus, np.asarray(rows), np.stack(vecs)

    def build_hnsw_index(self, m: int = 16, ef_construction: int = 200,
                         ef_search: int = 50,
                         metric: Optional[str] = None,
                         storage: str = "dense", **kw) -> int:
        """Build a genuine HNSW graph index over the default namespace.

        Parity with vector_engine/src/lib.rs build_hnsw_index /
        tensor_store/src/hnsw.rs. `storage` selects the per-node
        embedding mode: dense | quantized | binary | auto
        (EmbeddingStorage parity). The bulk device scan remains the
        default SIMILAR path; this host-side graph serves
        incremental / single-query workloads. Extra kwargs accepted
        for IVF-call compatibility (n_clusters/nprobe are ignored).
        """
        from neumann_tpu.ops.hnsw import HNSWConfig, HNSWIndex

        dim, corpus, row_map, mat = self._gather_rows()
        hnsw_metric = metric or self.config.default_metric
        # validate BEFORE HNSWConfig so engine callers get a
        # VectorError, not the kernel layer's ValueError
        if hnsw_metric not in ("cosine", "euclidean", "dot"):
            raise VectorError(
                f"HNSW supports cosine/euclidean/dot, not {hnsw_metric}")
        cfg = HNSWConfig(m=m, ef_construction=ef_construction,
                         ef_search=ef_search, metric=hnsw_metric)
        idx = HNSWIndex(dim, cfg)
        ins = {"dense": idx.insert, "quantized": idx.insert_quantized,
               "binary": idx.insert_binary,
               "auto": idx.insert_auto}.get(storage)
        if ins is None:
            raise VectorError(f"unknown HNSW storage '{storage}'")
        for v in mat:
            ins(v)
        with self._lock:
            self._hnsw = (idx, corpus, row_map)
        return len(mat)

    def _ivf_search(self, query, top_k: int, nprobe: Optional[int]
                    ) -> List[SearchResult]:
        state = getattr(self, "_ivf", None)
        if state is None:
            raise VectorError("no index built (build_ivf_index first)")
        idx, corpus, row_map = state
        q = self._validate_vec(query, idx.dim)
        s, ids = idx.search(q, top_k, nprobe)
        out = []
        for score, i in zip(s[0], ids[0]):
            if i < 0:
                continue
            key = corpus.index.key_of(int(row_map[i]))
            if key is not None:
                out.append(SearchResult(key, float(score)))
        return out

    def search_with_ivf_nprobe(self, query, top_k: int, nprobe: int
                               ) -> List[SearchResult]:
        return self._ivf_search(query, top_k, nprobe)

    def search_with_hnsw(self, query, top_k: int,
                         ef: Optional[int] = None) -> List[SearchResult]:
        """Graph-walk ANN search (hnsw.rs search / search_with_ef).

        Uses the HNSW graph if built; otherwise falls through to an
        IVF index built via the compat path."""
        state = getattr(self, "_hnsw", None)
        if state is None:
            return self._ivf_search(query, top_k, None)
        idx, corpus, row_map = state
        q = self._validate_vec(query, idx.dim)
        hits = (idx.search_with_ef(q, top_k, ef) if ef
                else idx.search(q, top_k))
        out = []
        for nid, score in hits:
            key = corpus.index.key_of(int(row_map[nid]))
            if key is not None:
                out.append(SearchResult(key, float(score)))
        return out

    def search_with_hnsw_ef(self, query, top_k: int, ef: int
                            ) -> List[SearchResult]:
        return self.search_with_hnsw(query, top_k, ef=ef)

    def save_index(self, path) -> None:
        """Persist whichever ANN index is built (HNSW preferred)."""
        self._flush_bulk_if_pending()
        hnsw = getattr(self, "_hnsw", None)
        if hnsw is not None:
            idx, corpus, row_map = hnsw
            np.savez_compressed(
                path, hnsw_blob=np.frombuffer(idx.to_bytes(), np.uint8),
                row_map=row_map)
            return
        state = getattr(self, "_ivf", None)
        if state is None:
            raise VectorError("no index built")
        idx, corpus, row_map = state
        np.savez_compressed(
            path, centroids=idx.centroids,
            reordered=np.asarray(idx._reordered),
            row_ids=idx._row_ids, stride=idx._stride, n=idx._n,
            dim=idx.dim, nprobe=idx.config.nprobe, row_map=row_map)

    def _load_hnsw_index(self, blob) -> int:
        from neumann_tpu.ops.hnsw import HNSWIndex

        idx = HNSWIndex.from_bytes(blob["hnsw_blob"].tobytes())
        with self._lock:
            corpus = self._corpora.get("", {}).get(idx.dim)
        if corpus is None:
            raise VectorError(
                f"no dimension-{idx.dim} embeddings loaded to map the "
                f"index onto")
        self._hnsw = (idx, corpus, blob["row_map"])
        return len(idx)

    def load_index(self, path) -> int:
        from neumann_tpu.ops.ivf import IVFConfig, IVFIndex

        import jax.numpy as jnp

        try:
            blob = np.load(path)
            files = blob.files
        except Exception as e:       # zip/crc/pickle-layer corruption
            raise VectorError(f"corrupt index file {path}: {e}") \
                from None
        try:
            if "hnsw_blob" in files:
                return self._load_hnsw_index(blob)
            dim = int(blob["dim"])
            idx = IVFIndex(dim, IVFConfig(
                n_clusters=len(blob["centroids"]),
                nprobe=int(blob["nprobe"])))
            idx.centroids = blob["centroids"]
            idx._reordered = jnp.asarray(blob["reordered"])
            idx._row_ids = blob["row_ids"]
            idx._stride = int(blob["stride"])
            idx._n = int(blob["n"])
            with self._lock:
                corpus = self._corpora.get("", {}).get(dim)
            if corpus is None:
                raise VectorError(
                    f"no dimension-{dim} embeddings loaded to map the "
                    f"index onto")
            self._ivf = (idx, corpus, blob["row_map"])
            return idx._n
        except VectorError:
            raise
        except Exception as e:       # missing keys / mangled arrays
            raise VectorError(f"corrupt index file {path}: {e}") \
                from None

    # ------------------------------------------------------------------
    # entity embeddings (unified engine support)
    # ------------------------------------------------------------------
    def store_entity_embedding(self, key: str, embedding) -> None:
        vec = self._validate_vec(embedding)
        data = self.store.get(ENTITY_PREFIX + key) or TensorData()
        data.set(_EMBEDDING_FIELD, TensorValue.vector(vec))
        self.store.put(ENTITY_PREFIX + key, data)

    def get_entity_embedding(self, key: str) -> Optional[np.ndarray]:
        data = self.store.get(ENTITY_PREFIX + key)
        if data is None:
            return None
        emb = data.get(_EMBEDDING_FIELD)
        return None if emb is None else emb.to_dense()

    def search_entities(self, query, top_k: int,
                        metric: Optional[str] = None,
                        mask_rows: Optional[np.ndarray] = None
                        ) -> List[SearchResult]:
        self._flush_bulk_if_pending()   # bulk-mode reads see all puts
        q = self._validate_vec(query)
        metric = metric or self.config.default_metric
        with self._lock:
            corpus = self._corpora.get("entity", {}).get(q.size)
        if corpus is None or corpus.count() == 0:
            return []
        return self._device_search(corpus, q, top_k, metric, mask_rows)[0]

    def entity_corpus(self, dim: int) -> Optional[_Corpus]:
        """Expose the entity corpus for fused hybrid queries (unified)."""
        self._flush_bulk_if_pending()   # bulk-mode reads see all puts
        with self._lock:
            return self._corpora.get("entity", {}).get(dim)

    # ------------------------------------------------------------------
    # collections
    # ------------------------------------------------------------------
    def create_collection(self, name: str,
                          config: Optional[VectorCollectionConfig] = None
                          ) -> None:
        config = config or VectorCollectionConfig()
        config.validate()
        with self._lock:
            if name in self._collections:
                raise VectorError(f"collection '{name}' already exists")
            self._collections[name] = config

    def drop_collection(self, name: str) -> bool:
        with self._lock:
            if name not in self._collections:
                return False
            del self._collections[name]
            self._corpora.pop(f"col/{name}", None)
        for key in self.store.scan(f"{COLLECTION_PREFIX}{name}:"):
            self.store.delete(key)
        return True

    def list_collections(self) -> List[str]:
        with self._lock:
            return sorted(self._collections)

    def collection_config(self, name: str) -> VectorCollectionConfig:
        with self._lock:
            cfg = self._collections.get(name)
        if cfg is None:
            raise VectorError(f"unknown collection '{name}'")
        return cfg

    def collection_stats(self, name: str) -> Dict[str, object]:
        self._flush_bulk_if_pending()
        cfg = self.collection_config(name)
        ns = f"col/{name}"
        with self._lock:
            corpora = list(self._corpora.get(ns, {}).values())
        count = sum(c.count() for c in corpora)
        return {"name": name, "count": count,
                "dimension": cfg.dimension, "metric": cfg.metric,
                "quantization": cfg.quantization}

    def store_in_collection(self, name: str, key: str, embedding,
                            metadata: Optional[Dict[str, object]] = None
                            ) -> None:
        cfg = self.collection_config(name)
        vec = self._validate_vec(embedding, cfg.dimension)
        if cfg.dimension is None:
            with self._lock:
                self._collections[name] = replace(cfg, dimension=vec.size)
        data = TensorData()
        data.set(_EMBEDDING_FIELD, TensorValue.vector(vec))
        for n, v in (metadata or {}).items():
            data.set(n, TensorValue.scalar(v))
        self.store.put(f"{COLLECTION_PREFIX}{name}:{key}", data)

    def delete_from_collection(self, name: str, key: str) -> bool:
        self.collection_config(name)
        return self.store.delete(f"{COLLECTION_PREFIX}{name}:{key}")

    def search_in_collection(self, name: str, query, top_k: int,
                             metric: Optional[str] = None
                             ) -> List[SearchResult]:
        cfg = self.collection_config(name)
        return self._search_ns(
            f"col/{name}", query, top_k, metric or cfg.metric,
            quantization=cfg.quantization, dim_hint=cfg.dimension)

    def search_filtered_in_collection(self, name: str, query, top_k: int,
                                      filter_cond: FilterCondition,
                                      metric: Optional[str] = None
                                      ) -> List[SearchResult]:
        cfg = self.collection_config(name)
        return self._search_ns(
            f"col/{name}", query, top_k, metric or cfg.metric, filter_cond,
            quantization=cfg.quantization, dim_hint=cfg.dimension)

    def snapshot_collection(self, name: str, path) -> int:
        """Persist a collection's vectors+metadata to an .npz file."""
        self._flush_bulk_if_pending()
        self.collection_config(name)
        prefix = f"{COLLECTION_PREFIX}{name}:"
        keys, vecs, metas = [], [], []
        for full in self.store.scan(prefix):
            data = self.store.get(full)
            emb = data.get(_EMBEDDING_FIELD)
            if emb is None:
                continue
            keys.append(full[len(prefix):])
            vecs.append(emb.to_dense())
            metas.append({n: v.value for n, v in data.fields.items()
                          if n != _EMBEDDING_FIELD and v.kind == "scalar"})
        import json

        np.savez_compressed(
            path, keys=np.array(keys, dtype=object),
            vectors=np.array(vecs, dtype=np.float32) if vecs else
            np.zeros((0, 0), np.float32),
            metadata=json.dumps(metas))
        return len(keys)

    def load_collection_snapshot(self, name: str, path) -> int:
        import json

        if name not in self._collections:
            self.create_collection(name)
        blob = np.load(path, allow_pickle=True)
        keys = blob["keys"]
        vectors = blob["vectors"]
        metas = json.loads(str(blob["metadata"]))
        for key, vec, meta in zip(keys, vectors, metas):
            self.store_in_collection(name, str(key), vec, meta or None)
        return len(keys)
