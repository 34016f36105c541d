"""Query batcher: coalesce concurrent searches into one device call.

SURVEY.md §6 hard-parts (f): p99 < 5 ms serving needs persistent compiled
executables + batched query dispatch, not per-query device calls. The
batcher keeps fixed-size query buckets (so jit executables are reused),
collects requests for up to `max_wait_ms`, pads the batch to the bucket
size, runs ONE masked scan, and distributes per-query results back to
the waiting callers.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from neumann_tpu.engines.vector import SearchResult, VectorEngine

_BUCKETS = (1, 4, 16, 64, 256)


@dataclass
class _Request:
    query: np.ndarray
    top_k: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[SearchResult]] = None
    error: Optional[Exception] = None


class QueryBatcher:
    def __init__(self, engine: VectorEngine, dim: int,
                 metric: str = "cosine", max_wait_ms: float = 2.0,
                 max_batch: int = 256):
        self.engine = engine
        self.dim = dim
        self.metric = metric
        self.max_wait_s = max_wait_ms / 1e3
        self.max_batch = max_batch
        self._queue: List[_Request] = []
        self._lock = threading.Lock()
        self._kick = threading.Event()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_run = 0
        self.queries_served = 0

    # ------------------------------------------------------------------
    def warmup(self, top_ks=(10,)) -> int:
        """Precompile every bucket's executable (SURVEY §7 hard-part
        (f)): one synthetic batch_search per (bucket, k), so the first
        real batch at any size never pays trace+compile."""
        rng = np.random.default_rng(0)
        warmed = 0
        for b in _BUCKETS:
            if b > self.max_batch:
                break
            q = rng.standard_normal((b, self.dim)).astype(np.float32)
            for k in top_ks:
                self.engine.batch_search(q, k, self.metric)
                warmed += 1
        return warmed

    # ------------------------------------------------------------------
    def search(self, query, top_k: int,
               timeout_s: float = 30.0) -> List[SearchResult]:
        """Blocking search; coalesced with concurrent callers."""
        req = _Request(np.asarray(query, np.float32), top_k)
        with self._lock:
            self._queue.append(req)
        self._kick.set()
        if not req.event.wait(timeout_s):
            raise TimeoutError("batched search timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self) -> None:
        self._stop.set()
        self._kick.set()
        self._thread.join(timeout=2.0)

    # ------------------------------------------------------------------
    def _loop(self) -> None:
        while not self._stop.is_set():
            self._kick.wait()
            if self._stop.is_set():
                return
            # small collection window lets concurrent callers coalesce
            self._stop.wait(self.max_wait_s)
            with self._lock:
                batch = self._queue[: self.max_batch]
                self._queue = self._queue[self.max_batch:]
                if not self._queue:
                    self._kick.clear()
            if batch:
                self._run(batch)

    def _bucket(self, n: int) -> int:
        for b in _BUCKETS:
            if n <= b:
                return b
        return _BUCKETS[-1]

    def _run(self, batch: List[_Request]) -> None:
        try:
            bucket = self._bucket(len(batch))
            q = np.zeros((bucket, self.dim), np.float32)
            for i, req in enumerate(batch):
                if req.query.shape != (self.dim,):
                    raise ValueError(
                        f"query dim {req.query.shape} != ({self.dim},)")
                q[i] = req.query
            max_k = max(r.top_k for r in batch)
            # one device call for the whole bucket (padded rows produce
            # results that are simply dropped)
            all_results = self.engine.batch_search(q, max_k, self.metric)
            for i, req in enumerate(batch):
                req.result = all_results[i][: req.top_k]
                req.event.set()
            self.batches_run += 1
            self.queries_served += len(batch)
        except Exception as e:  # noqa: BLE001 — propagate to callers
            for req in batch:
                req.error = e
                req.event.set()
