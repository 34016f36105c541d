"""Query batcher: coalesce concurrent searches into one device call.

SURVEY.md §6 hard-parts (f): p99 < 5 ms serving needs persistent compiled
executables + batched query dispatch, not per-query device calls. The
batcher keeps fixed-size query buckets (so jit executables are reused),
collects requests for up to `max_wait_ms`, pads the batch to the bucket
size, runs ONE masked scan, and distributes per-query results back to
the waiting callers.

Round 5 additions (VERDICT r4 #6 + serving overhaul):

- **Multiple dispatch workers.** Each worker thread owns one in-flight
  device call; the dev tunnel overlaps concurrent D2H syncs almost
  perfectly (8 overlapped calls measured ~1 sync floor), so N workers
  multiply serving throughput by ~N while any worker is blocked in a
  result pull. The GIL is released during device waits, so workers
  don't fight Python-side.
- **Per-request validation at submit.** A bad dimension / top_k fails
  only the submitting caller, before it can join a cohort.
- **Failure isolation.** If a cohort's device call raises, the batch
  is retried per-request so only the offending request fails; the
  other 15 of a 16-way batch still succeed.
- **Keyed cohorts.** Requests carry (optional) FilterCondition; a
  worker groups its drain by filter so identical concurrent filtered
  SIMILAR queries share one masked scan. The batcher itself is keyed
  by (namespace, dim, metric) at the router, extending coalescing to
  collection/metric variants (router/router.py:_batcher_for).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from neumann_tpu.engines.vector import (
    FilterCondition,
    SearchResult,
    VectorEngine,
)

_BUCKETS = (1, 4, 16, 64, 256)


@dataclass
class _Request:
    query: np.ndarray
    top_k: int
    filter_cond: Optional[FilterCondition] = None
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[SearchResult]] = None
    error: Optional[Exception] = None
    # async completion hook (QueryStream serving): called exactly once
    # with (results, error) from a worker thread
    callback: Optional[object] = None

    def finish(self) -> None:
        self.event.set()
        if self.callback is not None:
            self.callback(self.result, self.error)


class BatcherClosed(RuntimeError):
    """The server is shutting down; the request was not executed."""


class QueryBatcher:
    def __init__(self, engine: VectorEngine, dim: int,
                 ns: str = "", metric: Optional[str] = "cosine",
                 max_wait_ms: float = 2.0,
                 max_batch: int = 256, workers: int = 4):
        self.engine = engine
        self.dim = dim
        self.ns = ns
        self.metric = metric
        self.max_wait_s = max_wait_ms / 1e3
        self.max_batch = max_batch
        self._queue: List[_Request] = []
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._loop, daemon=True,
                             name=f"batcher-{ns or 'emb'}-{dim}-{i}")
            for i in range(max(1, workers))]
        for t in self._threads:
            t.start()
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
                self.engine.batch_search_ns(q, k, self.metric, self.ns)
                warmed += 1
        return warmed

    # ------------------------------------------------------------------
    def search(self, query, top_k: int, timeout_s: float = 30.0,
               filter_cond: Optional[FilterCondition] = None
               ) -> List[SearchResult]:
        """Blocking search; coalesced with concurrent callers.

        Validation happens at submit, before the request can join a
        cohort, so a malformed query fails only its own caller."""
        req = self.submit(query, top_k, filter_cond)
        if not req.event.wait(timeout_s):
            raise TimeoutError("batched search timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def submit(self, query, top_k: int,
               filter_cond: Optional[FilterCondition] = None,
               callback=None) -> _Request:
        """Non-blocking enqueue; validation errors raise HERE (in the
        submitting thread). ``callback(results, error)`` fires from a
        worker thread on completion — the QueryStream pipelined-serving
        hook."""
        q = np.asarray(query, np.float32)
        if q.shape != (self.dim,):
            raise ValueError(f"query dim {q.shape} != ({self.dim},)")
        if top_k <= 0:
            raise ValueError("top_k must be positive")
        req = _Request(q, top_k, filter_cond, callback=callback)
        with self._cond:
            if self._stop.is_set():
                raise BatcherClosed("batcher is closed")
            self._queue.append(req)
            self._cond.notify()
        return req

    def close(self) -> None:
        """Drain: queued requests are still executed (workers keep
        processing until the queue is empty), then threads exit."""
        with self._cond:
            self._stop.set()
            self._cond.notify_all()
        for t in self._threads:
            t.join(timeout=10.0)
        # anything still queued (workers died / timed out): fail fast
        # instead of leaving callers to hit their 30 s timeout
        with self._cond:
            leftovers, self._queue = self._queue, []
        for req in leftovers:
            req.error = BatcherClosed("batcher closed before execution")
            req.finish()

    # ------------------------------------------------------------------
    def _loop(self) -> None:
        while True:
            with self._cond:
                while not self._queue and not self._stop.is_set():
                    self._cond.wait()
                if not self._queue:     # stopping and drained
                    return
                coalesce = (self.max_wait_s > 0
                            and len(self._queue) < 4
                            and not self._stop.is_set())
            if coalesce:
                # small collection window lets concurrent callers join
                # (skipped when load has already queued a real batch)
                time.sleep(self.max_wait_s)
            with self._cond:
                batch = self._queue[: self.max_batch]
                del self._queue[: len(batch)]
                if self._queue:
                    self._cond.notify()     # leftovers -> next worker
            if batch:
                self._run(batch)

    def _bucket(self, n: int) -> int:
        for b in _BUCKETS:
            if n <= b:
                return b
        return _BUCKETS[-1]

    def _run(self, batch: List[_Request]) -> None:
        # group by filter: identical concurrent filtered queries share
        # one masked scan; distinct filters run as separate cohorts
        groups: Dict[Optional[FilterCondition], List[_Request]] = {}
        for req in batch:
            groups.setdefault(req.filter_cond, []).append(req)
        for filt, cohort in groups.items():
            self._run_cohort(filt, cohort)

    def _run_cohort(self, filt: Optional[FilterCondition],
                    cohort: List[_Request]) -> None:
        try:
            bucket = self._bucket(len(cohort))
            q = np.zeros((bucket, self.dim), np.float32)
            for i, req in enumerate(cohort):
                q[i] = req.query
            max_k = max(r.top_k for r in cohort)
            # one device call for the whole cohort (padded rows produce
            # results that are simply dropped)
            all_results = self.engine.batch_search_ns(
                q, max_k, self.metric, self.ns, filter_cond=filt)
            for i, req in enumerate(cohort):
                req.result = all_results[i][: req.top_k]
                req.finish()
            self.batches_run += 1
            self.queries_served += len(cohort)
        except Exception as e:  # noqa: BLE001 — isolate, then propagate
            if len(cohort) == 1:
                cohort[0].error = e
                cohort[0].finish()
                return
            # failure isolation: re-run per request so only the
            # offending one fails (VERDICT r4 #6)
            for req in cohort:
                try:
                    req.result = self.engine.batch_search_ns(
                        req.query[None, :], req.top_k, self.metric,
                        self.ns, filter_cond=filt)[0]
                    self.queries_served += 1
                except Exception as e2:  # noqa: BLE001
                    req.error = e2
                req.finish()
