"""IVF index: k-means coarse quantizer + cluster-sorted corpus layout.

Capability parity with IVFIndex (tensor_store/src/ivf.rs:61-554: train /
add / search_with_nprobe, Flat or quantized storage per list). TPU-native
layout: instead of per-cluster inverted lists of pointers, the corpus is
REORDERED so each cluster's rows are contiguous, padded to a fixed
cluster stride. An nprobe search then:

  1. scores the query against the [k, d] centroid matrix (one matmul),
  2. takes the nprobe nearest clusters,
  3. dynamic-slices those contiguous row blocks out of HBM,
  4. runs the same masked matmul+top-k scan over just those rows.

Static shapes throughout (stride = max cluster size), so the whole search
jits. Exactness: identical to brute force when the true neighbors live in
probed clusters; recall vs nprobe is measured in tests.

Note (SURVEY.md §6 hard-parts): on one chip, brute MXU scan is often
faster than ANY pruning until corpora get huge — IVF matters when the
corpus outgrows HBM or for CPU-ish latencies. It is provided for parity
and for the sharded regime.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class IVFConfig:
    """Parity with IVFConfig::{flat,pq,binary}
    (tensor_store/src/ivf.rs:61-140): per-list storage is Flat f32,
    PQ codes (ADC scan), or packed sign bits (hamming scan)."""

    n_clusters: int = 64
    nprobe: int = 8
    iters: int = 20
    storage: str = "flat"        # flat | pq | binary
    pq_subspaces: int = 8

    @staticmethod
    def flat(n_clusters: int = 64) -> "IVFConfig":
        return IVFConfig(n_clusters=n_clusters)

    @staticmethod
    def pq(n_clusters: int = 64, n_subspaces: int = 8) -> "IVFConfig":
        return IVFConfig(n_clusters=n_clusters, storage="pq",
                         pq_subspaces=n_subspaces)

    @staticmethod
    def binary(n_clusters: int = 64) -> "IVFConfig":
        return IVFConfig(n_clusters=n_clusters, storage="binary")


def _padded_layout(v: np.ndarray, assign: np.ndarray, k: int):
    """Cluster-sorted padded layout, fully vectorized.

    Returns (buf [k*stride, d] same dtype as v, ids [k*stride] int32 with
    -1 padding, stride)."""
    counts = np.bincount(assign, minlength=k)
    stride = ((int(max(counts.max(), 1)) + 7) // 8) * 8
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.zeros(k, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    within = np.arange(len(v), dtype=np.int64) - starts[sorted_assign]
    pos = sorted_assign.astype(np.int64) * stride + within
    buf = np.zeros((k * stride, v.shape[1]), v.dtype)
    ids = np.full(k * stride, -1, np.int32)
    buf[pos] = v[order]
    ids[pos] = order.astype(np.int32)
    return buf, ids, stride


class IVFIndex:
    def __init__(self, dim: int, config: Optional[IVFConfig] = None):
        self.dim = dim
        self.config = config or IVFConfig()
        self.centroids: Optional[np.ndarray] = None  # [k, d]
        self._reordered = None     # device [k * stride, d] (flat)
        self._codes = None         # device [k * stride, M] (pq)
        self._bits = None          # device [k * stride, W] (binary)
        self._pq = None
        self._row_ids = None       # np [k * stride] original ids (-1 pad)
        self._stride = 0
        self._n = 0
        self._host_v = None        # np [n, d] originals (relayouts)
        self._counts = None        # np [k] rows per cluster

    def train(self, sample: np.ndarray) -> None:
        from neumann_tpu.parallel.partitioner import kmeans

        self.centroids = kmeans(np.asarray(sample, np.float32),
                                self.config.n_clusters, self.config.iters)

    def _assign(self, v: np.ndarray) -> np.ndarray:
        c = self.centroids
        d2 = (np.sum(v * v, 1)[:, None] - 2 * v @ c.T
              + np.sum(c * c, 1)[None, :])
        return np.argmin(d2, axis=1)

    def _encode_rows(self, rows: np.ndarray):
        """Rows -> the storage plane's dtype (f32 / PQ codes / bits)."""
        storage = self.config.storage
        if storage == "pq":
            return self._pq.encode(rows).astype(np.int32)
        if storage == "binary":
            import jax.numpy as jnp

            from neumann_tpu.ops.quant import binary_quantize

            return np.asarray(binary_quantize(jnp.asarray(rows)))
        return rows

    def _relayout(self, v: np.ndarray, assign: np.ndarray,
                  min_stride: int = 0) -> None:
        """Full cluster-sorted (re)layout with `min_stride` slack."""
        import jax.numpy as jnp

        k = len(self.centroids)
        buf, ids, stride = _padded_layout(v, assign, k)
        if min_stride > stride:
            # re-pad to the requested slack (amortized append room)
            counts = np.bincount(assign, minlength=k)
            stride = ((min_stride + 7) // 8) * 8
            order = np.argsort(assign, kind="stable")
            starts = np.zeros(k, np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            within = (np.arange(len(v), dtype=np.int64)
                      - starts[assign[order]])
            pos = assign[order].astype(np.int64) * stride + within
            buf = np.zeros((k * stride, v.shape[1]), v.dtype)
            ids = np.full(k * stride, -1, np.int32)
            buf[pos] = v[order]
            ids[pos] = order.astype(np.int32)
        storage = self.config.storage
        if storage == "pq":
            if self._pq is None:
                from neumann_tpu.ops.pq import PQCodebook, PQConfig

                self._pq = PQCodebook(v.shape[1], PQConfig(
                    n_subspaces=self.config.pq_subspaces))
                self._pq.train(v)
            self._codes = jnp.asarray(
                self._pq.encode(buf).astype(np.int32))
        elif storage == "binary":
            from neumann_tpu.ops.quant import binary_quantize

            self._bits = jnp.asarray(binary_quantize(jnp.asarray(buf)))
        else:
            self._reordered = jnp.asarray(buf)
        self._row_ids = ids
        self._stride = stride
        self._counts = np.bincount(assign, minlength=k)
        self._n = len(v)

    def add(self, vectors: np.ndarray):
        """APPEND vectors to a trained index (IVFIndex::add,
        tensor_store/src/ivf.rs:276) — no full rebuild per call. The
        first call lays out the cluster-sorted padded buffer; later
        calls scatter rows into their clusters' padding slack, and
        only a cluster OVERFLOW triggers an amortized stride-doubling
        relayout. Returns the new row id (1-D input) or ids array."""
        import jax.numpy as jnp

        if self.centroids is None:
            raise ValueError("train() first")
        v = np.asarray(vectors, np.float32)
        single = v.ndim == 1
        if single:
            v = v[None, :]
        assign = self._assign(v)
        if self._host_v is None:          # first add: full layout
            self._host_v = v.copy()
            self._relayout(v, assign)
            ids = np.arange(len(v))
            return int(ids[0]) if single else ids
        base = self._n
        ids = np.arange(base, base + len(v))
        all_v = np.concatenate([self._host_v, v])
        new_counts = self._counts.copy()
        np.add.at(new_counts, assign, 1)
        if int(new_counts.max()) > self._stride:
            # amortized: relayout with doubled headroom
            all_assign = np.concatenate(
                [self._assign(self._host_v), assign])
            self._host_v = all_v
            self._relayout(all_v, all_assign,
                           min_stride=2 * int(new_counts.max()))
            return int(ids[0]) if single else ids
        # in-place append into each cluster's slack slots
        order = np.argsort(assign, kind="stable")
        srt = assign[order]
        run_start = np.searchsorted(srt, srt, side="left")
        within = np.arange(len(v), dtype=np.int64) - run_start
        pos = (srt.astype(np.int64) * self._stride
               + self._counts[srt] + within)
        rows = self._encode_rows(v[order])
        plane = ("_codes" if self.config.storage == "pq" else
                 "_bits" if self.config.storage == "binary" else
                 "_reordered")
        buf = getattr(self, plane)
        setattr(self, plane,
                buf.at[jnp.asarray(pos)].set(jnp.asarray(rows)))
        self._row_ids[pos] = ids[order].astype(np.int32)
        self._counts = new_counts
        self._host_v = all_v
        self._n += len(v)
        return int(ids[0]) if single else ids

    def search(self, queries: np.ndarray, k: int,
               nprobe: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Cosine top-k over the nprobe nearest clusters per query."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        if (self._reordered is None and self._codes is None
                and self._bits is None):
            raise ValueError("add() first")
        nprobe = min(nprobe or self.config.nprobe, len(self.centroids))
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        stride = self._stride
        cj = jnp.asarray(self.centroids)
        valid = jnp.asarray(self._row_ids >= 0)
        storage = self.config.storage

        @functools.partial(jax.jit,
                           static_argnames=("k", "nprobe", "storage"))
        def run(corpus, cents, valid, qs, aux, k, nprobe, storage):
            qn = qs / jnp.maximum(
                jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
            cn = cents / jnp.maximum(
                jnp.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
            _, probe = lax.top_k(qn @ cn.T, nprobe)   # [Q, nprobe]

            def one_query(qvec, probes, qaux):
                def gather(cidx):
                    block = lax.dynamic_slice(
                        corpus, (cidx * stride, 0),
                        (stride, corpus.shape[1]))
                    vmask = lax.dynamic_slice(valid, (cidx * stride,),
                                              (stride,))
                    return block, vmask, cidx * stride
                blocks, vmasks, bases = jax.vmap(gather)(probes)
                cand = blocks.reshape(-1, corpus.shape[1])
                cmask = vmasks.reshape(-1)
                pos = (bases[:, None]
                       + jnp.arange(stride)[None, :]).reshape(-1)
                if storage == "pq":
                    # qaux = [M, 256] ADC table; cand = int32 codes
                    per = qaux[jnp.arange(cand.shape[1])[None, :], cand]
                    scores = -jnp.sum(per, axis=1)
                elif storage == "binary":
                    # qaux = packed query bits [W]; cand = uint32 words
                    x = lax.population_count(cand ^ qaux[None, :])
                    scores = -jnp.sum(x.astype(jnp.int32),
                                      axis=1).astype(jnp.float32)
                else:
                    cn2 = jnp.maximum(
                        jnp.linalg.norm(cand, axis=1), 1e-30)
                    scores = (cand @ qvec) / (
                        cn2 * jnp.maximum(jnp.linalg.norm(qvec), 1e-30))
                scores = jnp.where(cmask, scores, -jnp.inf)
                kk = min(k, scores.shape[0])
                s, i = lax.top_k(scores, kk)
                return s, pos[i]

            return jax.vmap(one_query)(qs, probe, aux)

        if storage == "pq":
            corpus = self._codes
            aux = jnp.asarray(np.stack(
                [self._pq.compute_adc_table(qq) for qq in q]))
        elif storage == "binary":
            from neumann_tpu.ops.quant import binary_quantize

            corpus = self._bits
            aux = binary_quantize(jnp.asarray(q))
        else:
            corpus = self._reordered
            aux = jnp.zeros((q.shape[0], 1), jnp.float32)
        s, pos = run(corpus, cj, valid, jnp.asarray(q), aux, k, nprobe,
                     storage)
        from neumann_tpu.ops.scan import host_pull

        s, pos = host_pull(s, pos)
        ids = np.where(pos >= 0, self._row_ids[np.maximum(pos, 0)], -1)
        ids = np.where(np.isneginf(s), -1, ids)
        return s, ids.astype(np.int32)

    def search_with_nprobe(self, queries: np.ndarray, k: int,
                           nprobe: int
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """Name parity with IVFIndex::search_with_nprobe (ivf.rs:325)."""
        return self.search(queries, k, nprobe)

    @property
    def n_vectors(self) -> int:
        return self._n


def window_mean_centroids(buf, rmult, window: int,
                          chunk_rows: int = 1 << 18):
    """Per-window probe centroids for a FIXED-window layout.

    buf [n_pad, d] int8 cluster-sorted corpus, rmult [n_pad] f32 cosine
    row multipliers (row x rmult = unit row; 0 = padding). Returns a
    device [n_pad/window, d] f32 array: the normalized mean of each
    window's unit rows (zero for all-padding windows, which then
    attract no probes). Computed on device in row chunks so the f32
    upcast never materializes more than chunk_rows x d.
    """
    import jax
    import jax.numpy as jnp

    n_pad, d = buf.shape
    if n_pad % window:
        raise ValueError(f"n_pad {n_pad} not a multiple of window "
                         f"{window}")
    chunk_rows = max(window, (chunk_rows // window) * window)
    n_w = n_pad // window

    @functools.partial(jax.jit, static_argnames="rows")
    def sums_of(buf_c, rm_c, rows):
        x = buf_c.astype(jnp.float32) * rm_c[:, None]
        return jnp.sum(x.reshape(rows // window, window, d), axis=1)

    parts = []
    for s in range(0, n_pad, chunk_rows):
        rows = min(chunk_rows, n_pad - s)
        parts.append(sums_of(
            jax.lax.dynamic_slice(buf, (s, 0), (rows, d)),
            jax.lax.dynamic_slice(rmult, (s,), (rows,)), rows))
    sums = jnp.concatenate(parts, axis=0)
    norm = jnp.linalg.norm(sums, axis=1, keepdims=True)
    cents = jnp.where(norm > 0, sums / jnp.maximum(norm, 1e-30), 0.0)
    assert cents.shape[0] == n_w
    return cents


class DeviceIVFInt8:
    """IVF over a device-resident int8 corpus, built for the single-query
    latency target (north star: p99 < 5 ms on 10M x 768).

    A brute scan reads the whole corpus (~12 ms at 10M int8 on one v5e
    chip); an nprobe search reads only ~nprobe/n_clusters of it.

    Layout: WINDOWED cluster-sorted — rows sorted by cluster id into a
    buffer of EXACTLY corpus size (no per-cluster padding, so a skewed
    cluster histogram can't blow up HBM like a padded layout would).
    Each probe reads a fixed-width window starting at its cluster's
    offset (clamped); the window covers the whole cluster and may spill
    into neighbors — spillover rows are real corpus rows scored
    correctly, so they only ADD candidates. Duplicate candidates from
    overlapping windows are deduped host-side.

    FIXED-window mode (``build(..., fixed_window=w)``, the default via
    ``fixed_window="auto"``): instead of one window per k-means cluster
    sized to the FATTEST cluster, the sorted corpus is chopped into
    disjoint windows of exactly ``w`` rows and each window's probe
    centroid is the normalized mean of its rows
    (window_mean_centroids). K-means then only determines the SORT
    ORDER; cluster-size skew cannot blow up the window (measured 6x at
    10M/4096 under plain Lloyd's), every probe reads exactly w rows,
    windows never overlap (so rerank needs no dedup), and a fat
    cluster simply spans several adjacent windows whose near-identical
    centroids rank adjacently under the query's top-nprobe.
    """

    def __init__(self, dim: int, n_clusters: int = 1024,
                 nprobe: int = 32, iters: int = 12,
                 max_read_frac: float = 0.02):
        self.dim = dim
        self.n_clusters = n_clusters
        # cap on the corpus fraction one query reads through the
        # windowed path: the cluster-unit nprobe config scales the
        # intended fraction with n (64/1024 clusters = 6.25% of ANY
        # corpus), which over-probes big corpora badly — at 10M x 768
        # it meant 611 windows (625K rows) per query, recall long
        # saturated (the bench curve saturates by ~0.7% read on
        # clustered data). 2% keeps small-corpus behavior unchanged
        # and bounds the big-corpus read volume.
        self.max_read_frac = max_read_frac
        self._kmeans_k = n_clusters  # survives the fixed-window
        # overwrite of n_clusters so compact()/re-build() train the
        # intended k-means, not one-per-window
        self.nprobe = nprobe
        self._nprobe_cfg = nprobe   # cluster-unit config (see build)
        self.iters = iters
        self.centroids = None      # device [k, d] f32 (unit norm)
        self._buf = None           # device [n, d] int8, cluster-sorted
        self._rmult = None         # device [n] f32 (0 = invalid row)
        self._scale = None         # device [n] f32 sorted int8 scales
        self._rbuf = None          # optional residual int8 plane
        self._rscale = None        # optional residual scales
        self._starts = None        # device [k] int32 window starts
        self._row_ids = None       # host  [n] int32 (sorted order)
        self._window = 0
        self._fixed = False        # disjoint fixed windows (no dedup)
        self._n = 0
        # incremental mutation state (add/delete — ivf.rs:276 parity):
        # appended rows live in a device DELTA plane scanned exactly
        # and merged over the windowed results; deletes tombstone rmult
        self._dbuf = None          # device [cap, d] int8 delta rows
        self._drmult = None        # device [cap] f32 (0 = empty slot)
        self._dscale = None        # device [cap] f32
        self._dn = 0               # filled delta slots
        self._dids = None          # host [cap] int64 delta row ids
        self._next_id = 0          # id counter (continues build ids)
        self._pos_of = None        # host inverse: original id -> pos
        self._deleted = 0          # live tombstone count
        self._dead_ids = set()     # ids tombstoned (idempotence)

    @classmethod
    def from_device_layout(cls, dim, centroids, buf, rmult, starts,
                           row_ids, window, nprobe=32, scale=None,
                           residual=None, fixed=False):
        """Assemble from an already cluster-sorted device corpus (used
        when the corpus is born sorted and host staging is too slow).
        ``residual`` = (rq [n, d] int8, rscale [n] f32) in the SAME
        sorted order enables ~int16-fidelity reranking. fixed=True
        marks a disjoint fixed-window layout (skips rerank dedup)."""
        ivf = cls(dim, n_clusters=int(centroids.shape[0]), nprobe=nprobe)
        ivf.centroids = centroids
        ivf._buf = buf
        ivf._rmult = rmult
        ivf._scale = scale
        if residual is not None:
            ivf._rbuf, ivf._rscale = residual
        ivf._starts = starts
        ivf._row_ids = row_ids
        ivf._window = int(window)
        ivf._fixed = bool(fixed)
        ivf._n = int(buf.shape[0])
        ivf._next_id = (int(np.max(row_ids)) + 1
                        if row_ids is not None and len(row_ids)
                        else ivf._n)
        return ivf

    def build(self, corpus_q: np.ndarray, corpus_scale: np.ndarray,
              sample_rows: int = 200_000, seed: int = 0,
              chunk_rows: int = 1 << 20,
              sample_mask: Optional[np.ndarray] = None,
              residual: Optional[Tuple[np.ndarray, np.ndarray]] = None,
              fixed_window="auto",
              ) -> None:
        """corpus_q int8 [N, d] and per-row scale, both on HOST.
        sample_mask limits the k-means training sample to true rows
        (e.g. the slab valid mask — padding rows would otherwise pull
        centroids toward zero). ``residual`` = (rq, rscale) host arrays
        in CORPUS order (ops.rerank.residual_quantize) — stored sorted
        alongside the corpus so the rerank pass reconstructs rows at
        ~int16 fidelity.

        fixed_window: "auto" (default) or an int multiple of 128 —
        disjoint fixed-size windows with window-mean probe centroids
        (see class docstring); None/0 keeps the legacy one-window-per-
        cluster layout sized to the fattest cluster."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        from neumann_tpu.parallel.partitioner import kmeans

        import os
        import sys as _sys
        import time as _time
        _t0 = _time.time()
        _dbg = os.environ.get("NEUMANN_IVF_BUILD_DEBUG") == "1"

        def _stage(msg):
            if _dbg:
                print(f"[ivf-build +{_time.time() - _t0:6.1f}s] {msg}",
                      file=_sys.stderr, flush=True)

        n, d = corpus_q.shape
        rng = np.random.default_rng(seed)
        pool = (np.flatnonzero(sample_mask)
                if sample_mask is not None else np.arange(n))
        if pool.size == 0:
            pool = np.arange(n)
        pick = rng.choice(pool, size=min(sample_rows, pool.size),
                          replace=False)
        sample = corpus_q[pick].astype(np.float32) \
            * corpus_scale[pick][:, None]
        sample /= np.maximum(
            np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
        _stage("kmeans sample ready")
        kk_means = getattr(self, "_kmeans_k", None) or self.n_clusters
        if sample.size >= (1 << 24):
            # big samples train on device (the bench-build path:
            # random init + balance reseeding, ~7 s at 10M/4096).
            # partitioner.kmeans's k-means++ seeding is a k-step host
            # loop over the whole sample — measured MINUTES at
            # k=1024 x 200K x 768 (the r5 10M serving-warmup stall)
            from neumann_tpu.parallel.partitioner import kmeans_device

            cents = np.array(kmeans_device(jnp.asarray(sample),
                                           kk_means, self.iters))
        else:
            cents = np.array(kmeans(sample, kk_means, self.iters))
        cents /= np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
        self.centroids = jnp.asarray(cents)

        # chunked device assignment: nearest centroid by cosine
        @jax.jit
        def assign_chunk(chunk_q, cents):
            # NOTE assignment precision is correctness-coupled: rows
            # must land in the window the QUERY-side (f32) probe
            # scoring would rank first, or thin-margin rows become
            # unreachable (a bf16 variant measurably broke self-query
            # recall on random data). argmax is scale-invariant, so
            # the rsqrt normalize is kept only for f32 conditioning.
            x = chunk_q.astype(jnp.float32)
            inv = lax.rsqrt(jnp.maximum(
                jnp.sum(x * x, axis=1, keepdims=True), 1e-30))
            return jnp.argmax((x * inv) @ cents.T, axis=1).astype(
                jnp.int32)

        _stage("kmeans done; assigning")
        assign = np.empty(n, np.int32)
        for s in range(0, n, chunk_rows):
            e = min(n, s + chunk_rows)
            assign[s:e] = np.asarray(
                assign_chunk(jnp.asarray(corpus_q[s:e]), self.centroids))

        # layout: cluster-sorted buffer of exactly corpus size. Fixed-
        # window mode chops it into disjoint w-row windows (starts =
        # arange * w, probe centroids = window means, computed below
        # once the device buffer exists); legacy mode sizes one window
        # per cluster to the fattest cluster, starts rounded DOWN to
        # 128 rows and the window padded up by 128 so every probe is
        # whole 128-row blocks — the layout the Pallas probe kernel's
        # scalar-prefetch block indexing needs (and harmless for the
        # XLA path: extra rows are real rows).
        _stage("assignment done")
        counts = np.bincount(assign, minlength=kk_means)
        order = np.argsort(assign, kind="stable").astype(np.int32)
        if fixed_window:
            if fixed_window == "auto":
                avg = max(1, n // max(1, kk_means))
                window = int(min(1024, max(128,
                                           -(-avg // 128) * 128)))
            else:
                window = int(fixed_window)
                if window % 128:
                    raise ValueError("fixed_window must be a "
                                     "multiple of 128")
            n_pad = -(-n // window) * window
            starts = (np.arange(n_pad // window, dtype=np.int32)
                      * window)
        else:
            starts = np.zeros(kk_means, np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            window = int(((max(int(counts.max()), 1) + 127) // 128)
                         * 128 + 128)
            n_pad = ((n + 127) // 128) * 128
            window = min(window, n_pad)
            starts = ((np.clip(starts, 0, max(0, n_pad - window))
                       // 128) * 128).astype(np.int32)

        # Relayout ON DEVICE by chunked scatter: each host chunk is
        # uploaded once and scattered straight to its sorted position
        # (inverse permutation), so the host never pays the [N, d]
        # fancy-gather passes and peak HBM is target + one chunk
        # (a host-side `corpus_q[order]` + full asarray measured
        # ~10x the build time at 10M x 768 over the dev tunnel).
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _scatter(buf, rows, chunk):
            return buf.at[rows].set(chunk)

        def _scatter_plane(src, fill=0):
            buf = jnp.full((n_pad, d), fill, src.dtype)
            for s in range(0, n, chunk_rows):
                e = min(n, s + chunk_rows)
                buf = _scatter(buf, jnp.asarray(inv[s:e]),
                               jnp.asarray(src[s:e]))
            return buf

        _stage("scattering main plane")
        self._buf = _scatter_plane(corpus_q)
        # scale/rm are [N]-sized: host gathers are cheap there, and the
        # cosine multiplier comes from ONE device pass over the sorted
        # int8 buffer instead of a host einsum over the f32 view
        sc_sorted = corpus_scale[order].astype(np.float32)
        if n_pad != n:       # pad to whole 128-row blocks (rm 0 = masked)
            sc_sorted = np.concatenate(
                [sc_sorted, np.ones(n_pad - n, np.float32)])
        self._scale = jnp.asarray(sc_sorted)

        @jax.jit
        def _rmult_of(buf, scale):
            sq = jnp.sum(buf.astype(jnp.float32) ** 2, axis=1) \
                * scale ** 2
            return jnp.where(
                sq > 0, scale * lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)

        _stage("main plane scattered")
        self._rmult = _rmult_of(self._buf, self._scale)
        if residual is not None:
            rq, rsc = residual
            _stage("scattering residual plane")
            self._rbuf = _scatter_plane(rq)
            rsc_sorted = rsc[order].astype(np.float32)
            if n_pad != n:
                rsc_sorted = np.concatenate(
                    [rsc_sorted, np.ones(n_pad - n, np.float32)])
            self._rscale = jnp.asarray(rsc_sorted)
        _stage("planes on device")
        self._starts = jnp.asarray(starts)
        self._row_ids = order
        self._window = window
        self._fixed = bool(fixed_window)
        if self._fixed:
            # probe domain becomes the windows: their normalized mean
            # rows replace the k-means centroids (which only chose the
            # sort order above)
            self.centroids = window_mean_centroids(
                self._buf, self._rmult, window)
            k_kmeans = kk_means
            self.n_clusters = int(self.centroids.shape[0])
            # recalibrate the default nprobe from cluster units to
            # window units so the intended READ FRACTION survives the
            # layout change: "probe 64 of 1024 clusters" meant reading
            # ~64 * (n/1024) rows; that is 64 * avg/window windows
            avg = max(1, n // max(1, k_kmeans))
            # floor 64: the cap exists to stop the cluster-unit
            # fraction from scaling reads with n (611 windows/query at
            # 10M); small corpora never reach it, so their recall and
            # layout-parity behavior are unchanged
            cap = max(64, int(self.max_read_frac * n) // window)
            self.nprobe = int(max(1, min(
                self.n_clusters, cap,
                -(-self._nprobe_cfg * avg // window))))
        self._n = n
        self._next_id = n
        self._dbuf = self._drmult = self._dscale = self._dids = None
        self._dn = self._deleted = 0
        self._dead_ids = set()
        self._pos_of = None

    # ------------------------------------------------------------------
    # incremental mutation (IVFIndex::add, tensor_store/src/ivf.rs:276;
    # deletes are the tombstone side of the same contract)
    #
    # Adds are O(added), NOT O(N): new rows are quantized and appended
    # to a device-resident DELTA plane (capacity-doubled, in-place
    # donated writes). Searches scan the delta EXACTLY (it is small
    # between compactions — an exact scan of <=10% of the corpus rides
    # the same HBM pass economics as the rerank gather) and merge over
    # the windowed probe results, so a just-added row is immediately
    # findable at full fidelity. Deletes zero the row's cosine
    # multiplier (first pass scores it -inf; the rerank's first_scores
    # mask propagates the -inf), in main and delta planes alike.
    # compact() folds the delta back into the windowed layout.
    # ------------------------------------------------------------------
    _DELTA_MIN_CAP = 1024

    def _quant_rows(self, v: np.ndarray):
        v = np.asarray(v, np.float32)
        if v.ndim == 1:
            v = v[None, :]
        absmax = np.max(np.abs(v), axis=1)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0
                         ).astype(np.float32)
        q = np.clip(np.round(v / scale[:, None]), -127, 127
                    ).astype(np.int8)
        sq = np.sum((q.astype(np.float32) * scale[:, None]) ** 2,
                    axis=1)
        rm = np.where(sq > 0, scale / np.sqrt(np.maximum(sq, 1e-30)),
                      0.0).astype(np.float32)
        return q, scale, rm

    def _ensure_delta(self, extra: int) -> None:
        import jax.numpy as jnp
        from jax import lax

        need = self._dn + extra
        cap = 0 if self._dbuf is None else int(self._dbuf.shape[0])
        if need <= cap:
            return
        new_cap = max(self._DELTA_MIN_CAP,
                      1 << (need - 1).bit_length())
        db = jnp.zeros((new_cap, self.dim), jnp.int8)
        drm = jnp.zeros(new_cap, jnp.float32)
        dsc = jnp.ones(new_cap, jnp.float32)
        dids = np.full(new_cap, -1, np.int64)
        if cap:
            db = lax.dynamic_update_slice(db, self._dbuf, (0, 0))
            drm = lax.dynamic_update_slice(drm, self._drmult, (0,))
            dsc = lax.dynamic_update_slice(dsc, self._dscale, (0,))
            dids[:cap] = self._dids
        self._dbuf, self._drmult, self._dscale = db, drm, dsc
        self._dids = dids

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Append rows WITHOUT rebuilding (ivf.rs:276 `add`): O(added).
        Returns the new rows' ids (continuing the build numbering);
        they are immediately searchable via the exact delta merge."""
        import functools as _ft

        import jax
        import jax.numpy as jnp
        from jax import lax

        if self._buf is None:
            raise ValueError("build() first")
        q, scale, rm = self._quant_rows(vectors)
        m = q.shape[0]
        if q.shape[1] != self.dim:
            raise ValueError(f"dim {q.shape[1]} != index dim "
                             f"{self.dim}")
        self._ensure_delta(m)

        @_ft.partial(jax.jit, donate_argnums=(0, 1, 2),
                     static_argnames="rows")
        def write(db, drm, dsc, qd, rmd, scd, start, rows):
            return (lax.dynamic_update_slice(db, qd, (start, 0)),
                    lax.dynamic_update_slice(drm, rmd, (start,)),
                    lax.dynamic_update_slice(dsc, scd, (start,)))

        self._dbuf, self._drmult, self._dscale = write(
            self._dbuf, self._drmult, self._dscale,
            jnp.asarray(q), jnp.asarray(rm), jnp.asarray(scale),
            jnp.int32(self._dn), m)
        ids = np.arange(self._next_id, self._next_id + m, dtype=np.int64)
        self._dids[self._dn: self._dn + m] = ids
        self._dn += m
        self._next_id += m
        return ids

    def _main_pos_of(self, ids: np.ndarray) -> np.ndarray:
        """Sorted-buffer positions of original row ids (-1 = unknown)."""
        if self._pos_of is None:
            rid = np.asarray(self._row_ids, np.int64)
            inv = np.full(int(rid.max()) + 1 if rid.size else 0, -1,
                          np.int64)
            inv[rid] = np.arange(rid.size)
            self._pos_of = inv
        inv = self._pos_of
        ids = np.asarray(ids, np.int64)
        ok = (ids >= 0) & (ids < inv.shape[0])
        out = np.full(ids.shape, -1, np.int64)
        out[ok] = inv[ids[ok]]
        return out

    def delete(self, ids) -> int:
        """Tombstone rows by id: their cosine multiplier goes to 0, so
        every scan (windowed first pass, delta scan, rerank via the
        first_scores mask) treats them as invalid. O(batch) + one
        rmult copy; no relayout. Returns the number tombstoned."""
        import jax.numpy as jnp

        if self._buf is None:
            raise ValueError("build() first")
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        ids = ids[[int(i) not in self._dead_ids for i in ids]]
        if ids.size == 0:
            return 0
        removed = 0
        pos = self._main_pos_of(ids)
        main = pos[pos >= 0]
        if main.size:
            self._rmult = self._rmult.at[jnp.asarray(main)].set(0.0)
            self._dead_ids.update(int(i) for i in ids[pos >= 0])
            removed += int(main.size)
        if self._dn:
            want = np.isin(self._dids[:self._dn], ids)
            slots = np.flatnonzero(want)
            if slots.size:
                self._dead_ids.update(int(i)
                                      for i in self._dids[slots])
                self._drmult = self._drmult.at[
                    jnp.asarray(slots)].set(0.0)
                self._dids[slots] = -1
                removed += int(slots.size)
        self._deleted += removed
        return removed

    def _delta_topk(self, qd, k: int):
        """Exact f32 cosine top-k over the delta plane; returns host
        (scores [Q, k], original ids [Q, k] with -1 sentinels)."""
        import jax

        from neumann_tpu.ops.quant import int8_exact_topk

        rows = int(self._dbuf.shape[0])
        s, pos = jax.jit(int8_exact_topk,
                         static_argnames=("k", "block_rows"))(
            self._dbuf, self._drmult, qd, min(k, rows),
            block_rows=max(8192, rows))
        s = np.asarray(s)
        pos = np.asarray(pos)
        ids = np.where(pos >= 0, self._dids[np.maximum(pos, 0)], -1)
        ids = np.where(np.isneginf(s) | (ids < 0), -1, ids)
        s = np.where(ids < 0, -np.inf, s)
        return s, ids.astype(np.int64)

    @staticmethod
    def _merge_topk(s1, ids1, s2, ids2, k: int):
        s = np.concatenate([s1, s2], axis=1)
        ids = np.concatenate([np.asarray(ids1, np.int64),
                              np.asarray(ids2, np.int64)], axis=1)
        order = np.argsort(-s, axis=1, kind="stable")[:, :k]
        s = np.take_along_axis(s, order, axis=1)
        ids = np.take_along_axis(ids, order, axis=1)
        return s, np.where(np.isfinite(s), ids, -1)

    def compact(self, sample_rows: int = 200_000, seed: int = 0) -> int:
        """Fold the delta plane and tombstones back into a fresh
        windowed layout (the 'periodic compaction' side of the
        incremental contract — O(N), amortized over >=10% growth).
        Row ids are PRESERVED. The residual plane (if any) is dropped —
        rebuild with ``build(..., residual=...)`` to restore it.
        Returns the live row count."""
        if self._buf is None:
            raise ValueError("build() first")
        if self._scale is None:
            raise ValueError("compact() needs per-row scales; this "
                             "index was assembled from a device "
                             "layout without them")
        rm = np.asarray(self._rmult)
        live = rm > 0
        n0 = min(self._n, live.shape[0])
        keep = np.flatnonzero(live[:n0])
        bufs = [np.asarray(self._buf)[keep]]
        scales = [np.asarray(self._scale)[keep]]
        all_ids = [np.asarray(self._row_ids, np.int64)[keep]]
        if self._dn:
            drm = np.asarray(self._drmult[:self._dn])
            dkeep = np.flatnonzero(drm > 0)
            if dkeep.size:
                bufs.append(np.asarray(self._dbuf)[dkeep])
                scales.append(np.asarray(self._dscale)[dkeep])
                all_ids.append(self._dids[dkeep])
        corpus_q = np.concatenate(bufs, axis=0)
        corpus_scale = np.concatenate(scales, axis=0)
        ids = np.concatenate(all_ids, axis=0)
        next_id = self._next_id
        self.build(corpus_q, corpus_scale, sample_rows=sample_rows,
                   seed=seed,
                   fixed_window=self._window if self._fixed else None)
        # build() numbers rows 0..n-1 in CORPUS order; restore the
        # caller-visible ids through the sort permutation
        order = self._row_ids            # sorted-pos -> corpus row
        self._row_ids = ids[order].astype(np.int64)
        self._pos_of = None
        self._next_id = next_id
        return int(ids.size)

    @property
    def n_live(self) -> int:
        return self._n + self._dn - self._deleted

    # each query's probe gather materializes [nprobe, window, d]
    # candidates in HBM, so a wide vmap would blow memory at 10M scale
    # (measured: Q=64 -> ~32 GB); queries stream in small chunks
    _SEARCH_CHUNK_Q = 4

    def search(self, queries: np.ndarray, k: int,
               nprobe: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from neumann_tpu.ops.rerank import gather_rerank_topk_jit

        if self._buf is None:
            raise ValueError("build() first")
        nprobe = min(nprobe or self.nprobe, self.n_clusters)
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        # oversample the first pass: overlapping windows can yield the
        # same position more than once, and the rerank pass reorders —
        # the device-side dedup + exact top-k keeps the best k distinct
        kk = min(4 * k + 16, self._window * nprobe)
        s_parts, p_parts = [], []
        for s0 in range(0, q.shape[0], self._SEARCH_CHUNK_Q):
            qc = jnp.asarray(q[s0: s0 + self._SEARCH_CHUNK_Q])
            sc, pc = windowed_ivf_topk(
                self._buf, self._rmult, self.centroids, self._starts,
                qc, kk, nprobe, self._window, aligned128=True)
            # second pass: gather the kk candidates and rescore in f32
            # against the unquantized query (the first pass scored in
            # bf16 against an int8 corpus); dedups on device (fixed
            # windows are disjoint -> no duplicates possible)
            sc, pc = gather_rerank_topk_jit(
                self._buf, pc, qc, k, "cosine", scale=self._scale,
                residual_q=self._rbuf, residual_scale=self._rscale,
                first_scores=sc, dedup=not self._fixed)
            from neumann_tpu.ops.scan import host_pull

            sc, pc = host_pull(sc, pc)   # one tunnel floor, not two
            s_parts.append(sc)
            p_parts.append(pc)
        s = np.concatenate(s_parts, axis=0)
        pos = np.concatenate(p_parts, axis=0)
        ids = np.where(pos >= 0,
                       np.asarray(self._row_ids)[np.maximum(pos, 0)], -1)
        if self._dn:        # merge the exact delta-plane scan
            sd, idd = self._delta_topk(jnp.asarray(q), k)
            s, ids = self._merge_topk(s, ids, sd, idd, k)
        return s, ids.astype(np.int32)

    def search_batched(self, queries: np.ndarray, k: int,
                       nprobe: Optional[int] = None,
                       m: Optional[int] = None,
                       q_cap: Optional[int] = None, group: int = 8,
                       fast: Optional[bool] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Throughput search: probe-sharing batched IVF + exact rerank.

        The latency path (search) gathers per-query candidate windows;
        this path streams each cluster window from HBM once per BATCH
        and scores it against only the queries that probed it
        (batched_ivf_topk), then reranks candidates in f32 (+residual
        plane when built) via the chunked rerank. Queries are padded to
        power-of-two buckets so compile count stays bounded; q_cap
        (max queries per cluster) starts at 4x the uniform expectation
        and doubles on overflow (skewed query batches).

        fast (default: auto = fixed windows and a 128-multiple window):
        the VMEM-fused Pallas first pass — pooled-bits selection inside
        the window matmul, approx probe top-k, and a pool-expanded
        exact rerank. Same recall contract (exact f32 rerank decides
        the final order; pool expansion makes pooled selection
        collision-exact), measured 2.7x the XLA scan core at the 10M
        bench shape. Interpreted (slow, correct) off-TPU."""
        import jax.numpy as jnp

        from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

        if self._buf is None:
            raise ValueError("build() first")
        if fast is None:
            pool_a = self._window // 128
            # k cap: the packed-bits presel yields at most 512 distinct
            # candidates/query (top-2 over 256 lane-pools) — plenty for
            # serving k's, not for bulk exports
            fast = (self._fixed and self._window % 128 == 0
                    and pool_a >= 2 and (pool_a & (pool_a - 1)) == 0
                    and k <= 128)
        nprobe = min(nprobe or self.nprobe, self.n_clusters)
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        q_pad = max(8, 1 << (nq - 1).bit_length())
        if q_pad != nq:
            q = np.concatenate(
                [q, np.zeros((q_pad - nq, q.shape[1]), np.float32)])
        valid = jnp.arange(q_pad) < nq
        if m is None:
            m = min(k + 6, self._window)
        if q_cap is None:
            # kernel MACs scale with q_cap; 3x the uniform expectation
            # rounded to a 64-multiple absorbs realistic query skew
            # (the overflow loop below doubles on the rest) without
            # the up-to-8x padding a power-of-two round-up costs
            expect = -(-q_pad * nprobe // self.n_clusters)
            q_cap = max(64, -(-(3 * expect) // 64) * 64) \
                if q_pad > 64 else \
                (1 << (max(16, 4 * expect) - 1).bit_length())
        qd = jnp.asarray(q)
        pool = self._window // 128 if fast else 0
        sel = pool if fast else "approx"
        fused = "pallas" if fast else False
        pmode = ("pool" if nprobe < self.n_clusters else "exact") \
            if fast else "exact"
        # fast path: the top-2-per-pool kernel + packed-bits presel
        # keep only O(3k) candidates per query, so the rerank gather
        # is tiny and needs no pool expansion (ops/ivf._batched_core
        # presel docstring)
        presel_n = min(max(3 * k + 2, 32), nprobe * 256) if fast else 0
        while True:
            sc, pos, overflow = batched_ivf_topk(
                self._buf, self._rmult, self.centroids, self._starts,
                qd, nprobe, self._window, m, q_cap, group=group,
                valid_q=valid, selection=sel, fused=fused,
                probe_mode=pmode, presel=presel_n)
            if int(overflow) == 0 or q_cap >= q_pad:
                break  # q_cap == q_pad can never overflow (probes
                # within one query are distinct clusters)
            q_cap *= 2
        chunk = min(128, q_pad)
        # corpus row gathers cost ~µs each: cut the nprobe*m candidate
        # list to O(8k) by first-pass score before gathering (the bf16
        # first pass orders well past rank 8k; exact rerank restores
        # f32 ordering). +16 covers window-overlap duplicates. The
        # fast path's candidates are already the presel survivors.
        cand = None if fast else min(8 * k + 16, pos.shape[1])
        sc, pos = gather_rerank_topk_chunked(
            self._buf, pos, qd, k, "cosine", scale=self._scale,
            residual_q=self._rbuf, residual_scale=self._rscale,
            first_scores=sc, dedup=not self._fixed,
            chunk=chunk, pre_select=cand)
        from neumann_tpu.ops.scan import host_pull

        sc, pos = host_pull(sc, pos)
        sc = sc[:nq]
        pos = pos[:nq]
        ids = np.where(pos >= 0,
                       np.asarray(self._row_ids)[np.maximum(pos, 0)],
                       -1)
        if self._dn:        # merge the exact delta-plane scan
            sd, idd = self._delta_topk(qd[:nq], k)
            sc, ids = self._merge_topk(sc, ids, sd, idd, k)
        return sc, ids.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _windowed_core(k: int, nprobe: int, window: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(buf, rmult, cents, starts, qs):
        qn = qs / jnp.maximum(
            jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
        _, probe = lax.top_k(qn @ cents.T, nprobe)

        def one_query(qvec, probes):
            def gather(cidx):
                base = starts[cidx]
                block = lax.dynamic_slice(
                    buf, (base, 0), (window, buf.shape[1]))
                rm = lax.dynamic_slice(rmult, (base,), (window,))
                return block, rm, base
            blocks, rms, bases = jax.vmap(gather)(probes)
            cand = blocks.reshape(-1, buf.shape[1])
            rm = rms.reshape(-1)
            pos = (bases[:, None]
                   + jnp.arange(window, dtype=jnp.int32)[None, :]
                   ).reshape(-1)
            # int8 fits exactly in bf16; bf16 halves the materialized
            # convert bytes and runs the MXU at full rate
            dots = jnp.dot(cand.astype(jnp.bfloat16),
                           qvec.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            scores = jnp.where(rm > 0, dots * rm, -jnp.inf)
            s, i = lax.top_k(scores, min(k, scores.shape[0]))
            return s, pos[i]

        return jax.vmap(one_query)(qn, probe)

    return run


def windowed_ivf_topk(buf, rmult, cents, starts, qs, k: int,
                      nprobe: int, window: int,
                      aligned128: bool = False):
    """Jitted windowed-IVF top-k core (shared by DeviceIVFInt8.search
    and the latency bench). Returns (scores, positions-in-sorted-buf);
    positions may repeat across overlapping windows — callers dedup.

    aligned128: the layout guarantees 128-aligned starts + window —
    on a TPU backend the fused Pallas probe kernel takes over
    (scalar-prefetch block loads; no bf16 gather materialization — the
    XLA fallback gathers [Q_chunk, nprobe, window, d] bf16 and at 10M
    serving shapes its COMPILE alone crashed the remote compiler).
    NEUMANN_PALLAS=1 forces the kernel elsewhere; =0 forces XLA."""
    import os

    flag = os.environ.get("NEUMANN_PALLAS")
    use_pallas = flag == "1"
    if flag is None and aligned128 and window % 128 == 0:
        import jax

        use_pallas = jax.default_backend() == "tpu"
    if aligned128 and window % 128 == 0 and use_pallas:
        from neumann_tpu.ops.pallas_kernels import (
            ivf_windowed_topk_pallas,
        )

        return ivf_windowed_topk_pallas(buf, rmult, cents, starts,
                                        qs, k, nprobe, window)
    return _windowed_core(k, nprobe, window)(buf, rmult, cents,
                                             starts, qs)


# --------------------------------------------------------------------------
# Batched IVF: probe-sharing throughput kernel
#
# The per-query windowed core above gathers [nprobe, window, d] candidate
# rows PER QUERY — the right trade for single-query latency, but at batch
# sizes it re-reads every hot window once per query and blows HBM (Q=64
# measured ~32 GB of gather). Brute scan, the previous throughput path,
# is FLOP-bound at large Q (Q x N x d MACs) and plateaued at the 21K-QPS
# roofline (BENCH_r02).
#
# This kernel inverts the loop, the classic IVF batching trick (the
# reference batches per-list too — vector_engine/src/ivf.rs walks each
# probed list once per query batch): iterate over CLUSTER WINDOWS, read
# each window from HBM exactly once, and score it against only the
# queries that probed it. Work drops from Q x N to Q x nprobe x window
# MACs (~50x at 10M/4096/72) while the corpus is still streamed linearly
# — the path flips from FLOP-bound back to bandwidth-bound, which a
# batch amortizes across all Q queries.
#
# Static-shape plan (everything jits):
#   1. probe [Q, nprobe] <- top-nprobe centroids per query (one matmul).
#   2. invert to per-cluster query tables [C, q_cap] by sorting the
#      (cluster, query, probe_rank) triples by cluster and ranking
#      within runs via searchsorted; rank >= q_cap overflows are DROPPED
#      (counted and returned so callers can retry with a bigger cap).
#   3. lax.scan over cluster groups: dynamic-slice the group's windows,
#      one [q_cap, d] x [d, window] bf16 matmul each, approx_max_k of m
#      per (query, window). Per-cluster results are stacked as scan
#      OUTPUTS (ys) — no in-loop writes to a global table.
#   4. reassemble per query by GATHER: rank_of[q, r] (the slot query q
#      occupies in cluster probe[q, r]'s table, one small scatter built
#      alongside the tables) addresses ys[probe, rank_of] directly.
#      The first version scattered each step's results into
#      out[Q, nprobe, m]; two ~q_cap*group*m-element scatters per scan
#      step serialized the whole kernel (~40x over the HBM roofline
#      measured at 1M). Gathers vectorize on TPU; scatters often don't.
# Callers rerank the [Q, nprobe*m] candidates exactly (ops/rerank.py).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _batched_core(m: int, nprobe: int, window: int, q_cap: int,
                  group: int, selection="approx", stream: bool = False,
                  fused: bool = False, probe_mode: str = "exact",
                  presel: int = 0):
    """selection: "approx" = lax.approx_max_k of m per (query, window);
    an int p = POOLED-BITS — one max per p-row pool with the within-
    pool index packed into the low mantissa bits (the brute scan's
    selection trick, quant.int8_pooled_topk); pair pool mode with
    gather_rerank_topk_chunked(expand_pool=p) for collision-exact
    recall. Pool mode returns window//p candidates per (query, window)
    — m is ignored.

    stream: iterate windows as lax.scan xs over a reshaped corpus view
    instead of dynamic-slicing each window out of HBM. A traced-start
    dynamic_slice materializes a copy of every window before its
    matmul (~3x the read traffic); xs slicing along the leading axis
    is a pipelined DMA. Requires a FIXED-window layout (starts ==
    arange * window) and reads every window once — the right trade
    when Q x nprobe >= ~n_windows (big batches probe ~everything
    anyway); keep stream=False for small batches on huge corpora.

    fused: replace the window scan with ONE batched dot_general over
    all windows — [C, q_cap, d] selected queries x [C, G, pool, d]
    corpus view with the pool max fused into the matmul consumer (the
    brute scan's free-dim pooling trick with a batch axis). The scan
    variants dispatch C/group small matmuls sequentially and measured
    ~3% of MXU peak at 10M (100 µs/step against ~6 µs of MACs); one
    batched op lets XLA tile and pipeline the whole pass. Requires a
    fixed-window layout and pooled-bits selection (an unpooled fused
    pass would materialize the [C, q_cap, window] score tensor).

    presel (pallas-fused only): run the kernel in TOP-2-per-pool mode
    and pre-select the `presel` best candidates per query DIRECTLY on
    the packed winner bits (the bit pattern is score-monotone for
    live rows, so approx_max_k needs no decode), then decode only the
    survivors. Returns [Q, presel] instead of [Q, nprobe*m_eff].
    Top-2 makes pooled selection exact under <= 2-way pool collisions
    without the pool-expansion rerank gather (pool x survivor rows);
    >= 3 true top-k rows in one 16-row strided pool of a 2048-row
    window is measurement noise at recall@10. Skips materializing
    the [Q, nprobe, 128] score/position planes entirely."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    pool = selection if isinstance(selection, int) else 0
    if pool and (window % pool or pool & (pool - 1)):
        raise ValueError(f"pool {pool} must be a power-of-two divisor "
                         f"of window {window}")
    if fused and not pool:
        raise ValueError("fused batched core requires pooled-bits "
                         "selection (selection=<pool int>)")
    if fused == "pallas" and pool * 128 != window:
        raise ValueError(
            f"pallas fused core uses 128 strided pools of window/128 "
            f"rows: selection must be {window // 128}, got {pool}")
    if presel and fused != "pallas":
        raise ValueError("packed-bits presel requires the pallas "
                         "fused core")

    @jax.jit
    def run(buf, rmult, cents, starts, qs, valid_q):
        Q, d = qs.shape
        C = cents.shape[0]
        c_pad = -(-C // group) * group
        qn = qs / jnp.maximum(
            jnp.linalg.norm(qs, axis=1, keepdims=True), 1e-30)
        # probe selection: approx_max_k is ~5x cheaper than the full
        # per-row sort at C~5K (measured 2.35 -> 0.46 ms at Q=1024)
        # and only perturbs WHICH windows are read — recall is gated
        # end-to-end, so throughput callers opt in via probe_mode.
        # "pool": one winner per strided pool of the score row — a
        # single VPU max pass (no sort at all; approx_max_k measured
        # 13 ms at Q=4096 x C=4883, almost all in its final
        # aggregate-to-topk sort). Pool winners are a perturbed
        # top-nprobe: the best windows always win their pools; only
        # same-pool ties among near-rank-nprobe windows differ.
        if probe_mode == "pool" and C > nprobe:
            sc_c = lax.dot_general(
                qn.astype(jnp.bfloat16), cents.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            cp2 = -(-C // nprobe) * nprobe
            ppool = cp2 // nprobe
            lowb = max(1, (ppool - 1).bit_length())
            sp = jnp.pad(sc_c, ((0, 0), (0, cp2 - C)),
                         constant_values=-jnp.inf) + 2.0
            # scores land in [1, 3) like the window kernel's packing
            # (clip absorbs bf16 rounding past the cosine bounds);
            # padding clusters drop below any valid pattern
            sp = jnp.where(jnp.isfinite(sp),
                           jnp.clip(sp, 1.0, 2.9999998), 0.0)
            s3 = sp.reshape(Q, ppool, nprobe)
            pi = lax.broadcasted_iota(jnp.int32, s3.shape, 1)
            bits = (lax.bitcast_convert_type(s3, jnp.int32)
                    & ~((1 << lowb) - 1)) | pi
            wb_p = jnp.max(bits, axis=1)            # [Q, nprobe]
            lane = lax.broadcasted_iota(jnp.int32, wb_p.shape, 1)
            probe = (wb_p & ((1 << lowb) - 1)) * nprobe + lane
            # dead pools (all padding) decode below 1.0 -> send to the
            # sentinel cluster so their table writes drop
            probe = jnp.where(wb_p < 0x3F800000, C, probe)
        elif probe_mode == "approx":
            _, probe = lax.approx_max_k(qn @ cents.T, nprobe)
            probe = probe.astype(jnp.int32)
        else:
            _, probe = lax.top_k(qn @ cents.T, nprobe)
        # padding queries probe the sentinel cluster c_pad -> their
        # table writes drop; they never consume q_cap slots
        probe = jnp.where(valid_q[:, None], probe, c_pad)

        # Invert to per-cluster query tables WITHOUT a Q*nprobe-element
        # sort (argsort measured 14.9 ms at Q=1024 vs 1.8 ms for this):
        # rank(q, r) = #{q' < q probing the same cluster} = an
        # exclusive cumsum over the query axis of the per-query probe
        # histogram, read back at each probe's column. Within one
        # query probes are DISTINCT clusters, so no intra-row term.
        iota_c = jnp.arange(C, dtype=jnp.int32)
        onehot = probe[:, :, None] == iota_c[None, None, :]
        qb = 256
        if Q % qb == 0 and Q > qb:
            # exclusive scan over the query axis as a block-triangular
            # MXU matmul: jnp.cumsum lowers to a log-depth associative
            # scan (12 passes over the [Q, C] plane - measured ~14 ms
            # at Q=4096) while strict-tril [qb, qb] x [qb, C] per
            # block + a tiny cross-block cumsum is ~10 GFLOP of
            # matmul. Counts are small integers, so HIGHEST (bf16x3)
            # reproduces exact f32 arithmetic.
            hist = jnp.sum(onehot, axis=1, dtype=jnp.float32)
            nb = Q // qb
            h3 = hist.reshape(nb, qb, C)
            tril = jnp.tril(jnp.ones((qb, qb), jnp.float32), k=-1)
            within = jnp.einsum(
                "ij,bjc->bic", tril, h3,
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            bsum = jnp.sum(h3, axis=1)                      # [nb, C]
            offs = jnp.cumsum(bsum, axis=0) - bsum          # exclusive
            csum = (within + offs[:, None, :]).reshape(Q, C
                                                       ).astype(jnp.int32)
        else:
            hist = jnp.sum(onehot, axis=1).astype(jnp.int32)  # [Q, C]
            csum = jnp.cumsum(hist, axis=0) - hist            # exclusive
        rank = jnp.take_along_axis(
            csum, jnp.minimum(probe, C - 1), axis=1).astype(jnp.int32)
        fq2 = jnp.broadcast_to(
            jnp.arange(Q, dtype=jnp.int32)[:, None], (Q, nprobe))
        overflow = jnp.sum(((rank >= q_cap) & (probe < C)).astype(
            jnp.int32))
        # rank >= q_cap and probe >= C (padding) drop via out-of-bounds
        tbl_q = jnp.full((c_pad, q_cap), -1, jnp.int32).at[
            probe.reshape(-1),
            jnp.where(rank < q_cap, rank, q_cap).reshape(-1)
        ].set(fq2.reshape(-1), mode="drop")
        # rank_of[q, r]: the table slot query q holds in cluster
        # probe[q, r] (q_cap = dropped/overflowed)
        rank_of = jnp.where(rank < q_cap, rank, q_cap)
        starts_p = jnp.concatenate(
            [starts, jnp.zeros(c_pad - C, starts.dtype)]) \
            if c_pad != C else starts

        # int8 query plane: the window matmul runs s8 x s8 on the MXU
        # (like the brute int8_pooled path) instead of bf16 x bf16 —
        # the bf16 variant CONVERTS every corpus window (an extra
        # ~2 bytes/elem write + read of HBM traffic when XLA doesn't
        # fuse the upcast through the dynamic slice), tripling the
        # scan's memory bill. Query-side int8 costs ~nothing here: the
        # first pass only SELECTS candidates (callers rerank exactly).
        from neumann_tpu.ops.quant import scalar_quantize

        qq_i8, qsc = scalar_quantize(qn)

        def score_window(block, rm, qidx, base):
            # query-subset selection as a one-hot MXU matmul: a per-row
            # gather costs ~µs/row on TPU (C x q_cap rows per batch
            # dominated the kernel); [q_cap, Q] @ [Q, d] does the same
            # selection at MXU rate. Rows are one-hot, so the s32
            # result IS the int8 query row (-1 padding rows match
            # nothing and produce zero queries -> masked by rm anyway).
            oh = (qidx[:, None]
                  == jnp.arange(Q, dtype=jnp.int32)[None, :]
                  ).astype(jnp.int8)
            qsub = lax.dot_general(
                oh, qq_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.int8)
            sc_slot = jnp.where(qidx >= 0, qsc[jnp.maximum(qidx, 0)],
                                0.0)
            dots = lax.dot_general(
                qsub, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            mult = sc_slot[:, None] * rm[None, :]
            if pool:
                # pooled-bits: shift scores to [1, 3), bitcast, pack
                # the within-pool index into the low log2(pool)
                # mantissa bits — ONE max per pool carries score AND
                # argmax (bits 0 = dead row, below any valid pattern)
                s = dots.astype(jnp.float32) * mult + 2.0
                s = jnp.where(rm[None, :] > 0, s, 0.0)
                s3 = s.reshape(q_cap, window // pool, pool)
                pi = lax.broadcasted_iota(jnp.int32, s3.shape, 2)
                bits = (lax.bitcast_convert_type(s3, jnp.int32)
                        & ~(pool - 1)) | pi
                wb = jnp.max(bits, axis=2)     # [q_cap, window/pool]
                dead = wb < 0x3F800000         # below bitcast(1.0)
                sc_out = jnp.where(
                    dead, -jnp.inf,
                    lax.bitcast_convert_type(wb & ~(pool - 1),
                                             jnp.float32) - 2.0)
                local = wb & (pool - 1)
                ppos = (jnp.arange(window // pool, dtype=jnp.int32)
                        * pool + local)
                return sc_out, jnp.where(dead, -1, base + ppos)
            scores = jnp.where(rm[None, :] > 0,
                               dots.astype(jnp.float32) * mult,
                               -jnp.inf)
            s, i = lax.approx_max_k(scores, m)
            return s, base + i.astype(jnp.int32)

        m_eff = (window // pool) if pool else m
        if fused:
            G = window // pool
            nw = C * window
            tblC = tbl_q[:C]
            # row-gather query selection: jnp.take of C*q_cap rows
            # from the tiny [Q, d] int8 plane measured ~2x faster than
            # the one-hot matmul (1.54 vs 2.89 ms at Q=1024) and its
            # cost scales with C*q_cap*d bytes, not C*q_cap*Q*d MACs.
            # Empty (-1) slots gather row 0; their scale slot is 0 so
            # they score as dead and reassembly never reads them.
            qsel = jnp.take(qq_i8, jnp.maximum(tblC, 0).reshape(-1),
                            axis=0).reshape(C, q_cap, d)
            sc_slot = jnp.where(tblC >= 0,
                                qsc[jnp.maximum(tblC, 0)], 0.0)
            if fused == "pallas":
                # VMEM-fused: the dot output never reaches HBM; pools
                # are STRIDED (see pallas_kernels block comment), so
                # G must be 128 — selection=window//128 enforced below
                from neumann_tpu.ops.pallas_kernels import (
                    batched_probe_pallas,
                    decode_strided_pool_bits,
                )

                rm2 = rmult[:nw].reshape(C, window)
                wb = batched_probe_pallas(buf[:nw], rm2, qsel,
                                          sc_slot, window,
                                          top2=bool(presel))
                # DEFERRED decode: gather only the (probe, rank) slots
                # each query owns, then decode that [Q, nprobe, 128]
                # view — decoding the full [C, q_cap, 128] table first
                # writes 2x the bytes for slots nobody reads
                ok = (probe < C) & (rank_of < q_cap)
                cg_ = jnp.minimum(probe, C - 1)
                rk_ = jnp.minimum(rank_of, q_cap - 1)
                if presel:
                    # packed-bits preselect: live bits are
                    # bitcast(score+2 in [1,3)) | pool-index — as ints
                    # they compare exactly like scores (dead rows and
                    # masked slots stay below 1.0), so the top-presel
                    # cut runs on the RAW kernel output and only the
                    # survivors pay decode + position arithmetic.
                    # approx_max_k over the [Q, nprobe*256] plane
                    # measured ~25 ms at Q=4096 — instead steal
                    # log2(nprobe) more mantissa bits for the probe
                    # slot and reduce the probe axis with a streaming
                    # top-2 (entries of one lane-pool differ in their
                    # probe bits, so an equality mask isolates the
                    # runner-up exactly); the kernel's own top-1/top-2
                    # of a window land in different lane-pools, so
                    # nothing re-collides. Survivors: 2 per lane-pool
                    # -> one tiny exact top_k over [Q, 512].
                    lanes = wb.shape[-1]        # 256: top-2 kernel
                    wbg = jnp.where(ok[:, :, None], wb[cg_, rk_], 0)
                    kb = (pool - 1).bit_length()
                    mb = max(1, (nprobe - 1).bit_length())
                    pr_iota = lax.broadcasted_iota(
                        jnp.int32, wbg.shape, 1)
                    bits2 = ((wbg & ~((1 << (mb + kb)) - 1))
                             | (pr_iota << kb) | (wbg & (pool - 1)))
                    m1 = jnp.max(bits2, axis=1)            # [Q, 256]
                    m2 = jnp.max(jnp.where(
                        bits2 == m1[:, None, :], 0, bits2), axis=1)
                    cand = jnp.concatenate([m1, m2], axis=1)
                    fv = lax.bitcast_convert_type(cand, jnp.float32)
                    sv, si = lax.top_k(fv, min(presel, 2 * lanes))
                    bits = lax.bitcast_convert_type(sv, jnp.int32)
                    deadb = bits < 0x3F800000
                    g_s = jnp.where(
                        deadb, -jnp.inf,
                        lax.bitcast_convert_type(
                            bits & ~((1 << (mb + kb)) - 1),
                            jnp.float32) - 2.0)
                    local = bits & (pool - 1)
                    pr = (bits >> kb) & ((1 << mb) - 1)
                    lane = (si % lanes) % 128
                    win = jnp.take_along_axis(cg_, pr, axis=1)
                    g_p = jnp.where(
                        deadb, -1,
                        starts[win] + local * 128 + lane)
                    return g_s, g_p.astype(jnp.int32), overflow
                wbg = wb[cg_, rk_]              # [Q, nprobe, 128]
                g_s, g_pos = decode_strided_pool_bits(wbg, window)
                base = starts[cg_][:, :, None]
                out_s = jnp.where(ok[:, :, None], g_s, -jnp.inf)
                out_p = jnp.where(ok[:, :, None] & (g_pos >= 0),
                                  base + g_pos, -1)
                return (out_s.reshape(Q, nprobe * m_eff),
                        out_p.reshape(Q, nprobe * m_eff), overflow)
            else:
                corpus4 = buf[:nw].reshape(C, G, pool, d)
                rm3 = rmult[:nw].reshape(C, G, pool)
                # the whole first pass as ONE batched s8 x s8
                # dot_general: batch dim C, contracting d, G and pool
                # ride as free dims so the segmented max below can
                # fuse into the consumer chain (XLA currently
                # materializes it — the pallas variant fixes that)
                dots = lax.dot_general(
                    qsel, corpus4,
                    (((2,), (3,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32
                )                              # [C, q_cap, G, pool]
                s = (dots.astype(jnp.float32)
                     * (sc_slot[:, :, None, None]
                        * rm3[:, None, :, :])
                     + 2.0)
                s = jnp.where(rm3[:, None, :, :] > 0, s, 0.0)
                pi = lax.broadcasted_iota(jnp.int32, s.shape, 3)
                bits = (lax.bitcast_convert_type(s, jnp.int32)
                        & ~(pool - 1)) | pi
                wb = jnp.max(bits, axis=3)     # [C, q_cap, G]
                dead = wb < 0x3F800000         # below bitcast(1.0)
                ys_s = jnp.where(
                    dead, -jnp.inf,
                    lax.bitcast_convert_type(wb & ~(pool - 1),
                                             jnp.float32) - 2.0)
                local = wb & (pool - 1)
                base = (starts[:C, None, None]
                        + jnp.arange(G, dtype=jnp.int32)[None, None, :]
                        * pool)
                ys_p = jnp.where(dead, -1, base + local)
                cg_cap = C
        elif stream:
            # windows ride the scan as xs: leading-axis slicing is a
            # pipelined DMA, while a traced-start dynamic_slice
            # materializes a copy of every window before its matmul
            eff_g = group if C % group == 0 else 1
            nw = C * window
            corpus4 = buf[:nw].reshape(C // eff_g, eff_g, window, d)
            rm4 = rmult[:nw].reshape(C // eff_g, eff_g, window)
            tbl4 = tbl_q[:C].reshape(C // eff_g, eff_g, q_cap)
            base4 = starts[:C].reshape(C // eff_g, eff_g)

            def step(_, xs):
                bl, rm2, tb, bs = xs
                return (), jax.vmap(score_window)(bl, rm2, tb, bs)

            _, (ys_s, ys_p) = lax.scan(step, (), (corpus4, rm4, tbl4,
                                                  base4))
            ys_s = ys_s.reshape(C, q_cap, m_eff)
            ys_p = ys_p.reshape(C, q_cap, m_eff)
            cg_cap = C
        else:
            def one(c):
                base = starts_p[c]
                block = lax.dynamic_slice(buf, (base, 0), (window, d))
                rm = lax.dynamic_slice(rmult, (base,), (window,))
                return score_window(block, rm, tbl_q[c], base)

            def step(_, cg):
                return (), jax.vmap(one)(cg)

            cgs = jnp.arange(c_pad, dtype=jnp.int32).reshape(-1, group)
            _, (ys_s, ys_p) = lax.scan(step, (), cgs)
            ys_s = ys_s.reshape(c_pad, q_cap, m_eff)
            ys_p = ys_p.reshape(c_pad, q_cap, m_eff)
            cg_cap = c_pad

        ok = (probe < C) & (rank_of < q_cap)       # [Q, nprobe]
        cg_ = jnp.minimum(probe, cg_cap - 1)
        rk_ = jnp.minimum(rank_of, q_cap - 1)
        out_s = jnp.where(ok[:, :, None], ys_s[cg_, rk_], -jnp.inf)
        out_p = jnp.where(ok[:, :, None], ys_p[cg_, rk_], -1)
        return (out_s.reshape(Q, nprobe * m_eff),
                out_p.reshape(Q, nprobe * m_eff), overflow)

    return run


def batched_ivf_topk(buf, rmult, cents, starts, qs, nprobe: int,
                     window: int, m: int, q_cap: int, group: int = 8,
                     valid_q=None, selection="approx",
                     stream: bool = False, fused: bool = False,
                     probe_mode: str = "exact", presel: int = 0):
    """Probe-sharing batched IVF candidate pass (see block comment).

    buf/rmult/cents/starts: the DeviceIVFInt8 windowed layout.
    qs [Q, d] f32 queries; valid_q [Q] bool (False = padding query).
    Returns (scores [Q, nprobe*m] f32, positions [Q, nprobe*m] i32 in
    sorted-buffer coordinates with -1 sentinels, overflow count — the
    number of (query, cluster) probes dropped because more than q_cap
    queries probed one cluster; retry with a bigger q_cap if nonzero).
    Candidates may repeat across overlapping windows; rerank with
    dedup=True (ops/rerank.py) for k distinct exact-scored rows.
    """
    import jax.numpy as jnp

    if valid_q is None:
        valid_q = jnp.ones(qs.shape[0], bool)
    return _batched_core(m, nprobe, window, q_cap, group, selection,
                         stream, fused, probe_mode, presel)(
        buf, rmult, cents, starts, qs, valid_q)
