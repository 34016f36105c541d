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

    def train(self, sample: np.ndarray) -> None:
        from neumann_tpu.parallel.partitioner import kmeans

        self.centroids = kmeans(np.asarray(sample, np.float32),
                                self.config.n_clusters, self.config.iters)

    def add(self, vectors: np.ndarray) -> None:
        """(Re)build the cluster-sorted device layout from all vectors."""
        import jax.numpy as jnp

        if self.centroids is None:
            raise ValueError("train() first")
        v = np.asarray(vectors, np.float32)
        c = self.centroids
        k = len(c)
        d2 = (np.sum(v * v, 1)[:, None] - 2 * v @ c.T
              + np.sum(c * c, 1)[None, :])
        assign = np.argmin(d2, axis=1)
        counts = np.bincount(assign, minlength=k)
        stride = int(max(counts.max(), 1))
        # pad stride to the f32 sublane multiple
        stride = ((stride + 7) // 8) * 8
        buf = np.zeros((k * stride, v.shape[1]), np.float32)
        ids = np.full(k * stride, -1, np.int32)
        offsets = np.zeros(k, np.int64)
        for row, a in enumerate(assign):
            pos = a * stride + offsets[a]
            buf[pos] = v[row]
            ids[pos] = row
            offsets[a] += 1
        storage = self.config.storage
        if storage == "pq":
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
        self._n = len(v)

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
        s = np.asarray(s)
        pos = np.asarray(pos)
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
