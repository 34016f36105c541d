"""Partitioners: key -> shard assignment strategies.

Parity with the reference's Partitioner trait and implementations
(tensor_store/src/{partitioner,consistent_hash,semantic_partitioner,
voronoi}.rs): consistent hashing with virtual nodes, semantic assignment
by archetype-centroid similarity (k-means on device), and Voronoi regions
over explicit seed points. These drive which mesh shard owns an entity —
semantic assignment gives the locality that lets filtered/clustered
queries probe fewer shards.
"""

from __future__ import annotations

import bisect
import hashlib
from typing import Dict, List, Optional, Sequence

import numpy as np


class ConsistentHashPartitioner:
    """Hash ring with virtual nodes."""

    def __init__(self, shards: Sequence[str], virtual_nodes: int = 64):
        if not shards:
            raise ValueError("need at least one shard")
        self.virtual_nodes = virtual_nodes
        self._ring: List[int] = []
        self._owner: Dict[int, str] = {}
        self._shards = list(shards)
        for s in shards:
            self._add_ring(s)

    @staticmethod
    def _hash(s: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")

    def _add_ring(self, shard: str) -> None:
        for v in range(self.virtual_nodes):
            h = self._hash(f"{shard}#{v}")
            bisect.insort(self._ring, h)
            self._owner[h] = shard

    def assign(self, key: str) -> str:
        h = self._hash(key)
        idx = bisect.bisect_right(self._ring, h)
        if idx == len(self._ring):
            idx = 0
        return self._owner[self._ring[idx]]

    def add_shard(self, shard: str) -> None:
        self._shards.append(shard)
        self._add_ring(shard)

    def remove_shard(self, shard: str) -> None:
        self._shards.remove(shard)
        for v in range(self.virtual_nodes):
            h = self._hash(f"{shard}#{v}")
            i = bisect.bisect_left(self._ring, h)
            if i < len(self._ring) and self._ring[i] == h:
                self._ring.pop(i)
                self._owner.pop(h, None)

    @property
    def shards(self) -> List[str]:
        return list(self._shards)


# below this many elements, numpy Lloyd's beats the device (compile +
# dispatch overhead dominates) — and, critically, tiny trainings on
# HOST paths (chain codebooks, archetype discovery in tests) never
# initialize the accelerator backend at all, so a hung/unreachable
# device cannot stall a chain commit
_DEVICE_KMEANS_MIN_ELEMS = 262_144


def kmeans(vectors: np.ndarray, k: int, iters: int = 20,
           seed: int = 0) -> np.ndarray:
    """K-means (Lloyd's), k-means++ seeded: device matmul + segment-sum
    per iteration at scale, pure numpy below the device threshold."""
    n, d = vectors.shape
    k = min(k, n)
    rng = np.random.default_rng(seed)
    # k-means++ seeding: spread initial centroids by D^2 sampling
    # (plain random init collapses well-separated clusters). The
    # seeding loop is O(k * rows * d) SEQUENTIAL host work, so it runs
    # on a bounded subsample — seeding only needs one draw per mixture
    # mode, not the full sample (the Lloyd iterations below still see
    # everything)
    seed_rows = min(n, max(4 * k, 16_384))
    seed_idx = (np.arange(n) if seed_rows >= n
                else rng.choice(n, seed_rows, replace=False))
    x64 = vectors[seed_idx].astype(np.float64)
    first = rng.integers(seed_rows)
    chosen = [first]
    d2 = np.sum((x64 - x64[first]) ** 2, axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total <= 0:
            chosen.append(rng.integers(seed_rows))
        else:
            probs = d2 / total
            chosen.append(int(rng.choice(seed_rows, p=probs)))
        d2 = np.minimum(d2, np.sum(
            (x64 - x64[chosen[-1]]) ** 2, axis=1))
    centroids = vectors[seed_idx[chosen]].copy()

    if n * d < _DEVICE_KMEANS_MIN_ELEMS:
        x = vectors.astype(np.float32)
        cent = centroids.astype(np.float32)
        for _ in range(iters):
            d2 = (np.sum(x * x, 1, keepdims=True)
                  - 2.0 * x @ cent.T + np.sum(cent * cent, 1)[None, :])
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        return cent

    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(cent, x):
        d2 = (jnp.sum(x * x, 1, keepdims=True)
              - 2.0 * x @ cent.T + jnp.sum(cent * cent, 1)[None, :])
        assign = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((x.shape[0],)), assign,
                                     num_segments=k)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), cent)
        return new, assign

    x = np.asarray(vectors, np.float32)
    cent = jnp.asarray(centroids)
    xj = jnp.asarray(x)
    for _ in range(iters):
        cent, assign = step(cent, xj)
    return np.asarray(cent)


def kmeans_device(x, k: int, iters: int = 10, seed: int = 0,
                  balance: bool = True):
    """Fully on-device Lloyd's over a device-resident sample [n, d].

    For corpora that were BORN on device (bench generation, slab
    views): no host staging — the dev tunnel moves ~MB/s, so pulling a
    multi-100MB sample to host for the numpy path is not viable.
    Random distinct-row init (k-means++ seeding is an O(n*k) sequential
    host loop; a few extra Lloyd iterations recover the difference on
    clustered data). Returns centroids as a DEVICE array [k, d] f32.

    balance: reseed starved clusters by splitting fat ones between
    Lloyd steps (the FAISS split-clusters trick, done as one vectorized
    pairing: i-th smallest cluster adopts a jittered copy of the i-th
    largest's centroid when it holds <1/2 of a fair share and the donor
    >3/2). Random init routinely lands two seeds in one mixture mode
    and none in another; without this the downstream windowed-IVF
    layout (ops/ivf.py) must size every window to the FATTEST cluster —
    a measured 6x window blowup at 10M/4096 that drags the whole probe
    path. The final two iterations always run without reseeding so the
    returned centroids are a plain Lloyd fixed point of their last
    assignment.
    """
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    k = min(k, n)
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, (k,), replace=False)
    x = x.astype(jnp.float32)
    cent = x[idx]
    fair = n / k

    @jax.jit
    def step(cent, x):
        xx = jnp.sum(x * x, 1)
        # argmin_c ||x-c||^2 == argmax_c (x.c - ||c||^2/2); the xx term
        # is constant per row. bf16 MXU matmul (4x f32 throughput) with
        # f32 accumulation — k-means assignment tolerates the ~1e-3
        # input rounding (it is a heuristic partition; the centroid
        # UPDATE below stays exact f32), and the [n, k] score matrix
        # is the build's biggest HBM write either way.
        score = jnp.dot(x.astype(jnp.bfloat16),
                        cent.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        assign = jnp.argmax(score - 0.5 * jnp.sum(cent * cent, 1)[None],
                            axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones((x.shape[0],)), assign, num_segments=k)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0),
                        cent)
        # per-cluster variance (mean ||p - c||^2), for reseed jitter
        m2 = (jax.ops.segment_sum(xx, assign, num_segments=k)
              / jnp.maximum(counts, 1.0)) - jnp.sum(new * new, 1)
        return new, counts, m2

    @jax.jit
    def reseed(cent, counts, m2, key):
        recv = jnp.argsort(counts)            # starved first
        donor = recv[::-1]                    # fat first
        adopt = ((counts[recv] < 0.5 * fair)
                 & (counts[donor] > 1.5 * fair))
        # jitter at ~1/3 the donor's RMS radius: a microscopic copy
        # loses EVERY point to f32 winner-take-all (measured — the pair
        # just swaps labels each round), while a full-radius copy lands
        # outside the cluster and starves; 0.3x splits reliably
        # (swept 0.3/0.5/0.8/1.2 -> ratios 1.13/1.98/4.0/6.0)
        sig = 0.3 * jnp.sqrt(jnp.maximum(m2[donor], 0.0)
                             / cent.shape[1])
        new = cent[donor] + sig[:, None] * jax.random.normal(
            key, cent.shape, cent.dtype)
        return cent.at[recv].set(
            jnp.where(adopt[:, None], new, cent[recv]))

    for i in range(iters):
        cent, counts, m2 = step(cent, x)
        if balance and i < iters - 2:
            key, sub = jax.random.split(key)
            cent = reseed(cent, counts, m2, sub)
    return cent


class SemanticPartitioner:
    """Assign embeddings to the shard whose archetype centroid is nearest
    (cosine), like semantic_partitioner.rs. Centroids are discovered with
    device k-means over a sample."""

    def __init__(self, n_shards: int):
        self.n_shards = n_shards
        self.centroids: Optional[np.ndarray] = None

    def train(self, sample: np.ndarray, iters: int = 20) -> None:
        self.centroids = kmeans(np.asarray(sample, np.float32),
                                self.n_shards, iters)

    def assign(self, vector: np.ndarray) -> int:
        return int(self.assign_batch(np.asarray(vector)[None, :])[0])

    def assign_batch(self, vectors: np.ndarray) -> np.ndarray:
        if self.centroids is None:
            raise ValueError("partitioner not trained")
        v = np.asarray(vectors, np.float32)
        c = self.centroids
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        return np.argmax(vn @ cn.T, axis=1)

    def query_shards(self, query: np.ndarray, nprobe: int = 1
                     ) -> List[int]:
        """Shards to probe for a query, nearest-centroid first."""
        if self.centroids is None:
            raise ValueError("partitioner not trained")
        q = np.asarray(query, np.float32)
        c = self.centroids
        qn = q / max(float(np.linalg.norm(q)), 1e-30)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        order = np.argsort(-(cn @ qn))
        return [int(i) for i in order[:nprobe]]


class VoronoiPartitioner:
    """Explicit seed points define regions; assignment = nearest seed by
    euclidean distance (voronoi.rs capability)."""

    def __init__(self, seeds: np.ndarray):
        self.seeds = np.asarray(seeds, np.float32)
        if self.seeds.ndim != 2 or not len(self.seeds):
            raise ValueError("seeds must be [k, d]")

    def assign(self, vector: np.ndarray) -> int:
        v = np.asarray(vector, np.float32)
        d2 = np.sum((self.seeds - v[None, :]) ** 2, axis=1)
        return int(np.argmin(d2))

    def assign_batch(self, vectors: np.ndarray) -> np.ndarray:
        v = np.asarray(vectors, np.float32)
        d2 = (np.sum(v * v, 1)[:, None] - 2 * v @ self.seeds.T
              + np.sum(self.seeds * self.seeds, 1)[None, :])
        return np.argmin(d2, axis=1)

    def region_of(self, idx: int) -> np.ndarray:
        return self.seeds[idx]
