"""Product quantization: subspace codebooks + ADC search.

Parity with tensor_store/src/pq.rs (PQCodebook::{train,encode,decode,
compute_adc_table}, ADCTable::distance): vectors split into M subspaces,
each quantized to one of 256 centroids learned with k-means; a query
builds an asymmetric-distance (ADC) table [M, 256] once, and scanning the
corpus is a gather+sum over the code matrix.

TPU-native shape: codes are a [N, M] uint8 device array; the ADC scan is
one one-hot matmul per subspace batched as [M, N, 256] x [M, 256] — XLA
turns the gather into MXU-friendly take_along_axis over the code matrix.
32x compression at M=96 for 768d (1 byte per 8 dims with M=d/8).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class PQConfig:
    n_subspaces: int = 8       # M
    n_centroids: int = 256     # codes per subspace (uint8)
    iters: int = 15


class PQCodebook:
    """codebooks: [M, 256, d/M] f32."""

    def __init__(self, dim: int, config: Optional[PQConfig] = None):
        self.dim = dim
        self.config = config or PQConfig()
        if dim % self.config.n_subspaces:
            raise ValueError(
                f"dim {dim} not divisible by {self.config.n_subspaces} "
                f"subspaces")
        self.sub_dim = dim // self.config.n_subspaces
        self.codebooks: Optional[np.ndarray] = None

    def train(self, sample: np.ndarray) -> None:
        from neumann_tpu.parallel.partitioner import kmeans

        x = np.asarray(sample, np.float32)
        m = self.config.n_subspaces
        books = []
        for s in range(m):
            sub = x[:, s * self.sub_dim:(s + 1) * self.sub_dim]
            k = min(self.config.n_centroids, len(sub))
            cents = kmeans(sub, k, self.config.iters, seed=s)
            if len(cents) < self.config.n_centroids:
                pad = np.zeros((self.config.n_centroids - len(cents),
                                self.sub_dim), np.float32)
                cents = np.concatenate([cents, pad])
            books.append(cents)
        self.codebooks = np.stack(books)  # [M, 256, sub_dim]

    def _require_trained(self) -> np.ndarray:
        if self.codebooks is None:
            raise ValueError("codebook not trained")
        return self.codebooks

    def encode(self, vectors: np.ndarray) -> np.ndarray:
        """[N, d] -> codes [N, M] uint8 (nearest centroid per subspace)."""
        books = self._require_trained()
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(np.asarray(vectors, np.float32))
        m, sd = self.config.n_subspaces, self.sub_dim

        @jax.jit
        def enc(x, books):
            xs = x.reshape(x.shape[0], m, sd)          # [N, M, sd]
            # [M, N, sd] x [M, sd, 256] -> [M, N, 256] distances
            xt = jnp.transpose(xs, (1, 0, 2))
            d2 = (jnp.sum(xt * xt, -1, keepdims=True)
                  - 2.0 * jnp.einsum("mns,mcs->mnc", xt, books)
                  + jnp.sum(books * books, -1)[:, None, :])
            return jnp.argmin(d2, axis=-1).T            # [N, M]

        return np.asarray(enc(x, jnp.asarray(books))).astype(np.uint8)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        books = self._require_trained()
        codes = np.asarray(codes)
        n, m = codes.shape
        out = np.empty((n, self.dim), np.float32)
        for s in range(m):
            out[:, s * self.sub_dim:(s + 1) * self.sub_dim] = \
                books[s][codes[:, s]]
        return out

    def compute_adc_table(self, query: np.ndarray) -> np.ndarray:
        """[M, 256] squared-distance lookup table for one query."""
        books = self._require_trained()
        q = np.asarray(query, np.float32).reshape(
            self.config.n_subspaces, self.sub_dim)
        diff = books - q[:, None, :]
        return np.sum(diff * diff, axis=-1).astype(np.float32)

    def adc_distance(self, table: np.ndarray, code: np.ndarray) -> float:
        """Squared distance of one encoded vector to the tabled query."""
        return float(sum(table[s, c] for s, c in enumerate(code)))


@functools.lru_cache(maxsize=None)
def _adc_search_fn():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(codes, tables, mask, k):
        # codes [N, M] int32, tables [Q, M, 256]
        def one(table):
            # gather per subspace then sum: [N, M]
            per = jnp.take_along_axis(
                table.T[None, :, :],          # [1, M, 256]
                codes[:, :, None], axis=2)[:, :, 0] if False else \
                table[jnp.arange(codes.shape[1])[None, :],
                      codes]                   # [N, M]
            d2 = jnp.sum(per, axis=1)
            scores = -d2
            scores = jnp.where(mask, scores, -jnp.inf)
            s, i = jax.lax.top_k(scores, k)
            return s, i
        return jax.vmap(one)(tables)

    return run


def pq_topk(codebook: PQCodebook, codes, queries: np.ndarray, k: int,
            mask: Optional[np.ndarray] = None
            ) -> Tuple[np.ndarray, np.ndarray]:
    """ADC top-k: smallest squared distance (score = -d2)."""
    import jax.numpy as jnp

    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None, :]
    tables = np.stack([codebook.compute_adc_table(qq) for qq in q])
    codes_j = jnp.asarray(np.asarray(codes, np.int32))
    n = codes_j.shape[0]
    k = min(k, n)
    mask_j = jnp.asarray(mask if mask is not None
                         else np.ones(n, bool))
    s, i = _adc_search_fn()(codes_j, jnp.asarray(tables), mask_j, k)
    s = np.asarray(s)
    i = np.where(np.isneginf(s), -1, np.asarray(i))
    return s, i.astype(np.int32)
