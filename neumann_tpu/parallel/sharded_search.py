"""Sharded top-k search: shard-local scan + ICI all-gather merge.

The TPU-native equivalent of the reference's scatter-gather path
(QueryPlan::ScatterGather + MergeStrategy::TopK,
query_router/src/distributed.rs:20-60,342-500): the corpus lives
row-sharded over the mesh in HBM, every device scans only its shard
(MXU matmul + local top-k), and the merge is one all-gather of the
[Q, k] candidate lists over ICI followed by a final top-k — exact, and
collective-bandwidth-cheap since only k candidates per shard move.

Supports fp32/bf16 and int8 storage (per-row scales sharded alongside),
plus fused validity/predicate masks, matching the single-chip kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neumann_tpu.ops.scan import topk_scan
from neumann_tpu.ops.quant import (
    _pick_pool_blocks,
    _row_multiplier,
    int8_pooled_topk,
    int8_topk_scan,
)
from neumann_tpu.utils.shapes import round_up


def _merge_gathered(s, gi, axis: str, k: int):
    """all-gather per-shard [Q, k] candidates and take the global top-k."""
    all_s = lax.all_gather(s, axis)            # [S, Q, k]
    all_i = lax.all_gather(gi, axis)
    q = s.shape[0]
    all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(q, -1)
    all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(q, -1)
    ms, pos = lax.top_k(all_s, k)
    mi = jnp.take_along_axis(all_i, pos, axis=1)
    mi = jnp.where(jnp.isneginf(ms), -1, mi)
    return ms, mi


def make_sharded_topk(mesh: Mesh, k: int, metric: str = "cosine",
                      axis: str = "shard", quantized: bool = False,
                      block_rows: int = 256 * 1024):
    """Build a jitted sharded search function for the given mesh.

    Returns fn(corpus, queries, mask) -> (scores [Q,k], global_idx [Q,k])
    where corpus is [N, d] row-sharded over `axis` (int8 variant takes
    (values, row_scale)), queries replicated, mask [N] row-sharded.
    Outputs are replicated across the mesh.
    """

    def local(corpus_shard, queries, mask_shard, scale_shard=None,
              sqnorm_shard=None):
        rows = corpus_shard.shape[0]
        if quantized:
            # bound the pool so there are >= 4k pools (pooled selection
            # returns at most one row per pool)
            pool_cap = min(4096, max(8, rows // (4 * k)))
            picked = (metric == "cosine"
                      and _pick_pool_blocks(rows, k, pool_cap,
                                            block_rows))
            if picked and rows // picked[0] >= 4 * k:
                # shard-local pooled-bits scan (same kernel as the
                # single-chip headline path); the cross-shard merge
                # stays the exact all-gather top-k
                rm = _row_multiplier(scale_shard, sqnorm_shard,
                                     "cosine")
                s, i = int8_pooled_topk(
                    corpus_shard, scale_shard, queries, k,
                    pool=picked[0], block_rows=block_rows,
                    mask=mask_shard, row_mult=rm)
            else:
                s, i = int8_topk_scan(corpus_shard, scale_shard,
                                      queries, k, metric, mask_shard,
                                      block_rows=block_rows,
                                      corpus_sqnorm=sqnorm_shard)
        else:
            s, i = topk_scan(corpus_shard, queries, k, metric, mask_shard,
                             block_rows=block_rows)
        shard_idx = lax.axis_index(axis)
        gi = jnp.where(i >= 0, i + shard_idx * rows, -1)
        return _merge_gathered(s, gi, axis, k)

    if quantized:
        fn = jax.shard_map(
            lambda c, sc, sn, q, m: local(c, q, m, sc, sn),
            mesh=mesh,
            in_specs=(P(axis, None), P(axis), P(axis), P(None, None),
                      P(axis)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
    else:
        fn = jax.shard_map(
            lambda c, q, m: local(c, q, m),
            mesh=mesh,
            in_specs=(P(axis, None), P(None, None), P(axis)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
    return jax.jit(fn)


class ShardedCorpus:
    """A corpus row-sharded over a mesh with a search method.

    Rows pad up to a multiple of (lane x n_shards); the validity mask
    carries both padding and tombstones, fused into every scan.
    """

    def __init__(self, mesh: Mesh, dim: int, axis: str = "shard",
                 quantized: bool = False):
        self.mesh = mesh
        self.axis = axis
        self.dim = dim
        self.dim_pad = round_up(dim, 128)
        self.quantized = quantized
        self.n_shards = mesh.shape[axis]
        self._fns = {}
        self.corpus = None
        self.scale = None
        self.mask = None
        self.n_rows = 0

    def load(self, vectors: np.ndarray,
             mask: Optional[np.ndarray] = None) -> None:
        """Distribute [N, d] host vectors across the mesh."""
        n, d = vectors.shape
        if d != self.dim:
            raise ValueError(f"dim mismatch {d} != {self.dim}")
        # quantized shards align to 256 rows so the pooled-bits layout
        # applies; padding rows are masked out either way
        align = (256 if self.quantized else 8) * self.n_shards
        rows = round_up(max(n, 1), align)
        buf = np.zeros((rows, self.dim_pad), np.float32)
        buf[:n, :d] = vectors
        m = np.zeros(rows, bool)
        m[:n] = True if mask is None else mask
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        mask_sh = NamedSharding(self.mesh, P(self.axis))
        if self.quantized:
            from neumann_tpu.ops.quant import (
                corpus_sqnorms,
                scalar_quantize,
            )

            q, scale = scalar_quantize(jnp.asarray(buf))
            self.corpus = jax.device_put(q, sharding)
            self.scale = jax.device_put(scale, mask_sh)
            self.sqnorm = jax.device_put(
                jax.jit(corpus_sqnorms)(q, scale), mask_sh)
        else:
            self.corpus = jax.device_put(jnp.asarray(buf), sharding)
        self.mask = jax.device_put(jnp.asarray(m), mask_sh)
        self.n_rows = n

    def search(self, queries: np.ndarray, k: int,
               metric: str = "cosine") -> Tuple[np.ndarray, np.ndarray]:
        if self.corpus is None:
            raise ValueError("corpus not loaded")
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        qp = np.zeros((q.shape[0], self.dim_pad), np.float32)
        qp[:, : self.dim] = q
        key = (k, metric)
        fn = self._fns.get(key)
        if fn is None:
            fn = make_sharded_topk(self.mesh, k, metric, self.axis,
                                   self.quantized)
            self._fns[key] = fn
        if self.quantized:
            s, i = fn(self.corpus, self.scale, self.sqnorm,
                      jnp.asarray(qp), self.mask)
        else:
            s, i = fn(self.corpus, jnp.asarray(qp), self.mask)
        return np.asarray(s), np.asarray(i)
