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

    Quantized shards run two-pass: the bandwidth-optimal int8 scan
    selects shard-local candidates, a shard-local rerank rescores them
    in exact f32 against the unquantized query (ops/rerank.py), and
    only then do k exact-scored candidates per shard ride the ICI
    all-gather — so the merge compares f32 scores, not quantized ones.
    """
    from neumann_tpu.ops.rerank import gather_rerank_topk

    def local(corpus_shard, queries, mask_shard, scale_shard=None,
              sqnorm_shard=None):
        rows = corpus_shard.shape[0]
        if quantized:
            c = min(max(4 * k, 32), rows)    # local rerank candidates
            # bound the pool so there are >= 4c pools (pooled selection
            # returns at most one row per pool)
            pool_cap = min(4096, max(8, rows // (4 * c)))
            picked = (metric == "cosine"
                      and _pick_pool_blocks(rows, c, pool_cap,
                                            block_rows))
            if picked and rows // picked[0] >= 4 * c:
                # shard-local pooled-bits scan (same kernel as the
                # single-chip headline path); the cross-shard merge
                # stays the exact all-gather top-k
                rm = _row_multiplier(scale_shard, sqnorm_shard,
                                     "cosine")
                s, i = int8_pooled_topk(
                    corpus_shard, scale_shard, queries, c,
                    pool=picked[0], block_rows=block_rows,
                    mask=mask_shard, row_mult=rm)
            else:
                s, i = int8_topk_scan(corpus_shard, scale_shard,
                                      queries, c, metric, mask_shard,
                                      block_rows=block_rows,
                                      corpus_sqnorm=sqnorm_shard)
            s, i = gather_rerank_topk(
                corpus_shard, i, queries, k, metric, scale_shard,
                first_scores=s, dedup=False)
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
               metric: str = "cosine",
               mask: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """``mask`` (host [n_rows] bool) narrows this call to matching
        rows — the engine's metadata filters fused into the sharded
        scan, like the single-chip path."""
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
        m = self.mask
        if mask is not None:
            rows = int(self.mask.shape[0])
            mm = np.zeros(rows, bool)
            mm[: min(rows, len(mask))] = mask[:rows]
            mm &= np.asarray(self.mask)
            m = jax.device_put(
                jnp.asarray(mm),
                NamedSharding(self.mesh, P(self.axis)))
        if self.quantized:
            s, i = fn(self.corpus, self.scale, self.sqnorm,
                      jnp.asarray(qp), m)
        else:
            s, i = fn(self.corpus, jnp.asarray(qp), m)
        from neumann_tpu.ops.scan import host_pull

        return host_pull(s, i)


# ---------------------------------------------------------------------------
# sharded windowed IVF: the single-query latency path over the mesh
# ---------------------------------------------------------------------------

class ShardedIVFCorpus:
    """Cluster-sharded windowed IVF over a device mesh.

    The mesh analog of ops.ivf.DeviceIVFInt8 (the p99 path): k-means
    clusters are distributed across shards (semantic sharding — the
    idea of semantic_partitioner.rs), each shard holds its clusters'
    rows in a windowed cluster-sorted int8 layout, and a query probes
    its nprobe_local best clusters ON EVERY SHARD in parallel before
    one ICI all-gather merges the [Q, k] candidates. Total probed work
    is nprobe_local x n_shards windows, each shard reading only its
    own HBM — per-chip latency is 1/S of the single-chip probe cost.
    """

    def __init__(self, mesh: Mesh, dim: int, axis: str = "shard",
                 n_clusters: int = 64, nprobe: int = 8,
                 iters: int = 8):
        self.mesh = mesh
        self.axis = axis
        self.dim = dim
        self.dim_pad = round_up(dim, 128)
        self.n_shards = mesh.shape[axis]
        self.n_clusters = max(self.n_shards,
                              (n_clusters // self.n_shards)
                              * self.n_shards)
        self.nprobe = nprobe
        self._nprobe_cfg = nprobe     # cluster-unit config (see load)
        self.iters = iters
        self._fns = {}
        self.corpus = None

    def load(self, vectors: np.ndarray, seed: int = 0) -> None:
        from neumann_tpu.parallel.partitioner import kmeans

        v = np.asarray(vectors, np.float32)
        n, d = v.shape
        if d != self.dim:
            raise ValueError(f"dim mismatch {d} != {self.dim}")
        vp = np.zeros((n, self.dim_pad), np.float32)
        vp[:, :d] = v
        S, C = self.n_shards, self.n_clusters
        rng = np.random.default_rng(seed)
        sample = vp[rng.choice(n, size=min(50_000, n), replace=False)]
        cents = np.array(kmeans(sample, C, self.iters), np.float32)
        cents /= np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
        vn = vp / np.maximum(
            np.linalg.norm(vp, axis=1, keepdims=True), 1e-30)
        assign = np.argmax(vn @ cents.T, axis=1)
        counts = np.bincount(assign, minlength=C)

        # balance: biggest clusters deal round-robin across shards
        order_c = np.argsort(-counts, kind="stable")
        shard_of = np.empty(C, np.int64)
        shard_clusters = [[] for _ in range(S)]
        loads = np.zeros(S, np.int64)
        for c in order_c:
            s = int(np.argmin(loads))
            shard_of[c] = s
            shard_clusters[s].append(int(c))
            loads[s] += counts[c]
        c_per = max(len(cs) for cs in shard_clusters)

        # per-shard FIXED-window layout (ops/ivf.py DeviceIVFInt8
        # docstring): each shard's rows are cluster-sorted then chopped
        # into disjoint `window`-row windows probed by their normalized
        # mean rows. The previous per-cluster padded slots sized every
        # slot to the FATTEST cluster — a 6x skewed histogram (measured
        # under plain Lloyd's at 10M/4096) cost 6x shard HBM; fixed
        # windows store exactly ceil(n_s/w)*w rows and skew cannot
        # inflate either memory or the probe read. Windows stay
        # disjoint, so probe candidates are distinct by construction
        # and the cross-shard merge needs no dedup oversampling.
        avg = max(1, n // max(1, C))
        window = int(min(1024, max(128, -(-avg // 128) * 128)))
        max_shard_rows = max(
            int(counts[cs].sum()) for cs in shard_clusters)
        rows_s = max(window, -(-max_shard_rows // window) * window)
        c_per = rows_s // window          # probe domain: windows/shard
        am = np.max(np.abs(vp), axis=1)
        scale = np.where(am > 0, am / 127.0, 1.0).astype(np.float32)
        q8 = np.clip(np.round(vp / scale[:, None]), -127,
                     127).astype(np.int8)
        sq = np.einsum("ij,ij->i", vp, vp)
        rm = np.where(sq > 0, 1.0 / np.sqrt(np.maximum(sq, 1e-30)),
                      0.0).astype(np.float32)

        buf = np.zeros((S, rows_s, self.dim_pad), np.int8)
        rmult = np.zeros((S, rows_s), np.float32)
        row_ids = np.full((S, rows_s), -1, np.int64)
        cents_sh = np.zeros((S, c_per, self.dim_pad), np.float32)
        starts_sh = np.tile(
            (np.arange(c_per, dtype=np.int32) * window)[None, :],
            (S, 1))
        order_by_cluster = np.argsort(assign, kind="stable")
        cluster_rows = {}
        bounds = np.searchsorted(assign[order_by_cluster],
                                 np.arange(C + 1))
        for c in range(C):
            cluster_rows[c] = order_by_cluster[bounds[c]: bounds[c + 1]]
        for s in range(S):
            rows = (np.concatenate(
                [cluster_rows[c] for c in shard_clusters[s]])
                if shard_clusters[s] else np.empty(0, np.int64))
            n_s = len(rows)
            buf[s, :n_s] = q8[rows]
            rmult[s, :n_s] = rm[rows] * scale[rows]
            row_ids[s, :n_s] = rows
            # window-mean probe centroids over the shard's unit rows
            unit = vn[rows]
            sums = np.zeros((c_per, self.dim_pad), np.float32)
            np.add.at(sums, np.arange(n_s) // window, unit)
            norms = np.linalg.norm(sums, axis=1, keepdims=True)
            cents_sh[s] = np.where(norms > 0,
                                   sums / np.maximum(norms, 1e-30),
                                   0.0)
        sharding = NamedSharding(self.mesh, P(self.axis, None, None))
        s2 = NamedSharding(self.mesh, P(self.axis, None))
        self.corpus = jax.device_put(jnp.asarray(buf), sharding)
        self.rmult = jax.device_put(jnp.asarray(rmult), s2)
        self.cents = jax.device_put(jnp.asarray(cents_sh), sharding)
        self.starts = jax.device_put(jnp.asarray(starts_sh), s2)
        self.row_ids = row_ids
        self.rows_s = rows_s
        self.window = window
        self.c_per = c_per
        self.n_rows = n
        # recalibrate nprobe from cluster units to window units so the
        # configured READ FRACTION survives the fixed-window layout
        # (mirrors DeviceIVFInt8.build): "probe 8 of 64 clusters" meant
        # ~8 * (n/64) rows per shard, i.e. 8 * avg/window windows
        self.nprobe = int(max(1, min(
            c_per,
            -(-self._nprobe_cfg * max(1, n // max(1, C)) // window))))
        self._fns.clear()      # nprobe is baked into the compiled fns

    def _fn(self, k: int):
        fn = self._fns.get(k)
        if fn is not None:
            return fn
        axis = self.axis
        window = self.window
        rows_s = self.rows_s
        nprobe = min(self.nprobe, self.c_per)
        # windows are disjoint, so candidates are distinct by
        # construction; oversample the bf16 first pass — its near-tie
        # ordering errors are healed by the f32 rerank below before
        # anything crosses the ICI
        kk = min(4 * k + 16, window * nprobe)

        def local(buf, rm, cents, starts, queries):
            # leading shard dim of size 1 inside shard_map blocks
            buf = buf[0]
            rm = rm[0]
            cents = cents[0]
            starts = starts[0]
            qn = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
            _, probe = lax.top_k(qn @ cents.T, nprobe)

            def one_query(qvec, probes):
                def gather(ci):
                    base = starts[ci]
                    block = lax.dynamic_slice(
                        buf, (base, 0), (window, buf.shape[1]))
                    r = lax.dynamic_slice(rm, (base,), (window,))
                    return block, r, base
                blocks, rms, bases = jax.vmap(gather)(probes)
                cand = blocks.reshape(-1, buf.shape[1])
                rr = rms.reshape(-1)
                pos = (bases[:, None]
                       + jnp.arange(window, dtype=jnp.int32)[None, :]
                       ).reshape(-1)
                dots = jnp.dot(cand.astype(jnp.bfloat16),
                               qvec.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                scores = jnp.where(rr > 0, dots * rr, -jnp.inf)
                s, i = lax.top_k(scores, kk)
                return s, pos[i]

            s, pos = jax.vmap(one_query)(qn, probe)
            # shard-local exact rerank: an int8 row times its combined
            # multiplier (scale * 1/||x||) IS the unit row, so the
            # rescore is exact f32 cosine — the bf16 first pass only
            # SELECTS. Only k exact-scored candidates per shard ride
            # the ICI, and the cross-shard merge compares f32 scores
            # (matching the single-chip two-pass paths).
            safe = jnp.maximum(pos, 0)
            cand = buf[safe].astype(jnp.float32) \
                * rm[safe][:, :, None]                  # [Q, kk, d]
            ex = jnp.einsum("qd,qkd->qk", qn, cand)
            ex = jnp.where(jnp.isneginf(s), -jnp.inf, ex)
            s_k, sel = lax.top_k(ex, min(k, ex.shape[1]))
            pos_k = jnp.take_along_axis(pos, sel, axis=1)
            shard_idx = lax.axis_index(axis)
            gpos = jnp.where(jnp.isneginf(s_k), -1,
                             pos_k + shard_idx * rows_s)
            return _merge_gathered(s_k, gpos, axis, min(k, ex.shape[1]))

        fn = jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(axis, None, None), P(axis, None),
                      P(axis, None, None), P(axis, None),
                      P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        ))
        self._fns[k] = fn
        return fn

    def _batched_fn(self, k: int, q_cap: int, fast: bool = False):
        """Batched probe-sharing search per shard under shard_map: the
        single-chip throughput core (ops.ivf.batched_ivf_topk — each
        probed window read once per BATCH, scored only against the
        queries that probed it) runs shard-locally, an exact f32
        rerank cuts to k per shard, and one ICI all-gather merges.
        fast: the VMEM-fused Pallas core (top-2-per-pool kernel +
        packed-bits presel + pool-winner probes), shard-local like the
        XLA core — Pallas composes with shard_map per device.
        Returns fn(corpus, rmult, cents, starts, queries) ->
        (scores [Q, k], global positions [Q, k], overflow [Q?]-sum)."""
        key = ("batched", k, q_cap, fast)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        axis, window, rows_s = self.axis, self.window, self.rows_s
        nprobe = min(self.nprobe, self.c_per)
        m = min(k + 6, window)
        pool = window // 128
        presel = min(max(3 * k + 2, 32), nprobe * 256) if fast else 0

        from neumann_tpu.ops.ivf import batched_ivf_topk
        from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

        def local(buf, rm, cents, starts, queries):
            buf, rm = buf[0], rm[0]
            cents, starts = cents[0], starts[0]
            qn = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True),
                1e-30)
            if fast:
                sc, pos, ovf = batched_ivf_topk(
                    buf, rm, cents, starts, qn, nprobe, window, m,
                    q_cap, selection=pool, fused="pallas",
                    probe_mode="pool" if nprobe < self.c_per
                    else "exact", presel=presel)
            else:
                sc, pos, ovf = batched_ivf_topk(
                    buf, rm, cents, starts, qn, nprobe, window, m,
                    q_cap)
            # shard-local exact rerank (rm is scale/||x||, so the
            # row_mult fast path rescores exact f32 in one pass);
            # disjoint fixed windows -> no dedup. The fast core's
            # candidates are already its presel survivors.
            s_k, pos_k = gather_rerank_topk_chunked(
                buf, pos, qn, k, "cosine", first_scores=sc,
                dedup=False, chunk=min(128, qn.shape[0]),
                pre_select=None if fast
                else min(8 * k + 16, pos.shape[1]),
                row_mult=rm)
            shard_idx = lax.axis_index(axis)
            gpos = jnp.where(jnp.isneginf(s_k), -1,
                             pos_k + shard_idx * rows_s)
            s_m, p_m = _merge_gathered(s_k, gpos, axis, k)
            return s_m, p_m, lax.psum(ovf, axis)[None]

        fn = jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(axis, None, None), P(axis, None),
                      P(axis, None, None), P(axis, None),
                      P(None, None)),
            out_specs=(P(None, None), P(None, None), P(None)),
            check_vma=False,
        ))
        self._fns[key] = fn
        return fn

    def search_batched(self, queries: np.ndarray, k: int,
                       fast: Optional[bool] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Throughput search over the mesh: batched probe-sharing per
        shard + exact shard rerank + all-gather merge. Same results
        contract as search(); q_cap doubles on overflow like the
        single-chip DeviceIVFInt8.search_batched."""
        if self.corpus is None:
            raise ValueError("load() first")
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        q_pad = max(8, 1 << (nq - 1).bit_length())
        qp = np.zeros((q_pad, self.dim_pad), np.float32)
        qp[:nq, : self.dim] = q[:, : self.dim]
        nprobe = min(self.nprobe, self.c_per)
        if fast is None:
            # the Pallas core is interpret-mode (slow, correct) off
            # TPU — default it on real chips only
            import jax as _jax

            pool_a = self.window // 128
            fast = (_jax.devices()[0].platform == "tpu"
                    and self.window % 128 == 0 and pool_a >= 2
                    and (pool_a & (pool_a - 1)) == 0 and k <= 128)
        expect = -(-q_pad * nprobe // max(1, self.c_per))
        q_cap = (max(64, -(-(3 * expect) // 64) * 64) if q_pad > 64
                 else (1 << (max(16, 4 * expect) - 1).bit_length()))
        qd = jnp.asarray(qp)
        while True:
            s, gpos, ovf = self._batched_fn(k, q_cap, fast)(
                self.corpus, self.rmult, self.cents, self.starts, qd)
            if int(np.asarray(ovf)[0]) == 0 or q_cap >= q_pad:
                break
            q_cap *= 2
        from neumann_tpu.ops.scan import host_pull

        s, gpos = host_pull(s, gpos)
        s, gpos = s[:nq], gpos[:nq]
        flat_ids = self.row_ids.reshape(-1)
        ids = np.where(gpos >= 0, flat_ids[np.maximum(gpos, 0)], -1)
        ids = np.where(np.isfinite(s), ids, -1)
        s = np.where(ids >= 0, s, -np.inf).astype(np.float32)
        return s, ids.astype(np.int64)

    def search(self, queries: np.ndarray, k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores [Q, k], ORIGINAL row ids [Q, k], -1 sentinels)."""
        if self.corpus is None:
            raise ValueError("load() first")
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        qp = np.zeros((q.shape[0], self.dim_pad), np.float32)
        qp[:, : self.dim] = q
        s, gpos = self._fn(k)(self.corpus, self.rmult, self.cents,
                              self.starts, jnp.asarray(qp))
        from neumann_tpu.ops.scan import host_pull

        s, gpos = host_pull(s, gpos)
        # positions are DISTINCT by construction — shard windows are
        # disjoint and cross-shard bases never collide — and each
        # original row lives in exactly one shard slot, so no dedup is
        # needed; padding slots map to rid -1 and are masked. (The
        # previous per-result Python set loop undid the disjoint-
        # windows guarantee one layer up and scaled as k x Q.)
        flat_ids = self.row_ids.reshape(-1)
        ids = np.where(gpos >= 0, flat_ids[np.maximum(gpos, 0)], -1)
        ids = np.where(np.isfinite(s), ids, -1)
        sm = np.where(ids >= 0, s, -np.inf).astype(np.float32)
        order = np.argsort(-sm, axis=1, kind="stable")[:, :k]
        out_s = np.take_along_axis(sm, order, axis=1)
        out_i = np.take_along_axis(ids, order, axis=1).astype(np.int64)
        if out_s.shape[1] < k:          # fewer candidates than k
            pad = k - out_s.shape[1]
            out_s = np.pad(out_s, ((0, 0), (0, pad)),
                           constant_values=-np.inf)
            out_i = np.pad(out_i, ((0, 0), (0, pad)),
                           constant_values=-1)
        return out_s, out_i
