"""Device graph kernels over edge lists.

The reference walks CSR adjacency on the CPU (graph_engine traversals,
tensor_store/src/graph_tensor.rs). On TPU the natural representation is the
edge list as two int32 device arrays (src, dst): frontier expansion, rank
propagation, and label propagation are all segment reductions that XLA
vectorizes, with `lax.while_loop` driving iterations entirely on device.

All kernels take static n (padded node capacity) and a validity mask; they
work on any jax backend (tested on the CPU mesh, run on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def bfs_levels(src: jnp.ndarray, dst: jnp.ndarray, n: int,
               start: jnp.ndarray, max_depth: int = 0) -> jnp.ndarray:
    """Multi-source BFS levels. Returns int32[n], -1 = unreachable.

    src/dst: edge endpoints (directed; pass both directions for
    undirected). start: int32[n] bool-ish mask of source nodes.
    max_depth 0 means unbounded (n iterations worst case).
    """
    limit = max_depth if max_depth > 0 else n
    levels0 = jnp.where(start, 0, -1).astype(jnp.int32)

    def cond(state):
        levels, frontier, depth, changed = state
        return jnp.logical_and(changed, depth < limit)

    def body(state):
        levels, frontier, depth, _ = state
        # expand: a dst is reachable next if any src in frontier
        hit = jax.ops.segment_max(
            frontier[src].astype(jnp.int32), dst, num_segments=n,
            indices_are_sorted=False)
        new_frontier = jnp.logical_and(hit > 0, levels < 0)
        new_levels = jnp.where(new_frontier, depth + 1, levels)
        changed = jnp.any(new_frontier)
        return new_levels, new_frontier, depth + 1, changed

    levels, _, _, _ = lax.while_loop(
        cond, body,
        (levels0, start.astype(bool), jnp.int32(0), jnp.bool_(True)))
    return levels


def pagerank(src: jnp.ndarray, dst: jnp.ndarray, n: int,
             valid: jnp.ndarray, damping: float = 0.85,
             iters: int = 20) -> jnp.ndarray:
    """PageRank over the edge list; dangling mass redistributed uniformly."""
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    out_deg = jax.ops.segment_sum(
        jnp.ones_like(src, jnp.float32), src, num_segments=n)
    rank0 = jnp.where(valid, 1.0 / nv, 0.0)

    def body(_, rank):
        contrib = jnp.where(out_deg > 0, rank / jnp.maximum(out_deg, 1.0),
                            0.0)
        incoming = jax.ops.segment_sum(contrib[src], dst, num_segments=n)
        dangling = jnp.sum(jnp.where((out_deg == 0) & valid, rank, 0.0))
        new = (1.0 - damping) / nv + damping * (incoming + dangling / nv)
        return jnp.where(valid, new, 0.0)

    return lax.fori_loop(0, iters, body, rank0)


def connected_components(src: jnp.ndarray, dst: jnp.ndarray, n: int,
                         valid: jnp.ndarray) -> jnp.ndarray:
    """Label propagation: every node converges to the min node-id in its
    (weakly) connected component. Pass both edge directions."""
    labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32),
                        jnp.int32(n))

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        prop = jax.ops.segment_min(labels[src], dst, num_segments=n)
        new = jnp.minimum(labels, prop)
        new = jnp.where(valid, new, jnp.int32(n))
        return new, jnp.any(new != labels)

    labels, _ = lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return jnp.where(valid, labels, -1)


def degree_counts(src: jnp.ndarray, n: int) -> jnp.ndarray:
    return jax.ops.segment_sum(
        jnp.ones_like(src, jnp.int32), src, num_segments=n)
