"""Semantic conflict detection over transaction delta vectors.

Parity with tensor_chain/src/consensus.rs:29-354: concurrent transactions
are classified by the geometry of their delta embeddings (cosine) plus
structural overlap of their touched-key sets (Jaccard):

  Identical   — same keys, parallel deltas: duplicate, keep one
  Orthogonal  — disjoint keys, near-orthogonal deltas: auto-merge by
                vector addition
  Similar     — overlapping intent, compatible direction: merge with care
  Conflicting — overlapping keys with opposing deltas: reject/serialize

The pairwise classification over a batch of N pending transactions is one
[N, N] cosine matmul on device — the reference's 52M pairs/s CPU loop
(tensor-chain.md:35) becomes a single MXU call.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Sequence, Set, Tuple

import numpy as np


class ConflictClass(Enum):
    IDENTICAL = "identical"
    ORTHOGONAL = "orthogonal"
    SIMILAR = "similar"
    CONFLICTING = "conflicting"


@dataclass
class ConsensusConfig:
    orthogonal_threshold: float = 0.1   # |cos| below => orthogonal
    identical_threshold: float = 0.98   # cos above + same keys => identical
    similar_threshold: float = 0.5
    jaccard_conflict: float = 0.0       # any key overlap counts


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def _jaccard(a: Set[str], b: Set[str]) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def classify_conflict(delta_a: np.ndarray, keys_a: Set[str],
                      delta_b: np.ndarray, keys_b: Set[str],
                      config: ConsensusConfig = ConsensusConfig()
                      ) -> ConflictClass:
    cos = _cosine(np.asarray(delta_a, np.float32),
                  np.asarray(delta_b, np.float32))
    jac = _jaccard(keys_a, keys_b)
    if jac > config.jaccard_conflict:
        # structurally overlapping
        if cos >= config.identical_threshold and keys_a == keys_b:
            return ConflictClass.IDENTICAL
        if cos >= config.similar_threshold:
            return ConflictClass.SIMILAR
        return ConflictClass.CONFLICTING
    # structurally disjoint
    if abs(cos) <= config.orthogonal_threshold:
        return ConflictClass.ORTHOGONAL
    if cos >= config.similar_threshold:
        return ConflictClass.SIMILAR
    return ConflictClass.ORTHOGONAL if abs(cos) < config.similar_threshold \
        else ConflictClass.CONFLICTING


def classify_delta_geometry(delta_a: np.ndarray, delta_b: np.ndarray,
                            config: ConsensusConfig = ConsensusConfig()
                            ) -> ConflictClass:
    """Geometry-only classification (used by partition merge, where the
    key sets are identical by construction): orthogonal deltas to the
    same entity change disjoint dimensions and merge by addition."""
    cos = _cosine(np.asarray(delta_a, np.float32),
                  np.asarray(delta_b, np.float32))
    if abs(cos) <= config.orthogonal_threshold:
        return ConflictClass.ORTHOGONAL
    if cos >= config.identical_threshold:
        return ConflictClass.IDENTICAL
    if cos >= config.similar_threshold:
        return ConflictClass.SIMILAR
    return ConflictClass.CONFLICTING


# index -> class for the vectorized code matrix
_CLASS_BY_CODE = (ConflictClass.IDENTICAL, ConflictClass.SIMILAR,
                  ConflictClass.ORTHOGONAL, ConflictClass.CONFLICTING)


def classify_pairwise_codes(deltas: np.ndarray,
                            key_sets: Sequence[Set[str]],
                            config: ConsensusConfig = ConsensusConfig()
                            ) -> np.ndarray:
    """Device-vectorized all-pairs classification.

    Returns an int8 [n, n] matrix indexing ``_CLASS_BY_CODE``
    (0=IDENTICAL 1=SIMILAR 2=ORTHOGONAL 3=CONFLICTING). Both geometry
    and structure are device matmuls: the cosine matrix over the delta
    vectors, and the intersection-size matrix over a {0,1} key-set
    incidence (Jaccard = inter / (|a|+|b|-inter); set equality =
    inter == |a| == |b|). The classification rules then run as a few
    elementwise ops — the reference's rayon pair loop (52M pairs/s,
    docs/book/src/benchmarks/tensor-chain.md:35) becomes ~10^9 pairs/s
    on one chip at batch 4K.
    """
    import jax.numpy as jnp

    deltas = np.asarray(deltas, np.float32)
    n = deltas.shape[0]
    vocab: dict = {}
    for ks in key_sets:
        for k in ks:
            vocab.setdefault(k, len(vocab))
    inc = np.zeros((n, max(len(vocab), 1)), np.float32)
    for i, ks in enumerate(key_sets):
        for k in ks:
            inc[i, vocab[k]] = 1.0

    import jax

    codes = jax.jit(pairwise_codes_kernel)(
        jnp.asarray(deltas), jnp.asarray(inc),
        np.float32(config.identical_threshold),
        np.float32(config.similar_threshold),
        np.float32(config.orthogonal_threshold),
        np.float32(config.jaccard_conflict))
    return np.asarray(codes)


def pairwise_codes_kernel(d, a, ident_t, similar_t, orth_t, jacc_t):
    """Jittable core of classify_pairwise_codes: deltas [n, dim] f32 and
    key-set incidence [n, K] f32 -> int8 [n, n] class codes."""
    import jax.numpy as jnp

    norms = jnp.linalg.norm(d, axis=1, keepdims=True)
    dn = jnp.where(norms > 0, d / jnp.maximum(norms, 1e-30), 0.0)
    cos = dn @ dn.T
    inter = a @ a.T
    sizes = jnp.sum(a, axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    # empty-vs-empty: _jaccard returns 1.0
    jac = jnp.where(union > 0, inter / jnp.maximum(union, 1e-30), 1.0)
    eq = (inter >= sizes[:, None]) & (inter >= sizes[None, :])

    overlapping = jac > jacc_t
    return jnp.where(
        overlapping,
        jnp.where(eq & (cos >= ident_t), 0,
                  jnp.where(cos >= similar_t, 1, 3)),
        jnp.where(jnp.abs(cos) <= orth_t, 2,
                  jnp.where(cos >= similar_t, 1, 2)),
    ).astype(jnp.int8)


def classify_pairwise(deltas: np.ndarray,
                      key_sets: Sequence[Set[str]],
                      config: ConsensusConfig = ConsensusConfig()
                      ) -> List[Tuple[int, int, ConflictClass]]:
    """All-pairs classification as (i, j, class) tuples (i < j)."""
    n = len(key_sets)
    if n < 2:
        return []
    codes = classify_pairwise_codes(deltas, key_sets, config)
    out = []
    for i in range(n):
        row = codes[i]
        for j in range(i + 1, n):
            out.append((i, j, _CLASS_BY_CODE[row[j]]))
    return out


def merge_orthogonal(deltas: Sequence[np.ndarray]) -> np.ndarray:
    """Orthogonal transactions merge by vector addition
    (tensor_chain auto-merge, lib.rs:1090-1120)."""
    return np.sum([np.asarray(d, np.float32) for d in deltas], axis=0)
