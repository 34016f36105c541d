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


def classify_pairwise(deltas: np.ndarray,
                      key_sets: Sequence[Set[str]],
                      config: ConsensusConfig = ConsensusConfig()
                      ) -> List[Tuple[int, int, ConflictClass]]:
    """All-pairs classification; the cosine matrix is one device matmul."""
    n = len(key_sets)
    if n < 2:
        return []
    import jax.numpy as jnp

    d = jnp.asarray(np.asarray(deltas, np.float32))
    norms = jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-30)
    cos = np.asarray((d / norms) @ (d / norms).T)
    out = []
    cfg = config
    for i in range(n):
        for j in range(i + 1, n):
            jac = _jaccard(key_sets[i], key_sets[j])
            c = float(cos[i, j])
            if jac > cfg.jaccard_conflict:
                if c >= cfg.identical_threshold and \
                        key_sets[i] == key_sets[j]:
                    cls = ConflictClass.IDENTICAL
                elif c >= cfg.similar_threshold:
                    cls = ConflictClass.SIMILAR
                else:
                    cls = ConflictClass.CONFLICTING
            elif abs(c) <= cfg.orthogonal_threshold:
                cls = ConflictClass.ORTHOGONAL
            elif c >= cfg.similar_threshold:
                cls = ConflictClass.SIMILAR
            else:
                cls = ConflictClass.ORTHOGONAL
            out.append((i, j, cls))
    return out


def merge_orthogonal(deltas: Sequence[np.ndarray]) -> np.ndarray:
    """Orthogonal transactions merge by vector addition
    (tensor_chain auto-merge, lib.rs:1090-1120)."""
    return np.sum([np.asarray(d, np.float32) for d in deltas], axis=0)
