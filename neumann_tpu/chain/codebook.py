"""Hierarchical vector-quantization codebooks for chain state.

Parity with tensor_chain/src/codebook.rs: a static GlobalCodebook of
archetype centroids validates/compresses block delta embeddings, and a
per-domain LocalCodebook adapts with EMA updates as new deltas commit.
Quantizing a block's delta to its nearest code both compresses history
(store the code id, not the vector) and flags anomalous transitions
(distance above a calibrated threshold).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class GlobalCodebook:
    """Static codebook trained once over representative deltas."""

    def __init__(self, dim: int, n_codes: int = 64):
        self.dim = dim
        self.n_codes = n_codes
        self.codes: Optional[np.ndarray] = None
        self._threshold: Optional[float] = None

    def train(self, deltas: np.ndarray, iters: int = 20) -> None:
        from neumann_tpu.parallel.partitioner import kmeans

        x = np.asarray(deltas, np.float32)
        self.codes = kmeans(x, min(self.n_codes, len(x)), iters)
        # calibrate anomaly threshold: p99 of training distances
        d = self._distances(x)
        self._threshold = float(np.percentile(d.min(axis=1), 99)) * 1.5

    def _distances(self, x: np.ndarray) -> np.ndarray:
        c = self.codes
        return (np.sum(x * x, 1)[:, None] - 2 * x @ c.T
                + np.sum(c * c, 1)[None, :])

    def quantize(self, delta: np.ndarray) -> Tuple[int, float]:
        """(code id, quantization distance)."""
        if self.codes is None:
            raise ValueError("codebook not trained")
        d = self._distances(np.asarray(delta, np.float32)[None, :])[0]
        idx = int(np.argmin(d))
        return idx, float(np.sqrt(max(d[idx], 0.0)))

    def decode(self, code: int) -> np.ndarray:
        return self.codes[code].copy()

    def is_anomalous(self, delta: np.ndarray) -> bool:
        """Transition far from every known archetype."""
        if self._threshold is None:
            return False
        _, dist = self.quantize(delta)
        return dist * dist > self._threshold


class LocalCodebook:
    """EMA-adaptive per-domain codebook layered over the global one."""

    def __init__(self, global_codebook: GlobalCodebook,
                 ema: float = 0.1):
        self.base = global_codebook
        self.ema = ema
        self.codes = (global_codebook.codes.copy()
                      if global_codebook.codes is not None else None)
        self.usage = np.zeros(
            len(self.codes) if self.codes is not None else 0, np.int64)

    def observe(self, delta: np.ndarray) -> int:
        """Quantize and adapt the winning code toward the delta."""
        if self.codes is None:
            raise ValueError("codebook not trained")
        x = np.asarray(delta, np.float32)
        d = (np.sum(x * x) - 2 * self.codes @ x
             + np.sum(self.codes * self.codes, 1))
        idx = int(np.argmin(d))
        self.codes[idx] = (1 - self.ema) * self.codes[idx] + self.ema * x
        self.usage[idx] += 1
        return idx

    def drift_from_global(self) -> float:
        """How far local codes have adapted away from the global book."""
        if self.codes is None or self.base.codes is None:
            return 0.0
        return float(np.linalg.norm(self.codes - self.base.codes)
                     / max(np.linalg.norm(self.base.codes), 1e-30))
