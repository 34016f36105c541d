"""Mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("shard",)) -> Mesh:
    """1-D (or reshaped) device mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    arr = np.array(devs[:n])
    if len(axis_names) > 1:
        per = round(n ** (1 / len(axis_names)))
        shape = [per] * len(axis_names)
        shape[-1] = n // int(np.prod(shape[:-1]))
        arr = arr.reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
