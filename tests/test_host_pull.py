"""host_pull: overlapped device->host transfers (ops/scan.py).

On the dev TPU tunnel every blocking pull pays a ~25 ms latency floor;
host_pull starts non-blocking D2H copies for all arrays first so a
(scores, ids) result costs one floor. These tests pin semantics (value
fidelity, numpy passthrough, mixed inputs) — the latency win is only
observable on the real tunnel.
"""

import jax.numpy as jnp
import numpy as np

from neumann_tpu.ops import host_pull


def test_values_roundtrip():
    a = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    b = jnp.asarray([[1, -1], [7, 3]], dtype=jnp.int32)
    ah, bh = host_pull(a, b)
    assert isinstance(ah, np.ndarray) and isinstance(bh, np.ndarray)
    np.testing.assert_array_equal(
        ah, np.arange(12, dtype=np.float32).reshape(3, 4))
    np.testing.assert_array_equal(bh, [[1, -1], [7, 3]])


def test_numpy_passthrough_and_mixed():
    a = np.ones((2, 2), np.float32)
    b = jnp.zeros((2,), jnp.int32)
    ah, bh = host_pull(a, b)
    np.testing.assert_array_equal(ah, a)
    np.testing.assert_array_equal(bh, [0, 0])


def test_single_and_empty():
    (x,) = host_pull(jnp.asarray([5.0]))
    assert x[0] == 5.0
    assert host_pull() == ()
