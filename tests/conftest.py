"""Test config: force a virtual 8-device CPU mesh before jax imports.

Multi-chip sharding logic is exercised on 8 virtual CPU devices
(xla_force_host_platform_device_count), mirroring how the reference tests
multi-node logic in-process with MemoryTransport instead of a real cluster
(tensor_chain/src/network.rs:981-1283).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
