"""Test config: force a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised on 8 virtual CPU devices
(xla_force_host_platform_device_count), mirroring how the reference tests
multi-node logic in-process with MemoryTransport instead of a real cluster
(tensor_chain/src/network.rs:981-1283).

NOTE: the axon TPU plugin's site hook imports jax at interpreter startup,
so JAX_PLATFORMS set here would be too late — but the backend itself is
still uninitialized, so jax.config.update works. XLA_FLAGS is read at
backend init, which also hasn't happened yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# reuse compiled executables across test runs (same on-disk cache the
# bench/server use; entries are keyed by HLO+flags+topology so the
# 8-device CPU mesh never collides with TPU entries)
from neumann_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

# allow_cpu: the suite re-hits the same-host cache thousands of times;
# production CPU-only processes skip it (see compile_cache docstring)
enable_persistent_cache(allow_cpu=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
    yield
