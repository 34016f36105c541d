"""Persistent XLA compilation cache for every neumann_tpu entry point.

SURVEY §7 hard part (f): p99-bounded serving and fast restarts need
persistent compiled executables, not per-process trace+compile. JAX's
persistent compilation cache serializes XLA executables keyed by
(HLO, compile flags, device topology); any later process on the same
chip loads them in milliseconds instead of recompiling for seconds.
On the bench TPU a cold 10M-corpus run pays ~10 distinct jit compiles
(k-means step, chunk assignment, scan/rerank cores, probe kernels) —
with the cache warm those all come back from disk, which is the TPU
equivalent of the reference shipping prebuilt native binaries (its
Rust engines have no JIT step at all — compile once at `cargo build`;
ours compiles once per (kernel, shape) per MACHINE, not per process).

Call :func:`enable_persistent_cache` before the first `jax.jit`
execution. It is idempotent and safe on any backend (CPU tests reuse
the cache too). Opt out with ``NEUMANN_NO_COMPILE_CACHE=1``; point the
cache somewhere else with ``NEUMANN_COMPILE_CACHE=/path``.
"""

from __future__ import annotations

import os

_enabled_path: str | None = None


def host_fingerprint() -> str:
    """Short fingerprint of THIS host's machine features.

    XLA:CPU AOT-compiles against the compiling host's CPU features; an
    executable cached on one machine and loaded on another can SIGILL
    (the r4 dryrun tail was full of `cpu_aot_loader ... Machine type
    ... doesn't match` warnings). The JAX cache key does not include
    host features, so we scope the cache DIRECTORY per host instead:
    arch + a hash of /proc/cpuinfo flags. A mismatched host resolves a
    different directory and recompiles — never loads foreign AOT code.
    ``NEUMANN_FAKE_CPU_FEATURES`` overrides the flags (tests)."""
    import hashlib
    import platform

    feats = os.environ.get("NEUMANN_FAKE_CPU_FEATURES")
    if feats is None:
        feats = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        feats = line.split(":", 1)[1].strip()
                        break
        except OSError:
            pass
        feats += platform.processor()
    h = hashlib.sha256(feats.encode()).hexdigest()[:12]
    return f"{platform.machine()}-{h}"


def default_cache_dir() -> str:
    """Repo-/package-adjacent cache dir (kept beside the installed
    package so multiple checkouts don't share stale flag-keyed
    entries; the key includes flags+topology so sharing is safe, this
    is just locality)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), ".cache", "jax")


def enable_persistent_cache(path: str | None = None,
                            allow_cpu: bool = False) -> str | None:
    """Enable JAX's on-disk compilation cache. Returns the cache dir,
    or None when disabled (env opt-out, an unwritable target, or a
    CPU-only backend without explicit opt-in).

    On CPU the cache is skipped unless the caller opts in (explicit
    ``path``, ``allow_cpu=True``, or NEUMANN_COMPILE_CACHE): XLA:CPU
    persists executables as AOT machine code whose deserializer
    feature-checks every load (same-host loads trip a pseudo-feature
    false positive; foreign-host loads can SIGILL), and CPU compiles
    are fast enough that the cache buys little — the minutes-long
    remote AOT compiles it exists for are a TPU phenomenon."""
    global _enabled_path
    if os.environ.get("NEUMANN_NO_COMPILE_CACHE") == "1":
        return None
    if _enabled_path is not None:
        return _enabled_path
    env_path = os.environ.get("NEUMANN_COMPILE_CACHE")
    if path is None and env_path is None and not allow_cpu:
        import jax

        if jax.default_backend() == "cpu":
            return None
    path = path or env_path or default_cache_dir()
    # per-host subdir: an AOT result compiled under different CPU
    # features must never be loaded here (see host_fingerprint)
    path = os.path.join(path, host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".w")
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache anything that took >=0.4 s to compile: the big scan/probe
    # executables are seconds-to-minutes, tiny host-math jits are not
    # worth the disk round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_path = path
    return path
