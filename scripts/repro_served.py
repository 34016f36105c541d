"""Reproduce the served-path latency profile (bench.py served section)
with jax compile logging, to attribute any post-warmup slow query.

Usage: timeout 1800 python scripts/repro_served.py [n_rows]
"""

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d, k = 768, 10
    import jax

    jax.config.update("jax_log_compiles", True)
    logging.basicConfig(level=logging.WARNING)
    logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
    logging.getLogger("jax._src.interpreters.pxla").setLevel(
        logging.WARNING)

    from neumann_tpu.router import QueryRouter
    from neumann_tpu.server.client import NeumannClient
    from neumann_tpu.server.server import NeumannServer

    router = QueryRouter()
    router.vector.config.mesh_auto = False
    vecs = np.random.default_rng(17).standard_normal(
        (n, d)).astype(np.float32)
    t0 = time.perf_counter()
    eng = router.vector
    for i in range(n):
        eng.store_embedding(f"s{i}", vecs[i])
    print(f"[repro] ingest {n}: {time.perf_counter() - t0:.1f}s",
          flush=True)

    server = NeumannServer(router=router, port=0)
    t0 = time.perf_counter()
    server.serve(block=False, warmup=True)
    print(f"[repro] warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    try:
        client = NeumannClient.connect(f"127.0.0.1:{server.port}")
        qs = vecs[:64] + 0.05 * np.random.default_rng(19).standard_normal(
            (64, d)).astype(np.float32)
        lat = []
        for i in range(64):
            stmt = ("SIMILAR [" + ",".join(f"{x:.4f}" for x in qs[i])
                    + f"] TOP {k}")
            t0 = time.perf_counter()
            client.execute(stmt)
            dt = time.perf_counter() - t0
            lat.append(dt)
            if i < 5 or dt > 0.3:
                print(f"[repro] q{i}: {dt * 1e3:.1f} ms", flush=True)
        lat_ms = np.asarray(lat) * 1e3
        print(f"[repro] p50 {np.percentile(lat_ms, 50):.1f} ms  "
              f"p99 {np.percentile(lat_ms, 99):.1f} ms", flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    main()
