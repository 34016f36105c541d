"""SDK tour: embedded + remote clients, transactions, asyncio,
retry, numpy/pandas bridges, and the host HNSW index.

Run: python examples/sdk_tour.py
"""

import asyncio

import numpy as np

from neumann_tpu.server import (
    NeumannClient,
    NeumannServer,
    RetryConfig,
)
from neumann_tpu.server.aio import AsyncNeumannClient
from neumann_tpu.server.integrations import (
    cosine_similarity,
    result_to_dataframe,
    vectors_to_inserts,
)


def main() -> None:
    # -- remote mode over a real gRPC socket ---------------------------
    srv = NeumannServer(port=0)
    srv.serve()
    cli = NeumannClient.connect(f"127.0.0.1:{srv.port}")

    cli.execute("CREATE TABLE papers (id INT PRIMARY KEY, title TEXT, "
                "area TEXT)")
    cli.execute("INSERT INTO papers VALUES "
                "(1, 'Attention Is All You Need', 'ml'), "
                "(2, 'The Raft Consensus Algorithm', 'systems'), "
                "(3, 'Billion-scale Similarity Search', 'systems')")

    # numpy bridge: vectors -> EMBED statements
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((3, 64)).astype(np.float32)
    for stmt in vectors_to_inserts(["p1", "p2", "p3"], vecs):
        cli.execute(stmt)
    hits = cli.execute("SIMILAR 'p1' TOP 2").hits
    print("similar:", [(h["key"], round(h["score"], 3)) for h in hits])
    print("numpy cosine check:",
          round(cosine_similarity(vecs[0], vecs[1]), 3))

    # chain transaction: commits atomically, rolls back on error
    with cli.transaction() as tx:
        tx.execute("EMBED STORE 'p4' [1.0, 0.0]")
    print("chain height:", cli.execute("CHAIN HEIGHT").count)

    # pandas bridge (optional dependency)
    try:
        df = result_to_dataframe(
            cli.execute("SELECT title, area FROM papers ORDER BY id"))
        print("dataframe:\n", df)
    except Exception as e:       # pandas absent: the bridge says so
        print("pandas bridge:", e)

    # -- asyncio client ------------------------------------------------
    async def tour_async() -> None:
        retry = RetryConfig(max_retries=2, initial_backoff_s=0.05)
        async with AsyncNeumannClient.connect(
                f"127.0.0.1:{srv.port}", retry=retry) as acli:
            health = await acli.health()
            print("async health:", health["ok"], health["device"])
            rows = []
            async for chunk in acli.execute_stream(
                    "SELECT * FROM papers"):
                rows.extend(chunk.rows)
            print("async streamed rows:", len(rows))

    asyncio.run(tour_async())

    # -- host HNSW index (incremental single-query workloads) ----------
    from neumann_tpu.ops.hnsw import HNSWConfig, HNSWIndex

    ix = HNSWIndex(64, HNSWConfig.high_recall())
    for v in rng.standard_normal((500, 64)).astype(np.float32):
        ix.insert_quantized(v)
    q = ix.get(7)
    top = ix.search(q, 3)
    print("hnsw top-3:", [(i, round(s, 3)) for i, s in top])
    print("hnsw stats:", ix.access_stats())

    cli.close()
    srv.stop()


if __name__ == "__main__":
    main()
