"""Vector search — the north-star workload (examples/vector_search.rs).

Stores document embeddings, runs SIMILAR searches through the query
language and the engine API, shows filtered + quantized collections.
Run: python examples/vector_search.py
"""

import numpy as np

from neumann_tpu.router import QueryRouter


def main():
    r = QueryRouter()
    rng = np.random.default_rng(0)

    # store 10K document embeddings through the engine API (batched)
    vecs = rng.standard_normal((5_000, 128)).astype(np.float32)
    r.vector.batch_store_embeddings(
        [(f"doc:{i}", vecs[i]) for i in range(len(vecs))])
    print(f"stored {r.execute('COUNT EMBEDDINGS').count} embeddings")

    # SIMILAR by key through the query language
    res = r.execute("SIMILAR 'doc:42' TOP 5")
    print("\nSIMILAR 'doc:42' TOP 5:")
    for hit in res.results:
        print(f"  {hit['key']:>10}  {hit['score']:.4f}")

    # metadata-filtered search in an int8-quantized collection
    r.execute("CREATE COLLECTION news DIMENSION 128 QUANTIZATION int8")
    for i in range(500):
        r.vector.store_in_collection(
            "news", f"n{i}", vecs[i],
            {"lang": "en" if i % 3 else "de", "year": 2020 + i % 5})
    res = r.execute("SIMILAR [%s] TOP 3 IN news WHERE lang = 'de'"
                    % ", ".join(f"{x:.4f}" for x in vecs[9]))
    print("\nfiltered int8 search (lang = 'de'):")
    for hit in res.results:
        print(f"  {hit['key']:>6}  {hit['score']:.4f}")

    # sub-linear index (IVF; hnsw-compatible API)
    r.vector.build_ivf_index(n_clusters=64, nprobe=8)
    hits = r.vector.search_with_ivf_nprobe(vecs[123], 5, nprobe=8)
    print("\nIVF nprobe=8 search:")
    for h in hits:
        print(f"  {h.key:>10}  {h.score:.4f}")


if __name__ == "__main__":
    main()
