"""Mesh-sharded search + partitioner tests on the virtual 8-device mesh."""

import numpy as np
import pytest

from neumann_tpu.parallel import (
    ConsistentHashPartitioner,
    SemanticPartitioner,
    ShardedCorpus,
    VoronoiPartitioner,
    make_mesh,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == 8


def test_sharded_search_matches_oracle(rng):
    mesh = make_mesh(8)
    n, d, k = 512, 64, 7
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sc = ShardedCorpus(mesh, d)
    sc.load(vecs)
    queries = vecs[:3]
    s, i = sc.search(queries, k)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    oracle = qn @ vn.T
    want = np.argsort(-oracle, axis=1)[:, :k]
    for qi in range(3):
        assert i[qi, 0] == qi  # self-hit first
        np.testing.assert_allclose(
            np.sort(oracle[qi, i[qi]]), np.sort(oracle[qi, want[qi]]),
            rtol=1e-3, atol=1e-3)


def test_sharded_search_masked(rng):
    mesh = make_mesh(4)
    n, d = 256, 32
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[10:20] = True
    sc = ShardedCorpus(mesh, d)
    sc.load(vecs, mask)
    s, i = sc.search(vecs[0], 5)
    assert all(10 <= x < 20 for x in i[0] if x >= 0)


def test_sharded_int8(rng):
    mesh = make_mesh(8)
    n, d, k = 1024, 128, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sc = ShardedCorpus(mesh, d, quantized=True)
    sc.load(vecs)
    s, i = sc.search(vecs[42], k)
    assert i[0, 0] == 42


def test_sharded_euclidean(rng):
    mesh = make_mesh(2)
    vecs = rng.standard_normal((64, 16)).astype(np.float32)
    sc = ShardedCorpus(mesh, 16)
    sc.load(vecs)
    s, i = sc.search(vecs[7], 3, metric="euclidean")
    assert i[0, 0] == 7


def test_consistent_hash():
    p = ConsistentHashPartitioner(["s0", "s1", "s2"])
    keys = [f"k{i}" for i in range(1000)]
    before = {k: p.assign(k) for k in keys}
    counts = {}
    for s in before.values():
        counts[s] = counts.get(s, 0) + 1
    assert all(c > 100 for c in counts.values())  # roughly balanced
    # stability under shard addition: most keys keep their shard
    p.add_shard("s3")
    after = {k: p.assign(k) for k in keys}
    moved = sum(1 for k in keys if before[k] != after[k])
    assert moved < 500
    assert any(after[k] == "s3" for k in keys)
    p.remove_shard("s3")
    restored = {k: p.assign(k) for k in keys}
    assert restored == before


def test_semantic_partitioner(rng):
    # three well-separated clusters
    centers = np.array([[10, 0], [0, 10], [-10, -10]], np.float32)
    data = np.concatenate([
        centers[i] + 0.5 * rng.standard_normal((50, 2)).astype(np.float32)
        for i in range(3)])
    p = SemanticPartitioner(3)
    p.train(data)
    assign = p.assign_batch(data)
    # points in the same cluster land in the same shard
    for i in range(3):
        blk = assign[i * 50:(i + 1) * 50]
        assert len(set(blk.tolist())) == 1
    # query routing probes the nearest centroid first
    shards = p.query_shards(centers[1], nprobe=2)
    assert shards[0] == assign[50]


def test_voronoi_partitioner():
    seeds = np.array([[0, 0], [10, 10]], np.float32)
    p = VoronoiPartitioner(seeds)
    assert p.assign([1, 1]) == 0
    assert p.assign([9, 9]) == 1
    b = p.assign_batch(np.array([[0, 1], [10, 9]], np.float32))
    assert b.tolist() == [0, 1]
    np.testing.assert_allclose(p.region_of(1), [10, 10])


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    # compile-check only (small shapes would differ; just lower)
    jax.jit(fn).lower(*args).compile()


# ------------------------------------------------- distributed planner

def make_shard_cluster(rng, n_shards=3, docs_per=50, d=16):
    from neumann_tpu.parallel.distributed import (
        DistributedExecutor,
        QueryPlanner,
    )
    from neumann_tpu.router import QueryRouter

    routers = {}
    executors = {}
    for s in range(n_shards):
        r = QueryRouter()
        for i in range(docs_per):
            gid = s * docs_per + i
            r.vector.store_embedding(
                f"doc{gid}",
                np.eye(d, dtype=np.float32)[gid % d]
                + 0.01 * rng.standard_normal(d).astype(np.float32))
        routers[f"s{s}"] = r
        executors[f"s{s}"] = r.execute
    planner = QueryPlanner("s0", list(routers))
    return DistributedExecutor(planner, executors), routers


def test_scatter_gather_topk(rng):
    ex, routers = make_shard_cluster(rng)
    vec = ", ".join("1.0" if i == 3 else "0.0" for i in range(16))
    out = ex.execute(f"SIMILAR [{vec}] TOP 5")
    assert len(out.results) == 5
    # global best should be a doc whose id % 16 == 3 from ANY shard
    assert all(int(h["key"][3:]) % 16 == 3 for h in out.results[:3])
    # scores sorted descending across shards
    scores = [h["score"] for h in out.results]
    assert scores == sorted(scores, reverse=True)


def test_aggregate_and_first_non_empty(rng):
    ex, routers = make_shard_cluster(rng)
    out = ex.execute("COUNT EMBEDDINGS")
    assert out.count == 150
    out2 = ex.execute("EMBED GET 'doc120'")  # lives on shard 2 only
    assert out2.value is not None


def test_concat_merge(rng):
    ex, routers = make_shard_cluster(rng)
    for name, r in routers.items():
        r.execute("CREATE TABLE t (shard TEXT)")
        r.execute(f"INSERT INTO t VALUES ('{name}')")
    out = ex.execute("SELECT * FROM t")
    assert {row["shard"] for row in out.rows} == {"s0", "s1", "s2"}


def test_semantic_routing(rng):
    from neumann_tpu.parallel.distributed import QueryPlanner
    from neumann_tpu.parallel.partitioner import SemanticPartitioner

    centers = np.array([[10, 0], [0, 10], [-10, -10]], np.float32)
    data = np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((30, 2)).astype(np.float32)
        for i in range(3)])
    sp = SemanticPartitioner(3)
    sp.train(data)
    planner = QueryPlanner("s0", ["s0", "s1", "s2"], semantic=sp)
    plan = planner.plan_with_embedding("SIMILAR [1.0] TOP 5",
                                       centers[1], nprobe=1)
    assert len(plan.shards) == 1
    full = planner.plan("SIMILAR [1.0] TOP 5")
    assert len(full.shards) == 3 and full.k == 5


def test_shard_failure_degrades(rng):
    ex, routers = make_shard_cluster(rng)
    def boom(q):
        raise RuntimeError("shard down")
    ex.executors["s1"] = boom
    out = ex.execute("COUNT EMBEDDINGS")
    assert out.count == 100  # two healthy shards still answer


def test_sharded_int8_pooled_parity(rng):
    """Large-enough shards take the pooled-bits branch; results must
    match the exact unsharded int8 oracle up to pool collisions."""
    import jax.numpy as jnp

    from neumann_tpu.ops.quant import int8_topk_scan_jit, scalar_quantize

    mesh = make_mesh(8)
    n, d, k = 8 * 4096, 32, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sc = ShardedCorpus(mesh, d, quantized=True)
    sc.load(vecs)
    queries = vecs[:4]
    s, i = sc.search(queries, k)
    assert list(i[:, 0]) == [0, 1, 2, 3]      # self-matches always found
    cq, scale = scalar_quantize(jnp.asarray(vecs))
    es, ei = int8_topk_scan_jit(cq, scale, jnp.asarray(queries), k,
                                "cosine")
    ei = np.asarray(ei)
    recall = np.mean([len(set(ei[r]) & set(i[r])) / k for r in range(4)])
    assert recall >= 0.8


def test_kmeans_device_balance(rng):
    """Balance-aware reseeding: on a well-separated mixture, no cluster
    ends up fatter than ~1.5x a fair share and none die. Plain Lloyd's
    with random init routinely lands two seeds in one mode and none in
    another (measured 6x-fair fattest at 10M/4096) — the downstream
    fixed-window IVF only uses the ORDER, but a balanced histogram
    keeps windows cluster-pure, which is what the probe sharpness
    rides on."""
    import jax.numpy as jnp

    from neumann_tpu.parallel.partitioner import kmeans_device

    k, d = 64, 32
    modes = rng.standard_normal((k, d)).astype(np.float32)
    a = rng.integers(0, k, 16384)
    x = (modes[a] + 0.1 * rng.standard_normal((16384, d))
         ).astype(np.float32)
    cent = np.asarray(kmeans_device(jnp.asarray(x), k, iters=14))
    d2 = ((x ** 2).sum(1)[:, None] - 2 * x @ cent.T
          + (cent ** 2).sum(1)[None, :])
    counts = np.bincount(d2.argmin(1), minlength=k)
    fair = len(x) / k
    assert counts.max() <= 1.6 * fair, counts.max() / fair
    assert (counts == 0).sum() <= 1
    # unbalanced Lloyd's is measurably worse on the same data
    cent0 = np.asarray(kmeans_device(jnp.asarray(x), k, iters=14,
                                     balance=False))
    d20 = ((x ** 2).sum(1)[:, None] - 2 * x @ cent0.T
           + (cent0 ** 2).sum(1)[None, :])
    c0 = np.bincount(d20.argmin(1), minlength=k)
    assert c0.max() > counts.max()
