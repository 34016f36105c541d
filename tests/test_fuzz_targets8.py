"""Fuzz wave 8: oracle-checked targets for this round's newest
machinery — graph-access permission BFS (differential vs a naive
exhaustive-path oracle), SnapshotBuffer random op storms (vs a plain
bytes oracle), the streaming relational cursor (vs one-shot select),
the bounded cursor store (capacity/TTL invariants under random ops),
and the graph partitioner (determinism + pin overrides)."""

import os
import random

from neumann_tpu.chain.snapshot_buffer import (SnapshotBuffer,
                                               SnapshotBufferConfig)
from neumann_tpu.engines.graph_distributed import (GraphPartitioner,
                                                   PartitionConfig,
                                                   PartitionStrategy)
from neumann_tpu.vault.access import (AccessController, EdgeSigner,
                                      edge_type_for)
from neumann_tpu.vault.vault import Permission

SEEDS = range(30)


# ------------------------------------------------------------- access oracle

def _naive_permission(members, accesses, source, target, max_depth=32):
    """Exhaustive oracle: enumerate all MEMBER paths from source (DFS,
    bounded), take the max permission over access edges (src in
    reachable-set) -> target."""
    if source == target:
        return Permission.ADMIN
    reach = {source: 0}
    stack = [(source, 0)]
    while stack:
        cur, d = stack.pop()
        if d >= max_depth:
            continue
        for a, b in members:
            if a == cur and (b not in reach or reach[b] > d + 1):
                reach[b] = d + 1
                stack.append((b, d + 1))
    best = None
    for src, dst, perm in accesses:
        if dst == target and src in reach:
            best = perm if best is None else max(best, perm)
    return best


def test_fuzz_access_permission_vs_oracle():
    for seed in SEEDS:
        rng = random.Random(seed)
        entities = [f"e{i}" for i in range(rng.randint(3, 10))]
        secrets = [f"s{i}" for i in range(rng.randint(1, 4))]
        ac = AccessController()
        members, accesses = [], []
        for _ in range(rng.randint(2, 14)):
            a, b = rng.sample(entities, 2)
            ac.add_member_edge(a, b)
            members.append((a, b))
        for _ in range(rng.randint(1, 8)):
            src = rng.choice(entities)
            dst = rng.choice(secrets)
            perm = rng.choice(list(Permission))
            ac.add_access_edge(src, dst, perm)
            accesses.append((src, dst, perm))
        for src in entities:
            for dst in secrets:
                got = ac.get_permission_level(src, dst)
                want = _naive_permission(members, accesses, src, dst)
                assert got == want, (seed, src, dst, got, want)


def test_fuzz_access_tampered_edges_never_grant():
    """Under a wrong verification key every signed edge is skipped, so
    the verified check can never exceed what unsigned edges grant."""
    from neumann_tpu.vault.attenuation import AttenuationPolicy

    for seed in SEEDS:
        rng = random.Random(1000 + seed)
        ac = AccessController()
        signer = EdgeSigner(b"right")
        wrong = EdgeSigner(b"wrong")
        policy = AttenuationPolicy.none()
        entities = [f"e{i}" for i in range(5)]
        for _ in range(rng.randint(1, 8)):
            src = rng.choice(entities)
            ac.add_access_edge(src, "secret", rng.choice(list(Permission)),
                               signer=signer, timestamp=rng.randint(0, 99))
        for src in entities:
            assert ac.get_permission_level_verified(
                "secret", "secret", wrong, policy) == Permission.ADMIN
            assert ac.get_permission_level_verified(
                src, "secret", wrong, policy) is None


# ------------------------------------------------------------- snapshot buffer

def test_fuzz_snapshot_buffer_vs_bytes_oracle():
    for seed in SEEDS:
        rng = random.Random(seed)
        threshold = rng.choice([64, 256, 1024])
        buf = SnapshotBuffer(SnapshotBufferConfig(memory_threshold=threshold))
        oracle = bytearray()
        for _ in range(rng.randint(1, 20)):
            piece = os.urandom(rng.randint(0, 700))
            buf.write(piece)
            oracle.extend(piece)
        buf.finalize()
        assert buf.size == len(oracle)
        assert bytes(buf.as_bytes()) == bytes(oracle)
        import hashlib
        assert buf.hash_hex() == hashlib.sha256(bytes(oracle)).hexdigest()
        # random chunk reads
        for _ in range(8):
            if buf.size == 0:
                break
            off = rng.randint(0, buf.size - 1)
            ln = rng.randint(1, 900)
            assert buf.read_chunk(off, ln) == bytes(oracle[off: off + ln])
        path = buf.temp_path()
        buf.cleanup()
        if path:
            assert not os.path.exists(path)


# ------------------------------------------------------------- streaming cursor

def test_fuzz_streaming_cursor_vs_select():
    from neumann_tpu.engines.condition import Condition
    from neumann_tpu.engines.relational import Column, RelationalEngine

    for seed in SEEDS:
        rng = random.Random(seed)
        e = RelationalEngine()
        e.create_table("t", [Column("id", "int"), Column("v", "int")])
        n = rng.randint(0, 300)
        e.insert_many("t", [{"id": i, "v": rng.randint(0, 9)}
                            for i in range(n)])
        cond = (None if rng.random() < 0.3
                else Condition.cmp("v", rng.choice(["<", "=", ">"]),
                                   rng.randint(0, 9)))
        batch = rng.choice([1, 3, 7, 50, 1000])
        max_rows = rng.choice([None, None, 5, 40])
        want = e.select("t", cond)
        if max_rows is not None:
            want = want[:max_rows]
        got = list(e.select_streaming("t", cond, batch_size=batch,
                                      max_rows=max_rows))
        assert got == want, (seed, batch, max_rows)


# ------------------------------------------------------------- cursor store

def test_fuzz_cursor_store_invariants():
    from neumann_tpu.router.cursor_store import (CursorError, CursorStore,
                                                 CursorStoreConfig)

    for seed in SEEDS:
        rng = random.Random(seed)
        cap = rng.randint(1, 6)
        s = CursorStore(CursorStoreConfig(max_cursors=cap,
                                          default_ttl=30.0,
                                          cleanup_interval=9999))
        live = []
        for step in range(60):
            op = rng.random()
            if op < 0.55:
                c = s.new_cursor(f"q{step}", [step], page_size=1)
                live.append(c.id)
            elif op < 0.8 and live:
                cid = rng.choice(live)
                try:
                    got = s.get(cid)
                    assert got.id == cid
                except CursorError:
                    live.remove(cid)  # evicted by capacity pressure
            elif live:
                cid = rng.choice(live)
                s.remove(cid)
                live.remove(cid)
            assert len(s) <= cap, (seed, step)
        # every surviving id is either retrievable or was LRU-evicted
        retrievable = 0
        for cid in live:
            try:
                s.get(cid)
                retrievable += 1
            except CursorError:
                pass
        assert retrievable <= cap


# ------------------------------------------------------------- partitioner

def test_fuzz_partitioner_deterministic_and_pinnable():
    for seed in SEEDS:
        rng = random.Random(seed)
        shards = rng.randint(1, 16)
        strategy = rng.choice(list(PartitionStrategy))
        cfg = PartitionConfig(num_shards=shards, strategy=strategy)
        if strategy is PartitionStrategy.RANGE:
            bounds = sorted(rng.sample(range(1, 10_000), shards - 1)) \
                if shards > 1 else []
            edges = [0] + bounds + [10_000]
            cfg.ranges = list(zip(edges[:-1], edges[1:]))
        p = GraphPartitioner(cfg)
        ids = [rng.randint(0, 20_000) for _ in range(200)]
        first = [p.shard_for_node(i) for i in ids]
        assert first == [p.shard_for_node(i) for i in ids]
        assert all(0 <= sh < shards for sh in first)
        # pins always win
        nid = ids[0]
        p.assign_node(nid, shards - 1)
        assert p.shard_for_node(nid) == shards - 1


def test_fuzz_access_edge_signature_bits():
    """Any single-field perturbation must break the MAC."""
    s = EdgeSigner(os.urandom(16))
    for seed in SEEDS:
        rng = random.Random(seed)
        src, dst = f"a{rng.randint(0, 99)}", f"b{rng.randint(0, 99)}"
        etype = edge_type_for(rng.choice(list(Permission)))
        ts = rng.randint(0, 1 << 30)
        sig = s.sign_edge(src, dst, etype, ts)
        assert s.verify_edge(src, dst, etype, ts, sig)
        assert not s.verify_edge(src + "x", dst, etype, ts, sig)
        assert not s.verify_edge(src, dst + "x", etype, ts, sig)
        assert not s.verify_edge(src, dst, etype, ts + 1, sig)


# ------------------------------------------------------------- angular metric

def test_angular_geodesic_metric_matches_arccos_of_cosine():
    import numpy as np
    import jax.numpy as jnp

    from neumann_tpu.ops.scan import score_all, topk_scan_jit

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((64, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    # score_all is the INTERNAL ordering primitive: angular orders by
    # plain cosine there (arccos is monotone); the public topk_scan
    # reports the finalized -arccos distances.
    cos = np.asarray(score_all(jnp.asarray(corpus), jnp.asarray(q),
                               metric="cosine"))
    for metric in ("angular", "geodesic"):
        raw = np.asarray(score_all(jnp.asarray(corpus), jnp.asarray(q),
                                   metric=metric))
        np.testing.assert_allclose(raw, cos, rtol=1e-6)
        s, i = topk_scan_jit(jnp.asarray(corpus), jnp.asarray(q), 5, metric)
        s_cos, i_cos = topk_scan_jit(jnp.asarray(corpus), jnp.asarray(q), 5,
                                     "cosine")
        assert np.array_equal(np.asarray(i), np.asarray(i_cos))  # same order
        np.testing.assert_allclose(
            np.asarray(s),
            -np.arccos(np.clip(np.asarray(s_cos), -1, 1)),
            rtol=1e-5, atol=1e-5)
        assert np.all(np.asarray(s) <= 0.0)  # -arccos in [-pi, 0]


def test_vector_engine_accepts_angular():
    import numpy as np

    from neumann_tpu.engines.vector import VectorEngine

    e = VectorEngine()
    rng = np.random.default_rng(1)
    for i in range(20):
        e.store_embedding(f"k{i}", rng.standard_normal(8).astype(np.float32))
    hits = e.search_similar_with_metric(rng.standard_normal(8), 5,
                                        metric="angular")
    assert len(hits) == 5
    base = e.search_similar_with_metric(
        np.asarray(e.get_embedding("k3")), 1, metric="geodesic")
    assert base[0].key == "k3"


def test_sparse_geodesic_alias():
    import numpy as np

    from neumann_tpu.store.sparse import SparseVector

    a = SparseVector.from_dense(np.array([1.0, 0, 2.0, 0]))
    b = SparseVector.from_dense(np.array([0.5, 0, 1.7, 0.1]))
    assert a.geodesic_distance(b) == a.angular_distance(b)
