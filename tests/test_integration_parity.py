"""Integration parity wave: reference integration_tests families the
suite had not yet mirrored — partial/asymmetric partitions and per-link
faults (partial_partition.rs), simultaneous merge initiation
(simultaneous_merge.rs), quorum consistency (quorum_consistency.rs),
cold-tier knn reads (knn_cold_read.rs), cross-engine delete consistency
(delete_consistency.rs), blob+embedding search (blob_embedding_search.rs),
archetype persistence (archetype_persistence.rs), cache invalidation
(cache_invalidation.rs), TCP I/O timeouts (tcp_io_timeout.rs), durable
auto-init (auto_init.rs), and a grand-unification flow through every
engine and module in one router session (grand_unification.rs)."""

import socket
import time

import numpy as np
import pytest

from neumann_tpu.chain.transport import Message, TcpTransport, TransportHub
from neumann_tpu.store.tensor_store import TensorData, TensorStore, TensorValue

from tests.test_cluster_integration import (
    _elect,
    _emb,
    _leader,
    _mk_cluster,
    _pump,
)


# ------------------------------------------------- per-link faults

def test_one_way_partition_link():
    """A blocked directed link drops src->dst only; the reverse
    direction keeps delivering (asymmetric partition)."""
    hub = TransportHub()
    t1, t2 = hub.register("n1"), hub.register("n2")
    hub.block_link("n1", "n2")
    assert not t1.send("n2", "ping", {"term": 1})
    assert t2.send("n1", "ping", {"term": 2})
    got = t1.recv()
    assert got is not None and got.src == "n2"
    assert got.payload["term"] == 2
    assert t2.recv() is None
    hub.unblock_link("n1", "n2")
    assert t1.send("n2", "ping", {"term": 3})


def test_link_quality_degradation():
    """Link quality 1.0 == full drop on that link only; 0.0 restores;
    other links are unaffected."""
    hub = TransportHub(seed=7)
    t1, _t2, t3 = (hub.register(n) for n in ("n1", "n2", "n3"))
    hub.set_link_quality("n1", "n2", 1.0)
    assert not t1.send("n2", "ping", {})
    assert t1.send("n3", "ping", {})        # other link unaffected
    assert t3.recv() is not None
    hub.set_link_quality("n1", "n2", 0.0)
    assert t1.send("n2", "ping", {})
    # lossy (not absolute) link: some of many sends get through
    hub.set_link_quality("n1", "n3", 0.5)
    delivered = sum(t1.send("n3", "ping", {"i": i}) for i in range(100))
    assert 10 < delivered < 90


def test_heal_clears_link_faults():
    hub = TransportHub()
    t1, _ = hub.register("a"), hub.register("b")
    hub.block_link("a", "b", bidirectional=True)
    hub.set_link_quality("b", "a", 1.0)
    hub.heal()
    assert not hub.blocked_links and not hub.link_drop
    assert t1.send("b", "ping", {})


def test_bridge_topology_still_elects_and_commits():
    """Partial (non-transitive) partition: n0 and n2 cannot talk but
    both reach n1 — a 3-node cluster must still elect a leader and
    commit through the bridge quorum."""
    hub, ids, nodes = _mk_cluster(3, seed=3)
    hub.block_link("n0", "n2", bidirectional=True)
    leader = _elect(nodes)
    assert leader.propose_put("via-bridge", _emb([1.0, 0.0, 0.0, 0.0]))
    for _ in range(300):
        _pump(nodes, 1)
        if nodes["n1"].store.get("via-bridge") is not None:
            break
    # the bridge node (reachable from everyone) must have the write
    assert nodes["n1"].store.get("via-bridge") is not None


# ------------------------------------------------- quorum consistency

def test_minority_partition_cannot_commit():
    """Writes proposed on the minority side of a 2/3 split must not
    commit or apply; the majority side keeps committing; on heal the
    minority converges to the majority log (quorum_consistency.rs)."""
    hub, ids, nodes = _mk_cluster(5, seed=11)
    leader = _elect(nodes)
    maj = [leader.id] + [n for n in ids if n != leader.id][:2]
    mino = [n for n in ids if n not in maj]
    hub.partition(set(maj), set(mino))
    _pump(nodes, 100)

    # minority: no leader can arise (2 < quorum 3); any stale-leader
    # propose must never apply
    m = {k: nodes[k] for k in mino}
    for node in m.values():
        node.raft.propose({"op": "put", "key": "stolen",
                           "data": ""}) if node.is_leader() else None
    before = {k: m[k].raft.commit_index for k in mino}
    _pump(nodes, 150)
    assert all(m[k].raft.commit_index == before[k] for k in mino), \
        "minority commit index advanced without quorum"
    assert all(n.store.get("stolen") is None for n in m.values())

    # majority commits
    ld = _leader({k: nodes[k] for k in maj})
    assert ld is not None
    assert ld.propose_put("majority-write", _emb([0.0, 1.0, 0.0, 0.0]))
    _pump(nodes, 80)
    assert all(nodes[k].store.get("majority-write") is not None
               for k in maj)

    hub.heal()
    for _ in range(600):
        _pump(nodes, 1)
        if all(n.store.get("majority-write") is not None
               for n in nodes.values()):
            break
    assert all(n.store.get("majority-write") is not None
               for n in nodes.values()), "minority never converged"
    assert all(n.store.get("stolen") is None for n in nodes.values())


# ------------------------------------------------- simultaneous merge

def test_simultaneous_merge_offers_from_both_minority_nodes():
    """Both isolated nodes write locally and BOTH initiate merge offers
    on heal concurrently; the leader must apply each offered key exactly
    once and answer both sessions (simultaneous_merge.rs)."""
    hub, ids, nodes = _mk_cluster(5, seed=23)
    leader = _elect(nodes)
    maj = [leader.id] + [n for n in ids if n != leader.id][:2]
    mino = [n for n in ids if n not in maj]
    hub.partition(set(maj), set(mino))
    _pump(nodes, 120)

    a, b = nodes[mino[0]], nodes[mino[1]]
    a.put_local("from-a", _emb([1.0, 0.0, 0.0, 0.0]))
    b.put_local("from-b", _emb([0.0, 1.0, 0.0, 0.0]))

    hub.heal()
    for _ in range(900):
        _pump(nodes, 1)
        if not a.local_writes and not b.local_writes and all(
                n.store.get("from-a") is not None
                and n.store.get("from-b") is not None
                for n in nodes.values()):
            break
    assert not a.local_writes and not b.local_writes, \
        "a merge session never completed"
    for nid, node in nodes.items():
        va = node.store.get("from-a")
        vb = node.store.get("from-b")
        assert va is not None and vb is not None, f"{nid} missing a key"
        np.testing.assert_allclose(va.get("embedding").to_dense(),
                                   [1, 0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(vb.get("embedding").to_dense(),
                                   [0, 1, 0, 0], atol=1e-5)


# ------------------------------------------------- cold-tier knn

def test_knn_cold_read(tmp_path):
    """Embeddings pushed to the cold tier remain searchable: reads
    come back intact through the mmap segment, promote on access, and
    the nearest neighbor is found (knn_cold_read.rs)."""
    from neumann_tpu.store.tiered import TieredStore

    ts = TieredStore(str(tmp_path / "tiered"))
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    for i, v in enumerate(vecs):
        ts.put(f"emb:{i}", TensorData().set(
            "embedding", TensorValue.vector(v)))
    moved = ts.migrate_cold()
    assert moved == 50 and ts.stats()["hot"] == 0

    q = vecs[17] + 0.01 * rng.standard_normal(16).astype(np.float32)
    best_key, best_score = None, -np.inf
    for i in range(50):
        data = ts.get(f"emb:{i}")
        assert data is not None, "cold read lost a record"
        v = data.get("embedding").to_dense()
        score = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        if score > best_score:
            best_key, best_score = f"emb:{i}", score
    assert best_key == "emb:17"
    assert ts.stats()["hot"] > 0, "reads must promote to hot"


# ------------------------------------------------- delete consistency

def test_delete_consistency_across_engines():
    """delete_entity must remove the fields, the embedding (search can
    never return it), and every edge (neighbors drop it) atomically
    (delete_consistency.rs)."""
    from neumann_tpu.engines.unified import UnifiedEngine

    u = UnifiedEngine()
    u.create_entity("doc:a", {"title": "a"}, embedding=[1.0, 0.0])
    u.create_entity("doc:b", {"title": "b"}, embedding=[0.9, 0.1])
    u.create_entity("doc:c", {"title": "c"}, embedding=[0.0, 1.0])
    u.connect_entities("doc:a", "doc:b")
    u.connect_entities("doc:b", "doc:c")

    assert u.delete_entity("doc:b")
    assert u.get_entity("doc:b") is None
    assert not u.entity_exists("doc:b")
    hits = [r.key for r in u.find_similar_entities([0.9, 0.1], 3)]
    assert "doc:b" not in hits and "doc:a" in hits
    assert "doc:b" not in u.entity_neighbors("doc:a")
    assert "doc:b" not in u.entity_neighbors("doc:c")
    # deleting again reports absence, not an error
    assert not u.delete_entity("doc:b")


# ------------------------------------------------- blob + embedding

def test_blob_embedding_search():
    """A blob linked to an entity is discoverable through similarity:
    search for the entity, follow its links to the artifact, stream the
    bytes back (blob_embedding_search.rs)."""
    from neumann_tpu.blob.blob_store import BlobStore
    from neumann_tpu.engines.unified import UnifiedEngine

    store = TensorStore()
    u = UnifiedEngine(store=store)
    blob = BlobStore(store)

    payload = b"PDF-ish bytes " * 100
    art = blob.put("report.pdf", payload, content_type="application/pdf")
    u.create_entity("doc:report", {"name": "q3 report"},
                    embedding=[0.0, 1.0, 0.0])
    u.create_entity("doc:other", {"name": "other"},
                    embedding=[1.0, 0.0, 0.0])
    blob.link(art, "doc:report")

    top = u.find_similar_entities([0.1, 0.9, 0.0], 1)[0]
    assert top.key == "doc:report"
    arts = blob.for_entity("doc:report")
    assert arts == [art]
    assert blob.get(art) == payload
    assert b"".join(blob.read_stream(art)) == payload
    # deleting the artifact severs the entity link index
    assert blob.delete(art)
    assert blob.for_entity("doc:report") == []


# ------------------------------------------------- archetype persistence

def test_archetype_registry_snapshot_roundtrip():
    """Archetype centroids survive serialization: a registry restored
    from its snapshot decodes deltas encoded by the original
    (archetype_persistence.rs)."""
    from neumann_tpu.chain.delta_replication import DeltaReplicator
    from neumann_tpu.store.delta_vector import ArchetypeRegistry

    rng = np.random.default_rng(1)
    base = rng.standard_normal((64, 8)).astype(np.float32)
    reg = ArchetypeRegistry()
    reg.discover_archetypes(base)
    rep = DeltaReplicator(reg)

    # deltas well above the registry's sparsity threshold (tiny
    # components are dropped by design — that's the compression)
    vecs = [("k0", base[3] + 0.5), ("k1", base[40] - 0.75)]
    records = rep.encode_batch([(k, np.asarray(v, np.float32))
                                for k, v in vecs])

    rep2 = DeltaReplicator.from_snapshot(rep.registry_snapshot())
    np.testing.assert_allclose(rep2.registry.centroids,
                               reg.centroids, atol=1e-6)
    decoded = dict(rep2.decode_batch(records))
    for k, v in vecs:
        np.testing.assert_allclose(decoded[k], v, atol=1e-4)


# ------------------------------------------------- cache invalidation

def test_cache_invalidation():
    from neumann_tpu.cache.llm_cache import LLMCache

    c = LLMCache()
    c.put("what is neumann", "a database")
    c.put("what is jax", "a compiler stack")
    assert c.get_exact("what is neumann") == "a database"

    assert c.invalidate("What  is   NEUMANN")     # normalized match
    assert c.get_exact("what is neumann") is None
    assert not c.invalidate("what is neumann")    # second time: absent
    # semantic layer must not resurrect the invalidated entry
    assert c.get("what is neumann", threshold=0.99) is None
    assert c.stats.invalidations == 1
    assert len(c) == 1

    c.put("ns:a 1", "r1")
    c.put("ns:a 2", "r2")
    c.put("other", "r3")
    assert c.invalidate_prefix("ns:a") == 2
    assert c.get_exact("other") == "r3"


def test_cache_ttl_expiry_on_get():
    from neumann_tpu.cache.llm_cache import LLMCache

    c = LLMCache()
    c.put("ephemeral", "gone soon", ttl_s=0.05)
    assert c.get_exact("ephemeral") == "gone soon"
    time.sleep(0.08)
    assert c.get_exact("ephemeral") is None
    assert c.stats.expirations == 1


# ------------------------------------------------- tcp io timeout

def test_tcp_send_to_dead_peer_bounded():
    """Sending to a peer whose socket is gone must fail within a
    bounded interval — never hang the caller (tcp_io_timeout.rs)."""
    a = TcpTransport("a")
    b = TcpTransport("b")
    try:
        a.connect("b", b.address)
        assert a.send("b", "ping", {})
        assert b.recv(timeout=2.0) is not None
        b.close()
        time.sleep(0.05)
        # the first send after the peer dies may land in the TCP buffer
        # before the RST arrives; the failure must surface within a few
        # bounded attempts, never a hang
        t0 = time.monotonic()
        ok = True
        for _ in range(5):
            ok = a.send("b", "ping", {})
            if not ok:
                break
            time.sleep(0.1)
        dt = time.monotonic() - t0
        assert dt < 10.0, f"sends to dead peer took {dt:.1f}s"
        assert not ok, "send kept succeeding against a dead peer"
    finally:
        a.close()
        b.close()


def test_tcp_recv_timeout_returns_none():
    t = TcpTransport("solo")
    try:
        t0 = time.monotonic()
        assert t.recv(timeout=0.1) is None
        assert time.monotonic() - t0 < 1.0
    finally:
        t.close()


# ------------------------------------------------- durable auto-init

def test_durable_store_auto_init_and_reopen(tmp_path):
    """open_durable on a fresh directory creates the layout; reopening
    recovers every committed record (auto_init.rs)."""
    wal = tmp_path / "fresh" / "nested" / "store.wal"
    s = TensorStore()
    s.open_durable(str(wal))            # creates the nested layout
    s.put("k:1", TensorData().set("v", TensorValue.scalar(1)))
    s.put("k:2", TensorData().set(
        "embedding", TensorValue.vector(np.ones(4, np.float32))))
    s.wal_flush()
    assert wal.parent.exists() and wal.exists()

    s2 = TensorStore()
    assert s2.recover(str(wal)) >= 2
    assert s2.get("k:1").get("v").value == 1
    np.testing.assert_allclose(
        s2.get("k:2").get("embedding").to_dense(), np.ones(4))


# ------------------------------------------------- grand unification

def test_grand_unification_flow(tmp_path):
    """One router session exercising every engine and module together:
    relational rows, graph edges, embeddings, hybrid search, vault,
    cache, blob, checkpoint+rollback (grand_unification.rs)."""
    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    r.init_checkpoints(tmp_path / "ckpts")
    r.init_vault("hunter2")
    r.init_cache()
    r.init_blob()

    # relational
    r.execute("CREATE TABLE users (id INT PRIMARY KEY, name TEXT)")
    r.execute("INSERT INTO users VALUES (1, 'alice')")
    r.execute("INSERT INTO users VALUES (2, 'bob')")
    assert len(r.execute("SELECT * FROM users").rows) == 2

    # graph
    n1 = r.execute("NODE CREATE person { name: 'alice' }").value
    n2 = r.execute("NODE CREATE person { name: 'bob' }").value
    r.execute(f"EDGE CREATE {n1} -> {n2} : knows")
    assert r.execute(f"NEIGHBORS {n1}").rows

    # vector + hybrid
    r.execute("EMBED STORE 'alice' [1.0, 0.0, 0.0]")
    r.execute("EMBED STORE 'bob' [0.8, 0.2, 0.0]")
    sim = r.execute("SIMILAR 'alice' TOP 2")
    assert sim.results[0]["key"] == "alice"

    # vault
    r.execute("VAULT SET 'db-password' 's3cret'")
    assert r.execute("VAULT GET 'db-password'").value == "s3cret"

    # blob
    art = r.execute("BLOB PUT 'notes.txt' DATA 'hello world'").value
    assert r.execute(f"BLOB GET '{art}'").value == b"hello world"

    # checkpoint guards a destructive op; rollback restores
    r.execute("CHECKPOINT 'before-wipe'")
    r.execute("DELETE FROM users WHERE id = 1")
    assert len(r.execute("SELECT * FROM users").rows) == 1
    r.execute("ROLLBACK TO 'before-wipe'")
    assert len(r.execute("SELECT * FROM users").rows) == 2
    # secrets survive the relational rollback
    assert r.execute("VAULT GET 'db-password'").value == "s3cret"


# ------------------------------------------------- message reordering

def test_reorder_buffer_delays_and_releases():
    """Sampled messages sit in the shuffle buffer and come out later
    (possibly out of order); flush_reordered drains the rest — no
    message is ever lost (message_reordering.rs)."""
    hub = TransportHub(seed=5)
    t1, t2 = hub.register("a"), hub.register("b")
    hub.reorder_probability = 1.0
    hub.reorder_buffer_size = 4
    n = 20
    for i in range(n):
        assert t1.send("b", "m", {"i": i})
    early = [m.payload["i"] for m in iter(lambda: t2.recv(), None)]
    assert len(early) == n - 4              # 4 still buffered
    assert early != sorted(early), "full-rate buffer must reorder"
    assert hub.flush_reordered() == 4
    late = [m.payload["i"] for m in iter(lambda: t2.recv(), None)]
    assert sorted(early + late) == list(range(n))


def test_dst_raft_safe_under_reordering_and_drops():
    """Election safety + log-prefix consistency hold under combined
    message reordering, drops, and a partition/heal cycle
    (network_latency.rs + message_reordering.rs over DST)."""
    from neumann_tpu.chain.dst import DSTHarness, FaultAction

    for seed in (1, 7, 23):
        h = DSTHarness(n_nodes=5, seed=seed)
        res = h.run(ticks=700, faults=[
            FaultAction(at_tick=30, kind="reorder_rate", rate=0.3),
            FaultAction(at_tick=120, kind="drop_rate", rate=0.1),
            FaultAction(at_tick=250, kind="partition",
                        groups=[{"n0", "n1", "n2"}, {"n3", "n4"}]),
            FaultAction(at_tick=420, kind="heal"),
            FaultAction(at_tick=430, kind="reorder_rate", rate=0.2),
            FaultAction(at_tick=560, kind="heal"),
        ])
        assert res.ok, f"seed {seed}: {res.violations}"
        assert any(res.committed.values()), "nothing ever committed"


# ------------------------------------------------- background eviction

def test_cache_background_eviction():
    from neumann_tpu.cache.llm_cache import LLMCache

    c = LLMCache(capacity=20, eviction="lru")
    c.start_background_eviction(interval_s=0.02, low_watermark=0.5)
    try:
        for i in range(20):
            c.put(f"q{i}", f"r{i}")
        deadline = time.monotonic() + 3.0
        while len(c) > 10 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(c) <= 10, "background sweep never trimmed"
        assert c.stats.evictions >= 10
        # TTL expiry also happens off-thread (no get required)
        c.put("brief", "x", ttl_s=0.03)
        deadline = time.monotonic() + 3.0
        while c.stats.expirations == 0 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert c.stats.expirations >= 1
        # double-start is a no-op, not a second thread
        c.start_background_eviction(interval_s=0.02)
    finally:
        c.stop_background_eviction()


# ------------------------------------------------- membership callbacks

def test_membership_health_callbacks():
    """Status transitions invoke the registered callback with
    (peer, old, new) — both locally-detected (ack timeout -> suspect ->
    faulty) and gossip-learned changes (membership_health.rs
    MembershipCallback)."""
    from neumann_tpu.chain.gossip import (
        ALIVE,
        FAULTY,
        SUSPECT,
        GossipConfig,
        GossipNode,
    )

    events = []
    n = GossipNode("a", ["a", "b", "c"],
                   GossipConfig(suspect_timeout=2))
    n.on_status_change = lambda p, old, new: events.append((p, old, new))

    n._awaiting_ack["b"] = 1                 # overdue ack
    n.tick()                                 # -> suspect
    assert ("b", ALIVE, SUSPECT) in events
    n.tick()
    n.tick()                                 # suspect_timeout elapsed
    assert ("b", SUSPECT, FAULTY) in events

    # gossip-learned transition: a peer reports c faulty at a higher
    # incarnation -> local view flips and the callback fires
    events.clear()
    n._merge_membership({"c": {"status": FAULTY, "inc": 1, "v": 99}})
    assert events == [("c", ALIVE, FAULTY)]
    # no-op merges (same state) never fire
    events.clear()
    n._merge_membership({"c": {"status": FAULTY, "inc": 1, "v": 99}})
    assert events == []


# ------------------------------------------------- cache geometry

def test_cache_metric_configuration():
    """The semantic layer honors the configured metric
    (cache_geometry.rs): euclidean-configured caches score by distance
    similarity, and a bad metric is rejected at construction."""
    from neumann_tpu.cache.llm_cache import LLMCache

    with pytest.raises(ValueError):
        LLMCache(metric="hamming")

    def emb_of(text):
        table = {"near": [1.0, 0.0], "far": [0.0, 8.0],
                 "query": [0.9, 0.1]}
        return np.asarray(table[text.split()[0]], np.float32)

    c = LLMCache(metric="euclidean", semantic_threshold=0.1,
                 embedder=emb_of)
    c.put("near thing", "close response")
    c.put("far thing", "distant response")
    assert c.select_metric(emb_of("query")) == "euclidean"
    assert c.get("query please") == "close response"


def test_cache_auto_selects_jaccard_for_sparse():
    """auto_select_metric routes sparse embeddings to weighted Jaccard
    (lib.rs select_metric): overlap structure wins over cosine angle."""
    from neumann_tpu.cache.llm_cache import LLMCache

    dim = 64

    def emb_of(text):
        v = np.zeros(dim, np.float32)
        for tok in text.split():
            if tok.startswith("d"):
                v[int(tok[1:])] = 1.0
        return v

    c = LLMCache(auto_select_metric=True,
                 sparsity_metric_threshold=0.5,
                 semantic_threshold=0.3, embedder=emb_of)
    dense = np.ones(dim, np.float32)
    assert c.select_metric(dense) == "cosine"
    sparse = emb_of("d1 d2 d3")
    assert c.select_metric(sparse) == "jaccard"

    # overlap in dims {1,2,3} matches despite different weights
    c.put("d1 d2 d3 d4", "overlapping")
    c.put("d60 d61 d62 d63", "disjoint")
    assert c.get("d1 d2 d3") == "overlapping"
    # fully disjoint support: jaccard 0 -> miss, even though a dense
    # metric might still clear a low threshold
    assert c.get("d30 d31 d32") is None


# ------------------------------------------------- jepsen under chaos

def test_jepsen_linearizable_under_reorder_and_partial_partition():
    """Acknowledged register writes stay linearizable when messages
    reorder, links fail one-way, and a partition splits the cluster
    mid-run (jepsen_raft.rs nemesis breadth)."""
    from neumann_tpu.chain.dst import FaultAction
    from neumann_tpu.chain.jepsen import JepsenHarness

    for seed in (3, 17):
        h = JepsenHarness(5, seed=seed)
        res = h.run(ticks=500, nemesis=[
            FaultAction(at_tick=40, kind="reorder_rate", rate=0.25),
            FaultAction(at_tick=100, kind="block_link",
                        groups=[{"n0"}, {"n1"}]),
            FaultAction(at_tick=180, kind="partition",
                        groups=[{"n0", "n1", "n2"}, {"n3", "n4"}]),
            FaultAction(at_tick=300, kind="heal"),
            FaultAction(at_tick=320, kind="drop_rate", rate=0.05),
            FaultAction(at_tick=420, kind="heal"),
        ])
        assert res.ok, f"seed {seed}: {res.check}"
        assert res.writes_acked > 0, "no write ever committed"


def test_linearizability_checker_reductions_preserve_violations():
    """The tail reduction (unobserved, successor-free writes) and the
    reads-first search order must not mask genuine violations."""
    from neumann_tpu.chain.linearizability import Op, check_register

    inf = float("inf")
    # completed unobserved write followed by a stale read: NOT dropped
    # (it has a real-time successor), and the violation is caught
    h = [Op("w", "write", 1, invoke=0, complete=1),
         Op("r", "read", None, invoke=2, complete=3)]
    assert not check_register(h).ok

    # same but the write never completes: it MAY take effect after the
    # read, so this is linearizable (write goes to the tail)
    h2 = [Op("w", "write", 1, invoke=0, complete=inf),
          Op("r", "read", None, invoke=2, complete=3)]
    res = h2 and check_register(h2)
    assert res.ok and len(res.order) == 2

    # many concurrent indeterminate unobserved writes + a violation
    # among the observed ops: still detected, still fast
    h3 = [Op(f"w{i}", "write", 100 + i, invoke=0, complete=inf)
          for i in range(20)]
    h3 += [Op("a", "write", 1, invoke=0, complete=1),
           Op("b", "read", 1, invoke=2, complete=3),
           Op("c", "write", 2, invoke=4, complete=5),
           Op("d", "read", 1, invoke=6, complete=7)]   # stale
    assert not check_register(h3).ok

    # interleaved-read violation (reads disagree on order of two
    # concurrent writes) is caught despite reads-first ordering
    h4 = [Op("w1", "write", 1, invoke=0, complete=10),
          Op("w2", "write", 2, invoke=0, complete=10),
          Op("r1", "read", 1, invoke=11, complete=12),
          Op("r2", "read", 2, invoke=13, complete=14),
          Op("r3", "read", 1, invoke=15, complete=16)]
    assert not check_register(h4).ok


def test_linearizability_checker_cas_semantics():
    """CAS ops linearize iff the reported success matches the register
    at the linearization point (linearizability.rs OpType::Cas)."""
    from neumann_tpu.chain.linearizability import Op, check_register

    # w(1); cas(1->2, ok); r(2)  — linearizable
    h = [Op("a", "write", 1, invoke=0, complete=1),
         Op("b", "cas", (1, 2, True), invoke=2, complete=3),
         Op("c", "read", 2, invoke=4, complete=5)]
    assert check_register(h).ok

    # cas claims success against a value that was never current
    h2 = [Op("a", "write", 1, invoke=0, complete=1),
          Op("b", "cas", (9, 5, True), invoke=2, complete=3)]
    assert not check_register(h2).ok

    # failed cas must leave the register unchanged
    h3 = [Op("a", "write", 1, invoke=0, complete=1),
          Op("b", "cas", (9, 5, False), invoke=2, complete=3),
          Op("c", "read", 1, invoke=4, complete=5)]
    assert check_register(h3).ok

    # two concurrent cas on the same expected value: only one can win
    h4 = [Op("a", "write", 1, invoke=0, complete=1),
          Op("b", "cas", (1, 2, True), invoke=2, complete=6),
          Op("c", "cas", (1, 3, True), invoke=2, complete=6)]
    assert not check_register(h4).ok
    h5 = [Op("a", "write", 1, invoke=0, complete=1),
          Op("b", "cas", (1, 2, True), invoke=2, complete=6),
          Op("c", "cas", (1, 3, False), invoke=2, complete=6)]
    assert check_register(h5).ok


def test_jepsen_cas_workload_linearizable():
    """Mixed read/write/CAS workload through Raft: CAS resolves in the
    state machine at apply time (same verdict on every replica), and
    the recorded outcomes linearize together with reads and writes."""
    from neumann_tpu.chain.dst import FaultAction
    from neumann_tpu.chain.jepsen import JepsenHarness

    for seed in (5, 29):
        h = JepsenHarness(3, seed=seed)
        res = h.run(ticks=400, cas_every=11, nemesis=[
            FaultAction(at_tick=120, kind="partition",
                        groups=[{"n0", "n1"}, {"n2"}]),
            FaultAction(at_tick=220, kind="heal"),
        ])
        assert res.ok, f"seed {seed}: {res.check}"
        cas_ops = [o for o in res.history if o.kind == "cas"]
        assert cas_ops, "no CAS ever resolved"
        assert any(o.value[2] for o in cas_ops), "no CAS ever succeeded"


def test_cluster_cas_resolves_identically_on_all_replicas():
    """Two racing CAS proposals with the same expected value: exactly
    one wins, every replica stores the winner."""
    hub, ids, nodes = _mk_cluster(3, seed=41)
    leader = _elect(nodes)
    from neumann_tpu.store.tensor_store import TensorData

    assert leader.propose_put("reg", TensorData.with_values(v=1))
    _pump(nodes, 60)

    r1 = leader.propose_cas("reg", "v", 1, TensorData.with_values(v=2))
    r2 = leader.propose_cas("reg", "v", 1, TensorData.with_values(v=3))
    assert r1 and r2
    _pump(nodes, 80)
    assert leader.cas_result(r1) is True
    assert leader.cas_result(r2) is False     # log order: r1 applied first
    for nid, node in nodes.items():
        assert node.store.get("reg").get("v").value == 2, nid

    # expected=None matches a missing key (create-if-absent)
    r3 = leader.propose_cas("fresh", "v", None,
                            TensorData.with_values(v=7))
    _pump(nodes, 60)
    assert leader.cas_result(r3) is True
    assert all(n.store.get("fresh").get("v").value == 7
               for n in nodes.values())


def test_tcp_node_cas_over_real_sockets():
    """CAS through TcpClusterNode: follower-forwarded conditional
    writes resolve identically on every node over real TCP."""
    from neumann_tpu.chain.node import TcpClusterNode
    from neumann_tpu.chain.raft import RaftConfig
    from neumann_tpu.store.tensor_store import TensorData

    cfg = RaftConfig(election_timeout_min=3, election_timeout_max=6)
    nodes = {}
    for i, nid in enumerate(("n0", "n1", "n2")):
        nodes[nid] = TcpClusterNode(nid, {}, port=0, config=cfg, seed=i)
    addrs = {nid: n.address for nid, n in nodes.items()}
    for nid, n in nodes.items():
        n._peer_addrs = {p: addrs[p] for p in addrs if p != nid}
        n.raft.voters = set(addrs)
        n.start(tick_interval_s=0.01)
    try:
        deadline = time.time() + 15
        while time.time() < deadline and not any(
                n.is_leader() for n in nodes.values()):
            time.sleep(0.05)
        leader = next(n for n in nodes.values() if n.is_leader())
        follower = next(n for n in nodes.values()
                        if not n.is_leader())

        assert leader.propose_put("reg", TensorData.with_values(v=1))
        deadline = time.time() + 10
        while time.time() < deadline and \
                leader.store.get("reg") is None:
            time.sleep(0.05)

        r1 = leader.propose_cas("reg", "v", 1,
                                TensorData.with_values(v=2))
        assert r1 is not None
        deadline = time.time() + 10
        while time.time() < deadline and leader.cas_result(r1) is None:
            time.sleep(0.05)
        assert leader.cas_result(r1) is True

        # stale expected: loses (value is now 2)
        r2 = leader.propose_cas("reg", "v", 1,
                                TensorData.with_values(v=9))
        deadline = time.time() + 10
        while time.time() < deadline and leader.cas_result(r2) is None:
            time.sleep(0.05)
        assert leader.cas_result(r2) is False
        deadline = time.time() + 10
        while time.time() < deadline and not all(
                n.store.get("reg") is not None and
                n.store.get("reg").get("v").value == 2
                for n in nodes.values()):
            time.sleep(0.05)
        for nid, n in nodes.items():
            assert n.store.get("reg").get("v").value == 2, nid
        # follower forwarding places CAS through the leader too; the
        # OUTCOME applies on the follower's own replica
        r3 = follower.propose_cas("reg", "v", 2,
                                  TensorData.with_values(v=3))
        assert r3 is not None
        deadline = time.time() + 10
        while time.time() < deadline and \
                follower.cas_result(r3) is None:
            time.sleep(0.05)
        assert follower.cas_result(r3) is True
    finally:
        for n in nodes.values():
            n.stop()


def test_jepsen_multikey_workload_linearizable():
    """Workload spread over 4 independent registers, checked
    compositionally per key (check_kv) under a partition/heal cycle
    with CAS mixed in."""
    from neumann_tpu.chain.dst import FaultAction
    from neumann_tpu.chain.jepsen import JepsenHarness

    h = JepsenHarness(5, seed=13, n_keys=4)
    res = h.run(ticks=450, write_every=4, read_every=3, cas_every=13,
                nemesis=[
                    FaultAction(at_tick=120, kind="partition",
                                groups=[{"n0", "n1", "n2"},
                                        {"n3", "n4"}]),
                    FaultAction(at_tick=240, kind="heal"),
                ])
    assert res.ok, res.check
    keys_touched = {o.key for o in res.history}
    assert len(keys_touched) == 4, keys_touched
    assert res.writes_acked > 10


def test_check_kv_isolates_violations_per_key():
    from neumann_tpu.chain.linearizability import Op, check_kv

    good = [Op("a", "write", 1, invoke=0, complete=1, key="x"),
            Op("b", "read", 1, invoke=2, complete=3, key="x")]
    bad = [Op("c", "write", 5, invoke=0, complete=1, key="y"),
           Op("d", "read", 99, invoke=2, complete=3, key="y")]
    assert check_kv(good).ok
    res = check_kv(good + bad)
    assert not res.ok and "'y'" in res.reason


# ------------------------------------------------- REST hostile inputs

def test_rest_hostile_inputs():
    """Client errors map to 400 (not 500), Qdrant-shape collection
    bodies configure the dimension (so wrong-size upserts reject), and
    degenerate scroll limits return empty pages cleanly."""
    import json
    import urllib.error
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    rest = RestServer()
    rest.serve()
    base = f"http://127.0.0.1:{rest.port}"

    def req(path, data=None, method=None):
        r = urllib.request.Request(base + path, data=data,
                                   method=method)
        if data is not None:
            r.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(r, timeout=5) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        code, body = req("/collections/c1", b"{not json", "PUT")
        assert code == 400 and "malformed JSON" in body["error"]

        code, _ = req("/collections/good", json.dumps(
            {"vectors": {"size": 2, "distance": "Cosine"}}).encode(),
            "PUT")
        assert code == 200
        code, body = req("/collections/good/points", json.dumps(
            {"points": [{"id": 1, "vector": [1.0, 2.0, 3.0]}]}
        ).encode(), "PUT")
        assert code == 400 and "dimension" in body["error"]
        code, _ = req("/collections/good/points", json.dumps(
            {"points": [{"id": 1, "vector": [1.0, 2.0]}]}).encode(),
            "PUT")
        assert code == 200

        code, body = req("/collections/good/points/scroll",
                         json.dumps({"limit": -5}).encode(), "POST")
        assert code == 200 and body["points"] == []
        assert body["next_offset"] is None

        code, body = req("/zzz")
        assert code == 400
    finally:
        rest.stop()
