"""Distributed layer tests: HLC, transport faults, chain, consensus,
Raft (unit + DST with partitions/crashes), 2PC, gossip, deadlock,
cluster replication."""

import numpy as np
import pytest

from neumann_tpu.chain import (
    HLC,
    Chain,
    ConflictClass,
    DeadlockDetector,
    GossipNode,
    MemoryTransport,
    Message,
    RaftConfig,
    RaftNode,
    TensorChain,
    TransportHub,
    TwoPhaseCoordinator,
    TwoPhaseParticipant,
    classify_conflict,
    classify_pairwise,
)
from neumann_tpu.chain.block import compute_state_root
from neumann_tpu.chain.raft import LogEntry
from neumann_tpu.chain.cluster import ClusterOrchestrator
from neumann_tpu.chain.consensus import merge_orthogonal
from neumann_tpu.chain.dst import DSTHarness, FaultAction
from neumann_tpu.store.tensor_store import TensorData, TensorStore
from neumann_tpu.utils.errors import ChainError


# ---------------------------------------------------------------- HLC

def test_hlc_monotone_and_merge():
    t = [1000]
    clock = HLC("a", now_ms=lambda: t[0])
    a = clock.now()
    b = clock.now()
    assert b > a
    # clock stuck -> logical grows
    c = clock.now()
    assert c.logical > 0
    # remote ahead -> jump forward
    remote = HLC("b", now_ms=lambda: 2000).now()
    merged = clock.update(remote)
    assert merged.wall_ms == 2000 and merged > remote


# ---------------------------------------------------------------- transport

def test_memory_transport_and_faults():
    hub = TransportHub(seed=1)
    a = hub.register("a")
    b = hub.register("b")
    c = hub.register("c")
    assert a.send("b", "hello", {"x": 1})
    msg = b.recv()
    assert msg.kind == "hello" and msg.payload == {"x": 1}
    assert a.broadcast("hi", {}) == 2
    b.drain()
    c.drain()
    # partition: a alone, b+c together
    hub.partition({"a"}, {"b", "c"})
    assert not a.send("b", "x", {})
    assert b.send("c", "x", {})
    hub.heal()
    assert a.send("b", "x", {})
    # drops
    hub.drop_probability = 1.0
    assert not a.send("b", "x", {})
    hub.heal()
    # asymmetric blocking
    hub.blocked_inbound.add("b")
    assert not a.send("b", "x", {})
    assert b.send("a", "x", {})
    # corruption
    hub.heal()
    hub.corrupt_probability = 1.0
    a.send("b", "x", {"real": True})
    got = b.drain()[-1]
    assert got.payload.get("__corrupted__")


def test_message_codec():
    m = Message("k", "a", "b", {"n": 1, "s": "x"})
    assert Message.decode(m.encode()).payload == m.payload


# ---------------------------------------------------------------- chain

def test_chain_append_verify_history():
    ch = Chain()
    b1 = ch.new_block([{"id": 1, "ops": [{"op": "put", "key": "k:1"}]}],
                      "root1")
    ch.append(b1)
    b2 = ch.new_block([{"id": 2, "ops": [{"op": "put", "key": "k:2"}]}],
                      "root2", delta_embedding=np.ones(4))
    ch.append(b2)
    assert ch.height == 2 and ch.verify()
    assert ch.get_block(1).delta_embedding == [1, 1, 1, 1]
    hist = ch.history("k:1")
    assert len(hist) == 1 and hist[0]["height"] == 0
    # tamper detection
    ch._blocks[0].transactions.append({"id": 9, "ops": []})
    assert not ch.verify()


def test_chain_rejects_bad_blocks():
    ch = Chain()
    b1 = ch.new_block([], "r")
    ch.append(b1)
    bad = ch.new_block([], "r")
    bad.prev_hash = "f" * 64
    with pytest.raises(ChainError):
        ch.append(bad)
    other = Chain(signing_key=b"other")
    foreign = other.new_block([], "r")
    with pytest.raises(ChainError):
        ch.append(foreign)


def test_state_root_order_independent():
    a = compute_state_root({"x": b"1", "y": b"2"})
    b = compute_state_root({"y": b"2", "x": b"1"})
    assert a == b
    c = compute_state_root({"x": b"1", "y": b"3"})
    assert a != c


# ---------------------------------------------------------------- consensus

def test_classify_conflicts():
    e1 = np.array([1.0, 0, 0, 0], np.float32)
    e2 = np.array([0, 1.0, 0, 0], np.float32)
    assert classify_conflict(e1, {"a"}, e2, {"b"}) == \
        ConflictClass.ORTHOGONAL
    assert classify_conflict(e1, {"a"}, e1, {"a"}) == \
        ConflictClass.IDENTICAL
    assert classify_conflict(e1, {"a"}, -e1, {"a"}) == \
        ConflictClass.CONFLICTING
    assert classify_conflict(e1, {"a"}, e1 * 0.9 + e2 * 0.3, {"a"}) == \
        ConflictClass.SIMILAR
    merged = merge_orthogonal([e1, e2])
    np.testing.assert_allclose(merged, [1, 1, 0, 0])


def test_classify_pairwise_batch():
    deltas = np.array([[1, 0], [0, 1], [-1, 0]], np.float32)
    keys = [{"a"}, {"b"}, {"a"}]
    out = classify_pairwise(deltas, keys)
    d = {(i, j): c for i, j, c in out}
    assert d[(0, 1)] == ConflictClass.ORTHOGONAL
    assert d[(0, 2)] == ConflictClass.CONFLICTING


def test_tensor_chain_commit_flow():
    tc = TensorChain(embedding_dim=4)
    tx = tc.begin()
    tx.put("doc:1", TensorData.with_values(
        embedding=[1.0, 0, 0, 0], title="one"))
    assert tx.get("doc:1") is not None       # read-your-writes
    assert tc.store.get("doc:1") is None     # invisible pre-commit
    h = tc.commit(tx)
    assert h == 1 and tc.store.get("doc:1") is not None
    assert tc.verify()
    blk = tc.get_block(0)
    np.testing.assert_allclose(blk.delta_embedding, [1, 0, 0, 0])
    with pytest.raises(ChainError):
        tx.put("x", TensorData())  # closed


def test_tensor_chain_conflict_and_merge():
    tc = TensorChain(embedding_dim=4)
    tx1 = tc.begin()
    tx1.put("a", TensorData.with_values(embedding=[1.0, 0, 0, 0]))
    tx2 = tc.begin()
    tx2.put("b", TensorData.with_values(embedding=[0, 1.0, 0, 0]))
    # orthogonal: auto-merge commits both in one block
    h = tc.commit(tx1, auto_merge=True)
    assert h == 1
    assert tc.store.get("a") is not None and tc.store.get("b") is not None
    assert len(tc.get_block(0).transactions) == 2
    # conflicting: opposite delta on same key
    tx3 = tc.begin()
    tx3.put("c", TensorData.with_values(embedding=[1.0, 0, 0, 0]))
    tx4 = tc.begin()
    tx4.put("c", TensorData.with_values(embedding=[-1.0, 0, 0, 0]))
    with pytest.raises(ChainError):
        tc.commit(tx3)
    tc.rollback(tx4)
    assert tc.commit(tx3) == 2


def test_tensor_chain_similar_and_drift():
    tc = TensorChain(embedding_dim=2)
    for vec in ([1.0, 0.0], [0.9, 0.1], [0.0, 1.0]):
        tx = tc.begin()
        tx.put(f"k{vec}", TensorData.with_values(embedding=vec))
        tc.commit(tx)
    sim = tc.similar_blocks([1.0, 0.0], limit=2)
    assert sim[0]["height"] == 0 and sim[1]["height"] == 1
    d = tc.drift(0, 3)
    assert d["blocks"] == 3 and d["drift_norm"] > 0
    assert tc.rollback_to(1) == 2
    assert tc.height == 1


# ---------------------------------------------------------------- raft unit

def pump(nodes, hub, transports, steps=50):
    for _ in range(steps):
        for nid, node in nodes.items():
            for m in node.tick():
                hub.deliver(m)
        for nid, node in nodes.items():
            for msg in transports[nid].drain():
                for m in node.handle(msg):
                    hub.deliver(m)


def make_cluster(n=3, seed=0):
    hub = TransportHub(seed=seed)
    ids = [f"n{i}" for i in range(n)]
    nodes = {nid: RaftNode(nid, ids, RaftConfig(), seed=seed + i)
             for i, nid in enumerate(ids)}
    transports = {nid: hub.register(nid) for nid in ids}
    return hub, nodes, transports


def test_raft_elects_single_leader():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leaders = [n for n in nodes.values() if n.state == "leader"]
    assert len(leaders) == 1
    term = leaders[0].term
    followers = [n for n in nodes.values() if n.state != "leader"]
    assert all(f.term == term for f in followers)


def test_raft_replicates_and_commits():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    idx = leader.propose({"k": "v1"})
    assert idx is not None
    pump(nodes, hub, tr, 20)
    for node in nodes.values():
        committed = [p for _, p in node.take_committed()
                     if "noop" not in p]
        assert {"k": "v1"} in committed


def test_raft_single_node_cluster():
    node = RaftNode("solo", ["solo"], RaftConfig())
    for _ in range(30):
        node.tick()
    assert node.state == "leader"
    node.propose({"x": 1})
    got = [p for _, p in node.take_committed() if "noop" not in p]
    assert {"x": 1} in got


def test_raft_leadership_transfer():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    target = leader.peers[0]
    for m in leader.transfer_leadership(target):
        hub.deliver(m)
    pump(nodes, hub, tr, 40)
    new_leader = next(n for n in nodes.values() if n.state == "leader")
    assert new_leader.id == target


def test_raft_snapshot_install():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    # isolate one follower, write a lot, compact, heal
    lagger = leader.peers[0]
    hub.partition({leader.id, leader.peers[1]}, {lagger})
    for i in range(10):
        leader.propose({"i": i})
        pump(nodes, hub, tr, 5)
    leader.take_committed()
    leader.compact(snapshot_data={"state": "dense"})
    assert leader.snapshot_index > 0
    hub.heal()
    pump(nodes, hub, tr, 60)
    lag_node = nodes[lagger]
    assert lag_node.snapshot_index == leader.snapshot_index or \
        lag_node.last_index() >= leader.snapshot_index


# ---------------------------------------------------------------- DST

def test_dst_steady_state():
    r = DSTHarness(3, seed=42).run(ticks=300)
    assert r.ok, r.violations
    assert any(r.committed.values())


@pytest.mark.parametrize("seed", [1, 7, 1234])
def test_dst_partition_heals(seed):
    h = DSTHarness(5, seed=seed)
    faults = [
        FaultAction(60, "partition",
                    groups=[{"n0", "n1"}, {"n2", "n3", "n4"}]),
        FaultAction(150, "heal"),
    ]
    r = h.run(ticks=400, faults=faults)
    assert r.ok, r.violations
    # majority side keeps committing through the partition
    assert max(len(v) for v in r.committed.values()) > 0


@pytest.mark.parametrize("seed", [3, 99])
def test_dst_leader_crash_restart(seed):
    h = DSTHarness(3, seed=seed)
    h.run(ticks=80, propose_every=10)
    leader = h.current_leader() or "n0"
    faults = [FaultAction(0, "crash", node=leader),
              FaultAction(120, "restart", node=leader)]
    r = h.run(ticks=300, faults=faults)
    assert r.ok, r.violations


def test_dst_message_drops():
    h = DSTHarness(3, seed=5)
    faults = [FaultAction(20, "drop_rate", rate=0.3),
              FaultAction(200, "drop_rate", rate=0.0)]
    r = h.run(ticks=400, faults=faults)
    assert r.ok, r.violations


def test_dst_deterministic():
    a = DSTHarness(3, seed=11).run(ticks=200)
    b = DSTHarness(3, seed=11).run(ticks=200)
    assert a.committed == b.committed
    assert a.leaders_per_term == b.leaders_per_term


# ---------------------------------------------------------------- 2PC

def make_2pc(n=2):
    stores = {f"p{i}": TensorStore() for i in range(n)}
    parts = {nid: TwoPhaseParticipant(nid, s)
             for nid, s in stores.items()}
    coord = TwoPhaseCoordinator("coord")
    return coord, parts, stores


def route_2pc(coord, parts, msgs):
    # deliver until quiescent
    queue = list(msgs)
    while queue:
        msg = queue.pop(0)
        if msg.dst == coord.id:
            queue += coord.handle(msg)
        elif msg.dst in parts:
            queue += parts[msg.dst].handle(msg)


def test_2pc_commit():
    coord, parts, stores = make_2pc()
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "k:1", "fields": {"v": 1}}],
        "p1": [{"op": "put", "key": "k:2", "fields": {"v": 2}}]})
    route_2pc(coord, parts, prepares)
    assert coord.state_of(tx) == "committed"
    assert stores["p0"].get("k:1").get("v").value == 1
    assert stores["p1"].get("k:2").get("v").value == 2
    # locks released
    assert parts["p0"].locks.owner_of("k:1") is None


def test_2pc_abort_on_lock_conflict():
    coord, parts, stores = make_2pc()
    # pre-lock k:1 on p0 under another tx that never releases
    assert parts["p0"].locks.try_lock("k:1", "other-tx")
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "k:1", "fields": {"v": 1}}],
        "p1": [{"op": "put", "key": "k:2", "fields": {"v": 2}}]})
    route_2pc(coord, parts, prepares)
    # hardened semantics: the participant WAITS for the lock (deadlock-
    # aware); the holder never releases, so the wait times out, votes
    # no, and the coordinator aborts
    assert coord.state_of(tx) == "preparing"
    for _ in range(40):
        msgs = coord.tick()
        for p in parts.values():
            msgs += p.tick()
        route_2pc(coord, parts, msgs)
        if coord.state_of(tx) == "aborted":
            break
    assert coord.state_of(tx) == "aborted"
    assert stores["p0"].get("k:1") is None
    assert stores["p1"].get("k:2") is None  # atomicity across shards


def test_2pc_explicit_abort():
    coord, parts, stores = make_2pc()
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "a", "fields": {"v": 1}}]})
    msgs = coord.abort(tx)
    route_2pc(coord, parts, prepares + msgs)
    assert coord.state_of(tx) == "aborted"
    with pytest.raises(ChainError):
        coord.abort("nonexistent")


# ---------------------------------------------------------------- gossip

def pump_gossip(nodes, steps=30, lost=frozenset()):
    for _ in range(steps):
        inbox = []
        for node in nodes.values():
            inbox += node.tick()
        while inbox:
            msg = inbox.pop(0)
            if msg.dst in lost or msg.dst not in nodes:
                continue
            inbox += nodes[msg.dst].handle(msg)


def test_gossip_all_alive():
    ids = ["a", "b", "c", "d"]
    nodes = {i: GossipNode(i, ids, seed=2) for i in ids}
    pump_gossip(nodes, 30)
    for node in nodes.values():
        assert len(node.alive_peers()) == 3


def test_gossip_detects_failure_and_refutes():
    ids = ["a", "b", "c", "d"]
    nodes = {i: GossipNode(i, ids, seed=2) for i in ids}
    pump_gossip(nodes, 20)
    # d dies: messages to it vanish
    dead = {"d"}
    pump_gossip({i: n for i, n in nodes.items() if i not in dead},
                60, lost=dead)
    statuses = {nodes[i].status_of("d") for i in ("a", "b", "c")}
    assert "faulty" in statuses or "suspect" in statuses
    # d comes back with a refutation: incarnation bump spreads
    pump_gossip(nodes, 60)
    assert all(nodes[i].status_of("d") == "alive"
               for i in ("a", "b", "c"))


# ---------------------------------------------------------------- deadlock

def test_deadlock_detection():
    d = DeadlockDetector()
    d.add_wait("t1", "t2")
    d.add_wait("t2", "t3")
    assert d.find_cycle() is None
    d.add_wait("t3", "t1")
    cycle = d.find_cycle()
    assert cycle is not None and set(cycle) == {"t1", "t2", "t3"}
    assert d.victim() == "t3"
    d.remove_waiter("t3")
    assert d.find_cycle() is None


# ---------------------------------------------------------------- cluster

def test_cluster_replicated_store():
    orch = ClusterOrchestrator(3, seed=9)
    leader_id = orch.run_until_leader()
    assert leader_id is not None
    leader = orch.nodes[leader_id]
    assert leader.propose_put(
        "user:alice", TensorData.with_values(name="alice"))
    orch.step(30)
    for node in orch.nodes.values():
        got = node.store.get("user:alice")
        assert got is not None and got.get("name").value == "alice"
    assert leader.propose_delete("user:alice")
    orch.step(30)
    assert all(n.store.get("user:alice") is None
               for n in orch.nodes.values())
    # non-leader propose fails
    follower = next(n for n in orch.nodes.values() if not n.is_leader())
    assert not follower.propose_put("x", TensorData())
    assert follower.leader_hint() == leader_id


def test_cluster_query_routing():
    executed = []

    def factory(nid):
        def run(q):
            executed.append((nid, q))
            return f"{nid}:{q}"
        return run

    orch = ClusterOrchestrator(3, seed=4, query_executor_factory=factory)
    leader_id = orch.run_until_leader()
    # keep stepping until every follower has learned the leader
    for _ in range(100):
        orch.step()
        if all(n.leader_hint() == leader_id or n.is_leader()
               for n in orch.nodes.values()):
            break
    follower = next(n for n in orch.nodes.values() if not n.is_leader())
    follower.send_query("SHOW TABLES")
    orch.step(10)
    assert executed and executed[0][0] == leader_id
    assert follower.poll_query_result() == f"{leader_id}:SHOW TABLES"


# ------------------------------------------------------- linearizability

def test_linearizability_checker_basics():
    from neumann_tpu.chain.linearizability import Op, check_register

    # sequential write->read is fine
    h = [Op("w", "write", 1, 0, 1), Op("r", "read", 1, 2, 3)]
    assert check_register(h).ok
    # read of a never-written value fails
    h2 = [Op("w", "write", 1, 0, 1), Op("r", "read", 9, 2, 3)]
    assert not check_register(h2).ok
    # stale read after a completed overwrite fails
    h3 = [Op("w", "write", 1, 0, 1), Op("w", "write", 2, 2, 3),
          Op("r", "read", 1, 4, 5)]
    assert not check_register(h3).ok
    # concurrent write/read: either order is a valid linearization
    h4 = [Op("w", "write", 1, 0, 10), Op("r", "read", None, 2, 3)]
    assert check_register(h4).ok
    h5 = [Op("w", "write", 1, 0, 10), Op("r", "read", 1, 2, 3)]
    assert check_register(h5).ok
    assert check_register([]).ok


def test_jepsen_steady_state():
    from neumann_tpu.chain.jepsen import JepsenHarness

    res = JepsenHarness(3, seed=21).run(ticks=200)
    assert res.writes_acked > 0
    assert res.ok, res.check.reason


@pytest.mark.parametrize("seed", [2, 13])
def test_jepsen_with_partitions(seed):
    from neumann_tpu.chain.dst import FaultAction
    from neumann_tpu.chain.jepsen import JepsenHarness

    nemesis = [
        FaultAction(50, "partition",
                    groups=[{"n0"}, {"n1", "n2"}]),
        FaultAction(130, "heal"),
        FaultAction(200, "partition",
                    groups=[{"n1"}, {"n0", "n2"}]),
        FaultAction(280, "heal"),
    ]
    res = JepsenHarness(3, seed=seed).run(ticks=380, nemesis=nemesis)
    assert res.writes_acked > 0
    assert res.ok, res.check.reason


# ------------------------------------------------------- ed25519 signing

def test_ed25519_identities_and_blocks():
    from neumann_tpu.chain.signing import (
        NodeIdentity,
        derive_embedding,
        sign_block,
        verify_block,
    )

    ident = NodeIdentity.from_seed(b"node-1")
    same = NodeIdentity.from_seed(b"node-1")
    assert ident.public_bytes() == same.public_bytes()
    msg = b"append entries"
    sig = ident.sign(msg)
    assert NodeIdentity.verify(ident.public_bytes(), msg, sig)
    assert not NodeIdentity.verify(ident.public_bytes(), b"tampered", sig)
    # geometric identity: deterministic unit vector, distinct per key
    e1 = ident.embedding(32)
    e2 = NodeIdentity.from_seed(b"node-2").embedding(32)
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-5
    assert abs(float(e1 @ e2)) < 0.9
    np.testing.assert_allclose(e1, same.embedding(32))
    # block signing
    ch = Chain()
    blk = ch.new_block([], "root")
    sign_block(ident, blk)
    assert verify_block(ident.public_bytes(), blk)
    blk.transactions.append({"id": 1, "ops": []})
    assert not verify_block(ident.public_bytes(), blk)


# ------------------------------------------------------- codebooks

def test_codebooks(rng):
    from neumann_tpu.chain.codebook import GlobalCodebook, LocalCodebook

    centers = rng.standard_normal((4, 16)).astype(np.float32) * 5
    deltas = np.concatenate([
        centers[i] + 0.1 * rng.standard_normal((40, 16)).astype(np.float32)
        for i in range(4)])
    gb = GlobalCodebook(16, n_codes=4)
    gb.train(deltas)
    code, dist = gb.quantize(deltas[0])
    assert 0 <= code < 4 and dist < 2.0, dist
    np.testing.assert_allclose(gb.decode(code), gb.codes[code])
    # in-distribution deltas are not anomalous; far ones are
    assert not gb.is_anomalous(deltas[5])
    assert gb.is_anomalous(np.full(16, 100.0, np.float32))
    # local book adapts with EMA
    lb = LocalCodebook(gb, ema=0.5)
    shifted = centers[0] + 2.0
    for _ in range(10):
        lb.observe(shifted)
    assert lb.drift_from_global() > 0.01
    assert lb.usage.sum() == 10


def test_delta_replication(rng):
    from neumann_tpu.chain.delta_replication import DeltaReplicator
    from neumann_tpu.store.delta_vector import ArchetypeRegistry

    centers = rng.standard_normal((3, 64)).astype(np.float32) * 10
    data = np.concatenate([
        centers[i] + 0.002 * rng.standard_normal(
            (30, 64)).astype(np.float32)
        for i in range(3)])
    reg = ArchetypeRegistry(threshold=0.01)
    reg.discover_archetypes(data)
    rep = DeltaReplicator(reg)
    items = [(f"k{i}", data[i]) for i in range(90)]
    wire = rep.encode_batch(items)
    # replica reconstructs via a registry snapshot
    replica = DeltaReplicator.from_snapshot(rep.registry_snapshot())
    back = replica.decode_batch(wire)
    for (k1, v1), (k2, v2) in zip(items, back):
        assert k1 == k2
        np.testing.assert_allclose(v1, v2, atol=0.02)
    assert rep.bandwidth_ratio() > 3.0  # 4-6x claim territory


# ------------------------------------------------- partition merge

def test_partition_merge_six_phases():
    from neumann_tpu.chain.partition_merge import PartitionMerger
    from neumann_tpu.store.tensor_store import TensorStore

    base = TensorStore()
    base.put("shared", TensorData.with_values(
        embedding=[1.0, 0.0, 0.0, 0.0], v="orig"))
    left = TensorStore()
    right = TensorStore()
    for s in (left, right):
        s.put("shared", base.get("shared"))
    # divergence during the partition:
    left.put("left_only", TensorData.with_values(
        embedding=[0.0, 1.0, 0.0, 0.0]))
    right.put("right_only", TensorData.with_values(
        embedding=[0.0, 0.0, 1.0, 0.0]))
    # orthogonal edits to the same key (disjoint dims of change)
    left.put("shared", TensorData.with_values(
        embedding=[1.0, 0.5, 0.0, 0.0], v="orig"))
    right.put("shared", TensorData.with_values(
        embedding=[1.0, 0.0, 0.7, 0.0], v="orig"))
    merger = PartitionMerger(embedding_dim=4)
    report = merger.merge(left, right, base=base,
                          left_height=5, right_height=3)
    assert report.ok and not merger.frozen
    # creations survive on both sides
    assert left.get("right_only") is not None
    assert right.get("left_only") is not None
    # orthogonal edits merged by vector addition
    for s in (left, right):
        emb = s.get("shared").get("embedding").to_dense()
        np.testing.assert_allclose(emb, [1.0, 0.5, 0.7, 0.0], atol=1e-5)
    assert "shared" in report.merged
    # stores end identical
    from neumann_tpu.store import codec
    for key in set(left.keys()) | set(right.keys()):
        assert codec.encode_data(left.get(key)) == \
            codec.encode_data(right.get(key))


def test_partition_merge_conflicting_key():
    from neumann_tpu.chain.partition_merge import PartitionMerger
    from neumann_tpu.store.tensor_store import TensorStore

    base = TensorStore()
    base.put("k", TensorData.with_values(embedding=[1.0, 0.0]))
    left, right = TensorStore(), TensorStore()
    left.put("k", TensorData.with_values(embedding=[2.0, 0.0]))   # +x
    right.put("k", TensorData.with_values(embedding=[0.0, 0.0]))  # -x
    merger = PartitionMerger(embedding_dim=2)
    report = merger.merge(left, right, base=base,
                          left_height=9, right_height=2)
    assert "k" in report.conflicts
    # higher chain (left) won on both sides
    np.testing.assert_allclose(
        right.get("k").get("embedding").to_dense(), [2.0, 0.0])


# ------------------------------------------------- message validation

def test_message_validation():
    from neumann_tpu.chain.message_validation import (
        ValidatingInbox,
        validate,
    )

    ok, _ = validate(Message("vote_req", "a", "b",
                             {"term": 1, "last_index": 0,
                              "last_term": 0}))
    assert ok
    bad_cases = [
        Message("vote_req", "a", "b", {"term": "one", "last_index": 0,
                                       "last_term": 0}),
        Message("vote_req", "a", "b", {"term": 1}),
        Message("nonsense_kind", "a", "b", {}),
        Message("append_entries", "a", "b",
                {"term": 1, "prev_index": 0, "prev_term": 0,
                 "entries": [{"bogus": 1}], "leader_commit": 0}),
        Message("vote_req", "a", "b", {"__corrupted__": True,
                                       "term": 1, "last_index": 0,
                                       "last_term": 0}),
        Message("tx_prepare", "a", "b", {"tx": "x" * 9999, "ops": []}),
    ]
    for m in bad_cases:
        ok, reason = validate(m)
        assert not ok, m.kind
    # validating inbox shields a raft node from garbage
    node = RaftNode("n0", ["n0", "n1"], RaftConfig())
    inbox = ValidatingInbox(node)
    out = inbox.handle(Message("append_entries", "x", "n0",
                               {"term": "NaN"}))
    assert out == [] and inbox.rejected == 1
    good = inbox.handle(Message("vote_req", "n1", "n0",
                                {"term": 1, "last_index": 0,
                                 "last_term": 0}))
    assert good and good[0].kind == "vote_resp"


# ------------------------------------------------- geometric routing

def test_geometric_membership_routing():
    from neumann_tpu.chain.geometric import (
        GeometricMembership,
        GeometricTransport,
    )

    hub = TransportHub()
    t = hub.register("me")
    for p in ("a", "b", "c"):
        hub.register(p)
    gm = GeometricMembership("me", [1.0, 0.0])
    gm.upsert_peer("a", [0.9, 0.1])
    gm.upsert_peer("b", [0.0, 1.0])
    gm.upsert_peer("c", [-1.0, 0.0])
    assert gm.rank_peers() == ["a", "b", "c"]
    gt = GeometricTransport(t, gm)
    assert gt.send_to_nearest("hi", {"x": 1})
    msg = hub._nodes["a"]._queue.get_nowait()
    assert msg.kind == "hi"
    n = gt.regional_broadcast("region", {}, top_m=2)
    assert n == 2
    gm.remove_peer("a")
    assert gm.nearest([0.95, 0.05]) == "b"


# ------------------------------------------------- membership change

def test_raft_learner_then_promote():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    # boot a 4th node as a learner
    n3 = RaftNode("n3", ["n0", "n1", "n2", "n3"], RaftConfig(), seed=77)
    n3.voters = set(leader.voters)      # joins knowing current voters
    n3.learners = {"n3"}
    nodes["n3"] = n3
    transports = tr
    transports["n3"] = hub.register("n3")
    assert leader.propose_config_change("add_learner", "n3") is not None
    for i in range(5):
        leader.propose({"v": i})
    pump(nodes, hub, tr, 40)
    # learner replicates but does not vote / count for quorum
    assert n3.last_index() >= 5
    assert "n3" in leader.learners and "n3" not in leader.voters
    assert len(leader.voters) == 3
    pump(nodes, hub, tr, 10)
    # promotion makes it a voter
    assert leader.propose_config_change("promote", "n3") is not None
    pump(nodes, hub, tr, 40)
    assert "n3" in leader.voters
    # followers learned the config through the log
    for node in nodes.values():
        assert "n3" in node.voters, node.id


def test_raft_remove_node():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    victim = leader.voting_peers[0]
    assert leader.propose_config_change("remove", victim) is not None
    pump(nodes, hub, tr, 40)
    assert victim not in leader.voters
    # the 2-voter cluster still commits
    leader.propose({"after": 1})
    pump(nodes, hub, tr, 20)
    assert leader.commit_index >= leader.last_index() - 0


def test_raft_single_pending_config_change():
    hub, nodes, tr = make_cluster(3)
    # block replication so the first change stays uncommitted
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    hub.partition({leader.id})
    assert leader.propose_config_change("add_learner", "x1") is not None
    assert leader.propose_config_change("add_learner", "x2") is None
    hub.heal()


@pytest.mark.parametrize("seed", list(range(20, 30)))
def test_dst_seed_sweep(seed):
    """Broad seeded sweep with a mixed fault schedule per seed."""
    h = DSTHarness(3, seed=seed)
    faults = [
        FaultAction(40 + seed % 7, "drop_rate", rate=0.15),
        FaultAction(90, "partition",
                    groups=[{"n0"}, {"n1", "n2"}]),
        FaultAction(160, "heal"),
        FaultAction(200, "drop_rate", rate=0.0),
    ]
    r = h.run(ticks=320, faults=faults)
    assert r.ok, (seed, r.violations)


# ------------------------------------------------- snapshot streaming

def test_snapshot_streaming_roundtrip(rng):
    from neumann_tpu.chain.snapshot_streaming import (
        SnapshotReceiver,
        stream_snapshot,
    )

    blob = rng.integers(0, 256, 700_000, dtype=np.uint8).tobytes()
    rx = SnapshotReceiver()
    out = None
    for chunk in stream_snapshot("s1", blob, chunk_size=100_000):
        out = rx.receive(chunk)
    assert out == blob


def test_snapshot_streaming_resume_and_tamper(rng):
    from neumann_tpu.chain.snapshot_streaming import (
        SnapshotChunk,
        SnapshotReceiver,
        stream_snapshot,
    )

    blob = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    rx = SnapshotReceiver()
    chunks = list(stream_snapshot("s2", blob, chunk_size=100_000))
    rx.receive(chunks[0])
    # interruption: resume from the receiver's high-water mark
    off = rx.resume_offset("s2")
    assert off == 100_000
    out = None
    for chunk in stream_snapshot("s2", blob, chunk_size=100_000,
                                 resume_from=off):
        out = rx.receive(chunk)
    assert out == blob
    # tampered payload fails the whole-snapshot digest
    rx2 = SnapshotReceiver()
    bad = list(stream_snapshot("s3", blob, chunk_size=100_000))
    tampered = SnapshotChunk(bad[-1].snapshot_id, bad[-1].offset,
                             bad[-1].total, bad[-1].sha256,
                             b"\x00" * len(bad[-1].data))
    rx2.receive(bad[0])
    rx2.receive(bad[1])
    with pytest.raises(ChainError):
        rx2.receive(tampered)
    # payload survives wire encoding
    p = bad[0].to_payload()
    assert SnapshotChunk.from_payload(p).data == bad[0].data


# ------------------------------------------------- 2pc recovery

def test_2pc_participant_recovery():
    wal_records = []
    store = TensorStore()
    part = TwoPhaseParticipant("p0", store, wal=wal_records.append)
    coord = TwoPhaseCoordinator("coord")
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "k:1", "fields": {"v": 1}}]})
    votes = part.handle(prepares[0])
    # crash after prepare: new participant recovers from the WAL
    store2 = TensorStore()
    part2 = TwoPhaseParticipant("p0", store2)
    unresolved = part2.recover(wal_records)
    assert unresolved == [tx]
    # in-doubt tx still holds its lock
    assert part2.locks.owner_of("k:1") == tx
    # coordinator answers: commit applies the ops
    part2.recover(wal_records, coordinator_states={tx: "committed"})
    assert store2.get("k:1").get("v").value == 1
    assert part2.locks.owner_of("k:1") is None
    # an aborted outcome releases without applying
    store3 = TensorStore()
    part3 = TwoPhaseParticipant("p0", store3)
    assert part3.recover(wal_records,
                         coordinator_states={tx: "aborted"}) == []
    assert store3.get("k:1") is None


# ------------------------------------------------- TCP transport

def test_tcp_transport_roundtrip():
    from neumann_tpu.chain.transport import TcpTransport

    a = TcpTransport("a")
    b = TcpTransport("b")
    try:
        a.connect("b", b.address)
        b.connect("a", a.address)
        assert a.send("b", "hello", {"n": 1})
        msg = b.recv(timeout=2.0)
        assert msg.kind == "hello" and msg.payload == {"n": 1} \
            and msg.src == "a"
        assert b.send("a", "reply", {"ok": True})
        back = a.recv(timeout=2.0)
        assert back.kind == "reply"
        # send to unknown peer fails cleanly
        assert not a.send("ghost", "x", {})
        # disconnect then send fails
        a.disconnect("b")
        assert not a.send("b", "x", {})
    finally:
        a.close()
        b.close()


def test_raft_over_tcp_sockets():
    """Two sans-IO Raft nodes exchanging real TCP frames."""
    import time

    from neumann_tpu.chain.transport import TcpTransport

    cfg = RaftConfig(election_timeout_min=3, election_timeout_max=5)
    n0 = RaftNode("n0", ["n0", "n1"], cfg, seed=1)
    n1 = RaftNode("n1", ["n0", "n1"], cfg, seed=2)
    t0 = TcpTransport("n0")
    t1 = TcpTransport("n1")
    try:
        t0.connect("n1", t1.address)
        t1.connect("n0", t0.address)
        nodes = {"n0": (n0, t0), "n1": (n1, t1)}

        def pump_once():
            for nid, (node, tr) in nodes.items():
                for m in node.tick():
                    tr.send(m.dst, m.kind, m.payload)
            deadline = time.time() + 0.2
            while time.time() < deadline:
                progressed = False
                for nid, (node, tr) in nodes.items():
                    msg = tr.recv(timeout=0.01)
                    if msg is not None:
                        progressed = True
                        for m in node.handle(msg):
                            tr.send(m.dst, m.kind, m.payload)
                if not progressed:
                    break

        for _ in range(40):
            pump_once()
            if any(n.state == "leader" for n, _ in nodes.values()):
                break
        leader = next((n for n, _ in nodes.values()
                       if n.state == "leader"), None)
        assert leader is not None
        leader.propose({"via": "tcp"})
        for _ in range(20):
            pump_once()
        follower = next(n for n, _ in nodes.values() if n is not leader)
        committed = [p for _, p in follower.take_committed()
                     if "noop" not in p]
        assert {"via": "tcp"} in committed
    finally:
        t0.close()
        t1.close()


def test_tcp_transport_compression_roundtrip():
    from neumann_tpu.chain.transport import TcpTransport

    a = TcpTransport("a", compress=True, compress_min=64)
    b = TcpTransport("b")  # receiver decompresses regardless of config
    try:
        a.connect("b", b.address)
        big = {"blob": "x" * 50_000, "n": 7}
        assert a.send("b", "big", big)
        msg = b.recv(timeout=2.0)
        assert msg.payload == big
        # small payloads skip compression but still roundtrip
        assert a.send("b", "small", {"v": 1})
        assert b.recv(timeout=2.0).payload == {"v": 1}
    finally:
        a.close()
        b.close()


def test_tcp_transport_tls():
    from neumann_tpu.chain.transport import TcpTransport, \
        make_tls_contexts
    from neumann_tpu.server.server import generate_self_signed

    cert, key = generate_self_signed("127.0.0.1")
    sctx, cctx = make_tls_contexts(cert, key)
    srv = TcpTransport("srv", tls_server=sctx)
    cli = TcpTransport("cli", tls_client=cctx)
    try:
        cli.connect("srv", srv.address)
        assert cli.send("srv", "secure", {"ok": True})
        msg = srv.recv(timeout=2.0)
        assert msg.kind == "secure" and msg.payload == {"ok": True}
        # plaintext client against the TLS server must NOT deliver
        plain = TcpTransport("plain")
        try:
            try:
                plain.connect("srv", srv.address)
                plain.send("srv", "leak", {})
            except OSError:
                pass
            assert srv.recv(timeout=0.3) is None
        finally:
            plain.close()
    finally:
        srv.close()
        cli.close()


def test_tcp_transport_pool_and_reconnect():
    from neumann_tpu.chain.transport import TcpTransport

    a = TcpTransport("a", pool_size=3)
    b = TcpTransport("b")
    try:
        a.connect("b", b.address)
        assert len(a._pools["b"]) == 3
        for i in range(9):  # round-robins across the pool
            assert a.send("b", "m", {"i": i})
        got = sorted(b.recv(timeout=2.0).payload["i"] for _ in range(9))
        assert got == list(range(9))
        # kill every pooled socket server-side unseen by the sender;
        # send() must reconnect via the remembered address
        for s in list(a._pools["b"]):
            s.close()
        a._pools["b"].clear()
        assert a.send("b", "after", {"x": 1})
        assert b.recv(timeout=2.0).payload == {"x": 1}
    finally:
        a.close()
        b.close()


# ------------------------------------------------- joint consensus

def test_joint_consensus_add_and_remove():
    """{n0,n1,n2} -> {n0,n1,n3,n4} in one atomic joint change."""
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    # two fresh nodes join the transport fabric
    ids = sorted(nodes) + ["n3", "n4"]
    for nid in ("n3", "n4"):
        nodes[nid] = RaftNode(nid, [nid], RaftConfig(), seed=10)
        nodes[nid].voters = set()  # blank config; learns via snapshot/log
        tr[nid] = hub.register(nid)

    idx = leader.propose_joint_change(add=["n3", "n4"], remove=["n2"])
    assert idx is not None
    assert leader.joint_old == {"n0", "n1", "n2"}
    assert leader.voters == {"n0", "n1", "n3", "n4"}
    # a second change while joint is in flight must be refused
    assert leader.propose_joint_change(add=["n9"]) is None
    assert leader.propose_config_change("remove", "n1") is None

    pump(nodes, hub, tr, 80)
    # leave entry committed: every surviving voter finalized C_new
    for nid in ("n0", "n1", "n3", "n4"):
        assert nodes[nid].voters == {"n0", "n1", "n3", "n4"}, nid
        assert nodes[nid].joint_old is None, nid
    # post-change entries commit under the new majority
    leader2 = next(n for n in nodes.values() if n.state == "leader")
    leader2.propose({"after": "joint"})
    pump(nodes, hub, tr, 40)
    assert any(p.get("after") == "joint"
               for _, p in nodes["n3"].take_committed())


def test_joint_consensus_removed_leader_steps_down():
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    assert leader.propose_joint_change(remove=[leader.id]) is not None
    pump(nodes, hub, tr, 100)
    assert leader.state != "leader"
    assert leader.id not in leader.voters
    survivors = [n for n in nodes.values() if n.id != leader.id]
    assert all(n.voters == {s.id for s in survivors} for n in survivors)


def test_joint_phase_requires_both_majorities():
    """While joint, a C_new-only majority must NOT commit entries.

    Old-config peers are isolated INDIVIDUALLY so pre-vote stops them
    from electing a rival (a 2-node old-side group legitimately could:
    it never saw the joint entry)."""
    hub, nodes, tr = make_cluster(5)
    pump(nodes, hub, tr, 80)
    leader = next(n for n in nodes.values() if n.state == "leader")
    old = ["n0", "n1", "n2", "n3", "n4"]
    others = [nid for nid in old if nid != leader.id]
    for nid in ("n5", "n6", "n7"):
        nodes[nid] = RaftNode(nid, [nid], RaftConfig(), seed=11)
        nodes[nid].voters = set()
        tr[nid] = hub.register(nid)
    # C_old = {n0..n4}; C_new = {leader, n5, n6, n7}
    idx = leader.propose_joint_change(add=["n5", "n6", "n7"],
                                      remove=others)
    assert idx is not None
    # keep ONE old peer with the leader (2/5 of C_old: no old majority)
    # while ALL of C_new is reachable (4/4); isolate the other three
    # old peers each alone so pre-vote denies them a rival election
    hub.partition({leader.id, others[0], "n5", "n6", "n7"},
                  {others[1]}, {others[2]}, {others[3]})
    pump(nodes, hub, tr, 80)
    assert leader.state == "leader"
    assert leader.commit_index < idx
    assert leader.joint_old is not None  # still stuck in joint
    # heal: old majority reachable again -> enter commits, leave runs
    hub.heal()
    pump(nodes, hub, tr, 120)
    cur_leader = next(n for n in nodes.values() if n.state == "leader")
    assert cur_leader.joint_old is None
    assert cur_leader.voters == {leader.id, "n5", "n6", "n7"}


def test_joint_config_survives_snapshot_install():
    """A node that joins via snapshot learns the post-change config."""
    hub, nodes, tr = make_cluster(3)
    pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == "leader")
    leader.propose_joint_change(add=["n3"])
    pump(nodes, hub, tr, 80)
    for _ in range(5):
        leader.propose({"x": 1})
    pump(nodes, hub, tr, 40)
    leader.take_committed()  # advances last_applied; compact needs it
    leader.compact()
    assert leader.snapshot_index > 0
    # fresh n4 added via a second change; it must catch up from snapshot
    nodes["n4"] = RaftNode("n4", ["n4"], RaftConfig(), seed=12)
    nodes["n4"].voters = set()
    tr["n4"] = hub.register("n4")
    leader.propose_joint_change(add=["n4"])
    pump(nodes, hub, tr, 100)
    assert "n3" in nodes["n4"].voters and "n4" in nodes["n4"].voters


# ------------------------------------- similarity fast-path / tie-break

def test_block_similarity_fast_path():
    import numpy as np

    from neumann_tpu.chain.block import Chain

    chain = Chain(signing_key=b"k1")
    state = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    aligned = chain.new_block([{"op": "put"}], "root1",
                              delta_embedding=[0.99, 0.05, 0, 0])
    # break the signature: full validation would reject it
    aligned.signature = "00" * 32
    fast = chain.append(aligned, state_embedding=state,
                        enable_fast_path=True)
    assert fast  # skipped signature check: similarity 0.998 >= 0.95
    # dissimilar block falls back to full validation -> bad sig rejected
    ortho = chain.new_block([{"op": "put"}], "root2",
                            delta_embedding=[0, 1.0, 0, 0])
    ortho.signature = "00" * 32
    with pytest.raises(ChainError):
        chain.append(ortho, state_embedding=state, enable_fast_path=True)
    # and without the flag even the aligned block is fully validated
    chain2 = Chain(signing_key=b"k1")
    blk = chain2.new_block([], "r", delta_embedding=[1, 0, 0, 0])
    blk.signature = "00" * 32
    with pytest.raises(ChainError):
        chain2.append(blk, state_embedding=state)


def test_geometric_tiebreak_prefers_similar_candidate():
    cfg = RaftConfig(enable_geometric_tiebreak=True,
                     geometric_tiebreak_threshold=0.9)
    voter = RaftNode("v", ["v", "a", "b"], cfg, seed=1)
    voter.state_embedding = [1.0, 0.0]
    voter._elapsed = voter.config.election_timeout_min  # no live leader

    def pre_vote(src, emb):
        return voter.handle(Message("pre_vote_req", src, "v", {
            "term": 1, "last_index": 0, "last_term": 0,
            "embedding": emb}))[0].payload["granted"]

    assert pre_vote("a", [0.99, 0.1]) is True      # similar: granted
    assert pre_vote("b", [0.0, 1.0]) is False      # orthogonal: denied
    # candidate with a LONGER log wins regardless of embedding (safety)
    voter2 = RaftNode("v2", ["v2", "c"], cfg, seed=2)
    voter2.state_embedding = [1.0, 0.0]
    voter2._elapsed = voter2.config.election_timeout_min
    granted = voter2.handle(Message("pre_vote_req", "c", "v2", {
        "term": 1, "last_index": 5, "last_term": 1,
        "embedding": [0.0, 1.0]}))[0].payload["granted"]
    assert granted is True


# ------------------------------------------------- bounded model check

def test_model_check_raft_safety_clean():
    from neumann_tpu.chain.model_check import check_raft

    r = check_raft(n_nodes=2, max_states=4000)
    assert r.ok, f"{r.violation}\n" + "\n".join(r.trace)
    assert r.states_explored == 4000  # bounded run completed


def test_model_check_falsifies_double_voting():
    """The checker must FIND the classic election-safety bug when a
    voter's voted_for check is removed — proof it can falsify."""
    from neumann_tpu.chain.model_check import check_raft

    def buggy_vote_req(self, msg):
        p = msg.payload
        grant = False
        if p["term"] >= self.term:
            if (p["last_term"], p["last_index"]) >= \
                    (self.last_term(), self.last_index()):
                grant = True          # BUG: voted_for check removed
                self.voted_for = msg.src
                self._elapsed = 0
        return [Message("vote_resp", self.id, msg.src,
                        {"term": self.term, "granted": grant})]

    orig = RaftNode._on_vote_req
    RaftNode._on_vote_req = buggy_vote_req
    try:
        r = check_raft(n_nodes=2, max_states=10_000)
    finally:
        RaftNode._on_vote_req = orig
    assert not r.ok
    assert "I1" in r.violation
    assert len(r.trace) <= 14  # BFS returns a near-minimal trace


def test_dst_joint_change_under_message_drops():
    """Joint membership removal while 15% of messages drop, across
    seeds: invariants hold and the config converges on survivors."""
    from neumann_tpu.chain.dst import DSTHarness, FaultAction

    converged_runs = 0
    for seed in range(6):
        h = DSTHarness(n_nodes=5, seed=seed)
        res = h.run(ticks=400, faults=[
            FaultAction(at_tick=0, kind="drop_rate", rate=0.15),
            FaultAction(at_tick=120, kind="joint_remove", node="n4"),
            FaultAction(at_tick=260, kind="drop_rate", rate=0.0),
        ])
        assert res.ok, f"seed {seed}: {res.violations}"
        survivors = [h.nodes[n] for n in ("n0", "n1", "n2", "n3")]
        if all(n.voters == {"n0", "n1", "n2", "n3"}
               and n.joint_old is None for n in survivors):
            converged_runs += 1
    # the change needs a live leader at tick 120; most seeds converge
    assert converged_runs >= 3, converged_runs


def test_geometric_transport_routing():
    from neumann_tpu.chain.transport import GeometricTransport

    hub = TransportHub()
    trs = {n: hub.register(n) for n in ("a", "b", "c", "me")}
    geo = GeometricTransport(trs["me"])
    geo.update_peer_embedding("a", [1.0, 0.0])
    geo.update_peer_embedding("b", [0.7, 0.7])
    geo.update_peer_embedding("c", [0.0, 1.0])

    # nearest by cosine
    assert geo.send_to_nearest([0.9, 0.1], "m", {"x": 1}) == "a"
    assert trs["a"].recv().payload == {"x": 1}
    # regional broadcast: only peers within the similarity region
    n = geo.broadcast_to_region([1.0, 1.0], "r", {}, 0.9)
    assert n == 1  # only b (cos=1.0); a and c are at cos≈0.707
    assert trs["b"].recv() is not None
    assert trs["a"].recv() is None and trs["c"].recv() is None
    # nearest falls through dead peers to the next-best live one
    hub.partition({"me", "c"}, {"a", "b"})
    assert geo.send_to_nearest([0.9, 0.1], "m", {}) == "c"
    geo.remove_peer("c")
    hub.heal()
    assert geo.send_to_nearest([0.0, 1.0], "m", {}) == "b"


# ------------------------------------------------- TcpClusterNode

def test_tcp_cluster_node_replication_and_client():
    """Three in-process TcpClusterNodes over REAL sockets: writes route
    to the leader, replicate to all stores, and a thin client executes
    queries without running Raft."""
    import time

    from neumann_tpu.chain.node import ClusterClient, TcpClusterNode
    from neumann_tpu.store.tensor_store import TensorData

    cfg = RaftConfig(election_timeout_min=3, election_timeout_max=6)
    nodes = {}
    # bind all listeners first so peers can dial
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
        follower = next(n for n in nodes.values() if not n.is_leader())

        # leader-proposed write replicates everywhere
        assert leader.propose_put("k1", TensorData.with_values(v=1))
        # follower write FORWARDS to the leader
        assert follower.propose_put("k2", TensorData.with_values(v=2))
        deadline = time.time() + 10
        while time.time() < deadline and not all(
                n.store.get("k2") is not None for n in nodes.values()):
            time.sleep(0.05)
        for nid, n in nodes.items():
            assert n.store.get("k1").get("v").value == 1, nid
            assert n.store.get("k2").get("v").value == 2, nid

        # thin client executes statements on a node
        client = ClusterClient(follower.address)
        try:
            out = client.execute("NODE CREATE city {name: 'berlin'}", timeout=30.0)
            assert out["kind"] in ("rows", "value", "message")
            # strong read routes to the leader: read-your-writes
            res = client.execute("NODE LIST city", strong=True, timeout=30.0)
            assert len(res["rows"]) == 1
            # follower-local read converges (eventual consistency)
            deadline = time.time() + 10
            while time.time() < deadline:
                if len(client.execute("NODE LIST city")["rows"]) == 1:
                    break
                time.sleep(0.05)
            assert len(client.execute("NODE LIST city")["rows"]) == 1
            # error path surfaces cleanly
            try:
                client.execute("BOGUS STATEMENT")
                raise AssertionError("expected ChainError")
            except ChainError as e:
                assert "BOGUS" in str(e) or "unknown" in str(e)
        finally:
            client.close()
    finally:
        for n in nodes.values():
            n.stop()


def test_tcp_cluster_node_leader_failover():
    """Kill the leader process-equivalent (stop it): survivors elect a
    new leader and writes keep working."""
    import time

    from neumann_tpu.chain.node import TcpClusterNode
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
        assert leader.propose_put("before", TensorData.with_values(v=1))
        deadline = time.time() + 10
        while time.time() < deadline and any(
                n.store.get("before") is None for n in nodes.values()):
            time.sleep(0.05)

        # kill the leader; survivors must elect a replacement
        leader.stop()
        survivors = [n for n in nodes.values() if n is not leader]
        deadline = time.time() + 20
        while time.time() < deadline and not any(
                n.is_leader() for n in survivors):
            time.sleep(0.05)
        new_leader = next(n for n in survivors if n.is_leader())
        assert new_leader is not leader
        assert new_leader.propose_put("after",
                                      TensorData.with_values(v=2))
        other = next(n for n in survivors if n is not new_leader)
        deadline = time.time() + 10
        while time.time() < deadline and other.store.get("after") is None:
            time.sleep(0.05)
        assert other.store.get("after").get("v").value == 2
        assert other.store.get("before").get("v").value == 1
    finally:
        for n in nodes.values():
            if not n._stop.is_set():
                n.stop()


def test_cluster_connect_gateway():
    """CLUSTER CONNECT turns a shell/router into a cluster gateway:
    statements execute on the cluster, all nodes converge."""
    import time

    from neumann_tpu.chain.node import TcpClusterNode
    from neumann_tpu.router import QueryRouter

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

        r = QueryRouter()
        host, port = nodes["n0"].address
        out = r.execute(f"CLUSTER CONNECT '{host}:{port}'")
        assert "connected" in out.message
        assert "created" in r.execute(
            "CREATE TABLE gw (x INT)").message
        r.execute("INSERT INTO gw VALUES (7)")
        rows = r.execute("SELECT * FROM gw").rows
        assert rows == [{"_id": 0, "x": 7}]
        # the gateway's LOCAL store stayed empty: work ran remotely
        assert len(r.store) == 0
        # every cluster node applied the statements
        deadline = time.time() + 10
        while time.time() < deadline and not all(
                n.store.get("table:gw:0") is not None
                for n in nodes.values()):
            time.sleep(0.05)
        for n in nodes.values():
            assert n.store.get("_schema:gw") is not None
        assert "disconnected" in r.execute("CLUSTER DISCONNECT").message
        # detached: statements run locally again
        r.execute("CREATE TABLE local_t (y INT)")
        assert len(r.store) > 0
    finally:
        for n in nodes.values():
            n.stop()


# --------------------------------------------- mutation-hardening units

def test_raft_protocol_precise_behaviors():
    """Exact protocol obligations caught weak by mutation testing."""
    cfg = RaftConfig(election_timeout_min=2, election_timeout_max=2,
                     pre_vote=False)
    n = RaftNode("a", ["a", "b", "c"], cfg, seed=1)
    # election increments the term by EXACTLY one
    t0 = n.term
    n.tick(); n.tick()
    assert n.state == "candidate" and n.term == t0 + 1

    # a granted vote makes it leader; add_learner initializes the
    # learner's next_index to EXACTLY last_index + 1
    n.handle(Message("vote_resp", "b", "a",
                     {"term": n.term, "granted": True}))
    assert n.state == "leader"
    n.propose({"x": 1})
    n.propose_config_change("add_learner", "d")
    assert n.next_index["d"] == n.last_index() + 1
    assert n.match_index["d"] == 0


def test_raft_append_consistency_check_exact():
    """Log-matching: an append whose prev_term MISMATCHES must be
    rejected (success=False); a matching one at the same index must be
    accepted. Guards the inverted-comparison and forced-success
    mutants."""
    f = RaftNode("f", ["f", "l"], RaftConfig(), seed=2)
    # seed the follower with one entry at term 1
    r = f.handle(Message("append_entries", "l", "f", {
        "term": 1, "prev_index": 0, "prev_term": 0,
        "entries": [{"term": 1, "payload": {"v": 1}}],
        "leader_commit": 0}))
    assert r[0].payload["success"] is True and r[0].payload["match"] == 1
    # mismatching prev_term at prev_index=1 -> MUST reject
    r = f.handle(Message("append_entries", "l", "f", {
        "term": 2, "prev_index": 1, "prev_term": 9,
        "entries": [{"term": 2, "payload": {"v": 2}}],
        "leader_commit": 0}))
    assert r[0].payload["success"] is False
    assert f.last_index() == 1  # nothing appended
    # matching prev_term at the same index -> accepted
    r = f.handle(Message("append_entries", "l", "f", {
        "term": 2, "prev_index": 1, "prev_term": 1,
        "entries": [{"term": 2, "payload": {"v": 2}}],
        "leader_commit": 0}))
    assert r[0].payload["success"] is True and f.last_index() == 2


def test_raft_pre_vote_grant_conditions_exact():
    """Pre-vote must be denied when the term is not ahead OR the
    candidate's log is stale (guards the and->or mutant)."""
    v = RaftNode("v", ["v", "c"], RaftConfig(), seed=3)
    v._elapsed = v.config.election_timeout_min  # no live leader
    v.log.append(LogEntry(1, {"x": 1}))
    v.term = 1

    def pre(term, last_index, last_term):
        return v.handle(Message("pre_vote_req", "c", "v", {
            "term": term, "last_index": last_index,
            "last_term": last_term}))[0].payload["granted"]

    assert pre(2, 1, 1) is True          # ahead + up-to-date
    assert pre(1, 1, 1) is False         # term not ahead
    assert pre(2, 0, 0) is False         # stale log
    # live leader known and recently heard from -> denied
    v.leader_id = "c"
    v._elapsed = 0
    assert pre(2, 1, 1) is False


def test_2pc_commit_requires_every_vote():
    """The coordinator must stay PREPARING until EVERY participant has
    voted yes — a first-vote commit would be a consistency bug
    (mutation-found gap)."""
    coord = TwoPhaseCoordinator("c")
    tx_id, prepares = coord.begin({"p1": [{"op": "put", "key": "a"}],
                                   "p2": [{"op": "put", "key": "b"}],
                                   "p3": [{"op": "put", "key": "c"}]})
    assert len(prepares) == 3
    # first yes vote: still preparing, no commit messages
    out = coord.handle(Message("tx_vote", "p1", "c",
                               {"tx": tx_id, "ok": True}))
    assert out == [] and coord.state_of(tx_id) == "preparing"
    out = coord.handle(Message("tx_vote", "p2", "c",
                               {"tx": tx_id, "ok": True}))
    assert out == [] and coord.state_of(tx_id) == "preparing"
    # the FINAL vote commits and fans out exactly one commit per node
    out = coord.handle(Message("tx_vote", "p3", "c",
                               {"tx": tx_id, "ok": True}))
    assert coord.state_of(tx_id) == "committed"
    assert sorted(m.dst for m in out) == ["p1", "p2", "p3"]
    assert all(m.kind == "tx_commit" for m in out)


def test_2pc_participant_abort_releases_locks():
    """tx_abort (and ONLY tx_abort) drops staged state and locks."""
    from neumann_tpu.store.tensor_store import TensorStore

    store = TensorStore()
    part = TwoPhaseParticipant("p", store)
    part.handle(Message("tx_prepare", "c", "p", {
        "tx": "t1", "ops": [{"op": "put", "key": "k",
                             "fields": {"v": 1}}]}))
    assert part.locks.owner_of("k") == "t1"
    # unknown message kinds are ignored and do NOT release anything
    assert part.handle(Message("tx_noise", "c", "p", {"tx": "t1"})) == []
    assert part.locks.owner_of("k") == "t1"
    out = part.handle(Message("tx_abort", "c", "p", {"tx": "t1"}))
    assert out[0].kind == "tx_ack"
    assert part.locks.owner_of("k") is None
    assert store.get("k") is None  # nothing applied


def test_classify_pairwise_codes_matches_loop():
    """Vectorized code matrix must reproduce the per-pair rules."""
    from neumann_tpu.chain.consensus import (
        ConflictClass, ConsensusConfig, _jaccard,
        classify_pairwise_codes)

    rng = np.random.default_rng(3)
    n, d = 24, 16
    base = rng.standard_normal((4, d)).astype(np.float32)
    deltas = np.stack([
        base[i % 4] * (1.0 if i % 3 else 0.97)
        + (0.02 * rng.standard_normal(d) if i % 5 == 0 else 0)
        for i in range(n)]).astype(np.float32)
    deltas[7] = 0.0                      # zero-norm delta
    universe = [f"k{j}" for j in range(6)]
    key_sets = [set(rng.choice(universe, size=rng.integers(0, 4),
                               replace=False).tolist())
                for _ in range(n)]
    cfg = ConsensusConfig()

    def oracle(i, j):
        a, b = deltas[i], deltas[j]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        c = float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0
        jac = _jaccard(key_sets[i], key_sets[j])
        if jac > cfg.jaccard_conflict:
            if c >= cfg.identical_threshold and key_sets[i] == key_sets[j]:
                return ConflictClass.IDENTICAL
            if c >= cfg.similar_threshold:
                return ConflictClass.SIMILAR
            return ConflictClass.CONFLICTING
        if abs(c) <= cfg.orthogonal_threshold:
            return ConflictClass.ORTHOGONAL
        if c >= cfg.similar_threshold:
            return ConflictClass.SIMILAR
        return ConflictClass.ORTHOGONAL

    from neumann_tpu.chain.consensus import _CLASS_BY_CODE
    codes = classify_pairwise_codes(deltas, key_sets, cfg)
    for i in range(n):
        for j in range(i + 1, n):
            assert _CLASS_BY_CODE[codes[i, j]] == oracle(i, j), (i, j)


def test_tcp_transport_hostile_frames():
    """Garbage frames, oversized headers, and deflate bombs must not
    kill or balloon the node: decompression output is capped at
    _MAX_FRAME and bad peers just lose their connection."""
    import socket
    import time
    import tracemalloc
    import zlib

    from neumann_tpu.chain.transport import TcpTransport, _FRAME

    srv = TcpTransport("srv", port=0)
    port = srv.address[1]

    def attack(data):
        try:
            s = socket.create_connection(("127.0.0.1", port))
            s.sendall(data)
            s.close()
        except OSError:
            pass

    bomb = zlib.compress(b"\x00" * (256 << 20), 9)   # 256MB -> ~256KB
    tracemalloc.start()
    attack(b"\xde\xad\xbe\xef" * 64)                 # garbage
    attack(_FRAME.pack(1 << 30, 0))                  # oversized header
    attack(_FRAME.pack(len(bomb), 1) + bomb)         # deflate bomb
    time.sleep(1.0)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 200e6, peak                        # capped, not 256MB+
    cli = TcpTransport("cli", port=0)
    try:
        cli.connect("srv", ("127.0.0.1", port))
        cli.send("srv", "ping", {"x": 1})
        msg = srv.recv(timeout=2.0)
        assert msg is not None and msg.kind == "ping"
    finally:
        srv.close()
        cli.close()


def test_incremental_state_root_consistency():
    """The O(1)-per-op root tracker must equal a fresh seed of the
    final store state through puts, overwrites, deletes, and
    out-of-band (non-transactional) store writes."""
    from neumann_tpu.chain.block import StateRootTracker
    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store import TensorData, TensorStore, codec

    store = TensorStore()
    chain = TensorChain(store)

    def fresh_root():
        t = StateRootTracker()
        t.seed((k, codec.encode_data(store.get(k)))
               for k in store.keys())
        return t.root()

    roots = set()
    tx = chain.begin()
    tx.put("a:1", TensorData.with_values(v=1))
    tx.put("b:1", TensorData.with_values(v=2))
    chain.commit(tx)
    assert chain._state_root() == fresh_root()
    roots.add(chain._state_root())

    store.put("oob:1", TensorData.with_values(x=1))     # out-of-band
    assert chain._state_root() == fresh_root()
    roots.add(chain._state_root())

    store.put("oob:1", TensorData.with_values(x=2))     # overwrite
    assert chain._state_root() == fresh_root()
    roots.add(chain._state_root())

    store.delete("oob:1")
    tx = chain.begin()
    tx.delete("a:1")
    chain.commit(tx)
    assert chain._state_root() == fresh_root()
    roots.add(chain._state_root())
    assert len(roots) == 4   # every state change moved the root


def test_state_root_commit_is_o1_not_o_n():
    """Commit latency must not grow with store size."""
    import time

    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store import TensorData, TensorStore

    chain = TensorChain(TensorStore())

    def one(i):
        tx = chain.begin()
        tx.put(f"k:{i}", TensorData.with_values(v=i))
        chain.commit(tx)

    for i in range(40):
        one(i)              # warm: codebook training, codec build
    t0 = time.perf_counter()
    for i in range(40, 60):
        one(i)
    small = time.perf_counter() - t0
    for i in range(60, 3000):
        one(i)
    t0 = time.perf_counter()
    for i in range(3000, 3020):
        one(i)
    large = time.perf_counter() - t0
    # O(n) roots made this ratio ~50x at 3K keys; allow generous noise
    assert large < small * 5, (small, large)


def test_statement_level_chain_transaction_rollback(router=None):
    """Statements between BEGIN CHAIN TRANSACTION and ROLLBACK CHAIN
    must be undone across all engines (the store is authoritative and
    engine slabs resync through its hooks)."""
    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    r.execute("CREATE TABLE acct (name TEXT, bal INT)")
    r.execute("INSERT INTO acct VALUES ('a', 100), ('b', 50)")

    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("UPDATE acct SET bal = 0 WHERE name = 'a'")
    r.execute("INSERT INTO acct VALUES ('c', 7)")
    r.execute("DELETE FROM acct WHERE name = 'b'")
    r.execute("EMBED STORE 'tx-vec' [1.0, 0.0]")
    r.execute("ROLLBACK CHAIN")

    rows = r.execute("SELECT name, bal FROM acct ORDER BY name").rows
    assert rows == [{"name": "a", "bal": 100}, {"name": "b", "bal": 50}]
    assert "emb:tx-vec" not in r.store.scan("")
    # and the root matches a fresh recomputation (nothing leaked)
    from neumann_tpu.chain.block import StateRootTracker
    from neumann_tpu.store import codec

    t = StateRootTracker()
    t.seed((k, codec.encode_data(r.store.get(k)))
           for k in r.store.keys())
    assert r.chain._state_root() == t.root()


def test_statement_level_chain_transaction_commit_records_ops():
    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    r.execute("CREATE TABLE t2 (v INT)")
    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("INSERT INTO t2 VALUES (1)")
    r.execute("INSERT INTO t2 VALUES (2)")
    r.execute("COMMIT CHAIN")
    blk = r.chain.tip()
    keys = [op["key"] for tx in blk.transactions for op in tx["ops"]]
    assert keys == ["table:t2:0", "table:t2:1"]
    assert r.execute("SELECT COUNT(*) FROM t2").rows == [
        {"count(*)": 2}]
    # journal hooks are detached after commit
    assert "put" not in r.store.__dict__


def test_chain_metrics_counters_and_timing():
    """ChainMetrics parity (tensor_chain/src/metrics.rs): commit/
    rollback/conflict counters plus min/avg/max commit timings."""
    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store.tensor_store import TensorData, TensorValue

    chain = TensorChain(embedding_dim=8)
    for i in range(3):
        tx = chain.begin()
        tx.put(f"m{i}", TensorData.with_values(v=TensorValue.scalar(i)))
        chain.commit(tx)
    tx = chain.begin()
    chain.rollback(tx)
    snap = chain.metrics.snapshot()
    assert snap["commits"] == 3 and snap["blocks"] == 3
    assert snap["rollbacks"] == 1
    t = snap["commit_timing"]
    assert t["count"] == 3
    assert 0 <= t["min_us"] <= t["avg_us"] <= t["max_us"]
    chain.metrics.reset()
    assert chain.metrics.snapshot()["commits"] == 0


def test_chain_stats_statement():
    from neumann_tpu.router.router import QueryRouter

    r = QueryRouter()
    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("CREATE TABLE cs (a INT)")
    r.execute("INSERT INTO cs VALUES (1)")
    r.execute("COMMIT CHAIN")
    rows = r.execute("CHAIN STATS").rows
    assert rows and rows[0]["blocks"] >= 1
    assert rows[0]["commit_timing"]["count"] >= 1


def test_build_node_flags_and_env(monkeypatch, tmp_path):
    """build_node wires CLI flags (and NEUMANN_* env fallbacks) into a
    TcpClusterNode without starting the serve loop (node.py CLI
    surface; reference ops docs' container env contract)."""
    from neumann_tpu.chain.node import build_node

    node, args = build_node([
        "--id", "nx", "--port", "0",
        "--peers", "a=127.0.0.1:19001,b=127.0.0.1:19002",
        "--wal-dir", str(tmp_path / "wal"),
        "--auto-remove-faulty", "--faulty-grace-ticks", "7",
    ])
    try:
        assert node.id == "nx" and args.id == "nx"
        assert node._peer_addrs == {"a": ("127.0.0.1", 19001),
                                    "b": ("127.0.0.1", 19002)}
        assert node.auto_remove_faulty is True
        assert node.faulty_grace_ticks == 7
        assert node.raft_wal is not None
    finally:
        node.stop()

    # env fallback path: no argv at all
    monkeypatch.setenv("NEUMANN_NODE_ID", "envnode")
    monkeypatch.setenv("NEUMANN_CLUSTER_PORT", "0")
    monkeypatch.setenv("NEUMANN_PEERS", "p=localhost:19003")
    monkeypatch.setenv("NEUMANN_AUTO_REMOVE_FAULTY", "1")
    monkeypatch.setenv("NEUMANN_FAULTY_GRACE", "11")
    node2, args2 = build_node([])
    try:
        assert node2.id == "envnode"
        assert node2._peer_addrs == {"p": ("localhost", 19003)}
        assert node2.auto_remove_faulty is True
        assert node2.faulty_grace_ticks == 11
        assert node2.raft_wal is None  # no NEUMANN_DATA_DIR set
    finally:
        node2.stop()


def test_wire_binary_roundtrip_and_json_interop():
    """chain/wire.py: packed-array binary messages roundtrip exactly
    and JSON frames from older peers still decode."""
    from neumann_tpu.chain.transport import Message
    from neumann_tpu.chain import wire

    payload = {
        "term": 7, "leader": "n1", "prev_index": 41,
        "entries": [
            {"index": 42, "term": 7,
             "emb": [0.125 * i for i in range(768)],
             "ids": list(range(100)),
             "blob": b"\x00\x01\xff",
             "mixed": [1, "x", None, True, 2.5],
             "nested": {"a": {"b": [1.5, 2.5]}},
             "bigint": 1 << 100,
             "empty_list": [], "empty_dict": {}},
        ],
        "commit": 41, "none": None, "flag": False,
    }
    m = Message("append_entries", "n1", "n2", payload)
    # binary sends are OPT-IN (mixed-version clusters: old nodes only
    # json.loads); decode always accepts both formats
    assert m.encode()[:1] == b"{"
    assert Message.decode(m.encode()).payload == payload
    buf = m.encode_binary()
    assert buf[:2] == b"N1"
    back = Message.decode(buf)
    assert (back.kind, back.src, back.dst) == ("append_entries", "n1",
                                               "n2")
    assert back.payload == payload

    j = Message("gossip", "a", "b", {"seen": {"n1": 3}, "v": [1.0, 2.0]})
    back_j = Message.decode(j.encode_json())
    assert back_j.payload == j.payload and back_j.kind == "gossip"

    # size: binary AppendEntries with embeddings is far smaller than
    # JSON (full-precision floats print ~19 chars vs 8 packed bytes)
    import math

    m2 = Message("ae", "a", "b",
                 {"entries": [{"emb": [math.sin(i) * 0.7310585786300049
                                       for i in range(768)]}]})
    assert len(m2.encode_binary()) < len(m2.encode_json()) / 2
