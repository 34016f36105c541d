"""Integrated cluster boot: gossip + membership + delta replication +
snapshot streaming + partition merge running TOGETHER on one node stack
(reference ClusterOrchestrator boot path, cluster.rs:230-330; chaos
composition mirrors integration_tests/tests/chaos_combined.rs)."""

import numpy as np

from neumann_tpu.chain.cluster import ClusterNode
from neumann_tpu.chain.gossip import ALIVE, FAULTY, GossipConfig
from neumann_tpu.chain.raft import LEADER, RaftConfig
from neumann_tpu.chain.transport import TransportHub
from neumann_tpu.store.tensor_store import TensorData, TensorValue


def _mk_cluster(n=5, seed=0, **kw):
    hub = TransportHub(seed=seed)
    ids = [f"n{i}" for i in range(n)]
    nodes = {nid: ClusterNode(
        nid, ids, hub, seed=seed + i,
        gossip_config=GossipConfig(probe_interval=2, ack_timeout=2,
                                   suspect_timeout=4), **kw)
        for i, nid in enumerate(ids)}
    return hub, ids, nodes


def _pump(nodes, steps, skip=()):
    for _ in range(steps):
        for nid, node in nodes.items():
            if nid not in skip:
                node.pump()


def _leader(nodes, skip=()):
    for nid, node in nodes.items():
        if nid not in skip and node.is_leader():
            return node
    return None


def _elect(nodes, skip=(), steps=400):
    for _ in range(steps):
        _pump(nodes, 1, skip)
        ld = _leader(nodes, skip)
        if ld is not None and ld.raft.commit_index > 0:
            return ld
    raise AssertionError("no leader")


def _emb(vec):
    return TensorData().set("embedding", TensorValue.vector(
        np.asarray(vec, np.float32)))


def test_gossip_failure_drives_membership():
    """A SIGKILLed node is detected by SWIM, removed from the Raft
    config by the leader, and re-added (learner -> voter) on heal."""
    hub, ids, nodes = _mk_cluster(5, auto_remove_faulty=True,
                                  faulty_grace_ticks=5)
    leader = _elect(nodes)
    dead = next(nid for nid in ids if nid != leader.id)
    # stop pumping `dead` == process death (no acks, no raft)
    for _ in range(600):
        _pump(nodes, 1, skip={dead})
        if dead not in _leader(nodes, skip={dead}).raft.voters \
                if _leader(nodes, skip={dead}) else False:
            break
    leader = _leader(nodes, skip={dead})
    assert leader is not None
    assert dead not in leader.raft.voters, "faulty voter not removed"
    assert leader.gossip.status_of(dead) == FAULTY

    # heal: the node pumps again, gossip refutes, leader re-adds it
    for _ in range(800):
        _pump(nodes, 1)
        ld = _leader(nodes)
        if ld is not None and dead in ld.raft.voters:
            break
    ld = _leader(nodes)
    assert dead in ld.raft.voters, "healed node not promoted back"
    assert ld.gossip.status_of(dead) == ALIVE


def test_partition_merge_semantic_reconciliation():
    """Chaos: partition 5 nodes 3/2, write on BOTH sides (raft commits
    on the majority, eventual-mode local writes on the minority), heal,
    and assert the 6-phase semantic reconciliation: orthogonal deltas
    merge by vector addition, minority-only keys replicate everywhere,
    conflicting keys resolve to the leader and are logged."""
    hub, ids, nodes = _mk_cluster(5)
    leader = _elect(nodes)

    # replicated base state
    assert leader.propose_put("base", _emb([1.0, 0.0, 0.0, 0.0]))
    _pump(nodes, 60)
    assert all(n.store.get("base") is not None for n in nodes.values())

    maj = [leader.id] + [nid for nid in ids if nid != leader.id][:2]
    mino = [nid for nid in ids if nid not in maj]
    hub.partition(set(maj), set(mino))

    # let gossip on each side mark the other FAULTY
    _pump(nodes, 120)
    m0 = nodes[mino[0]]
    assert all(m0.gossip.status_of(p) == FAULTY for p in maj)

    # majority writes (commit through raft)
    ld = _leader({k: nodes[k] for k in maj})
    assert ld is not None
    assert ld.propose_put("shared", _emb([0.0, 2.0, 0.0, 0.0]))
    assert ld.propose_put("conflict", _emb([1.0, 1.0, 0.0, 0.0]))
    _pump(nodes, 60)

    # minority writes (eventual mode, reconciled on heal)
    m0.put_local("shared", _emb([0.0, 0.0, 3.0, 0.0]))   # orthogonal
    m0.put_local("mine", _emb([0.0, 0.0, 0.0, 4.0]))     # new key
    m0.put_local("conflict", _emb([-1.0, -1.0, 0.0, 0.0]))  # opposite

    hub.heal()
    for _ in range(800):
        _pump(nodes, 1)
        if not m0.local_writes and \
                nodes[maj[0]].store.get("mine") is not None:
            # wait for the resolutions to commit everywhere
            vals = [n.store.get("shared") for n in nodes.values()]
            if all(v is not None and v.get("embedding").to_dense()[2]
                   > 0 for v in vals):
                break
    assert not m0.local_writes, "merge never completed"

    for nid, node in nodes.items():
        shared = node.store.get("shared").get("embedding").to_dense()
        np.testing.assert_allclose(
            shared, [0.0, 2.0, 3.0, 0.0], atol=1e-5,
            err_msg=f"{nid}: orthogonal deltas not vector-merged")
        mine = node.store.get("mine").get("embedding").to_dense()
        np.testing.assert_allclose(mine, [0, 0, 0, 4.0], atol=1e-5)
        conf = node.store.get("conflict").get("embedding").to_dense()
        np.testing.assert_allclose(
            conf, [1.0, 1.0, 0.0, 0.0], atol=1e-5,
            err_msg=f"{nid}: conflict must resolve to the leader")
    report = next(r for n in nodes.values() for r in n.merge_reports
                  if r.get("conflicts"))
    assert "conflict" in report["conflicts"]
    assert "shared" in report["merged"]
    assert "mine" in report["took_offer"]


def test_delta_replication_rides_the_log():
    """After the archetype registry replicates through the log, puts
    carry (archetype, sparse delta) — smaller entries, same state."""
    hub, ids, nodes = _mk_cluster(3)
    leader = _elect(nodes)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    # seed: vectors clustered around 4 archetypes
    for i in range(16):
        v = base[i % 4] + 0.005 * rng.standard_normal(16)
        assert leader.propose_put(f"seed{i}", _emb(v))
    _pump(nodes, 80)
    assert leader.enable_delta_replication(16, n_archetypes=4)
    _pump(nodes, 60)
    assert all(n.delta_replicator is not None for n in nodes.values())

    v_new = base[1] + 0.005 * rng.standard_normal(16).astype(np.float32)
    assert leader.propose_put("delta-coded", _emb(v_new))
    # the proposed entry is delta-coded in the log itself
    entry = leader.raft.log[-1].payload
    assert entry["op"] == "put_delta"
    _pump(nodes, 60)
    for n in nodes.values():
        got = n.store.get("delta-coded").get("embedding").to_dense()
        np.testing.assert_allclose(got, v_new, atol=0.02)
    assert leader.delta_replicator.bandwidth_ratio() > 2.0


def test_snapshot_streaming_for_lagging_follower():
    """A compaction snapshot larger than the stream threshold reaches a
    lagging follower as SHA-256-validated chunks and installs."""
    hub, ids, nodes = _mk_cluster(3)
    leader = _elect(nodes)
    lag = next(nid for nid in ids if nid != leader.id)
    _pump(nodes, 40)

    # follower goes dark; leader keeps committing and compacts with a
    # big snapshot payload
    import base64

    for i in range(20):
        assert leader.propose_put(f"k{i}", _emb([float(i), 0, 0, 0]))
    _pump(nodes, 60, skip={lag})
    blob = base64.b64encode(
        leader.store.snapshot_bytes(compressed=False)).decode()
    pad = "x" * 40_000          # force the chunked path
    leader.raft.compact(upto=leader.raft.last_applied,
                        snapshot_data={"store": blob, "pad": pad})
    assert leader.raft.snapshot_index > 0

    # follower returns: next_index fell behind the snapshot -> leader
    # streams chunks; the follower reassembles, verifies, installs,
    # and rebuilds its store from the snapshot
    _pump(nodes, 300)
    lagnode = nodes[lag]
    assert lagnode.raft.snapshot_index == leader.raft.snapshot_index
    assert lagnode.raft.snapshot_data["pad"] == pad
    for i in range(20):
        got = lagnode.store.get(f"k{i}")
        assert got is not None, f"k{i} missing after snapshot install"
        assert got.get("embedding").to_dense()[0] == float(i)


def test_geometric_membership_rides_gossip():
    """Identity embeddings piggyback on gossip; every node ends up
    knowing its peers' embeddings and can rank them by similarity."""
    hub, ids, nodes = _mk_cluster(3)
    _elect(nodes)
    _pump(nodes, 60)
    for nid, node in nodes.items():
        known = set(node.geom._peers)
        assert set(ids) - {nid} <= known, (nid, known)
        ranked = node.geom.rank_peers()
        assert len(ranked) == 2
