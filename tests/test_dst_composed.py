"""Deterministic simulation composing Raft + gossip + partition merge.

Seeded fault schedules drive the INTEGRATED ClusterNode stack (the
reference composes subsystem chaos in chaos_combined.rs and seeds DST
in dst_raft.rs): random partitions, heals, leader writes, eventual-mode
minority writes, and node stalls. Invariants per seed: at most one
leader per term, committed data never lost, stores converge after the
dust settles, and pending merges complete."""

import random

import numpy as np
import pytest

from neumann_tpu.chain.cluster import ClusterNode
from neumann_tpu.chain.gossip import GossipConfig
from neumann_tpu.chain.model_check import (
    check_membership,
    check_two_phase,
)
from neumann_tpu.chain.transport import TransportHub
from neumann_tpu.store.tensor_store import TensorData, TensorValue


def _emb(vec):
    return TensorData().set("embedding",
                            TensorValue.vector(np.asarray(vec,
                                                          np.float32)))


def _leader(nodes, up):
    best = None
    for nid in up:
        n = nodes[nid]
        if n.is_leader() and (best is None
                              or n.raft.term > best.raft.term):
            best = n
    return best


@pytest.mark.parametrize("seed", range(10))
def test_composed_fault_schedule(seed):
    rng = random.Random(seed)
    hub = TransportHub(seed=seed)
    ids = [f"n{i}" for i in range(5)]
    nodes = {nid: ClusterNode(
        nid, ids, hub, seed=seed * 10 + i,
        gossip_config=GossipConfig(probe_interval=2, ack_timeout=2,
                                   suspect_timeout=4))
        for i, nid in enumerate(ids)}
    up = set(ids)
    acked = {}          # key -> value committed through raft
    eventual = {}       # key -> minority eventual writes
    partitioned = False
    wi = 0

    def pump(steps):
        for _ in range(steps):
            for nid in ids:
                if nid in up:
                    nodes[nid].pump()
            # I1: at most one leader per term
            terms = {}
            for nid, n in nodes.items():
                if n.is_leader():
                    assert terms.get(n.raft.term, nid) == nid, \
                        f"two leaders in term {n.raft.term}"
                    terms[n.raft.term] = nid

    pump(120)
    for _ in range(10):
        act = rng.choice(["write", "write", "partition", "heal",
                          "stall", "local_write", "pump",
                          "reorder", "lossy"])
        if act == "write":
            ld = _leader(nodes, up)
            if ld is not None:
                key = f"k{wi}"
                # orthogonal one-hot embeddings merge cleanly
                vec = [0.0] * 8
                vec[wi % 8] = float(wi + 1)
                if ld.propose_put(key, _emb(vec)):
                    acked[key] = vec
                wi += 1
            pump(40)
        elif act == "partition" and not partitioned:
            maj = set(rng.sample(ids, 3))
            hub.partition(maj, set(ids) - maj)
            partitioned = True
            pump(100)
        elif act == "heal" and partitioned:
            hub.heal()
            partitioned = False
            pump(200)
        elif act == "stall":
            victim = rng.choice(sorted(up))
            if len(up) > 3:
                up.discard(victim)
                pump(60)
                up.add(victim)
            pump(40)
        elif act == "reorder":
            # a bounded era of delayed+reordered delivery
            hub.reorder_probability = 0.25
            pump(80)
            hub.reorder_probability = 0.0
            hub.flush_reordered()
            pump(40)
        elif act == "lossy":
            hub.drop_probability = 0.1
            pump(80)
            hub.drop_probability = 0.0
            pump(40)
        elif act == "local_write" and partitioned:
            nid = rng.choice(ids)
            key = f"e{wi}"
            vec = [0.0] * 8
            vec[wi % 8] = 1.0
            nodes[nid].put_local(key, _emb(vec))
            eventual[key] = nid
            wi += 1
            pump(20)
        else:
            pump(30)

    hub.heal()
    up = set(ids)
    pump(600)

    # committed writes survive on every node
    for key in acked:
        for nid, n in nodes.items():
            assert n.store.get(key) is not None, \
                f"seed {seed}: committed {key} missing on {nid}"
    # eventual writes reconciled (merge completed, nothing pending)
    for key, origin in eventual.items():
        assert not nodes[origin].local_writes.get(key), \
            f"seed {seed}: merge never completed for {key}"
    # stores converge on the union of keys
    keysets = {nid: {k for k in n.store.keys()
                     if not k.startswith("_")}
               for nid, n in nodes.items()}
    base = keysets[ids[0]]
    for nid, ks in keysets.items():
        assert ks == base, f"seed {seed}: {nid} diverged"


def test_model_check_two_phase_bounded():
    r = check_two_phase(n_parts=2, max_states=12_000)
    assert r.ok, f"{r.violation}\n{r.trace}"
    assert r.states_explored >= 12_000 or not r.frontier_truncated


def test_model_check_two_phase_three_parts():
    r = check_two_phase(n_parts=3, max_states=6_000,
                        allow_crash=True)
    assert r.ok, f"{r.violation}\n{r.trace}"


def test_model_check_membership_bounded():
    r = check_membership(n_nodes=3, max_states=6_000)
    assert r.ok, f"{r.violation}\n{r.trace}"


def test_jepsen_compose_topologies_valid():
    """The docker Jepsen topologies parse and wire peers correctly
    (the driver itself needs a docker daemon; this validates the
    shipped files — reference docker-compose.jepsen*.yml parity)."""
    import yaml

    for path, n in (("deploy/docker-compose.jepsen.yml", 3),
                    ("deploy/docker-compose.jepsen-5node.yml", 5)):
        with open(path) as fh:
            doc = yaml.safe_load(fh)
        svcs = doc["services"]
        assert len(svcs) == n
        for nid, svc in svcs.items():
            env = svc["environment"]
            assert env["NEUMANN_NODE_ID"] == nid
            peers = dict(p.split("=", 1)
                         for p in env["NEUMANN_PEERS"].split(","))
            assert set(peers) == set(svcs) - {nid}
            assert env["NEUMANN_DATA_DIR"] == "/data"
            assert svc["volumes"], "durability needs a volume"


@pytest.mark.parametrize("seed", range(3))
def test_composed_with_auto_membership(seed):
    """The hardest composition: partitions + heals WHILE gossip-driven
    membership is live (the leader may remove partitioned voters and
    re-add them on heal). Invariants: never two leaders in a term,
    committed writes survive, the cluster converges back to full
    membership, and every store agrees."""
    rng = random.Random(1000 + seed)
    hub = TransportHub(seed=seed)
    ids = [f"n{i}" for i in range(5)]
    nodes = {nid: ClusterNode(
        nid, ids, hub, seed=seed * 10 + i,
        auto_remove_faulty=True, faulty_grace_ticks=8,
        gossip_config=GossipConfig(probe_interval=2, ack_timeout=2,
                                   suspect_timeout=4))
        for i, nid in enumerate(ids)}
    acked = {}
    partitioned = False
    wi = 0

    def pump(steps):
        for _ in range(steps):
            for nid in ids:
                nodes[nid].pump()
            terms = {}
            for nid, n in nodes.items():
                if n.is_leader():
                    assert terms.setdefault(n.raft.term, nid) == nid
            # config safety: voters never drop below a functioning
            # majority of the full cluster
            for n in nodes.values():
                assert len(n.raft.voters) >= 3, sorted(n.raft.voters)

    def leader():
        best = None
        for n in nodes.values():
            if n.is_leader() and (best is None
                                  or n.raft.term > best.raft.term):
                best = n
        return best

    pump(150)
    for _ in range(8):
        act = rng.choice(["write", "write", "partition", "heal",
                          "pump"])
        if act == "write":
            ld = leader()
            if ld is not None:
                key = f"k{wi}"
                vec = [0.0] * 8
                vec[wi % 8] = 1.0
                if ld.propose_put(key, _emb(vec)):
                    acked[key] = True
                wi += 1
            pump(60)
        elif act == "partition" and not partitioned:
            maj = set(rng.sample(ids, 3))
            hub.partition(maj, set(ids) - maj)
            partitioned = True
            pump(160)      # long enough for removal to fire
        elif act == "heal" and partitioned:
            hub.heal()
            partitioned = False
            pump(300)
        else:
            pump(40)

    hub.heal()
    pump(900)

    # full membership restored on the final leader
    ld = leader()
    assert ld is not None, f"seed {seed}: no leader at the end"
    assert ld.raft.voters == set(ids), \
        f"seed {seed}: membership never recovered {ld.raft.voters}"
    # committed writes on every CURRENT voter's store
    for key in acked:
        for nid in ids:
            assert nodes[nid].store.get(key) is not None, \
                f"seed {seed}: {key} missing on {nid}"
