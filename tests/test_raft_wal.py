"""Durable Raft persistent state (chain/raft_wal.py).

Mirrors the raft_wal.rs guarantees: term/vote/log survive SIGKILL, a
restarted node never double-votes in a term it already voted in, and
entries it acked to a leader are still in its log after restart
(tensor_chain/src/raft_wal.rs capability; crash_recovery_raft.rs test
strategy)."""

import os

from neumann_tpu.chain.raft import LEADER, RaftConfig, RaftNode
from neumann_tpu.chain.raft_wal import RaftWal, RecoveredRaftState
from neumann_tpu.chain.transport import Message, TransportHub


class E:
    def __init__(self, term, payload):
        self.term, self.payload = term, payload


def test_wal_roundtrip(tmp_path):
    p = tmp_path / "raft.wal"
    w = RaftWal(p)
    w.save_hard_state(3, "n1")
    w.append(1, [E(1, {"a": 1}), E(2, {"b": 2})])
    w.append(3, [E(3, {"c": 3})])
    w.truncate_suffix(3)
    w.append(3, [E(3, {"c2": 4})])
    w.sync()
    st = RaftWal(p).load()
    assert st.term == 3 and st.voted_for == "n1"
    assert [e["payload"] for e in st.log] == [{"a": 1}, {"b": 2},
                                              {"c2": 4}]
    assert st.snapshot_index == 0


def test_wal_append_overwrites_conflicting_suffix(tmp_path):
    w = RaftWal(tmp_path / "w")
    w.append(1, [E(1, {"x": 1}), E(1, {"x": 2}), E(1, {"x": 3})])
    w.append(2, [E(2, {"y": 2})])   # new leader overwrote from index 2
    w.sync()
    st = RaftWal(tmp_path / "w").load()
    assert [e["payload"] for e in st.log] == [{"x": 1}, {"y": 2}]
    assert st.log[1]["term"] == 2


def test_wal_torn_tail_truncated(tmp_path):
    p = tmp_path / "raft.wal"
    w = RaftWal(p)
    w.save_hard_state(1, None)
    w.append(1, [E(1, {"k": "v"})])
    w.sync()
    good = os.path.getsize(p)
    with open(p, "ab") as fh:       # simulate a torn write
        fh.write(b"\xde\xad\xbe\xef\x99")
    w2 = RaftWal(p)
    st = w2.load()
    assert st.term == 1 and len(st.log) == 1
    assert os.path.getsize(p) == good     # tail dropped
    w2.save_hard_state(2, "n0")           # appends still clean
    w2.sync()
    st = RaftWal(p).load()
    assert st.term == 2 and st.voted_for == "n0"


def test_wal_snapshot_rotation(tmp_path):
    p = tmp_path / "raft.wal"
    w = RaftWal(p)
    w.save_hard_state(5, "n2")
    w.append(1, [E(1, {"i": i}) for i in range(10)])
    w.sync()
    w.save_snapshot(8, 1, {"voters": ["n0", "n1"], "learners": [],
                           "joint_old": None},
                    {"state": "snap"}, [E(1, {"i": 8}), E(1, {"i": 9})],
                    5, "n2")
    st = RaftWal(p).load()
    assert st.snapshot_index == 8 and st.snapshot_term == 1
    assert st.snapshot_data == {"state": "snap"}
    assert st.config["voters"] == ["n0", "n1"]
    assert [e["payload"] for e in st.log] == [{"i": 8}, {"i": 9}]
    assert st.term == 5 and st.voted_for == "n2"


def test_empty_or_missing_wal_loads_none(tmp_path):
    assert RaftWal(tmp_path / "nope").load() is None
    w = RaftWal(tmp_path / "empty")
    w.sync()
    assert RaftWal(tmp_path / "empty").load() is None


# ------------------------------------------------------- RaftNode + WAL

def test_no_double_vote_after_crash(tmp_path):
    """A node that granted its vote, was SIGKILLed, and restarted must
    refuse a different candidate in the same term (election safety)."""
    path = tmp_path / "n0.wal"
    node = RaftNode("n0", ["n0", "n1", "n2"], RaftConfig(),
                    wal=RaftWal(path))
    [resp] = node.handle(Message("vote_req", "n1", "n0", {
        "term": 4, "last_index": 0, "last_term": 0}))
    assert resp.payload["granted"]
    # crash: drop the node object WITHOUT close(); reopen from disk
    node2 = RaftNode("n0", ["n0", "n1", "n2"], RaftConfig(),
                     wal=RaftWal(path))
    assert node2.term == 4 and node2.voted_for == "n1"
    [resp2] = node2.handle(Message("vote_req", "n2", "n0", {
        "term": 4, "last_index": 0, "last_term": 0}))
    assert not resp2.payload["granted"]
    # re-voting for the SAME candidate stays allowed
    [resp3] = node2.handle(Message("vote_req", "n1", "n0", {
        "term": 4, "last_index": 0, "last_term": 0}))
    assert resp3.payload["granted"]


def test_acked_entries_survive_crash(tmp_path):
    """Entries a follower acked must be in its log after restart —
    otherwise a leader that counted the ack could lose committed data."""
    path = tmp_path / "f.wal"
    f = RaftNode("f", ["f", "l", "x"], RaftConfig(), wal=RaftWal(path))
    [ack] = f.handle(Message("append_entries", "l", "f", {
        "term": 2, "prev_index": 0, "prev_term": 0,
        "entries": [{"term": 2, "payload": {"op": "put", "k": "a"}},
                    {"term": 2, "payload": {"op": "put", "k": "b"}}],
        "leader_commit": 0}))
    assert ack.payload["success"] and ack.payload["match"] == 2
    f2 = RaftNode("f", ["f", "l", "x"], RaftConfig(), wal=RaftWal(path))
    assert f2.last_index() == 2 and f2.term == 2
    assert f2.log[0].payload == {"op": "put", "k": "a"}
    assert f2.log[1].payload == {"op": "put", "k": "b"}
    # conflict truncation is also durable
    [ack2] = f2.handle(Message("append_entries", "l2", "f", {
        "term": 3, "prev_index": 1, "prev_term": 2,
        "entries": [{"term": 3, "payload": {"op": "put", "k": "c"}}],
        "leader_commit": 1}))
    assert ack2.payload["success"]
    f3 = RaftNode("f", ["f", "l", "x"], RaftConfig(), wal=RaftWal(path))
    assert [e.payload["k"] for e in f3.log] == ["a", "c"]


def test_leader_log_durable_across_restart(tmp_path):
    path = tmp_path / "solo.wal"
    n = RaftNode("solo", ["solo"], RaftConfig(), wal=RaftWal(path))
    for _ in range(30):
        n.tick()
    assert n.state == LEADER
    n.propose({"x": 1})
    n.propose({"x": 2})
    n2 = RaftNode("solo", ["solo"], RaftConfig(), wal=RaftWal(path))
    payloads = [e.payload for e in n2.log]
    assert {"x": 1} in payloads and {"x": 2} in payloads
    assert n2.term == n.term
    # restarted node re-elects itself and re-commits everything
    for _ in range(30):
        n2.tick()
    committed = [p for _, p in n2.take_committed()]
    assert {"x": 1} in committed and {"x": 2} in committed


def test_compaction_rotates_and_restores(tmp_path):
    path = tmp_path / "c.wal"
    n = RaftNode("solo", ["solo"], RaftConfig(), wal=RaftWal(path))
    for _ in range(30):
        n.tick()
    for i in range(20):
        n.propose({"i": i})
    n.take_committed()
    n.compact(snapshot_data={"acc": "state-at-compaction"})
    n.propose({"after": True})
    n2 = RaftNode("solo", ["solo"], RaftConfig(), wal=RaftWal(path))
    assert n2.snapshot_index == n.snapshot_index
    assert n2.snapshot_data == {"acc": "state-at-compaction"}
    assert n2.last_index() == n.last_index()
    assert n2.log[-1].payload == {"after": True}


def _pump(nodes, hub, transports, steps=50):
    for _ in range(steps):
        for node in nodes.values():
            for m in node.tick():
                hub.deliver(m)
        for nid, node in nodes.items():
            for msg in transports[nid].drain():
                for m in node.handle(msg):
                    hub.deliver(m)


def test_follower_crash_restart_rejoins_cluster(tmp_path):
    """In-process crash/restart of a follower mid-workload: after
    restarting from its WAL it has not double-voted, keeps its term, and
    converges on the committed log (multiprocess tier covers SIGKILL)."""
    hub = TransportHub(seed=7)
    ids = ["n0", "n1", "n2"]
    wals = {nid: tmp_path / f"{nid}.wal" for nid in ids}
    nodes = {nid: RaftNode(nid, ids, RaftConfig(), seed=i,
                           wal=RaftWal(wals[nid]))
             for i, nid in enumerate(ids)}
    tr = {nid: hub.register(nid) for nid in ids}
    _pump(nodes, hub, tr, 60)
    leader = next(n for n in nodes.values() if n.state == LEADER)
    follower_id = next(nid for nid in ids if nid != leader.id)
    for i in range(5):
        leader.propose({"i": i})
    _pump(nodes, hub, tr, 20)
    assert nodes[follower_id].last_index() >= 5
    crashed_term = nodes[follower_id].term

    # crash the follower (no close) and keep the cluster running
    del nodes[follower_id]
    for i in range(5, 10):
        leader.propose({"i": i})
    _pump(nodes, hub, tr, 20)
    assert leader.commit_index >= 10

    # restart from WAL: term preserved, log intact, catches up
    restarted = RaftNode(follower_id, ids, RaftConfig(), seed=99,
                         wal=RaftWal(wals[follower_id]))
    assert restarted.term >= crashed_term
    assert restarted.last_index() >= 5
    nodes[follower_id] = restarted
    tr[follower_id] = hub.register(follower_id)
    _pump(nodes, hub, tr, 60)
    committed = [p for _, p in restarted.take_committed()
                 if "noop" not in p]
    assert [{"i": i} for i in range(10)] == \
        [p for p in committed if "i" in p]


# --------------------------------------------- TcpClusterNode durability

def test_tcp_node_restart_from_raft_wal(tmp_path):
    """Statements + compaction snapshot survive a node restart: the
    store is rebuilt from the raft snapshot plus deterministic log
    replay (no separate store WAL, no double-applied statements)."""
    import time

    from neumann_tpu.chain.node import ClusterClient, TcpClusterNode

    wal_dir = str(tmp_path / "solo")
    node = TcpClusterNode("solo", {}, wal_dir=wal_dir)
    node.compact_threshold = 8          # force a mid-workload compaction
    node.start(tick_interval_s=0.01)
    try:
        deadline = time.time() + 10
        while time.time() < deadline and not node.is_leader():
            time.sleep(0.05)
        assert node.is_leader()
        c = ClusterClient(node.address)
        try:
            c.execute("CREATE TABLE t (id INT)")
            for i in range(20):
                c.execute(f"INSERT INTO t VALUES ({i})")
        finally:
            c.close()
        deadline = time.time() + 10     # wait for the compaction pass
        while time.time() < deadline and node.raft.snapshot_index == 0:
            time.sleep(0.05)
        assert node.raft.snapshot_index > 0
    finally:
        node.stop()

    node2 = TcpClusterNode("solo", {}, wal_dir=wal_dir)
    node2.start(tick_interval_s=0.01)
    try:
        deadline = time.time() + 15
        rows = None
        while time.time() < deadline:
            if node2.is_leader():
                try:
                    c = ClusterClient(node2.address)
                    try:
                        rows = sorted(
                            r["id"] for r in
                            c.execute("SELECT * FROM t")["rows"])
                    finally:
                        c.close()
                    if rows == list(range(20)):
                        break
                except Exception:
                    pass
            time.sleep(0.1)
        assert rows == list(range(20)), f"restart lost rows: {rows}"
    finally:
        node2.stop()
