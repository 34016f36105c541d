"""Distributed graph engine: partitioning, leader gating, real replication.

Mirrors the reference's graph_engine/src/{partitioning,distributed}.rs
test families, plus a stronger tier the reference lacks: graph writes
actually replicated through Raft onto follower graph mirrors.
"""
import pytest

from neumann_tpu.engines.graph import GraphEngine
from neumann_tpu.engines.graph_distributed import (
    ChainConsensus,
    ChainMembership,
    CrossShardQuery,
    DistributedConfig,
    DistributedGraphEngine,
    GraphPartitioner,
    NotLeader,
    PartitionAssignment,
    PartitionConfig,
    PartitionStatus,
    PartitionStrategy,
    QuorumLost,
    RaftState,
)


# -- partitioner ---------------------------------------------------------------

def test_hash_partition_stable_and_spread():
    p = GraphPartitioner(PartitionConfig(num_shards=4))
    shards = [p.shard_for_node(i) for i in range(1000)]
    assert shards == [p.shard_for_node(i) for i in range(1000)]  # stable
    counts = [shards.count(s) for s in range(4)]
    assert all(c > 150 for c in counts)  # spread, not degenerate


def test_modular_partition():
    p = GraphPartitioner(PartitionConfig(num_shards=3,
                                         strategy=PartitionStrategy.MODULAR))
    assert [p.shard_for_node(i) for i in range(6)] == [0, 1, 2, 0, 1, 2]


def test_range_partition_with_fallback():
    cfg = PartitionConfig(num_shards=3).with_ranges([(0, 100), (100, 200),
                                                     (200, 300)])
    p = GraphPartitioner(cfg)
    assert p.shard_for_node(50) == 0
    assert p.shard_for_node(150) == 1
    assert p.shard_for_node(250) == 2
    assert 0 <= p.shard_for_node(9999) < 3  # out of range -> hash fallback


def test_assignment_pin_overrides():
    p = GraphPartitioner(PartitionConfig(num_shards=4))
    natural = p.shard_for_node(42)
    p.assign_node(42, (natural + 1) % 4)
    assert p.shard_for_node(42) == (natural + 1) % 4


def test_cross_shard_edge_detection():
    p = GraphPartitioner(PartitionConfig(num_shards=2,
                                         strategy=PartitionStrategy.MODULAR))
    assert p.is_cross_shard_edge(0, 1)
    assert not p.is_cross_shard_edge(0, 2)
    assert p.shards_for_edge(0, 1) == (0, 1)


def test_partition_assignment_from_nodes():
    p = GraphPartitioner(PartitionConfig(num_shards=2,
                                         strategy=PartitionStrategy.MODULAR))
    a = PartitionAssignment.from_nodes(p, [0, 1, 2, 3, 4])
    assert a.by_shard == {0: [0, 2, 4], 1: [1, 3]}


# -- standalone engine ---------------------------------------------------------

def make_standalone(num_shards=2):
    cfg = DistributedConfig(
        node_id="n1",
        partition_config=PartitionConfig(
            num_shards=num_shards, strategy=PartitionStrategy.MODULAR))
    return DistributedGraphEngine(cfg)


def test_standalone_write_read_cycle():
    d = make_standalone()
    a = d.create_node("person", {"name": "ada"})
    b = d.create_node("person", {"name": "bob"})
    e = d.create_edge(a, b, "knows")
    assert d.get_node(a)["properties"]["name"] == "ada"
    assert d.get_edge(e)["type"] == "knows"
    assert d.neighbors(a) == [b]
    d.update_node(a, {"age": 36})
    assert d.get_node(a)["properties"]["age"] == 36
    assert d.delete_edge(e)
    assert d.delete_node(b)
    assert d.stats.writes == 6


def test_standalone_is_always_leader_with_quorum():
    d = make_standalone()
    assert d.is_leader()
    assert d.raft_state() is RaftState.LEADER
    assert d.has_quorum()
    view = d.cluster_view()
    assert view.partition_status is PartitionStatus.QUORUM_REACHABLE
    assert view.healthy_nodes == ["n1"]


def test_partition_stats_counts_cross_shard():
    d = make_standalone(num_shards=2)
    ids = [d.create_node("n") for _ in range(4)]  # ids 1..4 alternate shards
    d.create_edge(ids[0], ids[2], "same")   # 1->3 same shard (odd)
    d.create_edge(ids[0], ids[1], "cross")  # 1->2 cross
    st = d.partition_stats()
    assert st.total_nodes == 4
    assert st.total_edges == 2
    assert st.cross_shard_edges == 1
    assert st.imbalance_ratio() == 1.0


def test_pagerank_and_components_run():
    d = make_standalone()
    a = d.create_node("x")
    b = d.create_node("x")
    d.create_edge(a, b, "r")
    pr = d.pagerank()
    assert set(pr) == {a, b}
    cc = d.connected_components()
    assert cc[a] == cc[b]


# -- transactions --------------------------------------------------------------

def test_transaction_commit_applies_buffered_ops():
    d = make_standalone()
    tx = d.begin_transaction()
    tx.create_node("person", {"name": "ada"})
    tx.create_node("person", {"name": "bob"})
    assert d.local.find_nodes(label="person") == []  # buffered, not applied
    tx.commit()
    assert len(d.local.find_nodes(label="person")) == 2


def test_transaction_abort_discards():
    d = make_standalone()
    tx = d.begin_transaction()
    tx.create_node("person")
    tx.abort()
    assert d.local.find_nodes(label="person") == []
    assert d.stats.aborts == 1
    with pytest.raises(Exception):
        tx.commit()  # finished tx cannot commit


def test_transaction_context_manager_aborts_on_error():
    d = make_standalone()
    with pytest.raises(RuntimeError):
        with d.begin_transaction() as tx:
            tx.create_node("person")
            raise RuntimeError("boom")
    assert d.local.find_nodes(label="person") == []
    with d.begin_transaction() as tx:
        tx.create_node("person")
    assert len(d.local.find_nodes(label="person")) == 1


# -- cross-shard query ---------------------------------------------------------

def test_cross_shard_query_merges_shard_engines():
    d = make_standalone(num_shards=2)
    d.create_node("person", {"name": "local"})
    other = GraphEngine()
    other.create_node("person", {"name": "remote"})
    q = CrossShardQuery.all_shards(d)
    assert q.shards() == [0, 1]
    q.add_shard_engine(1, other)
    names = {n["properties"]["name"] for n in q.find_nodes_by_label("person")}
    assert names == {"local", "remote"}
    assert d.stats.cross_shard_reads == 1


# -- clustered mode: the writes really ride Raft -------------------------------

def make_cluster(n=3):
    from neumann_tpu.chain.cluster import ClusterNode
    from neumann_tpu.chain.transport import TransportHub

    hub = TransportHub(seed=7)
    ids = [f"n{i}" for i in range(n)]
    nodes = [ClusterNode(i, [p for p in ids if p != i], hub, gossip=False)
             for i in ids]
    for _ in range(50):
        for nd in nodes:
            nd.pump()
        if any(nd.is_leader() for nd in nodes):
            break
    leader = next(nd for nd in nodes if nd.is_leader())
    pump(nodes, 10)  # heartbeats teach followers the leader id
    return nodes, leader


def pump(nodes, rounds=30):
    for _ in range(rounds):
        for nd in nodes:
            nd.pump()


def test_clustered_writes_replicate_to_follower_graphs():
    nodes, leader = make_cluster()
    engines = {nd.id: DistributedGraphEngine(
        DistributedConfig(node_id=nd.id), cluster=nd) for nd in nodes}
    d = engines[leader.id]
    a = d.create_node("person", {"name": "ada"})
    b = d.create_node("person", {"name": "bob"})
    e = d.create_edge(a, b, "knows")
    pump(nodes)
    for nd in nodes:
        g = engines[nd.id].local
        assert g.get_node(a)["properties"]["name"] == "ada", nd.id
        assert g.get_edge(e)["type"] == "knows", nd.id
        assert g.neighbors(a) == [b], nd.id
    # delete replicates too
    d.delete_edge(e)
    pump(nodes)
    for nd in nodes:
        assert engines[nd.id].local.get_edge(e) is None, nd.id


def test_clustered_follower_write_rejected():
    nodes, leader = make_cluster()
    follower = next(nd for nd in nodes if not nd.is_leader())
    d = DistributedGraphEngine(DistributedConfig(node_id=follower.id),
                               cluster=follower)
    assert not d.is_leader()
    with pytest.raises(NotLeader) as ei:
        d.create_node("person")
    assert ei.value.leader == leader.id


def test_clustered_consensus_adapter_surface():
    nodes, leader = make_cluster()
    c = ChainConsensus(leader)
    assert c.raft_state() is RaftState.LEADER
    assert c.node_id() == leader.id
    assert c.current_term() >= 1
    m = ChainMembership(leader)
    v = m.view()
    assert sorted(v.nodes) == sorted(nd.id for nd in nodes)
    assert m.partition_status() is PartitionStatus.QUORUM_REACHABLE
    assert m.healthy_count() == len(nodes)


def test_quorum_lost_blocks_writes():
    nodes, leader = make_cluster()

    class DeadMembership:
        def view(self):
            from neumann_tpu.engines.graph_distributed import ClusterView
            return ClusterView(partition_status=PartitionStatus.QUORUM_LOST)

        def partition_status(self):
            return PartitionStatus.QUORUM_LOST

    d = DistributedGraphEngine(DistributedConfig(node_id=leader.id),
                               cluster=leader, membership=DeadMembership())
    with pytest.raises(QuorumLost):
        d.create_node("person")


# -- mutation-gap tests (survivors from tools/mutation_test.py) ------------------

def test_imbalance_ratio_empty_shard_is_inf():
    from neumann_tpu.engines.graph_distributed import PartitionStats

    st = PartitionStats(nodes_per_shard={0: 5, 1: 0})
    assert st.imbalance_ratio() == float("inf")
    st2 = PartitionStats(nodes_per_shard={0: 6, 1: 2})
    assert st2.imbalance_ratio() == 3.0
    assert PartitionStats().imbalance_ratio() == 1.0


def test_membership_status_empty_cluster_unknown():
    from neumann_tpu.engines.graph_distributed import ChainMembership

    assert ChainMembership._status(0, 0) is PartitionStatus.UNKNOWN
    assert ChainMembership._status(2, 3) is PartitionStatus.QUORUM_REACHABLE
    assert ChainMembership._status(2, 4) is PartitionStatus.STALEMATE
    assert ChainMembership._status(1, 4) is PartitionStatus.QUORUM_LOST


def test_partition_stats_exact_counts():
    d = make_standalone(num_shards=2)
    ids = [d.create_node("n") for _ in range(5)]  # ids 0..4 -> shards 0,1,0,1,0
    d.create_edge(ids[0], ids[2], "same")    # 0->2: shard 0->0
    d.create_edge(ids[0], ids[1], "cross")   # 0->1: shard 0->1
    d.create_edge(ids[2], ids[3], "cross")   # 2->3: shard 0->1
    st = d.partition_stats()
    assert st.nodes_per_shard == {0: 3, 1: 2}
    assert st.edges_per_shard == {0: 3}
    assert st.cross_shard_edges == 2
    assert st.total_edges == 3


def test_single_node_providers_surface():
    from neumann_tpu.engines.graph_distributed import (SingleNodeConsensus,
                                                       SingleNodeMembership)

    c = SingleNodeConsensus("nX")
    assert c.node_id() == "nX" and c.current_leader() == "nX"
    assert c.current_term() == 0 and c.commit_index() == 0
    m = SingleNodeMembership("nX")
    assert m.is_healthy("nX")
    assert not m.is_healthy("other")
    assert m.healthy_count() == 1


def test_stats_exact_counters():
    d = make_standalone()
    a = d.create_node("x")
    b = d.create_node("x")
    e = d.create_edge(a, b, "r")
    d.get_node(a); d.get_edge(e); d.neighbors(a); d.find_path(a, b)
    d.pagerank(); d.connected_components()
    assert d.stats.reads == 6
    assert d.stats.writes == 3
    assert d.stats.commits == 3
    d.update_node(a, {"k": 1}); d.delete_edge(e); d.delete_node(b)
    assert d.stats.writes == 6
    assert d.stats.commits == 6
