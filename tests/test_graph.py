"""Graph engine tests: CRUD, traversal, paths, device analytics,
algorithms, indexes — mirroring graph_engine's test coverage."""

import numpy as np
import pytest

from neumann_tpu.engines.condition import Condition as C
from neumann_tpu.engines.graph import GraphEngine, TraversalFilter
from neumann_tpu.store import TensorStore
from neumann_tpu.utils.errors import GraphError


@pytest.fixture
def g():
    return GraphEngine()


def chain(g, n, etype="knows", directed=True):
    ids = [g.create_node("person", {"name": f"p{i}"}) for i in range(n)]
    for i in range(n - 1):
        g.create_edge(ids[i], ids[i + 1], etype, directed=directed)
    return ids


def test_node_crud(g):
    a = g.create_node("person", {"name": "alice", "age": 30})
    assert g.node_exists(a)
    node = g.get_node(a)
    assert node["label"] == "person" and node["properties"]["name"] == "alice"
    g.update_node(a, {"age": 31})
    assert g.get_node(a)["properties"]["age"] == 31
    assert g.node_count() == 1
    assert g.delete_node(a)
    assert not g.delete_node(a)
    assert g.get_node(a) is None


def test_reserved_property(g):
    with pytest.raises(GraphError):
        g.create_node("x", {"_label": "nope"})


def test_edge_crud(g):
    a = g.create_node("a")
    b = g.create_node("b")
    e = g.create_edge(a, b, "rel", {"weight": 2.5})
    edge = g.get_edge(e)
    assert edge["src"] == a and edge["dst"] == b and edge["type"] == "rel"
    assert g.edge_count() == 1
    assert g.edges_between(a, b) == [e]
    assert g.edges_between(a, b, "other") == []
    assert g.delete_edge(e)
    assert g.edge_count() == 0
    with pytest.raises(GraphError):
        g.create_edge(a, 999, "rel")


def test_delete_node_cascades_edges(g):
    a, b, c = chain(g, 3)
    assert g.edge_count() == 2
    g.delete_node(b)
    assert g.edge_count() == 0
    assert g.node_count() == 2


def test_neighbors_direction_and_type(g):
    a = g.create_node("n")
    b = g.create_node("n")
    c = g.create_node("n")
    g.create_edge(a, b, "x")
    g.create_edge(c, a, "y")
    g.create_edge(a, c, "z", directed=False)
    assert g.neighbors(a, "out") == sorted([b, c])
    assert g.neighbors(a, "out", edge_type="x") == [b]
    assert g.neighbors(a, "in") == [c]
    assert set(g.neighbors(a, "both")) == {b, c}
    assert g.get_entity_neighbors(a) == {b, c}


def test_traverse_bfs_dfs(g):
    ids = chain(g, 5)
    bfs = g.traverse(ids[0])
    assert [n for n, _ in bfs] == ids
    assert [d for _, d in bfs] == [0, 1, 2, 3, 4]
    limited = g.traverse(ids[0], TraversalFilter(max_depth=2))
    assert [n for n, _ in limited] == ids[:3]
    dfs = g.traverse(ids[0], order="dfs")
    assert len(dfs) == 5


def test_traverse_filters(g):
    a = g.create_node("person", {"age": 30})
    b = g.create_node("person", {"age": 10})
    c = g.create_node("robot", {"age": 99})
    g.create_edge(a, b, "knows")
    g.create_edge(a, c, "knows")
    only_person = g.traverse(a, TraversalFilter(node_label="person"))
    assert {n for n, _ in only_person} == {a, b}
    adults = g.traverse(a, TraversalFilter(
        node_condition=C.cmp("age", ">=", 18)))
    assert {n for n, _ in adults} == {a, c}


def test_find_path(g):
    ids = chain(g, 6)
    path = g.find_path(ids[0], ids[5])
    assert path == ids
    assert g.find_path(ids[0], ids[5], max_depth=3) is None
    assert g.find_path(ids[0], ids[0]) == [ids[0]]
    lone = g.create_node("x")
    assert g.find_path(ids[0], lone) is None
    with pytest.raises(GraphError):
        g.find_path(ids[0], 1234)


def test_weighted_path(g):
    a, b, c = [g.create_node("n") for _ in range(3)]
    g.create_edge(a, b, "e", {"weight": 10.0})
    g.create_edge(a, c, "e", {"weight": 1.0})
    g.create_edge(c, b, "e", {"weight": 1.0})
    path, cost = g.find_weighted_path(a, b)
    assert path == [a, c, b] and cost == pytest.approx(2.0)
    with pytest.raises(GraphError):
        g.create_edge(b, a, "e", {"weight": -1.0})
        g.find_weighted_path(b, a)


def test_all_and_variable_paths(g):
    a, b, c, d = [g.create_node("n") for _ in range(4)]
    g.create_edge(a, b, "e")
    g.create_edge(b, d, "e")
    g.create_edge(a, c, "e")
    g.create_edge(c, d, "e")
    g.create_edge(a, d, "e")
    paths = g.find_all_paths(a, d)
    assert sorted(map(tuple, paths)) == sorted(
        [(a, d), (a, b, d), (a, c, d)])
    var = g.find_variable_paths(a, d, 2, 2)
    assert sorted(map(tuple, var)) == sorted([(a, b, d), (a, c, d)])


def test_pagerank_device(g):
    # star: everyone points to hub
    hub = g.create_node("hub")
    spokes = [g.create_node("s") for _ in range(5)]
    for s in spokes:
        g.create_edge(s, hub, "to")
    pr = g.pagerank()
    assert pr[hub] > max(pr[s] for s in spokes)
    assert sum(pr.values()) == pytest.approx(1.0, abs=0.05)


def test_connected_components_device(g):
    a1, a2 = chain(g, 2)
    b1, b2 = chain(g, 2)
    cc = g.connected_components()
    assert cc[a1] == cc[a2]
    assert cc[b1] == cc[b2]
    assert cc[a1] != cc[b1]


def test_bfs_levels_device(g):
    ids = chain(g, 4)
    lv = g.bfs_levels(ids[0])
    assert [lv[i] for i in ids] == [0, 1, 2, 3]
    lv2 = g.bfs_levels(ids[3])  # directed: nothing reachable
    assert lv2 == {ids[3]: 0}
    lv3 = g.bfs_levels(ids[3], direction="both")
    assert [lv3[i] for i in ids] == [3, 2, 1, 0]


def test_astar(g):
    nodes = []
    for i, (x, y) in enumerate([(0, 0), (1, 0), (2, 0), (1, 5)]):
        nodes.append(g.create_node("p", {"x": x, "y": y}))
    a, b, c, d = nodes
    g.create_edge(a, b, "e", {"weight": 1.0})
    g.create_edge(b, c, "e", {"weight": 1.0})
    g.create_edge(a, d, "e", {"weight": 1.0})
    g.create_edge(d, c, "e", {"weight": 1.0})
    path, cost = g.astar(a, c)
    assert path == [a, b, c] and cost == pytest.approx(2.0)


def test_triangle_count(g):
    a, b, c, d = [g.create_node("n") for _ in range(4)]
    g.create_edge(a, b, "e", directed=False)
    g.create_edge(b, c, "e", directed=False)
    g.create_edge(c, a, "e", directed=False)
    g.create_edge(c, d, "e", directed=False)
    assert g.triangle_count() == 1


def test_k_core(g):
    # 4-clique plus a pendant
    ids = [g.create_node("n") for _ in range(4)]
    for i in range(4):
        for j in range(i + 1, 4):
            g.create_edge(ids[i], ids[j], "e", directed=False)
    pend = g.create_node("n")
    g.create_edge(ids[0], pend, "e", directed=False)
    core3 = g.k_core(3)
    assert core3 == set(ids)


def test_mst(g):
    a, b, c = [g.create_node("n") for _ in range(3)]
    e1 = g.create_edge(a, b, "e", {"weight": 1.0}, directed=False)
    e2 = g.create_edge(b, c, "e", {"weight": 2.0}, directed=False)
    e3 = g.create_edge(a, c, "e", {"weight": 10.0}, directed=False)
    assert sorted(g.minimum_spanning_tree()) == sorted([e1, e2])


def test_scc(g):
    a, b, c, d = [g.create_node("n") for _ in range(4)]
    g.create_edge(a, b, "e")
    g.create_edge(b, a, "e")
    g.create_edge(b, c, "e")
    g.create_edge(c, d, "e")
    g.create_edge(d, c, "e")
    comp = g.strongly_connected_components()
    assert comp[a] == comp[b]
    assert comp[c] == comp[d]
    assert comp[a] != comp[c]


def test_biconnected(g):
    # two triangles sharing an articulation node
    a, b, c, d, e = [g.create_node("n") for _ in range(5)]
    for u, v in [(a, b), (b, c), (c, a), (c, d), (d, e), (e, c)]:
        g.create_edge(u, v, "e", directed=False)
    comps = g.biconnected_components()
    assert len(comps) == 2
    assert {frozenset(x) for x in comps} == {
        frozenset({a, b, c}), frozenset({c, d, e})}


def test_node_similarity(g):
    a, b, x, y = [g.create_node("n") for _ in range(4)]
    g.create_edge(a, x, "e", directed=False)
    g.create_edge(a, y, "e", directed=False)
    g.create_edge(b, x, "e", directed=False)
    g.create_edge(b, y, "e", directed=False)
    assert g.node_similarity(a, b) == pytest.approx(1.0)
    assert g.node_similarity(a, x) == pytest.approx(0.0)  # {x,y} vs {a,b}


def test_find_nodes_and_indexes(g):
    for i in range(10):
        g.create_node("person", {"group": i % 3, "name": f"p{i}"})
    found = g.find_nodes("person", C.eq("group", 1))
    assert len(found) == 3
    page = g.find_nodes("person", limit=4, offset=8)
    assert len(page) == 2
    g.create_property_index("group")
    assert g.find_nodes_by_property("group", 2) == \
        [n["id"] for n in g.find_nodes("person", C.eq("group", 2))]
    # index maintained on later insert
    nid = g.create_node("person", {"group": 2})
    assert nid in g.find_nodes_by_property("group", 2)
    g.delete_node(nid)
    assert nid not in g.find_nodes_by_property("group", 2)


def test_fulltext(g):
    a = g.create_node("doc", {"text": "the quick brown fox"})
    b = g.create_node("doc", {"text": "lazy brown dog"})
    g.create_fulltext_index("text")
    assert g.search_fulltext("text", "brown") == sorted([a, b])
    assert g.search_fulltext("text", "quick fox") == [a]
    assert g.search_fulltext("text", "cat") == []
    with pytest.raises(GraphError):
        g.search_fulltext("nope", "x")


def test_unique_constraint(g):
    g.create_unique_constraint("user", "email")
    g.create_node("user", {"email": "a@x.com"})
    with pytest.raises(GraphError):
        g.create_node("user", {"email": "a@x.com"})
    g.create_node("admin", {"email": "a@x.com"})  # other label fine
    with pytest.raises(GraphError):
        g.create_unique_constraint("admin", "email") or \
            g.create_node("admin", {"email": "a@x.com"})


def test_geo_search(g):
    sf = g.create_node("city", {"name": "SF", "lat": 37.77, "lon": -122.42})
    oak = g.create_node("city", {"name": "Oakland", "lat": 37.80,
                                 "lon": -122.27})
    nyc = g.create_node("city", {"name": "NYC", "lat": 40.71, "lon": -74.00})
    hits = g.geo_search(37.77, -122.42, 50.0)
    assert [h[0] for h in hits] == [sf, oak]
    assert hits[0][1] < 1.0


def test_wal_rebuild(tmp_path):
    store = TensorStore()
    g = GraphEngine(store)
    store.open_durable(tmp_path / "wal.log", sync_mode="immediate")
    a = g.create_node("n", {"name": "a"})
    b = g.create_node("n", {"name": "b"})
    g.create_edge(a, b, "rel")
    store2 = TensorStore()
    g2 = GraphEngine(store2)
    store2.recover(tmp_path / "wal.log")
    assert g2.node_count() == 2 and g2.edge_count() == 1
    assert g2.neighbors(a) == [b]
    # new ids continue after recovered max
    c = g2.create_node("n")
    assert c > b


def test_batch_ops(g):
    ids = g.batch_create_nodes([("a", None), ("b", {"x": 1})])
    assert len(ids) == 2
    eids = g.batch_create_edges([(ids[0], ids[1], "e")])
    assert g.edge_count() == 1


def test_betweenness_centrality(g):
    # path a-b-c: b is the bridge
    a, b, c = chain(g, 3, directed=False)
    bc = g.betweenness_centrality()
    assert bc[b] > bc[a] and bc[b] > bc[c]
    # sampled variant returns same argmax on this tiny graph
    bc2 = g.betweenness_centrality(sampling_ratio=1.0)
    assert max(bc2, key=bc2.get) == b


def test_closeness_centrality(g):
    a, b, c = chain(g, 3, directed=False)
    cc = g.closeness_centrality()
    assert cc[b] > cc[a]
    lone = g.create_node("x")
    assert g.closeness_centrality()[lone] == 0.0


def test_eigenvector_centrality(g):
    hub = g.create_node("h")
    spokes = [g.create_node("s") for _ in range(4)]
    for s in spokes:
        g.create_edge(hub, s, "e", directed=False)
    ev = g.eigenvector_centrality()
    assert ev[hub] > ev[spokes[0]]


def test_label_propagation_communities(g):
    # two cliques joined by one edge
    c1 = [g.create_node("a") for _ in range(4)]
    c2 = [g.create_node("b") for _ in range(4)]
    for grp in (c1, c2):
        for i in range(4):
            for j in range(i + 1, 4):
                g.create_edge(grp[i], grp[j], "e", directed=False)
    g.create_edge(c1[0], c2[0], "bridge", directed=False)
    labels = g.label_propagation(seed=3)
    assert len({labels[n] for n in c1}) == 1
    assert len({labels[n] for n in c2}) == 1
    assert labels[c1[1]] != labels[c2[1]]


def test_louvain_communities(g):
    c1 = [g.create_node("a") for _ in range(5)]
    c2 = [g.create_node("b") for _ in range(5)]
    for grp in (c1, c2):
        for i in range(5):
            for j in range(i + 1, 5):
                g.create_edge(grp[i], grp[j], "e", directed=False)
    g.create_edge(c1[0], c2[0], "bridge", directed=False)
    comm = g.louvain(seed=1)
    assert len({comm[n] for n in c1}) == 1
    assert len({comm[n] for n in c2}) == 1
    assert comm[c1[0]] != comm[c2[0]]
