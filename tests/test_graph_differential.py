"""Graph-algorithm differential suite vs networkx (the graph analog of
the SQL-vs-sqlite tier): random directed/undirected graphs, every
algorithm checked against the library oracle — shortest paths,
weighted paths, components, SCC, pagerank ranking, triangles, k-core,
MST weight, betweenness ordering."""

import random

import networkx as nx
import pytest

from neumann_tpu.engines.graph import GraphEngine


def _random_graph(seed, n=30, p=0.12, directed=True, weights=False):
    rng = random.Random(seed)
    eng = GraphEngine()
    ids = [eng.create_node("n", {"i": i}) for i in range(n)]
    g = nx.DiGraph() if directed else nx.Graph()
    g.add_nodes_from(ids)
    # directed: every ordered pair is a candidate; undirected: each
    # UNORDERED pair once (visiting both orders would mint parallel
    # engine edges with independent weights, which nx.Graph collapses)
    pairs = [(a, b) for a in ids for b in ids if a != b] if directed \
        else [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    for a, b in pairs:
        if rng.random() < p:
            props = None
            kw = {}
            if weights:
                w = round(rng.uniform(0.5, 5.0), 2)
                props, kw = {"weight": w}, {"weight": w}
            eng.create_edge(a, b, "e", properties=props,
                            directed=directed)
            g.add_edge(a, b, **kw)
    return eng, g, ids


@pytest.mark.parametrize("seed", range(4))
def test_shortest_paths_match_networkx(seed):
    eng, g, ids = _random_graph(seed)
    rng = random.Random(seed + 100)
    for _ in range(20):
        a, b = rng.choice(ids), rng.choice(ids)
        ours = eng.find_path(a, b)
        try:
            ref_len = nx.shortest_path_length(g, a, b)
        except nx.NetworkXNoPath:
            ref_len = None
        if ref_len is None:
            assert ours is None, (seed, a, b)
        else:
            assert ours is not None, (seed, a, b)
            assert len(ours) - 1 == ref_len, (seed, a, b, ours)
            # the returned path must actually exist edge by edge
            for u, v in zip(ours, ours[1:]):
                assert g.has_edge(u, v)


@pytest.mark.parametrize("seed", range(3))
def test_weighted_paths_match_networkx(seed):
    eng, g, ids = _random_graph(seed, weights=True)
    rng = random.Random(seed + 7)
    for _ in range(15):
        a, b = rng.choice(ids), rng.choice(ids)
        ours = eng.find_weighted_path(a, b)
        try:
            ref_cost = nx.dijkstra_path_length(g, a, b)
        except nx.NetworkXNoPath:
            ref_cost = None
        if ref_cost is None:
            assert ours is None
        else:
            path, cost = ours
            assert abs(cost - ref_cost) < 1e-9, (seed, a, b)


@pytest.mark.parametrize("seed", range(3))
def test_components_and_scc_match_networkx(seed):
    eng, g, ids = _random_graph(seed, n=25, p=0.08)
    # weak components: same partition
    ours = eng.connected_components()
    ref = list(nx.weakly_connected_components(g))
    by_rep = {}
    for nid, rep in ours.items():
        by_rep.setdefault(rep, set()).add(nid)
    assert sorted(map(sorted, by_rep.values())) == \
        sorted(map(sorted, ref))
    # strongly connected components
    ours_scc = eng.strongly_connected_components()
    ref_scc = list(nx.strongly_connected_components(g))
    by_rep = {}
    for nid, rep in ours_scc.items():
        by_rep.setdefault(rep, set()).add(nid)
    assert sorted(map(sorted, by_rep.values())) == \
        sorted(map(sorted, ref_scc))


@pytest.mark.parametrize("seed", range(3))
def test_pagerank_ranking_matches_networkx(seed):
    eng, g, ids = _random_graph(seed, n=25, p=0.15)
    ours = eng.pagerank(damping=0.85, iters=60)
    ref = nx.pagerank(g, alpha=0.85)
    # rankings agree on the clear top-5 (scores themselves differ by
    # normalization details across implementations)
    top_ours = sorted(ours, key=ours.get, reverse=True)[:5]
    top_ref = sorted(ref, key=ref.get, reverse=True)[:5]
    assert set(top_ours[:3]) <= set(top_ref[:5]), (seed, top_ours,
                                                   top_ref)


@pytest.mark.parametrize("seed", range(3))
def test_triangles_kcore_mst_match_networkx(seed):
    eng, g, ids = _random_graph(seed, n=22, p=0.18, directed=False,
                                weights=True)
    ug = nx.Graph(g)
    assert eng.triangle_count() == \
        sum(nx.triangles(ug).values()) // 3, seed
    for k in (2, 3):
        assert eng.k_core(k) == set(nx.k_core(ug, k).nodes), (seed, k)
    mst_eids = eng.minimum_spanning_tree()
    with eng._lock:
        ours_w = sum(
            float(eng._edges[e]["props"]["weight"].value
                  if hasattr(eng._edges[e]["props"]["weight"], "value")
                  else eng._edges[e]["props"]["weight"])
            for e in mst_eids)
    ref_w = sum(d["weight"] for _, _, d in
                nx.minimum_spanning_tree(ug).edges(data=True))
    assert abs(ours_w - ref_w) < 1e-6, (seed, ours_w, ref_w)


@pytest.mark.parametrize("seed", range(3))
def test_betweenness_matches_networkx_exactly(seed):
    """direction='out' on a DiGraph reproduces nx's unnormalized
    Brandes scores to machine precision (the default direction='both'
    is the undirected view — a different, also valid, statistic)."""
    eng, g, ids = _random_graph(seed, n=18, p=0.15)
    ours = eng.betweenness_centrality(direction="out")
    ref = nx.betweenness_centrality(g, normalized=False)
    for nid in ids:
        assert abs(ours[nid] - ref[nid]) < 1e-9, (seed, nid)


@pytest.mark.parametrize("seed", range(3))
def test_closeness_matches_networkx_exactly(seed):
    """direction='out' closeness == nx on the REVERSED digraph (nx
    measures incoming distance; ours measures outgoing), including the
    Wasserman-Faust disconnected-graph scaling — to machine
    precision."""
    eng, g, ids = _random_graph(seed, n=18, p=0.15)
    ours = eng.closeness_centrality(direction="out")
    ref = nx.closeness_centrality(g.reverse())
    for nid in ids:
        assert abs(ours[nid] - ref[nid]) < 1e-9, (seed, nid)


@pytest.mark.parametrize("seed", range(3))
def test_eigenvector_ranking_tracks_networkx(seed):
    """Power iteration on (A+I) over the undirected edge view: the top
    nodes agree with nx's eigenvector centrality (scores differ by
    normalization; the ranking is the meaningful output)."""
    eng, g, ids = _random_graph(seed, n=18, p=0.15)
    ug = nx.Graph(g.to_undirected())
    ref = nx.eigenvector_centrality(ug, max_iter=500)
    ours = eng.eigenvector_centrality(max_iterations=300)
    top_ours = sorted(ours, key=ours.get, reverse=True)[:5]
    top_ref = sorted(ref, key=ref.get, reverse=True)[:5]
    assert top_ours[0] in top_ref[:3], (seed, top_ours, top_ref)
    assert len(set(top_ours) & set(top_ref)) >= 3, (seed, top_ours,
                                                    top_ref)


@pytest.mark.parametrize("algo", ["louvain", "label_propagation"])
def test_community_detection_recovers_planted_partition(algo):
    """Three dense blocks with sparse cross-links: both community
    algorithms recover the planted partition (measured by nx
    modularity close to the ground truth's)."""
    rng = random.Random(3)
    eng = GraphEngine()
    blocks = []
    g = nx.Graph()
    for b in range(3):
        ids = [eng.create_node("n", {"b": b}) for _ in range(10)]
        blocks.append(ids)
        g.add_nodes_from(ids)
        for i, a in enumerate(ids):          # dense inside the block
            for c in ids[i + 1:]:
                if rng.random() < 0.7:
                    eng.create_edge(a, c, "e", directed=False)
                    g.add_edge(a, c)
    for _ in range(6):                        # sparse across blocks
        b1, b2 = rng.sample(range(3), 2)
        a, c = rng.choice(blocks[b1]), rng.choice(blocks[b2])
        if not g.has_edge(a, c):
            eng.create_edge(a, c, "e", directed=False)
            g.add_edge(a, c)

    labels = getattr(eng, algo)(seed=1)
    communities: dict = {}
    for nid, lab in labels.items():
        communities.setdefault(lab, set()).add(nid)
    got_mod = nx.community.modularity(g, communities.values())
    truth_mod = nx.community.modularity(g, map(set, blocks))
    assert got_mod > 0.8 * truth_mod, (algo, got_mod, truth_mod)
    # planted blocks should be (mostly) pure: every detected community
    # is dominated by one block
    for members in communities.values():
        if len(members) < 3:
            continue
        counts = [len(members & set(b)) for b in blocks]
        assert max(counts) >= 0.8 * len(members), (algo, members)


@pytest.mark.parametrize("seed", range(3))
def test_astar_matches_dijkstra_cost(seed):
    """A* with a euclidean heuristic over planar coordinates finds
    paths with exactly Dijkstra's optimal cost (admissible heuristic:
    straight-line distance <= true cost when weights are distances)."""
    rng = random.Random(seed)
    eng = GraphEngine()
    g = nx.Graph()
    pts = {}
    ids = []
    for i in range(25):
        x, y = rng.uniform(0, 10), rng.uniform(0, 10)
        nid = eng.create_node("p", {"x": x, "y": y})
        pts[nid] = (x, y)
        ids.append(nid)
        g.add_node(nid)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            (x1, y1), (x2, y2) = pts[a], pts[b]
            d = ((x1 - x2) ** 2 + (y1 - y2) ** 2) ** 0.5
            if d < 3.5 and rng.random() < 0.7:
                eng.create_edge(a, b, "e", properties={"weight": d},
                                directed=False)
                g.add_edge(a, b, weight=d)
    checked = 0
    for _ in range(20):
        a, b = rng.choice(ids), rng.choice(ids)
        ours = eng.astar(a, b)
        try:
            ref = nx.dijkstra_path_length(g, a, b)
        except nx.NetworkXNoPath:
            ref = None
        if ref is None:
            assert ours is None, (seed, a, b)
        else:
            assert ours is not None, (seed, a, b)
            path, cost = ours
            assert abs(cost - ref) < 1e-9, (seed, a, b, cost, ref)
            checked += 1
    assert checked > 3
