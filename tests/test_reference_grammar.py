"""Reference-grammar statement forms (exact spellings from
/root/reference/neumann_parser/src/parser.rs) parse and execute.

A user switching from the reference must be able to type its syntax
verbatim: GRAPH <algo> statements (parser.rs:2337-2560), GRAPH INDEX
ON forms (parser.rs:2589-2690), bare metric keywords after SIMILAR
(parser.rs:1888-1896), INTO collections, and FIND VERTEX / bare FIND /
RETURN projections (parser.rs:1925-1991).
"""
import pytest

from neumann_tpu.lang.parser import parse
from neumann_tpu.router.router import QueryRouter


# ---------------------------------------------------------------- parse


@pytest.mark.parametrize("q,kind", [
    ("GRAPH PAGERANK DAMPING 0.85 ITERATIONS 30", "PageRank"),
    ("GRAPH PAGERANK OUTGOING EDGE TYPE knows", "PageRank"),
    ("GRAPH BETWEENNESS CENTRALITY SAMPLING 0.5", "GraphAlgorithm"),
    ("GRAPH BETWEENNESS CENTRALITY EDGE TYPE friend", "GraphAlgorithm"),
    ("GRAPH CLOSENESS CENTRALITY INCOMING", "GraphAlgorithm"),
    ("GRAPH EIGENVECTOR CENTRALITY ITERATIONS 50 TOLERANCE 0.001",
     "GraphAlgorithm"),
    ("GRAPH LOUVAIN COMMUNITIES RESOLUTION 1.2 PASSES 3",
     "GraphAlgorithm"),
    ("GRAPH LABEL PROPAGATION ITERATIONS 10", "GraphAlgorithm"),
    ("GRAPH INDEX CREATE ON NODE PROPERTY name", "GraphIndex"),
    ("GRAPH INDEX CREATE ON EDGE PROPERTY weight", "GraphIndex"),
    ("GRAPH INDEX CREATE ON EDGE TYPE", "GraphIndex"),
    ("GRAPH INDEX CREATE ON LABEL", "GraphIndex"),
    ("GRAPH INDEX DROP ON NODE PROPERTY name", "GraphIndex"),
    ("GRAPH INDEX SHOW ON NODE", "GraphIndex"),
    ("GRAPH INDEX SHOW ON EDGE", "GraphIndex"),
])
def test_reference_graph_statement_forms_parse(q, kind):
    assert type(parse(q)).__name__ == kind


def test_reference_algorithm_params_map():
    s = parse("GRAPH BETWEENNESS CENTRALITY SAMPLING 0.5")
    assert s.params == {"sampling_ratio": 0.5}
    s = parse("GRAPH LOUVAIN COMMUNITIES RESOLUTION 1.2 PASSES 3")
    assert s.params == {"resolution": 1.2, "max_passes": 3}
    s = parse("GRAPH EIGENVECTOR CENTRALITY ITERATIONS 9 TOLERANCE 0.01")
    assert s.params == {"max_iterations": 9, "tol": 0.01}
    s = parse("GRAPH CLOSENESS CENTRALITY INCOMING")
    assert s.params == {"direction": "in"}
    s = parse("GRAPH BETWEENNESS CENTRALITY EDGE TYPE friend")
    assert s.params == {"edge_type": "friend"}


def test_our_compact_spellings_still_parse():
    assert parse("BETWEENNESS SAMPLING_RATIO 0.5").params == \
        {"sampling_ratio": 0.5}
    assert parse("LOUVAIN MAX_PASSES 2").params == {"max_passes": 2}
    s = parse("CLOSENESS DIRECTION OUTGOING")
    assert s.params == {"direction": "out"}
    assert parse("GRAPH INDEX CREATE NODE PROPERTY name").target == "node"
    assert parse("GRAPH INDEX SHOW NODE").action == "show"


@pytest.mark.parametrize("q,metric", [
    ("SIMILAR 'x' TOP 5 COSINE", "cosine"),
    ("SIMILAR 'x' TOP 5 EUCLIDEAN", "euclidean"),
    ("SIMILAR 'x' TOP 5 DOTPRODUCT", "dot"),
    ("SIMILAR 'x' TOP 5 DOT_PRODUCT", "dot"),
    ("SIMILAR 'x' TOP 5 METRIC COSINE", "cosine"),  # our spelling
])
def test_similar_bare_metric_keywords(q, metric):
    assert parse(q).metric == metric


def test_similar_into_collection():
    s = parse("SIMILAR 'x' TOP 5 COSINE INTO docs")
    assert s.collection == "docs" and s.metric == "cosine"
    assert parse("SIMILAR 'x' TOP 5 IN docs").collection == "docs"


def test_find_vertex_and_bare_and_return():
    s = parse("FIND VERTEX person WHERE age > 30")
    assert s.target == "node" and s.label == "person"
    s = parse("FIND WHERE age > 30")
    assert s.target == "node" and s.label is None
    s = parse("FIND NODE person RETURN name AS who, age LIMIT 5")
    assert s.return_items == [("name", "who"), ("age", "age")]
    assert s.limit == 5


# -------------------------------------------------------------- execute


@pytest.fixture()
def router():
    r = QueryRouter()
    r.execute("NODE CREATE person {name: 'ada', age: 36}")
    r.execute("NODE CREATE person {name: 'bob', age: 20}")
    r.execute("NODE CREATE person {name: 'eve', age: 25}")
    r.execute("EDGE CREATE 0 -> 1 knows")
    r.execute("EDGE CREATE 1 -> 2 knows")
    return r


def test_graph_algorithm_statements_execute(router):
    out = router.execute("GRAPH PAGERANK DAMPING 0.85 ITERATIONS 20")
    assert len(out.rows) == 3
    out = router.execute("GRAPH BETWEENNESS CENTRALITY SAMPLING 1.0")
    assert {r["id"] for r in out.rows} == {0, 1, 2}
    out = router.execute("GRAPH CLOSENESS CENTRALITY BOTH")
    assert len(out.rows) == 3
    out = router.execute(
        "GRAPH EIGENVECTOR CENTRALITY ITERATIONS 30 TOLERANCE 0.001")
    assert len(out.rows) == 3
    out = router.execute("GRAPH LOUVAIN COMMUNITIES RESOLUTION 1.0")
    assert len(out.rows) == 3
    out = router.execute("GRAPH LABEL PROPAGATION ITERATIONS 5")
    assert len(out.rows) == 3


def test_graph_index_on_forms_execute(router):
    router.execute("GRAPH INDEX CREATE ON NODE PROPERTY name")
    out = router.execute("GRAPH INDEX SHOW ON NODE")
    assert any("name" in str(r) for r in out.rows)
    router.execute("GRAPH INDEX DROP ON NODE PROPERTY name")


def test_find_reference_forms_execute(router):
    out = router.execute("FIND VERTEX person WHERE age > 30")
    assert [r["name"] for r in out.rows] == ["ada"]
    out = router.execute("FIND WHERE age > 21")
    assert {r["name"] for r in out.rows} == {"ada", "eve"}
    out = router.execute("FIND NODE person RETURN name AS who, age")
    assert out.rows[0] == {"who": "ada", "age": 36}
    assert set(out.rows[0]) == {"who", "age"}


def test_similar_bare_metric_executes():
    r = QueryRouter()
    r.execute("EMBED 'a' [1.0, 0.0, 0.0]")
    r.execute("EMBED 'b' [0.9, 0.1, 0.0]")
    r.execute("EMBED 'c' [0.0, 1.0, 0.0]")
    out = r.execute("SIMILAR 'a' TOP 2 COSINE")
    assert [h["key"] for h in out.results] == ["a", "b"]
    out = r.execute("SIMILAR 'a' TOP 2 EUCLIDEAN")
    assert len(out.results) == 2


# ------------------------------------------------ top-level statements


def test_toplevel_batch_reference_forms():
    r = QueryRouter()
    out = r.execute(
        "BATCH CREATE NODES [{labels: [person, user], name: 'Alice'}, "
        "{labels: [person], name: 'Bob'}]")
    assert out.value == [0, 1]
    out = r.execute(
        "BATCH CREATE EDGES [{from: 0, to: 1, type: FOLLOWS, since: 2021}]")
    assert out.value == [0]
    # extra labels kept as a property
    node = r.execute("NODE GET 0").rows[0]
    assert node["labels"] == ["person", "user"]
    out = r.execute("BATCH UPDATE NODES [{id: 0, name: 'Al'}]")
    assert "1" in str(out.message)
    assert r.execute("NODE GET 0").rows[0]["name"] == "Al"
    r.execute("BATCH DELETE EDGES 0")
    r.execute("BATCH DELETE NODES 1")
    assert r.execute("NODE LIST person").rows == \
        [{"id": 0, "label": "person", "name": "Al",
          "labels": ["person", "user"]}]


def test_toplevel_batch_missing_edge_fields_error():
    from neumann_tpu.utils.errors import ParseError
    for bad in ["BATCH CREATE EDGES [{to: 2, type: F}]",
                "BATCH CREATE EDGES [{from: 1, type: F}]",
                "BATCH CREATE EDGES [{from: 1, to: 2}]",
                "BATCH UPDATE NODES [{name: 'x'}]"]:
        with pytest.raises(ParseError):
            parse(bad)


def test_toplevel_constraint_with_type_kind():
    r = QueryRouter()
    r.execute("CONSTRAINT CREATE c2 ON NODE PROPERTY age TYPE INT")
    with pytest.raises(Exception, match="must be int"):
        r.execute("NODE CREATE person {age: 'old'}")
    with pytest.raises(Exception, match="must be int"):
        r.execute("NODE CREATE person {age: true}")
    r.execute("NODE CREATE person {age: 30}")
    r.execute("NODE CREATE person {name: 'no-age'}")  # absent prop ok
    rows = r.execute("CONSTRAINT LIST").rows
    assert rows[0]["kind"] == "type" and rows[0]["vtype"] == "int"
    r.execute("CONSTRAINT DROP c2")
    r.execute("NODE CREATE person {age: 'old'}")  # constraint gone


def test_toplevel_aggregate_reference_forms():
    r = QueryRouter()
    r.execute("BATCH CREATE NODES [{labels: [p], v: 1}, {labels: [p], v: 3}]")
    r.execute("BATCH CREATE EDGES [{from: 0, to: 1, type: F, w: 2}]")
    assert r.execute("AGGREGATE NODE PROPERTY v AVG BY LABEL p").value == 2.0
    assert r.execute("AGGREGATE NODE PROPERTY v SUM").value == 4.0
    assert r.execute("AGGREGATE EDGE PROPERTY w SUM BY TYPE F").value == 2.0
    assert r.execute(
        "AGGREGATE NODE PROPERTY v MAX WHERE v < 2").value == 1.0


def test_neighbors_by_similar_alias():
    s = parse("NEIGHBORS 0 BY SIMILAR [1.0, 0.0] LIMIT 5")
    assert s.by_similarity == [1.0, 0.0]
    s = parse("NEIGHBORS 0 BY SIMILARITY [1.0, 0.0]")
    assert s.by_similarity == [1.0, 0.0]
