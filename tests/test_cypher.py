"""Cypher subset tests: patterns, WHERE, RETURN, SET, DELETE, MERGE."""

import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.utils.errors import GraphError, ParseError


@pytest.fixture
def r():
    router = QueryRouter()
    router.execute("CREATE (a:Person { name: 'Alice', age: 34 })")
    router.execute("CREATE (b:Person { name: 'Bob', age: 28 })")
    router.execute("CREATE (c:Person { name: 'Carol', age: 41 })")
    return router


def nid(r, name):
    rows = r.execute(
        f"MATCH (p:Person) WHERE p.name = '{name}' RETURN p").rows
    return rows[0]["p"]


def test_create_and_match(r):
    rows = r.execute("MATCH (p:Person) RETURN p.name ORDER BY p.name").rows
    assert [x["p.name"] for x in rows] == ["Alice", "Bob", "Carol"]
    rows = r.execute(
        "MATCH (p:Person { name: 'Bob' }) RETURN p.age").rows
    assert rows == [{"p.age": 28}]


def test_create_relationship_pattern(r):
    r.execute("CREATE (d:Person { name: 'Dave' })"
              "-[:REPORTS_TO { since: 2024 }]->"
              "(m:Person { name: 'Mallory' })")
    rows = r.execute(
        "MATCH (a:Person)-[r:REPORTS_TO]->(b:Person) "
        "RETURN a.name, b.name, r.since").rows
    assert rows == [{"a.name": "Dave", "b.name": "Mallory",
                     "r.since": 2024}]


def test_match_where_order_skip_limit(r):
    rows = r.execute("MATCH (p:Person) WHERE p.age > 30 "
                     "RETURN p.name ORDER BY p.age DESC").rows
    assert [x["p.name"] for x in rows] == ["Carol", "Alice"]
    rows = r.execute("MATCH (p:Person) RETURN p.name "
                     "ORDER BY p.age SKIP 1 LIMIT 1").rows
    assert rows == [{"p.name": "Alice"}]


def test_count_and_alias(r):
    rows = r.execute("MATCH (p:Person) RETURN COUNT(*) AS n").rows
    assert rows == [{"n": 3}]
    rows = r.execute("MATCH (p:Person) WHERE p.age < 30 "
                     "RETURN p.name AS who").rows
    assert rows == [{"who": "Bob"}]


def test_multi_hop_and_varlength(r):
    a, b, c = (nid(r, n) for n in ("Alice", "Bob", "Carol"))
    r.graph.create_edge(a, b, "KNOWS")
    r.graph.create_edge(b, c, "KNOWS")
    rows = r.execute(
        "MATCH (x:Person)-[:KNOWS]->(y:Person)-[:KNOWS]->(z:Person) "
        "RETURN x.name, z.name").rows
    assert rows == [{"x.name": "Alice", "z.name": "Carol"}]
    rows = r.execute(
        "MATCH (x:Person { name: 'Alice' })-[:KNOWS*1..3]->(z:Person) "
        "RETURN z.name ORDER BY z.name").rows
    assert [x["z.name"] for x in rows] == ["Bob", "Carol"]


def test_direction(r):
    a, b = nid(r, "Alice"), nid(r, "Bob")
    r.graph.create_edge(a, b, "LIKES")
    out = r.execute("MATCH (x)-[:LIKES]->(y) RETURN x.name").rows
    assert out == [{"x.name": "Alice"}]
    inc = r.execute("MATCH (x)<-[:LIKES]-(y) RETURN x.name").rows
    assert inc == [{"x.name": "Bob"}]
    both = r.execute("MATCH (x { name: 'Bob' })-[:LIKES]-(y) "
                     "RETURN y.name").rows
    assert both == [{"y.name": "Alice"}]


def test_set(r):
    r.execute("MATCH (p:Person { name: 'Bob' }) SET p.age = 29, "
              "p.team = 'eng' RETURN p")
    rows = r.execute("MATCH (p:Person { name: 'Bob' }) "
                     "RETURN p.age, p.team").rows
    assert rows == [{"p.age": 29, "p.team": "eng"}]


def test_delete_and_detach(r):
    a, b = nid(r, "Alice"), nid(r, "Bob")
    r.graph.create_edge(a, b, "KNOWS")
    with pytest.raises(GraphError):
        r.execute("MATCH (p:Person { name: 'Alice' }) DELETE p")
    out = r.execute(
        "MATCH (p:Person { name: 'Alice' }) DETACH DELETE p").rows
    assert out == [{"deleted_nodes": 1, "deleted_edges": 0}]
    assert len(r.execute("MATCH (p:Person) RETURN p").rows) == 2
    # delete a relationship only
    r.graph.create_edge(nid(r, "Bob"), nid(r, "Carol"), "KNOWS")
    out = r.execute("MATCH (a)-[k:KNOWS]->(b) DELETE k").rows
    assert out[0]["deleted_edges"] == 1


def test_merge(r):
    out = r.execute("MERGE (p:Person { name: 'Alice' }) "
                    "ON MATCH SET p.seen = 1 "
                    "ON CREATE SET p.created = 1").rows
    assert len(out) == 1
    rows = r.execute("MATCH (p:Person { name: 'Alice' }) "
                     "RETURN p.seen, p.created").rows
    assert rows == [{"p.seen": 1, "p.created": None}]
    r.execute("MERGE (q:Person { name: 'Zed' }) "
              "ON CREATE SET q.created = 1")
    rows = r.execute("MATCH (p:Person { name: 'Zed' }) "
                     "RETURN p.created").rows
    assert rows == [{"p.created": 1}]


def test_cypher_errors(r):
    with pytest.raises(ParseError):
        r.execute("MATCH (p:Person RETURN p")
    with pytest.raises(GraphError):
        r.execute("CREATE (a)-[:X]->(b)")  # unbound bare vars


def test_cross_pattern_join(r):
    a, b = nid(r, "Alice"), nid(r, "Bob")
    r.graph.create_edge(a, b, "KNOWS")
    rows = r.execute(
        "MATCH (x:Person { name: 'Alice' }), (y:Person { name: 'Bob' }) "
        "RETURN x.name, y.name").rows
    assert rows == [{"x.name": "Alice", "y.name": "Bob"}]


def test_match_create(r):
    out = r.execute(
        "MATCH (a:Person { name: 'Alice' }), (b:Person { name: 'Bob' }) "
        "CREATE (a)-[:KNOWS { since: 2020 }]->(b)").rows
    assert out == [{"edge": 0}]
    rows = r.execute("MATCH (a)-[k:KNOWS]->(b) "
                     "RETURN a.name, b.name, k.since").rows
    assert rows == [{"a.name": "Alice", "b.name": "Bob",
                     "k.since": 2020}]


def test_variable_length_open_ended_and_malformed():
    """*n.. walks to max depth; malformed bounds are clean errors
    (found by the coverage-guided fuzzer)."""
    router = QueryRouter()
    for i in range(4):
        router.execute(f"CREATE (n:P {{ i: {i} }})")
    for i in range(3):
        router.execute(f"MATCH (a:P), (b:P) WHERE a.i = {i} AND "
                       f"b.i = {i + 1} CREATE (a)-[:K]->(b)")
    rows = router.execute(
        "MATCH (a:P)-[:K*2..]->(b) WHERE a.i = 0 RETURN b.i").rows
    assert sorted(x["b.i"] for x in rows) == [2, 3]
    from neumann_tpu.utils.errors import NeumannError

    with pytest.raises(NeumannError):
        router.execute("MATCH (a:P)-[:K*..]->(b) RETURN b")
