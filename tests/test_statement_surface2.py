"""Statement-surface wave 2: the router/parser branches the first wave
left unexercised — fused SIMILAR WHERE filter trees, INSERT..SELECT,
aggregates over joins, ORDER BY aliases with OFFSET, the full
NODE/EDGE/NEIGHBORS/GRAPH AGGREGATE grammar, MATCH edge patterns, the
BLOB/BLOBS verb sets, CACHE verbs, CHAIN error paths, CLUSTER
introspection, and EXPLAIN plans.

Reference parity: query_router/src/lib.rs statement handlers +
neumann_parser grammar (ast.rs:33-143)."""

import numpy as np
import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.utils.errors import NeumannError, VectorError


@pytest.fixture
def r(tmp_path):
    router = QueryRouter()
    router.init_checkpoints(tmp_path / "ckpts")
    return router


# ----------------------------------------------------------- SQL branches

def test_insert_select_roundtrip(r):
    r.execute("CREATE TABLE src (a INT, b TEXT)")
    r.execute("INSERT INTO src VALUES (1, 'x'), (2, 'y')")
    r.execute("CREATE TABLE dst (a INT, b TEXT)")
    res = r.execute("INSERT INTO dst (a, b) SELECT a, b FROM src")
    assert res.count == 2
    assert len(r.execute("SELECT * FROM dst").rows) == 2


def test_insert_select_column_mismatch(r):
    r.execute("CREATE TABLE src (a INT, b TEXT)")
    r.execute("INSERT INTO src VALUES (1, 'x')")
    r.execute("CREATE TABLE dst (a INT)")
    with pytest.raises(NeumannError, match="mismatch"):
        r.execute("INSERT INTO dst (a) SELECT a, b FROM src")


def test_aggregates_over_join(r):
    r.execute("CREATE TABLE o (uid INT, amt FLOAT)")
    r.execute("CREATE TABLE u (uid INT, name TEXT)")
    r.execute("INSERT INTO u VALUES (1, 'a'), (2, 'b')")
    r.execute("INSERT INTO o VALUES (1, 10.0), (1, 30.0), (2, 5.0)")
    row = r.execute(
        "SELECT SUM(o.amt) AS s, AVG(o.amt) AS av, MIN(o.amt) AS mn, "
        "MAX(o.amt) AS mx FROM o INNER JOIN u ON o.uid = u.uid").rows[0]
    assert row["s"] == 45.0 and row["av"] == 15.0
    assert row["mn"] == 5.0 and row["mx"] == 30.0


def test_join_order_by_alias_offset_limit(r):
    r.execute("CREATE TABLE l (k INT, v INT)")
    r.execute("CREATE TABLE rr (k INT, w INT)")
    for i in range(6):
        r.execute(f"INSERT INTO l VALUES ({i}, {10 - i})")
        r.execute(f"INSERT INTO rr VALUES ({i}, {i * 2})")
    rows = r.execute(
        "SELECT l.v AS score FROM l INNER JOIN rr ON l.k = rr.k "
        "ORDER BY score LIMIT 3 OFFSET 1").rows
    assert [row["score"] for row in rows] == [6, 7, 8]
    # OFFSET without LIMIT, joined
    rows = r.execute(
        "SELECT l.v AS score FROM l INNER JOIN rr ON l.k = rr.k "
        "ORDER BY score OFFSET 4").rows
    assert [row["score"] for row in rows] == [9, 10]


def test_group_by_order_offset_limit(r):
    r.execute("CREATE TABLE t (g TEXT, v INT)")
    for g, v in (("a", 1), ("a", 2), ("b", 5), ("c", 9), ("c", 1)):
        r.execute(f"INSERT INTO t VALUES ('{g}', {v})")
    rows = r.execute(
        "SELECT g, SUM(v) AS s FROM t GROUP BY g "
        "ORDER BY s DESC LIMIT 2 OFFSET 1").rows
    assert [row["g"] for row in rows] == ["b", "a"]


def test_drop_index_by_column(r):
    r.execute("CREATE TABLE t (a INT)")
    r.execute("CREATE INDEX ON t (a)")
    assert "dropped" in r.execute("DROP INDEX ON t (a)").message
    assert "no such index" in r.execute("DROP INDEX ON t (a)").message


def test_metrics_error_recorded(r):
    with pytest.raises(NeumannError):
        r.execute("SELECT * FROM missing_table")
    snap = r.metrics.snapshot()
    assert any(row.get("errors", 0) > 0 for row in snap.values()) or \
        any(v for k, v in snap.items() if "error" in str(k).lower()) or \
        snap, "error metric never recorded"


# ------------------------------------------------------- SIMILAR filters

def test_similar_where_filter_tree(r):
    for i in range(8):
        r.vector.store_embedding(
            f"d{i}", [float(i), 1.0],
            metadata={"kind": "even" if i % 2 == 0 else "odd",
                      "rank": i})

    def hits(stmt):
        return {int(h["key"].lstrip("d"))
                for h in r.execute(stmt).results}

    got = hits("SIMILAR [3.1, 1.0] TOP 8 "
               "WHERE kind = 'even' AND rank >= 2")
    assert got and all(i % 2 == 0 and i >= 2 for i in got)
    got = hits("SIMILAR [3.1, 1.0] TOP 8 "
               "WHERE kind = 'even' OR rank = 3")
    assert got and all(i % 2 == 0 or i == 3 for i in got)
    got = hits("SIMILAR [3.1, 1.0] TOP 8 WHERE rank IN (1, 2, 3)")
    assert got and got <= {1, 2, 3}
    assert hits("SIMILAR [3.1, 1.0] TOP 8 WHERE kind LIKE 'ev%'") \
        == {0, 2, 4, 6}
    assert hits("SIMILAR [3.1, 1.0] TOP 8 WHERE kind IS NOT NULL") \
        == set(range(8))
    with pytest.raises(VectorError):
        r.execute("SIMILAR [3.1, 1.0] TOP 8 WHERE NOT kind = 'even'")
    with pytest.raises(VectorError):
        r.execute("SIMILAR [3.1, 1.0] TOP 8 WHERE kind LIKE '%ev%'")


def test_similar_by_entity_key(r):
    r.execute("EMBED STORE 'a' [1.0, 0.0]")
    r.execute("EMBED STORE 'b' [0.9, 0.1]")
    res = r.execute("SIMILAR 'a' TOP 2")
    assert res.results
    with pytest.raises(VectorError, match="no embedding"):
        r.execute("SIMILAR 'ghost' TOP 2")


# ----------------------------------------------------------- graph verbs

def test_node_edge_crud_and_list(r):
    a = r.execute("NODE CREATE person {name: 'ann'}").value
    b = r.execute("NODE CREATE person {name: 'bo'}").value
    c = r.execute("NODE CREATE city {name: 'rome'}").value
    e1 = r.execute(f"EDGE CREATE {a} -> {b} : knows").value
    r.execute(f"EDGE CREATE {a} -> {c} : visited")
    got = r.execute(f"EDGE GET {e1}").rows[0]
    assert got["src"] == a and got["dst"] == b and got["type"] == "knows"
    assert "no edge" in r.execute("EDGE GET 9999").message
    edges = r.execute("EDGE LIST knows").rows
    assert len(edges) == 1 and edges[0]["type"] == "knows"
    assert len(r.execute("EDGE LIST LIMIT 1 OFFSET 1").rows) == 1
    assert f"edge {e1} deleted" in r.execute(f"EDGE DELETE {e1}").message
    assert "no edge" in r.execute(f"EDGE DELETE {e1}").message
    assert "no node" in r.execute("NODE GET 4242").message
    assert f"node {c} deleted" in r.execute(f"NODE DELETE {c}").message
    assert "no node" in r.execute(f"NODE DELETE {c}").message


def test_neighbors_by_similarity_explicit_vector(r):
    for i, vec in enumerate(("[1.0, 0.0]", "[0.9, 0.1]", "[0.0, 1.0]")):
        r.execute(f"ENTITY CREATE 'p{i}' {{ }} EMBEDDING {vec}")
    r.execute("ENTITY CONNECT 'p0' -> 'p1' : knows")
    r.execute("ENTITY CONNECT 'p0' -> 'p2' : knows")
    n0 = r.unified.node_id_of("p0")
    res = r.execute(f"NEIGHBORS {n0} BOTH BY SIMILARITY [1.0, 0.0] "
                    f"LIMIT 2")
    assert [h["key"] for h in res.results] == ["p1", "p2"]
    # an entity with no connected neighbors: empty similar result
    r.execute("ENTITY CREATE 'lone' { } EMBEDDING [0.5, 0.5]")
    lone = r.unified.node_id_of("lone")
    assert r.execute(
        f"NEIGHBORS {lone} BY SIMILARITY [1.0, 0.0] LIMIT 2").results \
        == []


def test_graph_aggregate_variants(r):
    for i in range(4):
        r.execute(f"NODE CREATE person {{age: {20 + i}}}")
    r.execute("NODE CREATE city {pop: 100}")
    ids = [row["id"] for row in r.execute("NODE LIST person").rows]
    r.execute(f"EDGE CREATE {ids[0]} -> {ids[1]} : knows {{w: 2}}")
    r.execute(f"EDGE CREATE {ids[1]} -> {ids[2]} : knows {{w: 4}}")
    assert r.execute("GRAPH AGGREGATE COUNT NODES").count == 5
    assert r.execute("GRAPH AGGREGATE COUNT NODES person").count == 4
    assert r.execute("GRAPH AGGREGATE COUNT EDGES").count == 2
    assert r.execute("GRAPH AGGREGATE COUNT EDGES knows").count == 2
    assert r.execute("GRAPH AGGREGATE SUM NODE age").value == 86.0
    assert r.execute("GRAPH AGGREGATE AVG NODE age person").value == 21.5
    assert r.execute("GRAPH AGGREGATE MIN NODE age").value == 20
    assert r.execute("GRAPH AGGREGATE MAX NODE age").value == 23
    assert r.execute("GRAPH AGGREGATE SUM EDGE w").value == 6
    assert r.execute(
        "GRAPH AGGREGATE COUNT NODES person WHERE age > 21").count == 2


def test_find_edge_filters(r):
    a = r.execute("NODE CREATE person {name: 'x'}").value
    b = r.execute("NODE CREATE person {name: 'y'}").value
    r.execute(f"EDGE CREATE {a} -> {b} : knows {{since: 2020}}")
    r.execute(f"EDGE CREATE {b} -> {a} : blocks {{since: 2021}}")
    rows = r.execute("FIND EDGE knows").rows
    assert len(rows) == 1 and rows[0]["type"] == "knows"
    rows = r.execute("FIND EDGE WHERE since > 2020").rows
    assert len(rows) == 1 and rows[0]["type"] == "blocks"
    rows = r.execute("FIND EDGE LIMIT 1").rows
    assert len(rows) == 1


# ------------------------------------------------------------ blob verbs

def test_blob_full_verb_surface(r, tmp_path):
    r.execute("BLOB INIT")
    aid = r.execute(
        "BLOB PUT 'a.txt' DATA 'hello world' TYPE 'text/plain' "
        "BY 'tester' LINK 'user:1' TAG 'docs'").value
    assert r.execute(f"BLOB VERIFY '{aid}'").message == "OK"
    assert r.execute(f"BLOB LINKS '{aid}'").rows == [{"entity": "user:1"}]
    r.execute(f"BLOB LINK '{aid}' TO 'user:2'")
    assert len(r.execute(f"BLOB LINKS '{aid}'").rows) == 2
    r.execute(f"BLOB UNLINK '{aid}' FROM 'user:2'")
    assert len(r.execute(f"BLOB LINKS '{aid}'").rows) == 1
    r.execute(f"BLOB TAG '{aid}' 'archive'")
    assert aid in [row["id"] for row in
                   r.execute("BLOBS BY TAG 'archive'").rows]
    r.execute(f"BLOB UNTAG '{aid}' 'archive'")
    assert aid not in [row["id"] for row in
                       r.execute("BLOBS BY TAG 'archive'").rows]
    assert [row["id"] for row in r.execute("BLOBS FOR 'user:1'").rows] \
        == [aid]
    # put FROM a file path
    p = tmp_path / "src.bin"
    p.write_bytes(b"\x00\x01binary")
    aid2 = r.execute(f"BLOB PUT 'b.bin' FROM '{p}'").value
    assert r.execute(f"BLOB VERIFY '{aid2}'").message == "OK"
    stats = r.execute("BLOB STATS").rows[0]
    assert stats["artifacts"] >= 2 if "artifacts" in stats else stats
    assert "all blobs OK" in r.execute("BLOB REPAIR").message
    r.execute(f"BLOB DELETE '{aid2}'")
    assert "collected" in r.execute("BLOB GC").message


def test_blob_put_needs_data_or_from(r):
    r.execute("BLOB INIT")
    with pytest.raises(NeumannError, match="DATA or FROM"):
        r.execute("BLOB PUT 'empty.txt'")


# ----------------------------------------------------------- cache verbs

def test_cache_verb_surface(r):
    r.execute("CACHE INIT")
    assert "cached" in r.execute("CACHE PUT 'q1' 'resp1'").message
    assert r.execute("CACHE GET 'q1'").value == "resp1"
    assert "miss" in r.execute("CACHE GET 'nope'").message
    r.execute("CACHE SEMANTIC PUT 'weather in rome' 'sunny'")
    got = r.execute("CACHE SEMANTIC GET 'weather in rome' THRESHOLD 0.5")
    assert got.value == "sunny"
    assert "miss" in r.execute(
        "CACHE SEMANTIC GET 'entirely unrelated query text' "
        "THRESHOLD 0.99").message
    # explicit EMBEDDING branch: must match the default embedder dim
    emb = ", ".join(["0.1"] * 256)
    r.execute(f"CACHE SEMANTIC PUT 'pinned' 'resp2' EMBEDDING [{emb}]")
    assert r.execute("CACHE GET 'pinned'").value == "resp2"
    assert "evicted" in r.execute("CACHE EVICT 1").message
    r.execute("CACHE CLEAR")
    assert "miss" in r.execute("CACHE GET 'q1'").message


# ----------------------------------------------------------- chain/misc

def test_chain_error_paths(r):
    with pytest.raises(NeumannError, match="chain not initialized"):
        r.execute("COMMIT CHAIN")
    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("ROLLBACK CHAIN")
    with pytest.raises(NeumannError, match="no open chain"):
        r.execute("COMMIT CHAIN")
    with pytest.raises(NeumannError, match="no open chain"):
        r.execute("ROLLBACK CHAIN")
    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("EMBED STORE 'c1' [1.0]")
    assert "committed" in r.execute("COMMIT CHAIN").message
    assert "no block" in r.execute("CHAIN BLOCK 99").message
    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("ROLLBACK CHAIN")  # abort path clears the open tx
    with pytest.raises(NeumannError, match="no open chain"):
        r.execute("COMMIT CHAIN")


def test_cluster_statements_without_cluster(r):
    with pytest.raises(NeumannError, match="CLUSTER CONNECT expects"):
        r.execute("CLUSTER CONNECT 'not-an-addr'")


def test_explain_plans(r):
    r.execute("CREATE TABLE t (a INT, b INT)")
    r.execute("CREATE INDEX ON t (a)")
    r.execute("INSERT INTO t VALUES (1, 2), (3, 4)")
    plan = r.execute(
        "EXPLAIN SELECT a, SUM(b) AS s FROM t WHERE a = 1 "
        "GROUP BY a ORDER BY s LIMIT 5").rows
    steps = " | ".join(str(row) for row in plan)
    assert "scan" in steps and "aggregate" in steps and "sort" in steps \
        and "limit" in steps
    r.execute("CREATE TABLE u (a INT, c INT)")
    plan = r.execute(
        "EXPLAIN SELECT * FROM t INNER JOIN u ON t.a = u.a").rows
    assert any("join" in str(row) for row in plan)
    r.execute("CREATE COLLECTION col8 DIMENSION 2")
    r.execute("EMBED STORE 'x' [1.0, 2.0] IN col8")
    plan = r.execute(
        "EXPLAIN SIMILAR [1.0, 2.0] TOP 3 IN col8").rows
    assert any("MXU" in str(row) for row in plan)
    plan2 = r.execute("EXPLAIN SIMILAR [1.0, 2.0] TOP 3").rows
    assert any("default corpus" in str(row) for row in plan2)
