"""End-to-end router tests: statements in, results out.

Mirrors the reference's query_router integration tests — every statement
family from parse to engine execution."""

import numpy as np
import pytest

from neumann_tpu.router import QueryResult, QueryRouter
from neumann_tpu.utils.errors import (
    NeumannError,
    RelationalError,
    VectorError,
)


@pytest.fixture
def r(tmp_path):
    router = QueryRouter()
    router.init_checkpoints(tmp_path / "ckpts")
    return router


def test_sql_roundtrip(r):
    assert "created" in r.execute(
        "CREATE TABLE users (name TEXT NOT NULL, age INT, "
        "email TEXT UNIQUE)").message
    res = r.execute("INSERT INTO users (name, age, email) VALUES "
                    "('alice', 30, 'a@x.com'), ('bob', 25, 'b@x.com')")
    assert res.count == 2
    rows = r.execute("SELECT name FROM users WHERE age > 26").rows
    assert rows == [{"name": "alice"}]
    r.execute("UPDATE users SET age = 26 WHERE name = 'bob'")
    assert r.execute("SELECT * FROM users WHERE age = 26").rows[0][
        "name"] == "bob"
    assert r.execute("SELECT COUNT(*) AS n FROM users").rows[0]["n"] == 2
    assert r.execute("SELECT AVG(age) AS a FROM users").rows[0]["a"] == 28
    r.execute("DELETE FROM users WHERE name = 'bob'")
    assert r.execute("SHOW TABLES").rows == [{"table": "users", "rows": 1}]
    desc = r.execute("DESCRIBE TABLE users").rows
    assert desc[0]["name"] == "name"
    r.execute("DROP TABLE users")
    with pytest.raises(RelationalError):
        r.execute("SELECT * FROM users")


def test_sql_join_group(r):
    r.execute("CREATE TABLE a (k INT, x TEXT)")
    r.execute("CREATE TABLE b (k INT, y TEXT)")
    r.execute("INSERT INTO a VALUES (1, 'a1'), (2, 'a2')")
    r.execute("INSERT INTO b VALUES (2, 'b2')")
    rows = r.execute(
        "SELECT * FROM a INNER JOIN b ON a.k = b.k").rows
    assert len(rows) == 1 and rows[0]["b.y"] == "b2"
    r.execute("CREATE TABLE s (grp TEXT, v INT)")
    r.execute("INSERT INTO s VALUES ('x', 1), ('x', 3), ('y', 10)")
    g = r.execute("SELECT grp, SUM(v) AS total FROM s GROUP BY grp "
                  "HAVING total > 2").rows
    assert {(row["grp"], row["total"]) for row in g} == {("x", 4.0),
                                                         ("y", 10.0)}


def test_graph_statements(r):
    n1 = r.execute("NODE CREATE person { name: 'Alice' }").value
    n2 = r.execute("NODE CREATE person { name: 'Bob' }").value
    e = r.execute(f"EDGE CREATE {n1} -> {n2} : knows").value
    assert r.execute(f"NODE GET {n1}").rows[0]["name"] == "Alice"
    assert len(r.execute("NODE LIST person").rows) == 2
    nb = r.execute(f"NEIGHBORS {n1} OUTGOING : knows").rows
    assert nb == [{"id": n2}]
    p = r.execute(f"PATH SHORTEST {n1} TO {n2}")
    assert p.value == [n1, n2]
    pr = r.execute("PAGERANK MAX_ITERATIONS 5").rows
    assert len(pr) == 2
    assert r.execute("GRAPH AGGREGATE COUNT NODES person").count == 2
    assert r.execute(f"EDGE DELETE {e}").message.startswith("edge")
    assert r.execute("GRAPH AGGREGATE COUNT EDGES").count == 0


def test_vector_statements(r):
    r.execute("EMBED STORE 'd1' [1.0, 0.0, 0.0]")
    r.execute("EMBED STORE 'd2' [0.9, 0.1, 0.0]")
    r.execute("EMBED STORE 'd3' [0.0, 0.0, 1.0]")
    res = r.execute("SIMILAR 'd1' TOP 2")
    assert res.results[0]["key"] == "d1"
    assert res.results[1]["key"] == "d2"
    res2 = r.execute("SIMILAR [0.0, 0.0, 1.0] LIMIT 1")
    assert res2.results[0]["key"] == "d3"
    assert r.execute("COUNT EMBEDDINGS").count == 3
    assert len(r.execute("SHOW EMBEDDINGS LIMIT 2").rows) == 2
    vec = r.execute("EMBED GET 'd1'").value
    assert vec == [1.0, 0.0, 0.0]
    r.execute("EMBED DELETE 'd3'")
    assert r.execute("COUNT EMBEDDINGS").count == 2
    with pytest.raises(VectorError):
        r.execute("SIMILAR 'nothere' TOP 1")


def test_vector_collections_and_filters(r):
    r.execute("CREATE COLLECTION docs DIMENSION 4 QUANTIZATION int8")
    r.execute("EMBED STORE 'a' [1.0, 0.0, 0.0, 0.0] IN docs")
    r.execute("EMBED BATCH [('b', [0.0, 1.0, 0.0, 0.0])] IN docs")
    res = r.execute("SIMILAR [1.0, 0.0, 0.0, 0.0] TOP 1 IN docs")
    assert res.results[0]["key"] == "a"
    cols = r.execute("SHOW COLLECTIONS").rows
    assert cols[0]["name"] == "docs" and cols[0]["count"] == 2
    # metadata filter on default namespace
    r.execute("EMBED STORE 'x' [1.0, 0.0]")
    r.vector.store_embedding("y", [0.9, 0.1], metadata={"lang": "de"})
    res = r.execute("SIMILAR [1.0, 0.0] TOP 5 WHERE lang = 'de'")
    assert [h["key"] for h in res.results] == ["y"]
    r.execute("DROP COLLECTION docs")
    assert r.execute("SHOW COLLECTIONS").rows == []


def test_entity_hybrid(r):
    r.execute("ENTITY CREATE 'q' { kind: 'query' } EMBEDDING [1.0, 0.0]")
    for i, v in enumerate(["[0.9, 0.1]", "[0.8, 0.2]", "[0.0, 1.0]"]):
        r.execute(f"ENTITY CREATE 'n{i}' {{ }} EMBEDDING {v}")
    r.execute("ENTITY CONNECT 'q' -> 'n1' : link")
    r.execute("ENTITY CONNECT 'q' -> 'n2' : link")
    res = r.execute("SIMILAR 'q' TOP 5 CONNECTED TO 'q'")
    assert {h["key"] for h in res.results} == {"n1", "n2"}
    ent = r.execute("ENTITY GET 'q'").rows[0]
    assert ent["kind"] == "query" and ent["embedding_dim"] == 2
    found = r.execute("FIND NODE entity WHERE kind = 'query'").rows
    assert len(found) == 1
    r.execute("ENTITY DELETE 'n0'")
    assert "no entity" in r.execute("ENTITY GET 'n0'").message


def test_find_rows(r):
    r.execute("CREATE TABLE t (v INT)")
    r.execute("INSERT INTO t VALUES (1), (5), (9)")
    rows = r.execute("FIND ROWS FROM t WHERE v > 2 LIMIT 5").rows
    assert [x["v"] for x in rows] == [5, 9]


def test_neighbors_by_similarity(r):
    r.execute("ENTITY CREATE 'c' { } EMBEDDING [1.0, 0.0]")
    r.execute("ENTITY CREATE 'close' { } EMBEDDING [0.95, 0.05]")
    r.execute("ENTITY CREATE 'far' { } EMBEDDING [0.0, 1.0]")
    r.execute("ENTITY CONNECT 'c' -> 'close' : e")
    r.execute("ENTITY CONNECT 'c' -> 'far' : e")
    nid = r.unified.node_id_of("c")
    res = r.execute(f"NEIGHBORS {nid} BOTH BY SIMILARITY LIMIT 2")
    assert [h["key"] for h in res.results] == ["close", "far"]


def test_vault_flow(r):
    r.init_vault("master-pw")
    r.execute("VAULT SET 'api' 'sk-123'")
    assert r.execute("VAULT GET 'api'").value == "sk-123"
    r.execute("VAULT ROTATE 'api' 'sk-456'")
    assert r.execute("VAULT GET 'api'").value == "sk-456"
    assert r.execute("VAULT LIST").rows == [{"key": "api"}]
    r.execute("VAULT GRANT 'alice' ON 'api'")
    assert r.vault.get("api", actor="alice") == "sk-456"
    r.execute("VAULT REVOKE 'alice' ON 'api'")
    from neumann_tpu.utils.errors import VaultError

    with pytest.raises(VaultError):
        r.vault.get("api", actor="alice")
    r.execute("VAULT DELETE 'api'")
    assert r.execute("VAULT LIST").rows == []


def test_cache_flow(r):
    r.execute("CACHE INIT")
    r.execute("CACHE PUT 'what is ML' 'machine learning is...'")
    assert r.execute("CACHE GET 'what is ML'").value == \
        "machine learning is..."
    sem = r.execute("CACHE SEMANTIC GET 'what is ML really' THRESHOLD 0.3")
    assert sem.kind in ("value", "message")
    stats = r.execute("CACHE STATS").rows[0]
    assert stats["exact_hits"] >= 1
    r.execute("CACHE CLEAR")
    assert "miss" in r.execute("CACHE GET 'what is ML'").message


def test_blob_flow(r, tmp_path):
    r.execute("BLOB INIT")
    aid = r.execute("BLOB PUT 'f.txt' DATA 'hello world' "
                    "TYPE 'text/plain' TAG 'demo'").value
    assert r.execute(f"BLOB GET '{aid}'").value == b"hello world"
    info = r.execute(f"BLOB INFO '{aid}'").rows[0]
    assert info["size"] == 11 and "demo" in info["tags"]
    assert r.execute(f"BLOB VERIFY '{aid}'").message == "OK"
    r.execute(f"BLOB LINK '{aid}' TO 'alice'")
    assert r.execute("BLOBS FOR 'alice'").rows[0]["id"] == aid
    assert r.execute("BLOBS BY TAG 'demo'").rows[0]["id"] == aid
    assert r.execute("BLOBS WHERE TYPE = 'text/plain'").rows[0]["id"] == aid
    r.execute(f"BLOB META SET '{aid}' 'dept' 'eng'")
    assert r.execute(f"BLOB META GET '{aid}' 'dept'").value == "eng"
    out = tmp_path / "out.txt"
    r.execute(f"BLOB GET '{aid}' TO '{out}'")
    assert out.read_bytes() == b"hello world"
    r.execute(f"BLOB DELETE '{aid}'")
    assert r.execute("BLOB GC").message.startswith("collected")


def test_checkpoint_rollback(r):
    r.execute("CREATE TABLE t (v INT)")
    r.execute("INSERT INTO t VALUES (1)")
    r.execute("CHECKPOINT 'clean'")
    r.execute("EMBED STORE 'k' [1.0]")
    r.execute("ROLLBACK TO 'clean'")
    assert r.execute("COUNT EMBEDDINGS").count == 0
    cps = r.execute("CHECKPOINTS").rows
    assert any(c["name"] == "clean" for c in cps)


def test_auto_checkpoint_before_destructive(r):
    r.execute("CREATE TABLE t (v INT)")
    r.execute("INSERT INTO t VALUES (1)")
    before = len(r.execute("CHECKPOINTS").rows)
    r.execute("DELETE FROM t WHERE v = 1")
    after = len(r.execute("CHECKPOINTS").rows)
    assert after == before + 1


def test_pagination(r):
    r.execute("CREATE TABLE t (v INT)")
    r.execute("INSERT INTO t VALUES " +
              ", ".join(f"({i})" for i in range(25)))
    page, cur = r.execute_paginated("SELECT * FROM t", 10)
    assert len(page) == 10 and cur is not None
    page2, cur2 = r.execute_paginated("SELECT * FROM t", 10, cursor=cur)
    assert len(page2) == 10 and cur2 is not None
    page3, cur3 = r.execute_paginated("SELECT * FROM t", 10, cursor=cur2)
    assert len(page3) == 5 and cur3 is None
    with pytest.raises(NeumannError):
        r.execute_paginated("SELECT * FROM t", 10, cursor="cur-999")


def test_execute_many(r):
    out = r.execute_many("CREATE TABLE t (v INT); "
                         "INSERT INTO t VALUES (1); "
                         "SELECT * FROM t")
    assert len(out) == 3 and out[2].rows[0]["v"] == 1


def test_module_not_initialized_errors(r):
    with pytest.raises(NeumannError):
        r.execute("VAULT GET 'x'")
    with pytest.raises(NeumannError):
        r.execute("BLOB STATS")


def test_chain_statements(r):
    assert "started" in r.execute("BEGIN CHAIN TRANSACTION").message
    # stage ops through the workspace API, then commit via statement
    from neumann_tpu.store.tensor_store import TensorData
    r._chain_tx.put("doc:x", TensorData.with_values(
        embedding=[1.0] + [0.0] * 63))
    assert "committed" in r.execute("COMMIT CHAIN").message
    assert r.execute("CHAIN HEIGHT").count == 1
    assert r.execute("CHAIN VERIFY").message == "chain OK"
    blk = r.execute("CHAIN BLOCK 0").rows[0]
    assert blk["height"] == 0
    hist = r.execute("CHAIN HISTORY 'doc:x'").rows
    assert len(hist) == 1
    tip = r.execute("CHAIN TIP").rows
    assert tip and tip[0]["height"] == 0
    sim = r.execute("CHAIN SIMILAR [1.0] LIMIT 2")
    assert isinstance(sim.rows, list)
    drift = r.execute("CHAIN DRIFT FROM 0 TO 1").rows[0]
    assert drift["blocks"] == 1
    assert "rolled back" in r.execute("ROLLBACK CHAIN TO 0").message
    assert r.execute("CHAIN HEIGHT").count == 0


def test_cluster_statements(r):
    out = r.execute("CLUSTER STATUS")
    assert "not connected" in out.message
    # unreachable address -> clean error, no half-connected state
    with pytest.raises(NeumannError):
        r.execute("CLUSTER CONNECT 'n2@127.0.0.1:1'")
    assert "not connected" in r.execute("CLUSTER DISCONNECT").message


def test_graph_algorithm_statements(r):
    ids = [r.execute("NODE CREATE n { }").value for _ in range(4)]
    for i in range(3):
        r.execute(f"EDGE CREATE {ids[i]} -> {ids[i+1]} : e")
    bw = r.execute("BETWEENNESS SAMPLING_RATIO 1.0").rows
    assert len(bw) == 4
    cl = r.execute("CLOSENESS").rows
    assert len(cl) == 4
    ev = r.execute("EIGENVECTOR MAX_ITERATIONS 30").rows
    assert len(ev) == 4
    lv = r.execute("LOUVAIN RESOLUTION 1.0").rows
    assert {row["id"] for row in lv} == set(ids)
    lp = r.execute("LABEL_PROPAGATION MAX_ITERATIONS 10").rows
    assert len(lp) == 4


def test_graph_constraint_statements(r):
    r.execute("GRAPH CONSTRAINT CREATE uniq_email ON NODE (user) "
              "email UNIQUE")
    r.execute("NODE CREATE user { email: 'a@x.com' }")
    from neumann_tpu.utils.errors import GraphError
    with pytest.raises(GraphError):
        r.execute("NODE CREATE user { email: 'a@x.com' }")
    r.execute("GRAPH CONSTRAINT CREATE needs_name ON NODE name EXISTS")
    with pytest.raises(GraphError):
        r.execute("NODE CREATE person { age: 3 }")
    lst = r.execute("GRAPH CONSTRAINT LIST").rows
    assert {c["name"] for c in lst} == {"uniq_email", "needs_name"}
    got = r.execute("GRAPH CONSTRAINT GET uniq_email").rows
    assert got[0]["kind"] == "unique"
    r.execute("GRAPH CONSTRAINT DROP needs_name")
    r.execute("NODE CREATE person { age: 3 }")  # now fine


def test_graph_index_statements(r):
    r.execute("NODE CREATE p { city: 'SF' }")
    r.execute("GRAPH INDEX CREATE NODE PROPERTY city")
    assert r.execute("GRAPH INDEX SHOW NODE").rows == [
        {"property": "city"}]
    assert "dropped" in r.execute("GRAPH INDEX DROP NODE city").message


def test_graph_pattern_statements(r):
    a = r.execute("NODE CREATE person { name: 'a' }").value
    b = r.execute("NODE CREATE person { name: 'b' }").value
    r.execute(f"EDGE CREATE {a} -> {b} : reports_to")
    n = r.execute("GRAPH PATTERN COUNT "
                  "(x:person)-[:reports_to]->(y:person)").count
    assert n == 1
    assert r.execute("GRAPH PATTERN EXISTS "
                     "(x:person)-[:reports_to]->(y:person)").value is True
    rows = r.execute("GRAPH PATTERN MATCH "
                     "(x:person)-[:reports_to]->(y:person) LIMIT 5").rows
    assert rows[0]["x.name"] == "a" and rows[0]["y.name"] == "b"


def test_graph_batch_statements(r):
    out = r.execute("GRAPH BATCH CREATE NODES ["
                    "(person { name: 'x' }), (person { name: 'y' })]")
    ids = out.value
    assert len(ids) == 2
    out2 = r.execute(f"GRAPH BATCH CREATE EDGES ["
                     f"({ids[0]} -> {ids[1]} : knows)]")
    assert len(out2.value) == 1
    r.execute(f"GRAPH BATCH UPDATE NODES [({ids[0]} {{ age: 9 }})]")
    assert r.execute(f"NODE GET {ids[0]}").rows[0]["age"] == 9
    r.execute(f"GRAPH BATCH DELETE EDGES [{out2.value[0]}]")
    assert r.execute("GRAPH AGGREGATE COUNT EDGES").count == 0
    r.execute(f"GRAPH BATCH DELETE NODES [{ids[0]}, {ids[1]}]")
    assert len(r.execute("NODE LIST person").rows) == 0


def test_query_result_cache(r):
    r.execute("EMBED STORE 'a' [1.0, 0.0]")
    r.enable_query_cache(semantic_threshold=0.99)
    first = r.execute("SIMILAR 'a' TOP 1")
    assert first.results[0]["key"] == "a"
    hits_before = r.cache.stats.hits
    second = r.execute("SIMILAR 'a' TOP 1")
    assert second.results == first.results
    assert r.cache.stats.hits > hits_before
    # mutations are never cached
    r.execute("EMBED STORE 'b' [0.9, 0.1]")
    r.cache.clear()
    fresh = r.execute("SIMILAR 'a' TOP 2")
    assert len(fresh.results) == 2


def test_explain_statements(r):
    r.execute("CREATE TABLE ex (id INT PRIMARY KEY, name TEXT)")
    r.execute("CREATE INDEX ex_name ON ex (name)")
    for i in range(4):
        r.execute(f"INSERT INTO ex VALUES ({i}, 'n{i}')")
    plan = r.execute(
        "EXPLAIN SELECT * FROM ex WHERE name = 'n1' "
        "ORDER BY id LIMIT 2").rows
    assert plan[0]["operation"] == "scan"
    assert "hash index on name" in plan[0]["detail"]
    assert [p["operation"] for p in plan] == ["scan", "sort", "limit"]
    # unindexed column: full scan
    full = r.execute("EXPLAIN SELECT * FROM ex WHERE id > 1").rows
    assert "hash index on id" in full[0]["detail"]  # PK is indexed
    # EXPLAIN must NOT execute: row count unchanged by explained insert
    r.execute("EXPLAIN INSERT INTO ex VALUES (99, 'x')")
    assert r.execute("SELECT COUNT(*) FROM ex").rows[0]["count(*)"] == 4
    # similar plan shows the device-scan shape
    r.execute("EMBED 'e1' [1.0, 0.0]")
    sim = r.execute("EXPLAIN SIMILAR 'e1' TOP 3 "
                    "CONNECTED TO 'x'").rows
    ops = [p["operation"] for p in sim]
    assert ops == ["scan", "mask", "select"]
    assert "MXU matmul" in sim[0]["detail"]
    assert "fused into scan" in sim[1]["detail"]


def test_similar_extended_metrics_end_to_end(r):
    r.execute("EMBED STORE 'a' [1.0, 0.0, 2.0, 0.0]")
    r.execute("EMBED STORE 'b' [0.9, 0.0, 1.9, 0.0]")
    r.execute("EMBED STORE 'c' [0.0, 3.0, 0.0, 1.0]")
    for metric in ("ANGULAR", "GEODESIC", "JACCARD", "OVERLAP"):
        res = r.execute(f"SIMILAR 'a' TOP 3 METRIC {metric}")
        assert res.results[0]["key"] == "a", metric
    # jaccard ranks by support overlap: 'b' shares a's support exactly
    res = r.execute("SIMILAR 'a' TOP 3 METRIC JACCARD")
    assert res.results[1]["key"] == "b"
    assert res.results[1]["score"] == pytest.approx(1.0)
    assert res.results[2]["score"] == pytest.approx(0.0)
