"""Statement-surface parity with the reference's query-language doc:
every documented graph / vector / entity / module statement form
executes through the router (mirrors how reference integration tests
drive the full surface).
"""

import pytest

from neumann_tpu.router.router import QueryRouter


@pytest.fixture
def r():
    return QueryRouter()


def test_graph_statement_surface(r):
    a = r.execute("NODE CREATE person { name: 'Alice', age: 30 }").value
    b = r.execute("NODE CREATE person { name: 'Bob', age: 25 }").value
    r.execute(f"EDGE CREATE {a} -> {b} : reports_to {{ weight: 0.7 }}")
    for s in [
        f"NODE GET {a}",
        "NODE LIST person LIMIT 10 OFFSET 0",
        f"NEIGHBORS {a} OUTGOING : reports_to",
        f"PATH SHORTEST {a} TO {b}",
        f"PATH WEIGHTED {a} TO {b} WEIGHT weight MAX_DEPTH 5",
        f"PATH ALL {a} TO {b} MIN_DEPTH 1 MAX_DEPTH 4",
        f"PATH VARIABLE {a} TO {b} MAX_DEPTH 3",
        "PAGERANK DAMPING 0.85 MAX_ITERATIONS 20",
        "BETWEENNESS SAMPLING_RATIO 0.5",
        "CLOSENESS DIRECTION BOTH",
        "EIGENVECTOR MAX_ITERATIONS 10",
        "LOUVAIN RESOLUTION 1.0 MAX_PASSES 5",
        "LABEL_PROPAGATION MAX_ITERATIONS 5",
        "GRAPH AGGREGATE COUNT NODES person",
        "GRAPH AGGREGATE AVG NODE age person",
        "GRAPH AGGREGATE SUM EDGE weight reports_to WHERE weight > 0.5",
        "GRAPH PATTERN MATCH (x:person)-[:reports_to]->(y:person)"
        " LIMIT 10",
        "GRAPH PATTERN COUNT (x:person)-[:reports_to]->(y:person)",
        "GRAPH PATTERN EXISTS (x:person)-[:mentors]->(y:person)",
        "GRAPH CONSTRAINT CREATE uniq_name ON NODE (person) name UNIQUE",
        "GRAPH CONSTRAINT LIST",
        "GRAPH CONSTRAINT DROP uniq_name",
        "GRAPH INDEX CREATE NODE PROPERTY age",
        "GRAPH INDEX SHOW NODE",
        "GRAPH INDEX DROP NODE age",
        "GRAPH BATCH CREATE NODES [(person { name: 'C' })]",
        f"GRAPH BATCH UPDATE NODES [({a} {{ age: 31 }})]",
        "DESCRIBE NODE person",
        "DESCRIBE EDGE reports_to",
    ]:
        r.execute(s)


def test_find_path(r):
    a = r.execute("NODE CREATE person { name: 'A' }").value
    b = r.execute("NODE CREATE person { name: 'B' }").value
    t = r.execute("NODE CREATE team { name: 'T' }").value
    r.execute(f"EDGE CREATE {a} -> {b} : reports_to")
    r.execute(f"EDGE CREATE {b} -> {t} : member_of")
    rows = r.execute(
        "FIND PATH person -[reports_to]-> person LIMIT 5").rows
    assert rows == [{"from": a, "to": b, "path": [a, b], "length": 1}]
    # edge-type filter rejects non-matching hops
    assert r.execute("FIND PATH person -[member_of]-> person").rows == []
    # untyped multi-hop
    rows = r.execute("FIND PATH person -[]-> team").rows
    assert {"from": a, "to": t, "path": [a, b, t],
            "length": 2} in rows
    # single-ended forms
    assert r.execute("FIND PATH -[reports_to]-> person").rows
    assert r.execute("FIND PATH person -[reports_to]->").rows


def test_entity_batch_create(r):
    res = r.execute(
        "ENTITY BATCH CREATE [{ key: 'k1', a: 1 }, { key: 'k2', a: 2 }]")
    assert len(res.value) == 2
    assert r.execute("ENTITY GET 'k1'").rows[0]["a"] == 1
    from neumann_tpu.utils.errors import NeumannError

    with pytest.raises(NeumannError):
        r.execute("ENTITY BATCH CREATE [{ a: 1 }]")


def test_codebook_statements():
    # chain initializes lazily via BEGIN CHAIN TRANSACTION
    r2 = QueryRouter()
    r2.execute("BEGIN CHAIN TRANSACTION")
    r2.execute("EMBED STORE 'd0' [0.1, 0.2, 0.3]")
    r2.execute("COMMIT CHAIN")
    info = r2.execute("SHOW CODEBOOK GLOBAL").rows[0]
    assert info["trained"] is False and info["pending_deltas"] == 1
    for i in range(20):
        r2.execute("BEGIN CHAIN TRANSACTION")
        r2.execute(f"EMBED STORE 'x{i}' [{0.1 * i:.2f}, 0.2, 0.3]")
        r2.execute("COMMIT CHAIN")
    info = r2.execute("SHOW CODEBOOK GLOBAL").rows[0]
    assert info["trained"] and info["entry_count"] == 16
    local = r2.execute("SHOW CODEBOOK LOCAL 'default'").rows[0]
    assert local["usage_total"] == 21
    stats = r2.execute("ANALYZE CODEBOOK TRANSITIONS").rows[0]
    assert stats["total_transitions"] == 21
    assert 0.0 <= stats["avg_validity_score"] <= 1.0
    # blocks carry codes, including backfilled early blocks
    assert r2.execute("CHAIN BLOCK 1").rows[0]["codebook_code"] \
        is not None


def test_codebook_requires_chain(r):
    from neumann_tpu.utils.errors import NeumannError

    with pytest.raises(NeumannError):
        r.execute("ANALYZE CODEBOOK TRANSITIONS")
