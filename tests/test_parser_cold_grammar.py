"""Parser cold-grammar branches: multi-column indexes, WEIGHTED path
variants, INDEX ON label+prop forms, batch deletes, BLOB inline data."""

from neumann_tpu.lang import parse
from neumann_tpu.router import QueryRouter


def test_multi_column_create_index():
    r = QueryRouter()
    r.execute("CREATE TABLE t (a INT, b INT, c INT)")
    r.execute("INSERT INTO t VALUES (1, 2, 3)")
    out = r.execute("CREATE INDEX ON t (a, b)")
    assert "index" in (out.message or "").lower() or out.kind
    rows = r.execute("SELECT c FROM t WHERE a = 1").rows
    assert rows[0]["c"] == 3


def test_weighted_and_variable_paths():
    r = QueryRouter()
    a = r.graph.create_node("N", {})
    b = r.graph.create_node("N", {})
    c = r.graph.create_node("N", {})
    r.graph.create_edge(a, b, "E", {"weight": 1.0})
    r.graph.create_edge(b, c, "E", {"weight": 2.0})
    for q in (f"PATH WEIGHTED {a} TO {c}",
              f"PATH ALL_WEIGHTED {a} TO {c}",
              f"PATH VARIABLE {a} TO {c} MIN_DEPTH 1 MAX_DEPTH 3"):
        stmt = parse(q)
        assert stmt is not None
    res = r.execute(f"PATH WEIGHTED {a} TO {c}")
    assert res.kind


def test_graph_constraint_label_property_forms():
    # one ident = property; ident PROPERTY ident = label + property;
    # two idents = label + property; TYPE form carries a value type
    for q, label, prop in (
            ("GRAPH CONSTRAINT CREATE c1 ON NODE name UNIQUE",
             None, "name"),
            ("GRAPH CONSTRAINT CREATE c2 ON NODE Person PROPERTY "
             "name UNIQUE", "Person", "name"),
            ("GRAPH CONSTRAINT CREATE c3 ON NODE Person name EXISTS",
             "Person", "name"),
            ("GRAPH CONSTRAINT CREATE c4 ON NODE age TYPE int",
             None, "age")):
        stmt = parse(q)
        assert stmt.label == label and stmt.prop == prop, q
    # index grammar: compact and reference ON-forms
    for q in ("GRAPH INDEX CREATE NODE PROPERTY name",
              "GRAPH INDEX CREATE ON EDGE TYPE",
              "GRAPH INDEX DROP NODE name",
              "GRAPH INDEX SHOW NODE"):
        assert parse(q) is not None


def test_graph_batch_delete_list():
    r = QueryRouter()
    ids = [r.graph.create_node("N", {}) for _ in range(3)]
    res = r.execute(
        f"BATCH DELETE NODES {ids[0]}, {ids[1]}, {ids[2]}")
    assert r.graph.node_count() == 0
    assert res.kind


def test_blob_put_inline_data_form():
    stmt = parse("BLOB PUT 'report.txt' 'hello world'")
    assert getattr(stmt, "data", None) == "hello world"
    r = QueryRouter()
    r.execute("BLOB INIT")
    aid = r.execute("BLOB PUT 'report.txt' 'hello world'").value
    out = r.execute(f"BLOB GET '{aid}'")
    val = out.value or out.message or ""
    assert "hello" in str(val)
