"""Parser tests across the full statement surface."""

import pytest

from neumann_tpu.lang import ast, parse, parse_many, tokenize
from neumann_tpu.utils.errors import ParseError


def test_lexer_basics():
    toks = tokenize("SELECT * FROM users WHERE name = 'O''Brien' -- hi\n")
    kinds = [t.kind for t in toks]
    assert kinds[-1] == "eof"
    strings = [t for t in toks if t.kind == "string"]
    assert strings[0].value == "O'Brien"
    nums = tokenize("1 2.5 -3 1e4 .5")
    vals = [t.value for t in nums if t.kind == "number"]
    assert vals == [1, 2.5, 3, 1e4, 0.5]


def test_lexer_errors():
    with pytest.raises(ParseError):
        tokenize("'unterminated")
    with pytest.raises(ParseError):
        tokenize("hello @ world")


def test_select_full():
    s = parse("SELECT name, COUNT(*) AS n FROM users "
              "WHERE age >= 18 AND (city = 'SF' OR city = 'NY') "
              "GROUP BY name HAVING n > 1 "
              "ORDER BY name DESC LIMIT 10 OFFSET 5")
    assert isinstance(s, ast.Select)
    assert s.table == "users"
    assert s.items[0].expr == "name"
    assert s.items[1].agg == "count" and s.items[1].alias == "n"
    assert s.group_by == ["name"] and s.having is not None
    assert s.order_by == [("name", True)]
    assert s.limit == 10 and s.offset == 5


def test_select_join():
    s = parse("SELECT * FROM a LEFT JOIN b ON a.k = b.k WHERE b.v > 3")
    assert s.joins[0].how == "left"
    assert s.joins[0].table == "b"
    assert s.joins[0].left_col == "k" and s.joins[0].right_col == "k"
    s2 = parse("SELECT * FROM a CROSS JOIN b")
    assert s2.joins[0].how == "cross"


def test_insert():
    s = parse("INSERT INTO users (name, age) VALUES ('a', 1), ('b', 2)")
    assert s.columns == ["name", "age"]
    assert s.rows == [["a", 1], ["b", 2]]
    s2 = parse("INSERT INTO t VALUES (1, 2.5, TRUE, NULL, 'x', [1.0, 2.0])")
    assert s2.rows[0] == [1, 2.5, True, None, "x", [1.0, 2.0]]


def test_update_delete():
    s = parse("UPDATE users SET age = 31, city = 'LA' WHERE name = 'a'")
    assert s.updates == {"age": 31, "city": "LA"}
    d = parse("DELETE FROM users WHERE age < 18")
    assert isinstance(d, ast.Delete) and d.where is not None


def test_create_table():
    s = parse("""CREATE TABLE IF NOT EXISTS orders (
        id INT PRIMARY KEY,
        user_id INT NOT NULL REFERENCES users(id) ON DELETE CASCADE,
        total FLOAT DEFAULT 0.0,
        note VARCHAR(255) UNIQUE,
        ok BOOLEAN
    )""")
    assert s.if_not_exists
    cols = {c.name: c for c in s.columns}
    assert cols["id"].primary_key and not cols["id"].nullable
    assert cols["user_id"].references == ("users", "id", "cascade", "restrict")
    assert cols["total"].default == 0.0
    assert cols["note"].ctype == "text" and cols["note"].unique
    assert cols["ok"].ctype == "bool"


def test_drop_and_indexes():
    assert parse("DROP TABLE IF EXISTS t CASCADE").if_exists
    s = parse("CREATE UNIQUE INDEX idx ON users (email)")
    assert s.unique and s.columns == ["email"] and s.name == "idx"
    s2 = parse("CREATE INDEX ON users (age)")
    assert s2.name is None
    s3 = parse("DROP INDEX ON users(email)")
    assert s3.table == "users" and s3.column == "email"
    s4 = parse("CREATE BTREE INDEX ON users (age)")
    assert s4.btree


def test_show_describe():
    assert isinstance(parse("SHOW TABLES"), ast.ShowTables)
    assert parse("SHOW EMBEDDINGS LIMIT 5").limit == 5
    assert isinstance(parse("COUNT EMBEDDINGS"), ast.CountEmbeddings)
    d = parse("DESCRIBE TABLE users")
    assert d.target == "table" and d.name == "users"


def test_graph_statements():
    n = parse("NODE CREATE person { name: 'Alice', age: 30, ok: TRUE }")
    assert n.label == "person"
    assert n.properties == {"name": "Alice", "age": 30, "ok": True}
    assert parse("NODE GET 3").node_id == 3
    assert parse("NODE DELETE 3").node_id == 3
    nl = parse("NODE LIST person LIMIT 10 OFFSET 2")
    assert nl.label == "person" and nl.limit == 10 and nl.offset == 2
    e = parse("EDGE CREATE 1 -> 2 : reports_to { since: '2024' }")
    assert (e.src, e.dst, e.edge_type) == (1, 2, "reports_to")
    assert e.properties == {"since": "2024"}
    el = parse("EDGE LIST reports_to LIMIT 5")
    assert el.edge_type == "reports_to"


def test_neighbors_path():
    nb = parse("NEIGHBORS 7 BOTH : knows BY SIMILARITY [0.1, 0.2] LIMIT 5")
    assert nb.node_id == 7 and nb.direction == "both"
    assert nb.edge_type == "knows"
    assert nb.by_similarity == [0.1, 0.2] and nb.limit == 5
    p = parse("PATH WEIGHTED 1 TO 2 WEIGHT cost MAX_DEPTH 5")
    assert p.mode == "weighted" and p.weight == "cost" and p.max_depth == 5
    p2 = parse("PATH ALL 1 TO 9 MIN_DEPTH 2 MAX_DEPTH 4")
    assert p2.mode == "all" and p2.min_depth == 2


def test_pagerank_aggregate():
    pr = parse("PAGERANK DAMPING 0.9 MAX_ITERATIONS 50")
    assert pr.damping == 0.9 and pr.max_iterations == 50
    ga = parse("GRAPH AGGREGATE COUNT NODES person")
    assert ga.func == "count" and ga.target == "nodes" \
        and ga.label == "person"
    ga2 = parse("GRAPH AGGREGATE AVG NODE age person WHERE age > 10")
    assert ga2.func == "avg" and ga2.prop == "age" and ga2.where is not None


def test_vector_statements():
    es = parse("EMBED STORE 'doc1' [0.1, 0.2] IN mycol")
    assert es.key == "doc1" and es.collection == "mycol"
    assert parse("EMBED 'doc1' [0.1, 0.2]").key == "doc1"  # short form
    assert parse("EMBED GET 'doc1'").key == "doc1"
    assert parse("EMBED DELETE 'doc1' IN c").collection == "c"
    eb = parse("EMBED BATCH [('a', [1.0]), ('b', [2.0])]")
    assert eb.items == [("a", [1.0]), ("b", [2.0])]


def test_similar():
    s = parse("SIMILAR 'user:alice' TOP 5")
    assert s.query_key == "user:alice" and s.limit == 5
    s2 = parse("SIMILAR [0.1, 0.2] LIMIT 10 METRIC EUCLIDEAN "
               "CONNECTED TO 'bob' IN docs WHERE lang = 'en'")
    assert s2.query_vector == [0.1, 0.2]
    assert s2.metric == "euclidean" and s2.connected_to == "bob"
    assert s2.collection == "docs" and s2.where is not None
    with pytest.raises(ParseError):
        parse("SIMILAR 'x' METRIC NOPE")


def test_entity_find():
    ec = parse("ENTITY CREATE 'alice' { role: 'eng' } EMBEDDING [0.1]")
    assert ec.key == "alice" and ec.embedding == [0.1]
    up = parse("ENTITY UPDATE 'alice' { role: 'senior' }")
    assert up.update
    assert parse("ENTITY GET 'alice'").key == "alice"
    con = parse("ENTITY CONNECT 'a' -> 'b' : reports_to")
    assert (con.src, con.dst, con.edge_type) == ("a", "b", "reports_to")
    f = parse("FIND NODE person WHERE name = 'Alice' "
              "SIMILAR TO 'user:alice' CONNECTED TO 'bob' LIMIT 3")
    assert f.target == "node" and f.label == "person"
    assert f.similar_to == "user:alice" and f.connected_to == "bob"
    fr = parse("FIND ROWS FROM users WHERE age > 25")
    assert fr.target == "rows" and fr.label == "users"


def test_vault_cache():
    v = parse("VAULT SET 'api_key' 'sk-123'")
    assert v.action == "set" and v.value == "sk-123"
    g = parse("VAULT GRANT 'alice' ON 'api_key'")
    assert g.entity == "alice" and g.key == "api_key"
    assert parse("VAULT LIST 'api_*'").pattern == "api_*"
    c = parse("CACHE SEMANTIC GET 'what is ML' THRESHOLD 0.85")
    assert c.action == "semantic_get" and c.threshold == 0.85
    cp = parse("CACHE SEMANTIC PUT 'q' 'resp' EMBEDDING [0.1]")
    assert cp.embedding == [0.1]
    assert parse("CACHE EVICT 10").count == 10


def test_blob_statements():
    b = parse("BLOB PUT 'r.pdf' DATA 'xx' TYPE 'application/pdf' "
              "BY 'admin' TAG 'q1'")
    assert b.name == "r.pdf" and b.content_type == "application/pdf"
    assert b.creator == "admin" and b.tag == "q1"
    assert parse("BLOB GET 'a1' TO '/tmp/f'").path == "/tmp/f"
    ln = parse("BLOB LINK 'a1' TO 'alice'")
    assert ln.entity == "alice"
    ms = parse("BLOB META SET 'a1' 'dept' 'eng'")
    assert ms.action == "meta_set" and ms.meta_value == "eng"
    bs = parse("BLOBS BY TAG 'q1'")
    assert bs.mode == "by_tag" and bs.tag == "q1"
    assert parse("BLOBS FOR 'alice'").entity == "alice"
    assert parse("BLOBS SIMILAR TO 'a1' LIMIT 3").limit == 3


def test_checkpoint_chain_cluster():
    assert parse("CHECKPOINT 'before'").name == "before"
    assert parse("CHECKPOINT").name is None
    assert parse("CHECKPOINTS LIMIT 5").limit == 5
    assert parse("ROLLBACK TO 'before'").target == "before"
    assert parse("BEGIN CHAIN TRANSACTION").action == "begin"
    assert parse("COMMIT CHAIN").action == "commit"
    assert parse("ROLLBACK CHAIN TO 7").height == 7
    assert parse("CHAIN BLOCK 42").height == 42
    cd = parse("CHAIN DRIFT FROM 10 TO 50")
    assert cd.from_height == 10 and cd.to_height == 50
    cs = parse("CHAIN SIMILAR [0.1] LIMIT 5")
    assert cs.embedding == [0.1]
    cl = parse("CLUSTER CONNECT 'node2@host:7000'")
    assert cl.address == "node2@host:7000"


def test_collections_ddl():
    c = parse("CREATE COLLECTION docs DIMENSION 768 METRIC COSINE "
              "QUANTIZATION int8")
    assert c.name == "docs" and c.dimension == 768
    assert c.quantization == "int8"
    assert parse("DROP COLLECTION docs").name == "docs"
    assert isinstance(parse("SHOW COLLECTIONS"), ast.ShowCollections)


def test_parse_many_and_errors():
    stmts = parse_many("SHOW TABLES; COUNT EMBEDDINGS;")
    assert len(stmts) == 2
    assert parse("") .kind == "Empty"
    with pytest.raises(ParseError):
        parse("SELEC * FROM t")
    with pytest.raises(ParseError):
        parse("SELECT * FROM t garbage after")
    with pytest.raises(ParseError):
        parse("INSERT INTO t")
    err = None
    try:
        parse("SELECT *\nFROM t WHERE x ==")
    except ParseError as e:
        err = e
    assert err is not None and err.line >= 1  # carries position info


def test_condition_forms():
    s = parse("SELECT * FROM t WHERE a BETWEEN 1 AND 5 AND b IN (1, 2) "
              "AND c LIKE 'x%' AND d IS NOT NULL AND NOT e = 3")
    assert s.where is not None
    row = {"a": 3, "b": 2, "c": "xy", "d": 0, "e": 4}
    assert s.where.evaluate_row(row)
    row["e"] = 3
    assert not s.where.evaluate_row(row)


def test_metric_composite_parses():
    stmt = parse("SIMILAR 'v1' TOP 5 METRIC COMPOSITE")
    assert stmt.metric == "composite"
    stmt = parse("SIMILAR 'v1' TOP 5 METRIC GEOMETRIC")
    assert stmt.metric == "composite"


def test_native_lexer_matches_python_lexer():
    """Differential check: the C tokenizer and the regex lexer must
    produce identical token streams (or both reject) on random ASCII
    input and on the tricky literal forms."""
    import random
    import string

    import neumann_tpu.lang.lexer as L
    from neumann_tpu.native import pylexer

    ext = pylexer.load()
    if ext is None:
        pytest.skip("no toolchain")

    def python_tokens(src):
        real = pylexer.load
        pylexer.load = lambda: None
        try:
            return [tuple(t) for t in L.tokenize(src)]
        finally:
            pylexer.load = real

    cases = [
        "SELECT a, b FROM t WHERE x >= 1.5 AND y != 'it''s' -- c",
        "INSERT INTO t VALUES (.5, 1., 1e3, 1E-2, 2e+10, '')",
        "a->b <= >= != <> ()[]{},:;=<>*.+-/%",
        "'multi\nline' AFTER", "5..7", "", " \t\r\n ",
        "123456789012345678901234567890",
    ]
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + \
        " '.,;:()[]{}<>=!+-*/%\n\t_e"
    cases += ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 50)))
              for _ in range(500)]
    for src in cases:
        try:
            a = [tuple(t) for t in ext.tokenize(src)]
        except ValueError:
            a = None
        try:
            b = python_tokens(src)
        except Exception:
            b = None
        assert a == b or (a is None and b is None), repr(src)


def test_similar_extended_metric_names():
    for name, want in (("ANGULAR", "angular"), ("GEODESIC", "geodesic"),
                       ("JACCARD", "jaccard"), ("OVERLAP", "overlap")):
        stmt = parse(f"SIMILAR 'v1' TOP 5 METRIC {name}")
        assert stmt.metric == want
    c = parse("CREATE COLLECTION g DIMENSION 8 METRIC ANGULAR")
    assert c.metric == "angular"
