"""SQL-surface parity with the reference's query-language doc
(docs/book/src/reference/query-language.md): subqueries, USING joins,
NULLS placement, INSERT..SELECT, CHECK constraints, table constraints,
referential ON UPDATE actions, HAVING aggregates, NOT IN / NOT LIKE.
"""

import pytest

from neumann_tpu.router.router import QueryRouter
from neumann_tpu.utils.errors import NeumannError


@pytest.fixture
def r():
    router = QueryRouter()
    router.execute("CREATE TABLE users (id INT PRIMARY KEY, name TEXT, "
                   "age INT)")
    router.execute("INSERT INTO users VALUES (1, 'Alice', 30), "
                   "(2, 'Bob', 25), (3, 'Carol', 28)")
    router.execute(
        "CREATE TABLE orders (id INT PRIMARY KEY, user_id INT "
        "REFERENCES users(id), total FLOAT)")
    router.execute("INSERT INTO orders VALUES (1, 1, 120.0), "
                   "(2, 2, 80.0), (3, 1, 50.0)")
    return router


def test_in_subquery(r):
    rows = r.execute("SELECT name FROM users WHERE id IN "
                     "(SELECT user_id FROM orders WHERE total > 100)").rows
    assert [x["name"] for x in rows] == ["Alice"]
    rows = r.execute("SELECT name FROM users WHERE id NOT IN "
                     "(SELECT user_id FROM orders)").rows
    assert [x["name"] for x in rows] == ["Carol"]


def test_scalar_subquery(r):
    rows = r.execute("SELECT name FROM users WHERE age = "
                     "(SELECT MIN(age) FROM users)").rows
    assert [x["name"] for x in rows] == ["Bob"]
    # empty scalar subquery -> NULL -> no rows
    rows = r.execute("SELECT name FROM users WHERE age = "
                     "(SELECT MIN(age) FROM users WHERE id > 50)").rows
    assert rows == []
    with pytest.raises(NeumannError):
        r.execute("SELECT * FROM users WHERE age = "
                  "(SELECT age FROM users)")


def test_exists(r):
    assert len(r.execute(
        "SELECT * FROM users WHERE EXISTS "
        "(SELECT id FROM orders WHERE total > 100)").rows) == 3
    assert r.execute(
        "SELECT * FROM users WHERE EXISTS "
        "(SELECT id FROM orders WHERE total > 999)").rows == []
    assert len(r.execute(
        "SELECT * FROM users WHERE NOT EXISTS "
        "(SELECT id FROM orders WHERE total > 999)").rows) == 3


def test_not_like(r):
    rows = r.execute("SELECT name FROM users WHERE name NOT LIKE 'A%'"
                     ).rows
    assert sorted(x["name"] for x in rows) == ["Bob", "Carol"]


def test_having_aggregate(r):
    rows = r.execute("SELECT user_id, COUNT(*) FROM orders "
                     "GROUP BY user_id HAVING COUNT(*) > 1").rows
    assert rows == [{"user_id": 1, "count(*)": 2}]
    # HAVING on an aggregate NOT in the select list (hidden column)
    rows = r.execute("SELECT user_id FROM orders GROUP BY user_id "
                     "HAVING SUM(total) > 100").rows
    assert rows == [{"user_id": 1}]


def test_nulls_first_last(r):
    r.execute("INSERT INTO users VALUES (4, 'Dan', NULL)")
    first = r.execute("SELECT name FROM users ORDER BY age ASC "
                      "NULLS FIRST").rows
    assert first[0]["name"] == "Dan"
    last = r.execute("SELECT name FROM users ORDER BY age ASC "
                     "NULLS LAST").rows
    assert last[-1]["name"] == "Dan"
    # SQL defaults: asc -> nulls last, desc -> nulls first
    assert r.execute("SELECT name FROM users ORDER BY age"
                     ).rows[-1]["name"] == "Dan"
    assert r.execute("SELECT name FROM users ORDER BY age DESC"
                     ).rows[0]["name"] == "Dan"


def test_offset_before_limit(r):
    rows = r.execute("SELECT name FROM users ORDER BY id "
                     "OFFSET 1 LIMIT 1").rows
    assert [x["name"] for x in rows] == ["Bob"]


def test_join_using(r):
    rows = r.execute("SELECT * FROM users u JOIN orders o "
                     "USING (id)").rows
    assert len(rows) == 3                 # ids 1..3 match both tables
    # multi-column USING filters on every column
    r.execute("CREATE TABLE a2 (k INT, v INT)")
    r.execute("CREATE TABLE b2 (k INT, v INT)")
    r.execute("INSERT INTO a2 VALUES (1, 10), (1, 20)")
    r.execute("INSERT INTO b2 VALUES (1, 10), (1, 99)")
    rows = r.execute("SELECT * FROM a2 JOIN b2 USING (k, v)").rows
    assert len(rows) == 1
    assert rows[0]["a2.v"] == 10


def test_insert_select(r):
    r.execute("CREATE TABLE adults (id INT, name TEXT, age INT)")
    res = r.execute("INSERT INTO adults SELECT id, name, age "
                    "FROM users WHERE age >= 28")
    assert res.count == 2
    rows = r.execute("SELECT name FROM adults ORDER BY name").rows
    assert [x["name"] for x in rows] == ["Alice", "Carol"]


def test_check_constraints(r):
    r.execute("CREATE TABLE c (v INT CHECK(v > 0), w INT, "
              "CHECK(w < 100))")
    r.execute("INSERT INTO c VALUES (5, 50)")
    with pytest.raises(NeumannError):
        r.execute("INSERT INTO c VALUES (-1, 50)")
    with pytest.raises(NeumannError):
        r.execute("INSERT INTO c VALUES (5, 200)")
    r.execute("INSERT INTO c VALUES (NULL, 50)")   # unknown passes
    with pytest.raises(NeumannError):
        r.execute("UPDATE c SET w = 500 WHERE v = 5")


def test_composite_unique_and_pk(r):
    r.execute("CREATE TABLE cu (a INT, b INT, UNIQUE (a, b))")
    r.execute("INSERT INTO cu VALUES (1, 2)")
    r.execute("INSERT INTO cu VALUES (1, 3)")
    with pytest.raises(NeumannError):
        r.execute("INSERT INTO cu VALUES (1, 2)")
    r.execute("INSERT INTO cu VALUES (NULL, 2)")   # NULLs never conflict
    r.execute("INSERT INTO cu VALUES (NULL, 2)")
    r.execute("CREATE TABLE cpk (a INT, b INT, PRIMARY KEY (a, b))")
    r.execute("INSERT INTO cpk VALUES (1, 1)")
    with pytest.raises(NeumannError):
        r.execute("INSERT INTO cpk VALUES (1, 1)")
    with pytest.raises(NeumannError):               # PK cols NOT NULL
        r.execute("INSERT INTO cpk VALUES (NULL, 2)")


def test_table_level_fk(r):
    r.execute("CREATE TABLE tfk (uid INT, x INT, "
              "FOREIGN KEY (uid) REFERENCES users(id))")
    r.execute("INSERT INTO tfk VALUES (1, 0)")
    with pytest.raises(NeumannError):
        r.execute("INSERT INTO tfk VALUES (77, 0)")


def test_on_update_actions(r):
    r.execute("CREATE TABLE ch1 (pid INT REFERENCES users(id) "
              "ON UPDATE CASCADE)")
    r.execute("INSERT INTO ch1 VALUES (3)")
    r.execute("UPDATE users SET id = 33 WHERE id = 3")
    assert r.execute("SELECT pid FROM ch1").rows == [{"pid": 33}]
    # default is RESTRICT
    r.execute("CREATE TABLE ch2 (pid INT REFERENCES users(id))")
    r.execute("INSERT INTO ch2 VALUES (2)")
    with pytest.raises(NeumannError):
        r.execute("UPDATE users SET id = 22 WHERE id = 2")
    # SET NULL
    r.execute("CREATE TABLE ch3 (pid INT REFERENCES users(id) "
              "ON UPDATE SET NULL)")
    r.execute("INSERT INTO users VALUES (5, 'Eve', 40)")
    r.execute("INSERT INTO ch3 VALUES (5)")
    r.execute("UPDATE users SET id = 55 WHERE id = 5")
    assert r.execute("SELECT pid FROM ch3").rows == [{"pid": None}]


def test_on_delete_set_default(r):
    r.execute("INSERT INTO users VALUES (7, 'Sink', 0)")
    r.execute("CREATE TABLE chd (pid INT DEFAULT 7 "
              "REFERENCES users(id) ON DELETE SET DEFAULT)")
    r.execute("INSERT INTO users VALUES (6, 'Gone', 1)")
    r.execute("INSERT INTO chd VALUES (6)")
    r.execute("DELETE FROM users WHERE id = 6")
    assert r.execute("SELECT pid FROM chd").rows == [{"pid": 7}]


def test_schema_persistence_roundtrip(tmp_path):
    """CHECK / composite-unique / ON UPDATE survive store recovery."""
    from neumann_tpu.store.tensor_store import TensorStore

    store = TensorStore()
    router = QueryRouter(store)
    router.execute("CREATE TABLE t (a INT CHECK(a > 0), b INT, c INT, "
                   "UNIQUE (b, c))")
    router.execute("INSERT INTO t VALUES (1, 2, 3)")
    store.save_snapshot(tmp_path / "s.ntpu")

    store2 = TensorStore()
    router2 = QueryRouter(store2)
    store2.load_snapshot(tmp_path / "s.ntpu")
    with pytest.raises(NeumannError):
        router2.execute("INSERT INTO t VALUES (-1, 9, 9)")
    with pytest.raises(NeumannError):
        router2.execute("INSERT INTO t VALUES (1, 2, 3)")
    router2.execute("INSERT INTO t VALUES (1, 2, 4)")


def test_expressions(r):
    rows = r.execute("SELECT id * 2 + 1 AS x FROM users "
                     "ORDER BY id").rows
    assert [x["x"] for x in rows] == [3, 5, 7]
    rows = r.execute(
        "SELECT name, CASE WHEN age < 26 THEN 'young' ELSE 'old' END "
        "AS bucket FROM users ORDER BY id").rows
    assert [x["bucket"] for x in rows] == ["old", "young", "old"]
    rows = r.execute("SELECT CAST(id AS TEXT) AS sid FROM users "
                     "ORDER BY id LIMIT 1").rows
    assert rows == [{"sid": "1"}]
    # NULL propagates through arithmetic
    r.execute("INSERT INTO users VALUES (9, 'N', NULL)")
    rows = r.execute("SELECT age + 1 AS a1 FROM users WHERE id = 9").rows
    assert rows == [{"a1": None}]
    # default output name keeps parens structure
    rows = r.execute("SELECT (id + 1) * 2 FROM users LIMIT 1").rows
    assert rows == [{"(id + 1) * 2": 4}]
    with pytest.raises(NeumannError):
        r.execute("SELECT id / 0 FROM users")


def test_expression_alias_in_join(r):
    rows = r.execute("SELECT u.name, o.total * 2 AS dbl FROM users u "
                     "JOIN orders o ON u.id = o.user_id "
                     "WHERE o.total > 100").rows
    assert rows == [{"users.name": "Alice", "dbl": 240.0}]


def test_expression_operators_unit():
    """Direct Expr-tree coverage: each arithmetic op's value, CASE
    without ELSE, CAST conversions, and tree immutability."""
    from neumann_tpu.lang.expr import Bin, Case, Cast, Col, Lit
    from neumann_tpu.engines.condition import Condition

    row = {"a": 7, "b": 2}
    assert Bin("-", Col("a"), Col("b")).evaluate(row) == 5
    assert Bin("/", Col("a"), Col("b")).evaluate(row) == 3.5
    assert Bin("%", Col("a"), Col("b")).evaluate(row) == 1
    assert Bin("+", Col("a"), Lit(1)).evaluate(row) == 8
    assert Bin("*", Col("b"), Lit(3)).evaluate(row) == 6
    # CASE with no ELSE yields NULL when nothing matches
    c = Case(((Condition.eq("a", 999), Lit("x")),))
    assert c.evaluate(row) is None
    assert Cast(Lit("5"), "int").evaluate(row) == 5
    assert Cast(Lit(1), "bool").evaluate(row) is True
    assert Cast(Lit("true"), "bool").evaluate(row) is True
    assert Cast(Lit("no"), "bool").evaluate(row) is False
    with pytest.raises(NeumannError):
        Cast(Lit("xyz"), "int").evaluate(row)
    # expression nodes are frozen (shared across cached statements)
    import dataclasses

    for node in (Col("a"), Lit(1), Bin("+", Lit(1), Lit(2)), c,
                 Cast(Lit(1), "int")):
        with pytest.raises(dataclasses.FrozenInstanceError):
            node.op_x = 1  # type: ignore[attr-defined]


def test_order_by_select_alias(r):
    r.execute("CREATE TABLE ob (name TEXT, sal FLOAT)")
    r.execute(
        "INSERT INTO ob VALUES ('ana', 10.5), ('bo', 8.0), ('cy', 12.0)")
    # alias of a plain column
    assert [r["s"] for r in r.execute(
        "SELECT name, sal AS s FROM ob ORDER BY s DESC").rows] == \
        [12.0, 10.5, 8.0]
    # alias of an expression, with LIMIT applied after the sort
    assert r.execute(
        "SELECT name, sal*2 AS dbl FROM ob ORDER BY dbl DESC LIMIT 1"
    ).rows == [{"name": "cy", "dbl": 24.0}]
    # OFFSET after the late sort
    assert r.execute(
        "SELECT name, sal*2 AS dbl FROM ob ORDER BY dbl LIMIT 1 OFFSET 1"
    ).rows == [{"name": "ana", "dbl": 21.0}]
    # ordering by a non-projected table column still works
    assert [r["n"] for r in r.execute(
        "SELECT name AS n FROM ob ORDER BY sal").rows] == \
        ["bo", "ana", "cy"]


def test_order_by_alias_in_join(r):
    r.execute("CREATE TABLE oj_e (name TEXT, dept INT, sal FLOAT)")
    r.execute("CREATE TABLE oj_d (id INT, dn TEXT)")
    r.execute("INSERT INTO oj_e VALUES ('ana', 1, 10.5), "
                   "('bo', 2, 8.0), ('cy', 1, 12.0)")
    r.execute("INSERT INTO oj_d VALUES (1, 'eng'), (2, 'ops')")
    out = r.execute(
        "SELECT oj_e.name AS who, oj_e.sal*10 AS pay FROM oj_e "
        "JOIN oj_d ON oj_e.dept = oj_d.id ORDER BY pay DESC").rows
    assert out == [{"who": "cy", "pay": 120.0},
                   {"who": "ana", "pay": 105.0},
                   {"who": "bo", "pay": 80.0}]
