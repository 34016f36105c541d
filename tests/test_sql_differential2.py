"""Differential SQL semantics vs SQLite, wave 2: joins, ORDER BY /
LIMIT / OFFSET, GROUP BY / HAVING, DISTINCT, and subqueries — the
relational_engine test families (relational_join.rs,
relational_aggregate.rs, tests.rs join/order sections) checked
against a real SQL engine instead of hand-written expectations."""

import itertools
import random
import sqlite3

import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.utils.errors import NeumannError, ParseError


def _norm(v):
    return round(v, 6) if isinstance(v, float) else v


def _fill(r, db, table, cols, rows, rng, choices):
    ddl = f"CREATE TABLE {table} ({', '.join(cols)})"
    r.execute(ddl)
    db.execute(ddl)
    for _ in range(rows):
        vals = ", ".join(
            "NULL" if v is None else
            (f"'{v}'" if isinstance(v, str) else repr(v))
            for v in (rng.choice(c) for c in choices))
        r.execute(f"INSERT INTO {table} VALUES ({vals})")
        db.execute(f"INSERT INTO {table} VALUES ({vals})")


@pytest.fixture(scope="module")
def engines():
    rng = random.Random(11)
    r = QueryRouter()
    db = sqlite3.connect(":memory:")
    _fill(r, db, "l", ["k INT", "x INT", "s TEXT"], 30, rng,
          [[None, 0, 1, 2, 3], [None, 1, 5, 9], ["p", "q", None]])
    _fill(r, db, "rt", ["k INT", "y FLOAT"], 20, rng,
          [[None, 1, 2, 4], [None, 0.5, 2.25]])
    return r, db


def _run_both(r, db, q, drop_id=True):
    ours = [tuple(_norm(v) for kk, v in row.items()
                  if not (drop_id and kk.endswith("_id")))
            for row in r.execute(q).rows]
    theirs = [tuple(_norm(v) for v in row) for row in db.execute(q)]
    return ours, theirs


def test_joins_match_sqlite(engines):
    r, db = engines
    mismatches = []
    for how in ["JOIN", "INNER JOIN", "LEFT JOIN", "CROSS JOIN"]:
        on = "" if how == "CROSS JOIN" else " ON l.k = rt.k"
        for proj in ["l.x, rt.y", "l.s, rt.k", "COUNT(*)"]:
            q = f"SELECT {proj} FROM l {how} rt{on}"
            try:
                ours, theirs = _run_both(r, db, q)
            except (NeumannError, ParseError) as e:
                mismatches.append((q, f"raised {e}"))
                continue
            if sorted(ours, key=repr) != sorted(theirs, key=repr):
                mismatches.append((q, sorted(ours, key=repr)[:4],
                                   sorted(theirs, key=repr)[:4]))
    assert not mismatches, mismatches[:4]


def test_join_with_where_match_sqlite(engines):
    r, db = engines
    for pred in ["l.x > 1", "rt.y IS NULL", "l.x = 1 AND rt.y > 0",
                 "l.s = 'p' OR rt.y < 1"]:
        q = ("SELECT l.k, l.x, rt.y FROM l JOIN rt ON l.k = rt.k "
             f"WHERE {pred}")
        ours, theirs = _run_both(r, db, q)
        assert sorted(ours, key=repr) == sorted(theirs, key=repr), q


def test_order_by_limit_offset_match_sqlite(engines):
    """Ordered prefix semantics: compare the ordered column sequences
    (NULL placement conventions differ, so null rows are compared as
    a set at whichever end they land)."""
    r, db = engines
    for col, desc in itertools.product(["x", "k"], ["", " DESC"]):
        for lim in ["LIMIT 5", "LIMIT 3 OFFSET 2", "LIMIT 100"]:
            q = (f"SELECT {col} FROM l WHERE {col} IS NOT NULL "
                 f"ORDER BY {col}{desc} {lim}")
            ours = [row[col] for row in r.execute(q).rows]
            theirs = [row[0] for row in db.execute(q)]
            assert ours == theirs, (q, ours, theirs)


def test_group_by_having_match_sqlite(engines):
    r, db = engines
    queries = [
        "SELECT k, COUNT(*) FROM l GROUP BY k",
        "SELECT k, SUM(x) FROM l GROUP BY k",
        "SELECT k, MIN(x), MAX(x) FROM l GROUP BY k",
        "SELECT s, AVG(x) FROM l GROUP BY s",
        "SELECT k, COUNT(*) FROM l GROUP BY k HAVING COUNT(*) > 2",
        "SELECT k, SUM(x) FROM l GROUP BY k HAVING SUM(x) > 3",
    ]
    for q in queries:
        ours, theirs = _run_both(r, db, q)
        assert sorted(ours, key=repr) == sorted(theirs, key=repr), \
            (q, sorted(ours, key=repr)[:5], sorted(theirs, key=repr)[:5])


def test_distinct_match_sqlite(engines):
    r, db = engines
    for proj in ["k", "s", "k, s"]:
        q = f"SELECT DISTINCT {proj} FROM l"
        ours, theirs = _run_both(r, db, q)
        assert sorted(ours, key=repr) == sorted(theirs, key=repr), q


def test_in_subquery_match_sqlite(engines):
    r, db = engines
    queries = [
        "SELECT x FROM l WHERE k IN (SELECT k FROM rt)",
        "SELECT x FROM l WHERE k NOT IN "
        "(SELECT k FROM rt WHERE k IS NOT NULL)",
        "SELECT x FROM l WHERE EXISTS (SELECT k FROM rt WHERE y > 2)",
    ]
    for q in queries:
        try:
            ours, theirs = _run_both(r, db, q)
        except (NeumannError, ParseError) as e:
            raise AssertionError(f"{q} raised {e}")
        assert sorted(ours, key=repr) == sorted(theirs, key=repr), \
            (q, sorted(ours, key=repr)[:6], sorted(theirs, key=repr)[:6])


def test_three_valued_logic_sweep(engines):
    """Exhaustive 3VL truth table through real rows: every boolean
    combinator over NULL-able operands must agree with SQLite."""
    r, db = engines
    preds = ["x = 1", "x IS NULL", "x > 1"]
    for p1, p2 in itertools.product(preds, preds):
        for op in ["AND", "OR"]:
            q = f"SELECT COUNT(*) FROM l WHERE {p1} {op} {p2}"
            ours, theirs = _run_both(r, db, q)
            assert ours == theirs, q
        q = f"SELECT COUNT(*) FROM l WHERE NOT ({p1})"
        ours, theirs = _run_both(r, db, q)
        assert ours == theirs, q


def test_distinct_aggregates_match_sqlite():
    """COUNT/SUM/AVG/MIN/MAX(DISTINCT col), plain and grouped — the
    reference parses the DISTINCT flag (parser.rs
    parse_function_call_expr) and we also execute it."""
    import sqlite3

    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    db = sqlite3.connect(":memory:")
    for ex in (r.execute, db.execute):
        ex("CREATE TABLE dd (id INT, g INT, v FLOAT, tag TEXT)")
    for i in range(30):
        stmt = (f"INSERT INTO dd VALUES ({i}, {i % 4}, "
                f"{(i % 5) * 2.5}, 't{i % 3}')")
        r.execute(stmt)
        db.execute(stmt)

    for q in ["SELECT COUNT(DISTINCT g) FROM dd",
              "SELECT SUM(DISTINCT v) FROM dd",
              "SELECT AVG(DISTINCT v) FROM dd",
              "SELECT MIN(DISTINCT v), MAX(DISTINCT v) FROM dd",
              "SELECT COUNT(DISTINCT tag) FROM dd",
              "SELECT COUNT(DISTINCT g) FROM dd WHERE v > 2",
              "SELECT g, COUNT(DISTINCT tag) FROM dd GROUP BY g",
              "SELECT g, SUM(DISTINCT v) AS sv FROM dd GROUP BY g "
              "ORDER BY sv"]:
        ours = [tuple(row.values()) for row in r.execute(q).rows]
        ref = db.execute(q).fetchall()
        assert len(ours) == len(ref), q
        for a, b in zip(ours, ref):
            for x, y in zip(a, b):
                if isinstance(y, float):
                    assert abs(float(x) - y) < 1e-9, (q, a, b)
                else:
                    assert x == y, (q, a, b)

    # the canonical output column name carries the DISTINCT marker
    row = r.execute("SELECT COUNT(DISTINCT g) FROM dd").rows[0]
    assert "count(DISTINCT g)" in row
    # COUNT(DISTINCT *) is a parse error
    import pytest

    from neumann_tpu.utils.errors import NeumannError
    with pytest.raises(NeumannError):
        r.execute("SELECT COUNT(DISTINCT *) FROM dd")


def test_scalar_functions_match_sqlite():
    """COALESCE/NULLIF/ABS/ROUND/FLOOR/CEIL/UPPER/LOWER/LENGTH/TRIM/
    SUBSTR/REPLACE in the select list — the reference parses
    ExprKind::Call but never executes scalar functions; here they
    evaluate, pinned to sqlite."""
    import sqlite3

    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    db = sqlite3.connect(":memory:")
    for ex in (r.execute, db.execute):
        ex("CREATE TABLE sf (id INT, g INT, v FLOAT, name TEXT)")
    for i in range(8):
        stmt = (f"INSERT INTO sf VALUES ({i}, {i % 3}, {i * 1.7}, "
                f"'  Name{i} ')")
        r.execute(stmt)
        db.execute(stmt)

    for q in ["SELECT COALESCE(NULL, v) FROM sf",
              "SELECT NULLIF(g, 0) FROM sf",
              "SELECT ABS(v - 10.0), ROUND(v), ROUND(v, 1) FROM sf",
              "SELECT UPPER(name), LOWER(name), LENGTH(name) FROM sf",
              "SELECT TRIM(name), SUBSTR(name, 3, 4) FROM sf",
              "SELECT REPLACE(name, 'Name', 'X') FROM sf",
              "SELECT COALESCE(NULLIF(g, 1), 99) FROM sf",
              "SELECT ABS(v) + LENGTH(name) FROM sf LIMIT 3"]:
        ours = [tuple(row.values()) for row in r.execute(q).rows]
        ref = db.execute(q).fetchall()
        assert len(ours) == len(ref), q
        for a, b in zip(ours, ref):
            for x, y in zip(a, b):
                if isinstance(y, float):
                    assert abs(float(x) - y) < 1e-9, (q, a, b)
                else:
                    assert x == y, (q, a, b)

    # NULL propagation and arity errors
    assert r.execute("SELECT UPPER(NULL) FROM sf LIMIT 1"
                     ).rows[0].popitem()[1] is None
    import pytest

    from neumann_tpu.utils.errors import NeumannError
    with pytest.raises(NeumannError):
        r.execute("SELECT ABS(v, g) FROM sf")
    with pytest.raises(NeumannError):
        r.execute("SELECT NULLIF(v) FROM sf")


def test_text_aggregates_raise_clean_errors():
    """SUM/MIN over TEXT raises the engine's typed error on every path
    (grouped, plain, DISTINCT) — the grouped path used to blow up with
    a raw ValueError cast failure (found by the grammar fuzzer)."""
    import pytest

    from neumann_tpu.router import QueryRouter
    from neumann_tpu.utils.errors import NeumannError

    r = QueryRouter()
    r.execute("CREATE TABLE tx (g INT, name TEXT)")
    r.execute("INSERT INTO tx VALUES (1, 'a')")
    r.execute("INSERT INTO tx VALUES (1, 'b')")
    for q in ["SELECT g, SUM(name) FROM tx GROUP BY g",
              "SELECT g, MIN(name) FROM tx GROUP BY g",
              "SELECT SUM(name) FROM tx",
              "SELECT SUM(DISTINCT name) FROM tx"]:
        with pytest.raises(NeumannError):
            r.execute(q)
    # COUNT over text stays legal everywhere
    assert r.execute("SELECT COUNT(DISTINCT name) FROM tx"
                     ).rows[0]["count(DISTINCT name)"] == 2
    assert r.execute("SELECT g, COUNT(name) FROM tx GROUP BY g"
                     ).rows[0]["count(name)"] == 2
