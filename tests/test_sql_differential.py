"""Differential SQL semantics tests against SQLite.

Runs generated SELECTs on both engines over the same data and compares
result multisets. Known, intentional divergences are filtered:

* ``SELECT *`` includes the ``_id`` rowid column (stripped here).
* A bare identifier on a comparison's right side is a string literal
  (``WHERE c = b`` means ``c = 'b'``), matching the reference's
  query-language semantics, so those predicates aren't generated.
* Default NULL ordering follows the NULLS-FIRST-on-DESC convention
  rather than SQLite's; ordered comparisons fall back to multisets.
"""

import itertools
import random
import sqlite3

import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.utils.errors import NeumannError, ParseError

PREDS = [
    "a > 1", "a = 1", "a != 1", "a <= 0", "b IS NULL", "b IS NOT NULL",
    "c = 'x'", "c != 'x'", "c LIKE 'a%'", "c LIKE '%c'", "c LIKE 'a_c'",
    "a IN (1, 2)", "a NOT IN (1, 2)", "a BETWEEN 0 AND 2",
    "a > 1 AND b < 7", "a > 1 OR b = 5", "NOT a = 1",
    "NOT (a = 1 OR b = 5)", "d > 0", "a + b > 5", "a * 2 = 2",
    "a IS NULL", "c IS NULL OR a = 0", "a - b < 0", "a + d > 1",
    "NOT a IN (1, 2)", "NOT c LIKE 'a%'",
]
PROJS = [
    "a", "a, b", "COUNT(*)", "COUNT(a)", "COUNT(c)", "SUM(a)",
    "AVG(d)", "MIN(a), MAX(a)", "a + 1 AS ap", "a - b AS am",
    "CASE WHEN a > 1 THEN 'hi' ELSE 'lo' END AS cw",
]


@pytest.fixture(scope="module")
def engines():
    rng = random.Random(0)
    r = QueryRouter()
    db = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE t (a INT, b INT, c TEXT, d FLOAT)"
    r.execute(ddl)
    db.execute(ddl)
    for _ in range(40):
        a = rng.choice([None, 0, 1, 2, 3, -1, 100])
        b = rng.choice([None, 0, 5, 7])
        c = rng.choice([None, "x", "y", "abc", "aXc", ""])
        d = rng.choice([None, 0.0, 1.5, -2.25])
        vals = ", ".join(
            "NULL" if v is None else
            (f"'{v}'" if isinstance(v, str) else repr(v))
            for v in (a, b, c, d))
        r.execute(f"INSERT INTO t VALUES ({vals})")
        db.execute(f"INSERT INTO t VALUES ({vals})")
    return r, db


def _norm(v):
    return round(v, 6) if isinstance(v, float) else v


def test_select_semantics_match_sqlite(engines):
    r, db = engines
    mismatches = []
    for proj, pred in itertools.product(PROJS, PREDS):
        q = f"SELECT {proj} FROM t WHERE {pred}"
        try:
            ours = [tuple(_norm(v) for k, v in row.items() if k != "_id")
                    for row in r.execute(q).rows]
        except (NeumannError, ParseError) as e:
            mismatches.append((q, f"raised {type(e).__name__}: {e}"))
            continue
        theirs = [tuple(_norm(v) for v in row) for row in db.execute(q)]
        if sorted(ours, key=repr) != sorted(theirs, key=repr):
            mismatches.append((q, ours[:4], theirs[:4]))
    assert not mismatches, mismatches[:6]


def test_count_column_skips_nulls(engines):
    r, _ = engines
    star = r.execute("SELECT COUNT(*) FROM t").rows[0]["count(*)"]
    col = r.execute("SELECT COUNT(a) FROM t").rows[0]["count(a)"]
    nulls = r.execute(
        "SELECT COUNT(*) FROM t WHERE a IS NULL").rows[0]["count(*)"]
    assert col == star - nulls


def test_empty_set_aggregates_are_null(engines):
    r, _ = engines
    row = r.execute("SELECT SUM(a), AVG(a), MIN(a), MAX(a) FROM t "
                    "WHERE a > 100000").rows[0]
    assert list(row.values()) == [None, None, None, None]


def test_aggregates_over_joins_match_sqlite():
    """COUNT/SUM/GROUP BY over a JOIN must aggregate the joined rows,
    not the base table."""
    r = QueryRouter()
    db = sqlite3.connect(":memory:")
    for ddl in ["CREATE TABLE e (name TEXT, dept INT, sal FLOAT)",
                "CREATE TABLE d (id INT, dn TEXT)"]:
        r.execute(ddl)
        db.execute(ddl)
    rng = random.Random(3)
    for _ in range(25):
        name = rng.choice(["a", "b", "c", None])
        dept = rng.choice([1, 2, 3, None])
        sal = rng.choice([10.0, 20.5, None])
        vals = ", ".join("NULL" if v is None else
                         (f"'{v}'" if isinstance(v, str) else repr(v))
                         for v in (name, dept, sal))
        r.execute(f"INSERT INTO e VALUES ({vals})")
        db.execute(f"INSERT INTO e VALUES ({vals})")
    for i, dn in [(1, "eng"), (2, "ops"), (4, "hr")]:
        r.execute(f"INSERT INTO d VALUES ({i}, '{dn}')")
        db.execute(f"INSERT INTO d VALUES ({i}, '{dn}')")
    queries = [
        "SELECT COUNT(*) FROM e JOIN d ON e.dept = d.id",
        "SELECT SUM(e.sal) FROM e JOIN d ON e.dept = d.id",
        "SELECT COUNT(e.sal) FROM e JOIN d ON e.dept = d.id",
        "SELECT d.dn, COUNT(*) FROM e JOIN d ON e.dept = d.id "
        "GROUP BY d.dn",
        "SELECT d.dn, SUM(e.sal) FROM e JOIN d ON e.dept = d.id "
        "GROUP BY d.dn HAVING COUNT(*) > 2",
        "SELECT COUNT(*) FROM e JOIN d ON e.dept = d.id "
        "WHERE e.sal > 10",
    ]
    for q in queries:
        ours = [tuple(_norm(v) for k, v in row.items() if k != "_id")
                for row in r.execute(q).rows]
        theirs = [tuple(_norm(v) for v in row) for row in db.execute(q)]
        assert sorted(ours, key=repr) == sorted(theirs, key=repr), \
            (q, ours, theirs)


def test_update_delete_match_sqlite():
    """Mutations with 3VL predicates and SET expressions leave both
    engines in the same state."""
    mutations = [
        "UPDATE t SET b = 99 WHERE a = 1",
        "UPDATE t SET c = 'z' WHERE b IS NULL",
        "UPDATE t SET a = a + 10 WHERE a >= 2",
        "UPDATE t SET b = NULL WHERE c = 'x'",
        "UPDATE t SET a = a * 2, b = b - 1 WHERE a IN (1, 2)",
        "DELETE FROM t WHERE a NOT IN (1, 2)",
        "DELETE FROM t WHERE NOT b = 5",
        "DELETE FROM t WHERE a + b > 8",
    ]
    for m in mutations:
        rng = random.Random(5)
        r = QueryRouter()
        db = sqlite3.connect(":memory:")
        ddl = "CREATE TABLE t (a INT, b INT, c TEXT)"
        r.execute(ddl)
        db.execute(ddl)
        for _ in range(25):
            a = rng.choice([None, 0, 1, 2, 3])
            b = rng.choice([None, 5, 7])
            c = rng.choice([None, "x", "y"])
            vals = ", ".join(
                "NULL" if v is None else
                (f"'{v}'" if isinstance(v, str) else repr(v))
                for v in (a, b, c))
            r.execute(f"INSERT INTO t VALUES ({vals})")
            db.execute(f"INSERT INTO t VALUES ({vals})")
        r.execute(m)
        db.execute(m)
        ours = sorted((tuple(v for k, v in row.items() if k != "_id")
                       for row in r.execute("SELECT * FROM t").rows),
                      key=repr)
        theirs = sorted((tuple(row)
                         for row in db.execute("SELECT * FROM t")),
                        key=repr)
        assert ours == theirs, (m, ours[:5], theirs[:5])
