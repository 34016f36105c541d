"""Statement-surface wave 3: edge semantics pinned from exploratory
probes — degenerate LIMIT/OFFSET/TOP values, deep nesting, int64
extremes, unicode identifiers and literals, empty-set aggregates,
inverted ranges, and scalar-function corner arguments."""

import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.utils.errors import NeumannError


@pytest.fixture
def r():
    router = QueryRouter()
    router.execute("CREATE TABLE t (a INT, n TEXT)")
    router.execute("INSERT INTO t VALUES (1, 'x')")
    router.execute("INSERT INTO t VALUES (2, 'y')")
    return router


def test_degenerate_limit_offset(r):
    assert r.execute("SELECT * FROM t LIMIT 0").rows == []
    # negative LIMIT means NO limit (sqlite semantics; the raw slice
    # used to silently drop the last row)
    assert len(r.execute("SELECT * FROM t LIMIT -1").rows) == 2
    assert r.execute("SELECT * FROM t OFFSET 99999").rows == []
    assert len(r.execute("SELECT * FROM t LIMIT 99999").rows) == 2


def test_similar_top_clamps_and_rejects(r):
    r.execute("EMBED STORE 'k' [1.0, 0.0]")
    r.execute("EMBED STORE 'j' [0.0, 1.0]")
    # k far beyond the corpus clamps to the valid rows
    res = r.execute("SIMILAR 'k' TOP 999999999")
    assert len(res.results) == 2
    for bad in ("SIMILAR 'k' TOP 0", "SIMILAR 'k' TOP -5"):
        with pytest.raises(NeumannError):
            r.execute(bad)


def test_deep_nesting(r):
    assert r.execute("SELECT ((((a)))) FROM t").rows[0]["a"] == 1
    q = "SELECT " + "ABS(" * 30 + "a" + ")" * 30 + " FROM t"
    vals = sorted(row.popitem()[1] for row in r.execute(q).rows)
    assert vals == [1, 2]


def test_int64_extremes(r):
    r.execute("INSERT INTO t VALUES (9223372036854775807, 'big')")
    big = r.execute(
        "SELECT a FROM t WHERE a > 1000000").rows[0]["a"]
    assert big == 9223372036854775807
    assert r.execute("SELECT MAX(a) FROM t").rows[0][
        "max(a)"] == 9223372036854775807


def test_unicode_identifiers_and_literals(r):
    r.execute("CREATE TABLE üml (x INT, label TEXT)")
    r.execute("INSERT INTO üml VALUES (1, 'über\U0001F600')")
    rows = r.execute(
        "SELECT * FROM üml WHERE label = 'über\U0001F600'").rows
    assert len(rows) == 1 and rows[0]["x"] == 1


def test_empty_set_semantics(r):
    r.execute("DELETE FROM t")
    assert r.execute("SELECT MAX(a) FROM t").rows[0]["max(a)"] is None
    assert r.execute("SELECT COUNT(*) FROM t").rows[0]["count(*)"] == 0
    assert r.execute("SELECT COUNT(DISTINCT a) FROM t").rows[0][
        "count(DISTINCT a)"] == 0
    assert r.execute("SELECT a FROM t GROUP BY a").rows == []


def test_inverted_and_trivial_ranges(r):
    assert r.execute("SELECT * FROM t WHERE a BETWEEN 5 AND 1"
                     ).rows == []
    assert len(r.execute("SELECT * FROM t WHERE a BETWEEN 1 AND 2"
                         ).rows) == 2
    assert len(r.execute(
        "SELECT a FROM t GROUP BY a HAVING COUNT(*) > -1").rows) == 2


def test_scalar_function_corner_arguments(r):
    row = r.execute("SELECT ROUND(a, 100) FROM t").rows[0]
    assert row["round(a, 100)"] == 1.0
    # negative SUBSTR start counts from the end (sqlite semantics)
    assert r.execute("SELECT SUBSTR(n, -1) FROM t").rows[0][
        "substr(n, 0 - 1)"] == "x"
    assert r.execute("SELECT NULLIF(NULL, NULL) FROM t").rows[0][
        "nullif(None, None)"] is None


def test_chain_transaction_keyword_symmetry():
    """COMMIT/ROLLBACK CHAIN accept the optional TRANSACTION keyword,
    mirroring BEGIN CHAIN TRANSACTION (the reference's exact forms
    BEGIN CHAIN TRANSACTION / COMMIT CHAIN both still parse)."""
    r = QueryRouter()
    r.execute("CREATE TABLE ct (a INT)")
    r.execute("BEGIN CHAIN TRANSACTION")
    r.execute("INSERT INTO ct VALUES (7)")
    r.execute("COMMIT CHAIN TRANSACTION")
    assert r.execute("CHAIN HEIGHT").count >= 1
    r.execute("BEGIN CHAIN")
    r.execute("INSERT INTO ct VALUES (8)")
    r.execute("ROLLBACK CHAIN TRANSACTION")
    assert len(r.execute("SELECT * FROM ct").rows) == 1


def test_vault_history_rollback_audit_statements():
    """VAULT HISTORY / ROLLBACK / AUDIT surface the engine's versioning
    and audit APIs as statements (beyond the reference's 7 VaultOps)."""
    r = QueryRouter()
    r.init_vault("pw")
    r.execute("VAULT SET 'api' 'v1'")
    r.execute("VAULT ROTATE 'api' 'v2'")
    row = r.execute("VAULT HISTORY 'api'").rows[0]
    assert row["prior_versions"] == 1
    assert r.execute("VAULT GET 'api'").value == "v2"
    r.execute("VAULT ROLLBACK 'api'")
    assert r.execute("VAULT GET 'api'").value == "v1"
    assert r.execute("VAULT HISTORY 'api'").rows[0][
        "prior_versions"] == 0
    log = r.execute("VAULT AUDIT 5").rows
    assert log and all("action" in e or "op" in e for e in log)
