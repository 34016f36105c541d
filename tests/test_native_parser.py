"""Native fast-path parser (native/parser_ext.cpp) differential tests.

Safety property: for EVERY statement the native parser accepts, its
AST must equal the pure-Python parser's AST (dataclass __eq__ compares
all fields recursively — Conditions included). Statements outside its
grammar must return None so the Python parser (and its canonical
ParseError messages) stays authoritative.
"""

import pytest

from neumann_tpu.lang.parser import _Parser, parse
from neumann_tpu.native import pyparser

ext = pyparser.load()
pytestmark = pytest.mark.skipif(ext is None, reason="no native toolchain")


COVERED = [
    # SELECT
    "SELECT name, score FROM users WHERE id = 42",
    "SELECT * FROM t",
    "select a from t where b = 1 order by a asc",
    "SELECT DISTINCT a FROM t WHERE x > 1.5 AND y < -3 OR NOT z = 'q''s'",
    "SELECT a AS b, COUNT(*) AS n FROM t WHERE c IN (1, 2.5, 'x', TRUE, "
    "NULL) ORDER BY a DESC NULLS FIRST, b LIMIT 10 OFFSET 5",
    "SELECT u.name FROM users WHERE u.age BETWEEN 18 AND 65 "
    "AND name LIKE 'a%'",
    "SELECT a FROM t WHERE b IS NOT NULL AND c IS NULL",
    "SELECT a FROM t WHERE NOT (x = 1 OR y != 2)",
    "SELECT a FROM t WHERE x <> 3",
    "SELECT SUM(x) FROM t",
    "SELECT MIN(a.b) AS lo FROM t",
    "SELECT a FROM t WHERE x NOT IN (1,2)",
    "SELECT a FROM t WHERE x NOT LIKE 'p%'",
    "SELECT a FROM t;",
    "SELECT a FROM t;;",
    "SELECT a FROM t LIMIT 5 OFFSET 2",
    "SELECT a FROM t OFFSET 2 LIMIT 5",
    "SELECT a FROM t WHERE v = [1.5, 2]",
    "SELECT a FROM t WHERE s = 'it''s'",
    "SELECT a FROM t WHERE f = 0.5",
    "SELECT a FROM t WHERE f = .5",
    "SELECT a FROM t WHERE f = 5.",
    "SELECT a FROM t WHERE f = 1e3",
    "SELECT a FROM t WHERE f = 0.5e-2",
    "SELECT a FROM t -- trailing comment",
    # INSERT
    "INSERT INTO users VALUES (1, 'alice', 3.5)",
    "INSERT INTO users (id, name) VALUES (1, 'a'), (2, 'b')",
    "INSERT INTO t VALUES (-5, [1.0, -2.5, 3], FALSE, NULL, bareword)",
    # SIMILAR
    "SIMILAR 'user:alice' TOP 10",
    "SIMILAR [0.1, 0.2] LIMIT 5 METRIC EUCLIDEAN IN docs "
    "CONNECTED TO 'e:1' WHERE score > 0.5",
    "SIMILAR 'k' METRIC WJACCARD",
    "SIMILAR 'k' METRIC ANGULAR",
    "SIMILAR 'k' METRIC GEODESIC",
    "SIMILAR 'k' METRIC JACCARD",
    "SIMILAR 'k' METRIC OVERLAP",
    "SIMILAR 'k'",
    # UPDATE / DELETE / EMBED
    "UPDATE t SET a = 5 WHERE b = 'v'",
    "UPDATE t SET a = 1, b = 'x', c = NULL, d = -2.5",
    "DELETE FROM t WHERE a < 10 AND b IS NOT NULL",
    "DELETE FROM t",
    "EMBED 'k1' [1.0, 2.0, 3.0]",
    "EMBED 'k1' [1.0] IN docs",
    "EMBED STORE 'k2' [0.5, -1]",
    "EMBED GET 'k1' IN docs",
    "EMBED DELETE 'k1'",
    # NODE CREATE / FIND
    "NODE CREATE person {name: 'bob'}",
    "NODE CREATE person",
    "NODE CREATE p {name: 'b', age: 30, w: [1.0, 2], ok: TRUE, n: NULL}",
    "FIND ENTITY WHERE age > 30 LIMIT 5",
    "FIND NODE person WHERE name = 'x'",
    "FIND ROWS FROM users WHERE id < 3",
    "FIND EDGE knows LIMIT 2",
    "FIND NODE SIMILAR TO 'k' CONNECTED TO 'c'",
    "FIND NODE SIMILAR TO [0.5, 1]",
]

FALLBACK = [
    "SELECT a FROM t JOIN u ON t.id = u.id",      # joins
    "SELECT a, b+1 FROM t",                       # expressions
    "SELECT a FROM t WHERE x = (SELECT y FROM u)",  # subquery
    "SELECT a FROM t GROUP BY a",                 # group by
    "SELECT a FROM t u WHERE u.x = 1",            # table alias
    "SELECT a FROM t WHERE a + b > 5",            # arithmetic LHS
    "SELECT a FROM t WHERE a = b + 1",            # arithmetic RHS
    "SELECT a FROM t WHERE EXISTS (SELECT b FROM u)",
    "SELECT a FROM t WHERE x = 1e",               # malformed number
    "INSERT INTO t SELECT a FROM u",              # insert-select
    "SIMILAR 'k' METRIC NOPE",                    # unknown metric
    "SELECT '名' FROM t",                     # non-ASCII
    "CREATE TABLE t (id INT)",                    # other statements
    "UPDATE t SET a = a + 1",            # expression RHS
    "EMBED BATCH [('k', [1.0])]",
    "EMBED BUILD INDEX",
    "NODE GET 5",
    "NODE LIST",
    "FIND PATH a -[e]-> b",
    "FIND NODE 'str'",
    "VAULT SET 'k' 'v'",
    "",
]


def test_covered_statements_match_python_ast():
    for src in COVERED:
        got = ext.parse(src)
        assert got is not None, f"native fell back on covered: {src!r}"
        want = _Parser(src).statement()
        assert got == want, f"divergence for {src!r}:\n  {got}\n  {want}"


def test_fallback_statements_return_none():
    for src in FALLBACK:
        assert ext.parse(src) is None, f"should fall back: {src!r}"


def test_parse_entrypoint_uses_native_and_matches():
    for src in COVERED:
        assert parse(src) == _Parser(src).statement(), src


def test_errors_still_raise_canonical_parse_errors():
    from neumann_tpu.utils.errors import ParseError

    for bad in ["SELECT", "SELECT FROM", "INSERT INTO", "SIMILAR",
                "SELECT a FROM t WHERE", "SELECT a FROM t WHERE x = 1e",
                "SELECT a FROM t trailing junk here"]:
        with pytest.raises(ParseError):
            parse(bad)


def test_grammar_fuzz_differential():
    """Random statements from the grammar fuzzer: wherever the native
    parser answers, it must agree with the Python parser."""
    from tests.test_grammar_fuzz import Gen

    covered = 0
    for seed in range(6):
        g = Gen(seed)
        for _ in range(150):
            src = g.statement()
            try:
                want = _Parser(src).statement()
            except Exception:
                # native must not accept what Python rejects
                assert ext.parse(src) is None, src
                continue
            got = ext.parse(src)
            if got is not None:
                covered += 1
                assert got == want, \
                    f"divergence for {src!r}:\n  {got}\n  {want}"
    assert covered > 50          # the fast path actually fires


def test_mutation_fuzz_no_crash_no_divergence():
    """Byte-mutated statements: native must never crash, and must
    either fall back or agree."""
    import random

    rng = random.Random(7)
    seeds = COVERED + FALLBACK
    for _ in range(3000):
        s = list(rng.choice(seeds))
        for _ in range(rng.randint(1, 4)):
            if not s:
                break
            i = rng.randrange(len(s))
            r = rng.random()
            if r < 0.4:
                s[i] = chr(rng.randint(32, 126))
            elif r < 0.7:
                del s[i]
            else:
                s.insert(i, chr(rng.randint(32, 126)))
        src = "".join(s)
        got = ext.parse(src)
        if got is None:
            continue
        try:
            want = _Parser(src).statement()
        except Exception as e:
            raise AssertionError(
                f"native accepted what Python rejects: {src!r} "
                f"-> {got} (python: {e})")
        assert got == want, f"divergence for {src!r}"


def test_parse_full_zero_frame_binding():
    """When the extension is built, lang.parser.parse IS the C
    parse_full entry (no Python wrapper frame); uncovered grammar and
    syntax errors route through the registered Python fallback."""
    from neumann_tpu.lang import parser as P

    if not pyparser.built():
        pytest.skip("extension not built")
    assert P.parse.__name__ == "parse_full"
    # covered: C fast path
    assert type(P.parse("SELECT * FROM t")).__name__ == "Select"
    # uncovered grammar: C delegates to the Python parser
    assert type(P.parse("CREATE TABLE t (a INT)")).__name__ == \
        "CreateTable"
    # syntax error: the fallback's canonical ParseError surfaces
    with pytest.raises(Exception) as ei:
        P.parse("SELECT FROM WHERE")
    assert type(ei.value).__name__ == "ParseError"


def test_identifier_cache_value_correctness():
    """The C identifier cache is value-keyed: colliding/evicting names
    still parse to the right strings, and near-identical names never
    alias each other."""
    if ext is None:
        pytest.skip("extension not built")
    names = [f"col{i}" for i in range(2000)] + ["a", "ab", "ba", "a"]
    for nm in names:
        s = ext.parse(f"SELECT {nm} FROM {nm}2")
        assert s is not None
        assert s.items[0].expr == nm
        assert s.table == nm + "2"
