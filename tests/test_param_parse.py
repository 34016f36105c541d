"""Parameterized statement templates (lang/parser.parse_param).

A cold statement whose SHAPE was seen before skips the parser: its
literals substitute along the cached template's literal spine. Safety
property: parse_param(src) must be structurally identical to
parse(src) for EVERY statement — verified here differentially against
the grammar fuzzer's generator and a hand-picked edge corpus."""

import time

import pytest

from neumann_tpu.lang.parser import (
    _template_cache,
    parse,
    parse_param,
)

EDGE_CORPUS = [
    "INSERT INTO t VALUES (1, 'a')",
    "INSERT INTO t VALUES (2, 'b')",
    "INSERT INTO t VALUES (-5, 'x')",          # negative: falls back
    "INSERT INTO t VALUES (1.5, 'y')",         # float vs int shape
    "INSERT INTO t (a, b) VALUES (3, 'z')",
    "SELECT * FROM t WHERE id = 7 LIMIT 3",
    "SELECT * FROM t WHERE id = 8 LIMIT 4",
    "SELECT a, b FROM t WHERE x >= 1.25 AND y != 'q' ORDER BY a LIMIT 9",
    "UPDATE t SET a = 5 WHERE b = 'v'",
    "DELETE FROM t WHERE a < 10",
    "EMBED 'k1' [1.0, 2.0, 3.0]",
    "EMBED 'k2' [4.0, 5.0, 6.0]",
    "SIMILAR 'k1' TOP 5",
    "SIMILAR 'k2' TOP 7 METRIC EUCLIDEAN",
    "SIMILAR [0.5, 0.25] TOP 2",
    "NODE CREATE person {name: 'ada', age: 36}",
    "NODE CREATE person {name: 'bob', age: 37}",
    "EDGE CREATE 1 -> 2 knows",
    "FIND ENTITY WHERE name = 'ada' LIMIT 5",
    "CREATE TABLE t2 (a INT, b TEXT)",
    "SELECT COUNT(*) FROM t",
    "SELECT CASE WHEN a > 1 THEN 'hi' ELSE 'lo' END AS c FROM t",
    "VAULT SET 'api' 'secret-value'",
    "CACHE GET 'prompt'",
    "SELECT * FROM t WHERE s = 'it''s quoted'",
    "SELECT * FROM t WHERE f = 1e3",
    "SELECT * FROM t WHERE f = 0.5e-2",
]


def test_edge_corpus_differential():
    for src in EDGE_CORPUS:
        a = repr(parse(src))
        b = repr(parse_param(src))
        assert a == b, f"divergence for {src!r}:\n  {a}\n  {b}"
        # second pass goes through the compiled template
        c = repr(parse_param(src))
        assert a == c, f"template divergence for {src!r}"


def test_grammar_fuzz_differential():
    from tests.test_grammar_fuzz import Gen

    for seed in range(4):
        g = Gen(seed)
        for _ in range(120):
            src = g.statement()
            try:
                want = repr(parse(src))
            except Exception as e:
                with pytest.raises(type(e)):
                    parse_param(src)
                continue
            assert repr(parse_param(src)) == want, src
            assert repr(parse_param(src)) == want, src  # templated


def test_template_reuse_and_type_keys():
    # expression-SET UPDATEs are outside the native fast-path parser's
    # grammar, so they exercise the template machinery (native-covered
    # statements skip templates entirely — a direct parse is faster)
    _template_cache.clear()
    parse_param("UPDATE zz1 SET a = a * 1 WHERE b = 9")
    n1 = len(_template_cache)
    parse_param("UPDATE zz1 SET a = a * 2 WHERE b = 8")  # same shape
    assert len(_template_cache) == n1
    parse_param("UPDATE zz1 SET a = a * 2.5 WHERE b = 8")  # float: new
    assert len(_template_cache) == n1 + 1
    parse_param("UPDATE zz1 SET a = a * 2 WHERE b = 's'")  # string: new
    assert len(_template_cache) == n1 + 2


def test_substitution_not_frozen():
    """A template built from statement A must never leak A's values
    into statement B of the same shape."""
    _template_cache.clear()
    for i in range(20):
        s = parse_param(f"INSERT INTO zz2 VALUES ({i}, 'v{i}')")
        assert s.rows[0][0] == i and s.rows[0][1] == f"v{i}"


def test_cold_parse_speedup():
    """Distinct-literal workloads must beat the PYTHON parser
    substantially — via the template spine for statements outside the
    native grammar (UPDATE), and via the native parser for statements
    inside it (both routes measured against the pure-Python parser)."""
    from neumann_tpu.lang.parser import _Parser

    def measure(stmts):
        # best-of-3 each way: the suite runs on a noisy shared VM
        t_full = t_param = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for s in stmts:
                _Parser(s).statement()      # raw Python parse
            t_full = min(t_full, time.perf_counter() - t0)
            t0 = time.perf_counter()
            for s in stmts:
                parse_param(s)
            t_param = min(t_param, time.perf_counter() - t0)
        return t_full, t_param

    stmts = [f"UPDATE bench SET a = a + {i}, b = 'name{i}' "
             f"WHERE id = {i}" for i in range(1000)]
    for s in stmts[:5]:
        parse_param(s)
    t_full, t_param = measure(stmts)
    assert t_param * 2 < t_full, \
        f"no speedup: full={t_full*1e6/1000:.1f}us " \
        f"param={t_param*1e6/1000:.1f}us"

    inserts = [f"INSERT INTO bench VALUES ({i}, 'name{i}', {i % 7})"
               for i in range(1000)]
    parse_param(inserts[0])
    t_full, t_param = measure(inserts)
    assert t_param * 2 < t_full, \
        f"no speedup: full={t_full*1e6/1000:.1f}us " \
        f"param={t_param*1e6/1000:.1f}us"
