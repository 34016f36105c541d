"""Cold-branch coverage push, part 3: Cypher grammar variants and the
shell REPL loop / script / WAL-command branches."""

import io

import pytest

from neumann_tpu.router import QueryRouter
from neumann_tpu.shell.shell import Shell, _split_script, format_table


@pytest.fixture()
def router():
    return QueryRouter()


def _graph(router):
    router.execute("CREATE (a:Person { name: 'Ann', age: 30 })")
    router.execute("CREATE (b:Person { name: 'Bob', age: 40 })")
    router.execute("CREATE (c:City { name: 'Rome' })")
    router.execute(
        "MATCH (a:Person { name: 'Ann' }), (c:City) "
        "CREATE (a)-[:LIVES_IN]->(c)")
    return router


# ----------------------------------------------------------------- cypher

def test_cypher_literals_negative_bool_null(router):
    router.execute("CREATE (x:T { a: -5, b: TRUE, c: NULL })")
    rows = router.execute(
        "MATCH (x:T) RETURN x.a, x.b").rows
    assert rows[0]["x.a"] == -5
    assert rows[0]["x.b"] is True


def test_cypher_count_star_and_var(router):
    _graph(router)
    rows = router.execute(
        "MATCH (p:Person) RETURN count(*)").rows
    key = next(iter(rows[0]))
    assert rows[0][key] == 2
    rows = router.execute(
        "MATCH (p:Person) RETURN count(p)").rows
    key = next(iter(rows[0]))
    assert rows[0][key] == 2


def test_cypher_variable_hops(router):
    _graph(router)
    # *..N and *N forms both parse and traverse
    rows = router.execute(
        "MATCH (a:Person)-[*..2]->(c:City) RETURN c.name").rows
    assert any(r.get("c.name") == "Rome" for r in rows)
    rows = router.execute(
        "MATCH (a:Person)-[*2]->(x) RETURN x").rows
    assert isinstance(rows, list)


def test_cypher_where_or_not_paren_null(router):
    _graph(router)
    rows = router.execute(
        "MATCH (p:Person) WHERE (p.age > 35) OR NOT (p.age > 20) "
        "RETURN p.name").rows
    assert {r["p.name"] for r in rows} == {"Bob"}
    rows = router.execute(
        "MATCH (p:Person) WHERE p.nickname IS NULL "
        "RETURN p.name").rows
    assert len(rows) == 2
    rows = router.execute(
        "MATCH (p:Person) WHERE p.age IS NOT NULL "
        "RETURN p.name").rows
    assert len(rows) == 2


def test_cypher_optional_match(router):
    _graph(router)
    rows = router.execute(
        "OPTIONAL MATCH (p:Person)-[:KNOWS]->(q) "
        "RETURN p.name, q").rows
    assert isinstance(rows, list)


def test_cypher_match_create_and_delete(router):
    _graph(router)
    router.execute(
        "MATCH (a:Person { name: 'Ann' }), "
        "(b:Person { name: 'Bob' }) CREATE (a)-[:KNOWS]->(b)")
    rows = router.execute(
        "MATCH (a)-[:KNOWS]->(b) RETURN b.name").rows
    assert rows and rows[0]["b.name"] == "Bob"
    router.execute(
        "MATCH (c:City { name: 'Rome' }) DETACH DELETE c")
    rows = router.execute("MATCH (c:City) RETURN c.name").rows
    assert rows == []


def test_cypher_rel_props_filter(router):
    _graph(router)
    router.execute(
        "MATCH (a:Person { name: 'Ann' }), "
        "(b:Person { name: 'Bob' }) CREATE (a)-[:RATED { stars: 5 }]->(b)")
    rows = router.execute(
        "MATCH (a)-[:RATED { stars: 5 }]->(b) RETURN b.name").rows
    assert rows and rows[0]["b.name"] == "Bob"
    rows = router.execute(
        "MATCH (a)-[:RATED { stars: 1 }]->(b) RETURN b.name").rows
    assert rows == []


def test_cypher_multiple_patterns(router):
    _graph(router)
    rows = router.execute(
        "MATCH (a:Person { name: 'Ann' }), (b:Person) "
        "WHERE b.age > 35 RETURN a.name, b.name").rows
    assert rows and rows[0]["b.name"] == "Bob"


# ------------------------------------------------------------------ shell

def test_split_script_semicolons_and_tail():
    stmts = _split_script(
        "CREATE TABLE a (x INT);\n-- comment\nINSERT INTO a VALUES (1)")
    assert stmts == ["CREATE TABLE a (x INT)",
                     "INSERT INTO a VALUES (1)"]


def test_format_table_bytes_value():
    out = format_table([{"k": b"\x00\x01\x02"}])
    assert "3 bytes" in out


def test_shell_clear_help_and_internal_error():
    sh = Shell()
    assert "\033[2J" in sh.execute("clear")
    assert sh.execute("help")

    # engine bug surfaces as "internal error", not a traceback
    def boom(q):
        raise RuntimeError("kaput")

    sh.router.execute = boom
    out = sh.execute("SELECT 1")
    assert "internal error: RuntimeError: kaput" in out


def test_shell_wal_commands_disabled():
    sh = Shell()
    assert "disabled" in sh.execute("wal truncate")


def test_shell_script_run(tmp_path):
    p = tmp_path / "s.sql"
    p.write_text("CREATE TABLE st (x INT);\nINSERT INTO st VALUES (7);")
    sh = Shell()
    out = sh.execute(f"\\i {p}")
    assert "created" in out or "inserted" in out
    # script with no output
    p2 = tmp_path / "empty.sql"
    p2.write_text("-- nothing\n")
    out = sh.execute(f"\\i {p2}")
    assert "no output" in out


def test_shell_run_repl_loop(monkeypatch):
    lines = iter(["CREATE TABLE r (x INT)", "exit"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    out = io.StringIO()
    sh = Shell(stdout=out)
    monkeypatch.setattr("builtins.input", fake_input)
    sh.run()
    text = out.getvalue()
    assert "created" in text
    assert "bye" in text


def test_shell_run_repl_eof_and_interrupt(monkeypatch):
    calls = {"n": 0}

    def fake_input(prompt=""):
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt
        raise EOFError

    out = io.StringIO()
    sh = Shell(stdout=out)
    monkeypatch.setattr("builtins.input", fake_input)
    sh.run()
    assert "bye" in out.getvalue()
    assert calls["n"] == 2


def test_shell_completer():
    sh = Shell()
    first = sh.complete("SEL", 0)
    assert first and first.upper().startswith("SEL")
    assert sh.complete("zzzznot", 0) is None
