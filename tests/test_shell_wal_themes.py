"""Shell command WAL (replay-on-start) + themed output.

Reference parity: neumann_shell/src/wal.rs (statement WAL activated by
LOAD, truncated by SAVE, strict/recover replay) and src/output/
(per-result-type themed formatters).
"""

import io

import pytest

from neumann_tpu.router import QueryResult
from neumann_tpu.shell import Shell
from neumann_tpu.shell.cmdwal import CommandWal, is_write_command
from neumann_tpu.shell.output import THEMES, TableBuilder, format_result


@pytest.fixture
def sh():
    return Shell(stdout=io.StringIO())


# ------------------------------------------------------------- cmd WAL

def test_load_activates_and_save_truncates(sh, tmp_path):
    snap = str(tmp_path / "s.ntpu")
    sh.execute("CREATE TABLE t (v INT)")
    sh.execute(f"save '{snap}'")
    assert sh.cmd_wal is None          # WAL activates on LOAD
    assert "command WAL: inactive" in sh.execute("wal status")

    out = sh.execute(f"load '{snap}'")
    assert "loaded" in out
    assert sh.cmd_wal is not None
    sh.execute("INSERT INTO t VALUES (1)")
    sh.execute("SELECT * FROM t")                 # read: not logged
    cmds = CommandWal.read_commands(snap + ".log")
    assert cmds == ["INSERT INTO t VALUES (1)"]
    assert "command WAL" in sh.execute("wal status")

    sh.execute(f"save '{snap}'")                  # truncates
    assert CommandWal.read_commands(snap + ".log") == []


def test_crash_replay_on_load(tmp_path):
    snap = str(tmp_path / "s.ntpu")
    sh1 = Shell(stdout=io.StringIO())
    sh1.execute("CREATE TABLE t (v INT)")
    sh1.execute(f"save '{snap}'")
    sh1.execute(f"load '{snap}'")
    sh1.execute("INSERT INTO t VALUES (7)")
    sh1.execute("INSERT INTO t VALUES (8)")
    # "crash": new shell, no explicit replay of anything
    sh2 = Shell(stdout=io.StringIO())
    out = sh2.execute(f"load '{snap}'")
    assert "replayed 2 command(s)" in out
    got = sh2.execute("SELECT v FROM t ORDER BY v")
    assert "7" in got and "8" in got


def test_replay_strict_vs_recover(tmp_path):
    snap = str(tmp_path / "s.ntpu")
    sh1 = Shell(stdout=io.StringIO())
    sh1.execute("CREATE TABLE t (v INT)")
    sh1.execute(f"save '{snap}'")
    sh1.execute(f"load '{snap}'")
    sh1.execute("INSERT INTO t VALUES (7)")
    # corrupt a WAL line by hand
    with open(snap + ".log", "a", encoding="utf-8") as f:
        f.write("INSERT INTO missing VALUES (1)\n")
        f.write("INSERT INTO t VALUES (9)\n")

    strict = Shell(stdout=io.StringIO())
    out = strict.execute(f"load '{snap}'")
    assert "error" in out.lower() or "failed" in out.lower()

    rec = Shell(stdout=io.StringIO(), wal_recovery="recover")
    out = rec.execute(f"load '{snap}'")
    assert "replayed 2" in out and "skipped 1" in out
    assert "9" in rec.execute("SELECT v FROM t WHERE v = 9")


def test_multiline_statement_one_wal_line(tmp_path):
    snap = str(tmp_path / "s.ntpu")
    s = Shell(stdout=io.StringIO())
    s.execute("CREATE TABLE t (v INT)")
    s.execute(f"save '{snap}'")
    s.execute(f"load '{snap}'")
    s.execute("INSERT INTO t\nVALUES (1)")
    cmds = CommandWal.read_commands(snap + ".log")
    assert cmds == ["INSERT INTO t VALUES (1)"]


def test_is_write_command_classification():
    assert is_write_command("INSERT INTO t VALUES (1)")
    assert is_write_command("NODE CREATE 'a' LABEL 'x'")
    assert is_write_command("EMBED STORE 'k' [1.0]")
    assert is_write_command("VAULT SET 'k' 'v'")
    assert is_write_command("BLOB PUT 'k' 'x'")
    assert not is_write_command("SELECT * FROM t")
    assert not is_write_command("NODE GET 'a'")
    assert not is_write_command("EMBED GET 'k'")
    assert not is_write_command("VAULT GET 'k'")
    assert not is_write_command("SIMILAR 'k' TOP 5")
    assert not is_write_command("")
    # multi-statement scripts: ANY writing sub-statement makes the
    # script a write (it used to be classified by the first keyword,
    # silently dropping read-led scripts' writes from crash replay)
    assert is_write_command("SELECT * FROM t; INSERT INTO t VALUES (1)")
    assert not is_write_command("SELECT * FROM t; SELECT v FROM t")
    assert not is_write_command("SELECT 'a;INSERT fake' FROM t")
    # MATCH-led Cypher write clauses
    assert is_write_command("MATCH (a) SET a.x = 1")
    assert is_write_command("MATCH (a)-[r]->(b) DELETE r")
    assert is_write_command("MATCH (a) MERGE (a)-[:KNOWS]->(a)")
    assert not is_write_command("MATCH (a) RETURN a")
    assert not is_write_command("MATCH (a) WHERE a.x = 1 RETURN a")


def test_read_led_script_writes_reach_wal(tmp_path):
    """The review repro: a script whose FIRST statement is a read must
    still land in the command WAL when a later statement writes."""
    snap = str(tmp_path / "s.ntpu")
    sh1 = Shell(stdout=io.StringIO())
    sh1.execute("CREATE TABLE t (v INT)")
    sh1.execute(f"save '{snap}'")
    sh1.execute(f"load '{snap}'")
    out = sh1.execute("SELECT * FROM t; INSERT INTO t VALUES (42)")
    assert "error" not in out.lower()
    assert CommandWal.read_commands(snap + ".log") != []
    sh2 = Shell(stdout=io.StringIO())
    sh2.execute(f"load '{snap}'")
    assert "42" in sh2.execute("SELECT v FROM t")


# -------------------------------------------------------------- themes

def test_themed_rows_unicode_box():
    t = THEMES["dark"]
    res = QueryResult.of_rows([{"a": 1, "b": None}])
    out = format_result(res, t)
    assert "┌" in out and "│" in out and "┘" in out
    assert "NULL" in out and "(1 row(s))" in out


def test_themed_similar_score_bar():
    t = THEMES["dark"]
    res = QueryResult("similar", results=[
        {"key": "k1", "score": 0.99}, {"key": "k2", "score": 0.42}])
    out = format_result(res, t)
    assert "▰" in out and "(2 hit(s))" in out and "0.990000" in out


def test_themed_path_arrows():
    t = THEMES["minimal"]
    res = QueryResult("value",
                      value={"path": ["a", "b", "c"], "cost": 2.5})
    out = format_result(res, t)
    assert "a → b → c" in out.replace("\x1b", "") or "a" in out
    assert "cost 2.5" in out


def test_themed_edges_icons():
    t = THEMES["minimal"]
    res = QueryResult.of_rows([{"src": "a", "dst": "b",
                                "label": "knows"}])
    out = format_result(res, t)
    assert "●" in out and "→" in out and "knows" in out


def test_plain_theme_stays_ascii():
    t = THEMES["plain"]
    res = QueryResult.of_rows([{"a": 1}])
    out = format_result(res, t)
    assert "┌" not in out and "\x1b" not in out


def test_table_builder_ragged_rows():
    tb = TableBuilder(THEMES["plain"])
    tb.add_row({"a": 1})
    tb.add_row({"b": 2})
    out = tb.build()
    assert "a" in out and "b" in out


def test_shell_uses_plain_theme_on_non_tty(sh):
    sh.execute("CREATE TABLE t (v INT)")
    sh.execute("INSERT INTO t VALUES (1)")
    out = sh.execute("SELECT * FROM t")
    assert "\x1b" not in out and "+" in out


def test_shell_theme_flag(tmp_path):
    s = Shell(stdout=io.StringIO(), theme="dark")
    s.execute("CREATE TABLE t (v INT)")
    s.execute("INSERT INTO t VALUES (1)")
    out = s.execute("SELECT * FROM t")
    assert "┌" in out
