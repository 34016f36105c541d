"""Relational engine tests: schema, constraints, CRUD, indexes, joins,
aggregates, transactions — mirroring relational_engine's test strategy."""

import numpy as np
import pytest

from neumann_tpu.engines.condition import Condition as C
from neumann_tpu.engines.relational import (
    Column,
    ForeignKey,
    RelationalEngine,
)
from neumann_tpu.utils.errors import RelationalError


@pytest.fixture
def eng():
    e = RelationalEngine()
    e.create_table("users", [
        Column("name", "text", nullable=False),
        Column("email", "text", unique=True),
        Column("age", "int"),
        Column("score", "float"),
        Column("active", "bool"),
    ])
    return e


def seed(eng, n=5):
    for i in range(n):
        eng.insert("users", {
            "name": f"user{i}", "email": f"u{i}@x.com", "age": 20 + i,
            "score": i * 1.5, "active": i % 2 == 0})


def test_create_drop_describe(eng):
    assert eng.list_tables() == ["users"]
    with pytest.raises(RelationalError):
        eng.create_table("users", [Column("a", "int")])
    desc = eng.describe("users")
    assert desc[0]["name"] == "name" and not desc[0]["nullable"]
    assert eng.drop_table("users")
    assert not eng.table_exists("users")
    with pytest.raises(RelationalError):
        eng.describe("users")


def test_insert_select(eng):
    seed(eng)
    assert eng.row_count("users") == 5
    rows = eng.select("users", C.cmp("age", ">=", 22))
    assert {r["name"] for r in rows} == {"user2", "user3", "user4"}
    rows = eng.select("users", C.eq("name", "user1"), columns=["email"])
    assert rows == [{"email": "u1@x.com"}]
    # boolean + compound
    rows = eng.select("users", C.eq("active", True).and_(
        C.cmp("age", "<", 24)))
    assert {r["name"] for r in rows} == {"user0", "user2"}
    # LIKE / IN / NOT
    assert len(eng.select("users", C.like("email", "u%@x.com"))) == 5
    assert len(eng.select("users", C.in_("age", [20, 24]))) == 2
    assert len(eng.select("users", C.eq("name", "user0").not_())) == 4


def test_null_handling(eng):
    eng.insert("users", {"name": "nully"})
    rows = eng.select("users", C.is_null("age"))
    assert [r["name"] for r in rows] == ["nully"]
    assert eng.select("users", C.is_not_null("age")) == []
    # comparisons never match NULL
    assert eng.select("users", C.cmp("age", ">", 0)) == []


def test_order_limit_offset(eng):
    seed(eng)
    rows = eng.select("users", order_by=[("age", True)], limit=2)
    assert [r["name"] for r in rows] == ["user4", "user3"]
    rows = eng.select("users", order_by=[("age", False)], limit=2, offset=2)
    assert [r["name"] for r in rows] == ["user2", "user3"]
    # multi-column: active desc then age asc
    rows = eng.select("users", order_by=[("active", True), ("age", False)])
    assert [r["name"] for r in rows] == [
        "user0", "user2", "user4", "user1", "user3"]


def test_update_delete(eng):
    seed(eng)
    n = eng.update("users", C.eq("name", "user1"), {"age": 99})
    assert n == 1
    assert eng.select("users", C.eq("age", 99))[0]["name"] == "user1"
    n = eng.delete("users", C.cmp("age", "<", 23))
    assert n == 2  # user0 (20) and user2 (22); user1 is now 99
    assert eng.row_count("users") == 3


def test_constraints(eng):
    seed(eng, 2)
    with pytest.raises(RelationalError):
        eng.insert("users", {"name": None})  # NOT NULL
    with pytest.raises(RelationalError):
        eng.insert("users", {"name": "x", "email": "u0@x.com"})  # UNIQUE
    with pytest.raises(RelationalError):
        eng.insert("users", {"name": "x", "nosuch": 1})
    with pytest.raises(RelationalError):
        eng.insert("users", {"name": "x", "age": "notanint"})
    # unique allows multiple NULLs
    eng.insert("users", {"name": "a"})
    eng.insert("users", {"name": "b"})


def test_primary_key():
    e = RelationalEngine()
    e.create_table("t", [Column("pk", "int", primary_key=True),
                         Column("v", "text")])
    e.insert("t", {"pk": 1, "v": "a"})
    with pytest.raises(RelationalError):
        e.insert("t", {"pk": 1, "v": "b"})
    with pytest.raises(RelationalError):
        e.insert("t", {"pk": None, "v": "b"})
    with pytest.raises(RelationalError):
        e.create_table("t2", [Column("a", "int", primary_key=True),
                              Column("b", "int", primary_key=True)])


def test_foreign_keys():
    e = RelationalEngine()
    e.create_table("dept", [Column("code", "text", unique=True)])
    e.create_table("emp", [
        Column("name", "text"),
        Column("dept", "text",
               references=ForeignKey("dept", "code", "restrict"))])
    e.insert("dept", {"code": "eng"})
    e.insert("emp", {"name": "alice", "dept": "eng"})
    with pytest.raises(RelationalError):
        e.insert("emp", {"name": "bob", "dept": "nope"})
    # restrict blocks parent delete
    with pytest.raises(RelationalError):
        e.delete("dept", C.eq("code", "eng"))
    # drop_table restricted while referenced
    with pytest.raises(RelationalError):
        e.drop_table("dept")


def test_fk_cascade_and_set_null():
    e = RelationalEngine()
    e.create_table("p", [Column("k", "int", unique=True)])
    e.create_table("c1", [Column("pk", "int",
                                 references=ForeignKey("p", "k", "cascade"))])
    e.create_table("c2", [Column("pk", "int",
                                 references=ForeignKey("p", "k", "set_null"))])
    e.insert("p", {"k": 1})
    e.insert("c1", {"pk": 1})
    e.insert("c2", {"pk": 1})
    e.delete("p", C.eq("k", 1))
    assert e.row_count("c1") == 0
    rows = e.select("c2")
    assert len(rows) == 1 and rows[0]["pk"] is None


def test_indexes(eng):
    seed(eng, 100)
    eng.create_index("users", "age")
    eng.create_btree_index("users", "score")
    assert eng.list_indexes("users") == {
        "hash": ["age", "email"], "btree": ["score"]}
    rows = eng.select("users", C.eq("age", 50))
    assert len(rows) == 1 and rows[0]["name"] == "user30"
    rows = eng.select("users", C.cmp("score", ">=", 147.0))
    assert {r["name"] for r in rows} == {"user98", "user99"}
    # index stays correct through update/delete
    eng.update("users", C.eq("name", "user30"), {"age": 200})
    assert eng.select("users", C.eq("age", 50)) == []
    assert eng.select("users", C.eq("age", 200))[0]["name"] == "user30"
    eng.delete("users", C.eq("age", 200))
    assert eng.select("users", C.eq("age", 200)) == []
    assert eng.drop_index("users", "age")
    assert not eng.drop_index("users", "age")
    # unique constraint index can't be dropped
    eng.drop_index("users", "email")
    with pytest.raises(RelationalError):
        eng.insert("users", {"name": "dup", "email": "u1@x.com"})


def test_select_by_id(eng):
    seed(eng, 3)
    row = eng.select("users", C.eq("_id", 1))
    assert row[0]["name"] == "user1"
    assert eng.get_row("users", 2)["name"] == "user2"
    assert eng.get_row("users", 99) is None


def test_aggregates(eng):
    seed(eng, 10)
    assert eng.count("users") == 10
    assert eng.count("users", C.eq("active", True)) == 5
    assert eng.sum_column("users", "age") == sum(20 + i for i in range(10))
    assert eng.avg_column("users", "age") == pytest.approx(24.5)
    assert eng.min_column("users", "age") == 20
    assert eng.max_column("users", "age") == 29
    assert eng.avg_column("users", "age", C.eq("name", "zzz")) is None
    with pytest.raises(RelationalError):
        eng.sum_column("users", "name")


def test_group_by_having(eng):
    seed(eng, 10)
    out = eng.group_by(
        "users", ["active"],
        [("count", "", "n"), ("avg", "age", "avg_age")],
        having=C.cmp("n", ">", 0))
    assert len(out) == 2
    by_active = {r["active"]: r for r in out}
    assert by_active[True]["n"] == 5
    assert by_active[True]["avg_age"] == pytest.approx(24.0)
    assert by_active[False]["avg_age"] == pytest.approx(25.0)
    out2 = eng.group_by("users", ["active"], [("count", "", "n")],
                        having=C.cmp("n", ">", 99))
    assert out2 == []


def test_joins():
    e = RelationalEngine()
    e.create_table("a", [Column("k", "int"), Column("x", "text")])
    e.create_table("b", [Column("k", "int"), Column("y", "text")])
    e.insert("a", {"k": 1, "x": "a1"})
    e.insert("a", {"k": 2, "x": "a2"})
    e.insert("b", {"k": 2, "y": "b2"})
    e.insert("b", {"k": 3, "y": "b3"})
    inner = e.join("a", "b", "k", "k", "inner")
    assert len(inner) == 1 and inner[0]["a.x"] == "a2" \
        and inner[0]["b.y"] == "b2"
    left = e.join("a", "b", "k", "k", "left")
    assert len(left) == 2
    assert any(r["b.y"] is None for r in left)
    right = e.join("a", "b", "k", "k", "right")
    assert len(right) == 2 and any(r["a.x"] is None for r in right)
    full = e.join("a", "b", "k", "k", "full")
    assert len(full) == 3
    cross = e.join("a", "b", "k", "k", "cross")
    assert len(cross) == 4
    nat = e.natural_join("a", "b")
    assert len(nat) == 1 and nat[0]["a.k"] == 2


def test_transactions(eng):
    seed(eng, 2)
    tx = eng.begin_transaction()
    eng.tx_insert(tx, "users", {"name": "txuser", "email": "tx@x.com"})
    eng.tx_update(tx, "users", C.eq("name", "user0"), {"age": 55})
    # read-your-writes inside tx
    rows = eng.tx_select(tx, "users")
    assert {r["name"] for r in rows} == {"user0", "user1", "txuser"}
    assert [r for r in rows if r["name"] == "user0"][0]["age"] == 55
    # not visible outside before commit
    assert eng.row_count("users") == 2
    assert eng.select("users", C.eq("age", 55)) == []
    eng.commit(tx)
    assert eng.row_count("users") == 3
    assert eng.select("users", C.eq("age", 55))[0]["name"] == "user0"
    with pytest.raises(RelationalError):
        eng.commit(tx)  # gone


def test_transaction_rollback(eng):
    seed(eng, 1)
    tx = eng.begin_transaction()
    eng.tx_delete(tx, "users", None)
    eng.rollback(tx)
    assert eng.row_count("users") == 1


def test_transaction_atomic_failure(eng):
    seed(eng, 2)
    tx = eng.begin_transaction()
    eng.tx_insert(tx, "users", {"name": "ok", "email": "new@x.com"})
    eng.tx_insert(tx, "users", {"name": "dup", "email": "u0@x.com"})
    with pytest.raises(RelationalError):
        eng.commit(tx)
    # first insert rolled back too
    assert eng.row_count("users") == 2
    assert eng.select("users", C.eq("name", "ok")) == []


def test_select_columnar(eng):
    seed(eng, 4)
    cols = eng.select_columnar("users", C.cmp("age", ">=", 22),
                               columns=["age", "name"])
    np.testing.assert_array_equal(cols["age"], [22, 23])
    assert list(cols["name"]) == ["user2", "user3"]
    assert list(cols["_id"]) == [2, 3]


def test_selection_bitmap(eng):
    seed(eng, 4)
    mask = eng.selection_bitmap("users", C.eq("active", True))
    assert mask[0] and mask[2] and not mask[1] and not mask[3]


def test_vector_column():
    e = RelationalEngine()
    e.create_table("docs", [Column("title", "text"),
                            Column("emb", "vector")])
    e.insert("docs", {"title": "a", "emb": [1.0, 2.0]})
    row = e.select("docs")[0]
    np.testing.assert_allclose(row["emb"], [1.0, 2.0])


def test_query_timeout():
    import time

    eng = RelationalEngine(query_timeout_s=0.0)  # disabled by default
    eng.create_table("t", [Column("v", "int")])
    for i in range(100):
        eng.insert("t", {"v": i})
    assert len(eng.select("t")) == 100
    # explicit zero-ish timeout trips on a scan
    with pytest.raises(RelationalError):
        eng.select("t", timeout_s=-1.0)


# --------------------------------------------- mutation-hardening units

def test_btree_range_boundary_strictness():
    """Indexed < / <= / > / >= must respect boundary in/exclusion
    exactly (mutation-found gap in the btree fast path)."""
    eng = RelationalEngine()
    eng.create_table("b", [Column("v", "int")])
    eng.create_btree_index("b", "v")
    for v in (1, 2, 3, 4, 5):
        eng.insert("b", {"v": v})
    got = lambda c: sorted(r["v"] for r in eng.select("b", c))
    assert got(C.cmp("v", "<", 3)) == [1, 2]
    assert got(C.cmp("v", "<=", 3)) == [1, 2, 3]
    assert got(C.cmp("v", ">", 3)) == [4, 5]
    assert got(C.cmp("v", ">=", 3)) == [3, 4, 5]


def test_foreign_key_to_row_id_zero():
    """_id 0 is a valid FK target (off-by-one mutation gap)."""
    eng = RelationalEngine()
    eng.create_table("parents", [Column("name", "text")])
    eng.create_table("kids", [
        Column("name", "text"),
        Column("parent", "int",
               references=ForeignKey("parents", "_id"))])
    eng.insert("parents", {"name": "p0"})  # row id 0
    eng.insert("kids", {"name": "k", "parent": 0})  # must be accepted
    assert eng.row_count("kids") == 1
    with pytest.raises(RelationalError):
        eng.insert("kids", {"name": "k2", "parent": 99})


def test_update_set_null_and_float_null_selects():
    eng = RelationalEngine()
    eng.create_table("n", [Column("x", "float"), Column("s", "text")])
    eng.insert("n", {"x": 1.5, "s": "a"})
    eng.update("n", C.eq("s", "a"), {"x": None})
    row = eng.select("n")[0]
    assert row["x"] is None          # nulled float reads back as NULL
    assert eng.count("n", C.is_null("x")) == 1
    eng.update("n", None, {"x": 2.5})
    assert eng.select("n")[0]["x"] == 2.5


def test_group_by_avg_min_max():
    eng = RelationalEngine()
    eng.create_table("g", [Column("grp", "text"), Column("v", "int")])
    for grp, v in (("a", 1), ("a", 3), ("b", 10)):
        eng.insert("g", {"grp": grp, "v": v})
    rows = eng.group_by("g", ["grp"], [("avg", "v", "avg_v"),
                                       ("min", "v", "min_v"),
                                       ("max", "v", "max_v")])
    by = {r["grp"]: r for r in rows}
    assert by["a"]["avg_v"] == 2.0 and by["a"]["min_v"] == 1
    assert by["a"]["max_v"] == 3 and by["b"]["avg_v"] == 10.0


def test_bulk_insert_fast_path_semantics():
    """Columnar bulk insert must match row-by-row semantics exactly:
    NULLs, bools in int columns, float-for-int rejection, text/vector
    columns, unknown-column errors."""
    eng = RelationalEngine()
    eng.create_table("b", [Column("i", "int"), Column("f", "float"),
                           Column("t", "text"), Column("bl", "bool")])
    ids = eng.insert_many("b", [
        {"i": 1, "f": 1.5, "t": "x", "bl": True},
        {"i": True, "f": 2, "t": None, "bl": False},
        {"i": None, "f": None, "t": "z", "bl": None},
    ])
    assert ids == [0, 1, 2]
    rows = eng.select("b", None)
    assert rows[1]["i"] == 1 and rows[1]["f"] == 2.0
    assert rows[1]["t"] is None and rows[2]["i"] is None
    # non-integral float for an int column: falls back and raises
    with pytest.raises(RelationalError):
        eng.insert_many("b", [{"i": 2.5}])
    with pytest.raises(RelationalError):
        eng.insert_many("b", [{"nope": 1}])
    assert eng.row_count("b") == 3
    # constraint tables never take the bulk path: PK duplicates raise
    eng.create_table("c", [Column("k", "int", primary_key=True)])
    eng.insert_many("c", [{"k": 1}, {"k": 2}])
    with pytest.raises(RelationalError):
        eng.insert_many("c", [{"k": 3}, {"k": 1}])


def test_self_join_aliases_right_side(eng):
    """Self-joins disambiguate the right side as `name:2` (merged-dict
    keys must not collide; the duplicate keys previously corrupted the
    native materializer's run memo — a use-after-free)."""
    seed(eng, 6)
    out = eng.join("users", "users", "age", "age")
    assert out, "self-join produced nothing"
    row = out[0]
    left_keys = {k for k in row if k.startswith("users.")}
    right_keys = {k for k in row if k.startswith("users:2.")}
    assert left_keys and right_keys
    # every pair matches on the join key and survives materialization
    for r in out:
        assert r["users.age"] == r["users:2.age"]
    # reflexive pairs are present (each row matches itself)
    ids = {(r["users._id"], r["users:2._id"]) for r in out}
    assert all((i, i) in ids for i in {p[0] for p in ids})
