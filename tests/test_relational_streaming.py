"""StreamingCursor: batch-fetching iteration (relational cursor.rs)."""
import pytest

from neumann_tpu.engines.relational import (Column, RelationalEngine,
                                            RelationalError)
from neumann_tpu.engines.condition import Condition


def make_engine(n=250):
    e = RelationalEngine()
    e.create_table("t", [Column("id", "int"), Column("name", "text")])
    for i in range(n):
        e.insert("t", {"id": i, "name": f"r{i}"})
    return e


def test_streams_all_rows_in_batches():
    e = make_engine(250)
    cur = e.select_streaming("t", batch_size=64)
    rows = list(cur)
    assert len(rows) == 250
    assert [r["id"] for r in rows[:3]] == [0, 1, 2]
    assert cur.rows_yielded == 250


def test_condition_filtering():
    e = make_engine(100)
    cur = e.select_streaming("t", Condition.cmp("id", "<", 10), batch_size=3)
    assert [r["id"] for r in cur] == list(range(10))


def test_max_rows_caps_yield():
    e = make_engine(100)
    cur = e.select_streaming("t", batch_size=7, max_rows=20)
    assert len(list(cur)) == 20


def test_batches_iteration():
    e = make_engine(50)
    sizes = [len(b) for b in e.select_streaming("t", batch_size=20).batches()]
    assert sizes == [20, 20, 10]


def test_zero_batch_size_defaults():
    e = make_engine(5)
    cur = e.select_streaming("t", batch_size=0)
    assert cur.batch_size == 1000
    assert len(list(cur)) == 5


def test_unknown_table_raises_up_front():
    e = RelationalEngine()
    with pytest.raises(RelationalError):
        e.select_streaming("nope")


def test_empty_result():
    e = make_engine(10)
    assert list(e.select_streaming("t", Condition.cmp("id", ">", 99))) == []


def test_memory_bound_batches():
    """The cursor never holds more than one batch."""
    e = make_engine(1000)
    cur = e.select_streaming("t", batch_size=50)
    next(cur)
    assert len(cur._batch) == 50
