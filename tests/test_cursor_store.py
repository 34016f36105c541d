"""Cursor store: TTL expiry, LRU eviction, cleanup, router integration.

Mirrors the reference's cursor_store.rs / cursor.rs test families
(expiry boundary, touch-extends-life, capacity eviction, cleanup count).
"""
import time

import pytest

from neumann_tpu.router.cursor_store import (
    CursorCapacityExceeded,
    CursorExpired,
    CursorNotFound,
    CursorState,
    CursorStore,
    CursorStoreConfig,
)


def make_store(**kw):
    return CursorStore(CursorStoreConfig(**kw))


def test_insert_get_roundtrip():
    s = make_store()
    c = s.new_cursor("SELECT * FROM t", list(range(10)), page_size=3)
    got = s.get(c.id)
    assert got.rows == list(range(10))
    assert got.total_count == 10
    assert len(s) == 1


def test_get_unknown_raises():
    s = make_store()
    with pytest.raises(CursorNotFound):
        s.get("cur-nope")


def test_expired_cursor_removed_on_get():
    s = make_store(default_ttl=0.05)
    c = s.new_cursor("q", [1, 2, 3], page_size=1)
    time.sleep(0.12)
    with pytest.raises(CursorExpired):
        s.get(c.id)
    assert len(s) == 0


def test_touch_slides_expiry():
    s = make_store(default_ttl=0.25)
    c = s.new_cursor("q", [1, 2, 3], page_size=1)
    for _ in range(4):
        time.sleep(0.1)
        s.get(c.id)  # touch keeps it alive past the original deadline
    assert s.get(c.id).id == c.id


def test_ttl_clamped_to_max():
    s = make_store(default_ttl=10.0, max_ttl=20.0)
    c = s.new_cursor("q", [1], page_size=1, ttl=9999.0)
    assert c.ttl == 20.0


def test_lru_eviction_at_capacity():
    s = make_store(max_cursors=3)
    c1 = s.new_cursor("q1", [1], 1)
    time.sleep(0.01)
    c2 = s.new_cursor("q2", [2], 1)
    time.sleep(0.01)
    c3 = s.new_cursor("q3", [3], 1)
    s.get(c1.id)  # refresh c1 -> c2 is now LRU
    c4 = s.new_cursor("q4", [4], 1)
    assert len(s) == 3
    with pytest.raises(CursorNotFound):
        s.get(c2.id)
    for c in (c1, c3, c4):
        assert s.get(c.id).id == c.id


def test_capacity_error_when_unevictable():
    s = make_store(max_cursors=0)
    with pytest.raises(CursorCapacityExceeded):
        s.new_cursor("q", [1], 1)


def test_cleanup_expired_counts():
    s = make_store(default_ttl=0.05)
    for i in range(5):
        s.new_cursor(f"q{i}", [i], 1)
    live = s.new_cursor("live", [9], 1, ttl=30.0)
    time.sleep(0.12)
    assert s.cleanup_expired() == 5
    assert len(s) == 1
    assert s.get(live.id).id == live.id


def test_background_sweeper():
    s = make_store(default_ttl=0.05, cleanup_interval=0.05)
    s.new_cursor("q", [1], 1)
    s.spawn_cleanup_thread()
    try:
        deadline = time.monotonic() + 2.0
        while len(s) and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(s) == 0
    finally:
        s.shutdown()
    assert s.is_shutdown()


def test_state_has_more():
    st = CursorState(id="x", query="q", rows=[1, 2, 3], page_size=2)
    assert st.has_more()
    st.pos = 3
    assert not st.has_more()


# -- router integration -------------------------------------------------------

def _router():
    from neumann_tpu.router.router import QueryRouter

    r = QueryRouter()
    r.execute("CREATE TABLE t (id INT)")
    for i in range(7):
        r.execute(f"INSERT INTO t VALUES ({i})")
    return r


def test_router_pagination_still_works():
    r = _router()
    page, cur = r.execute_paginated("SELECT * FROM t", 3)
    assert len(page) == 3 and cur is not None
    page2, cur2 = r.execute_paginated("SELECT * FROM t", 3, cursor=cur)
    assert len(page2) == 3 and cur2 == cur
    page3, cur3 = r.execute_paginated("SELECT * FROM t", 3, cursor=cur2)
    assert len(page3) == 1 and cur3 is None
    # cursor is gone after exhaustion
    assert r.close_cursor(cur) is False


def test_router_expired_cursor_raises_neumann_error():
    from neumann_tpu.utils.errors import NeumannError

    r = _router()
    _, cur = r.execute_paginated("SELECT * FROM t", 2, ttl=0.05)
    time.sleep(0.12)
    with pytest.raises(NeumannError, match="expired"):
        r.execute_paginated("SELECT * FROM t", 2, cursor=cur)


def test_router_unknown_cursor_raises_neumann_error():
    from neumann_tpu.utils.errors import NeumannError

    r = _router()
    with pytest.raises(NeumannError, match="unknown cursor"):
        r.execute_paginated("SELECT * FROM t", 2, cursor="cur-999")


def test_router_close_cursor():
    r = _router()
    _, cur = r.execute_paginated("SELECT * FROM t", 2)
    assert r.close_cursor(cur) is True
    assert r.close_cursor(cur) is False
