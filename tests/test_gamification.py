"""Gamification (achievements/XP/streaks) and the dashboard endpoints —
the web-admin layer the reference ships in src/gamification + src/web."""

import http.client
import json

import pytest

from neumann_tpu.server.gamification import (
    ACHIEVEMENTS,
    ProgressTracker,
    UserProgress,
    get_achievement,
    xp_for_level,
)


def test_catalog_integrity():
    ids = [a.id for a in ACHIEVEMENTS]
    assert len(set(ids)) == len(ids)
    for a in ACHIEVEMENTS:
        assert a.tier in ("bronze", "silver", "gold", "platinum")
        assert a.category in ("discovery", "performance", "mastery",
                              "dedication")
    assert get_achievement("first_query").name
    assert get_achievement("nope") is None


def test_xp_levels_monotonic():
    assert xp_for_level(1) == 0
    p = UserProgress()
    assert p.level == 1
    p.xp = xp_for_level(5)
    assert p.level == 5
    lp = p.level_progress()
    assert lp["into_level"] == 0 and lp["needed"] > 0


def test_unlock_awards_xp_once():
    p = UserProgress()
    gained = p.unlock("first_query")
    assert gained == 50
    assert p.unlock("first_query") == 0
    assert p.xp == 50


def test_streaks():
    p = UserProgress()
    for day in (10, 11, 12):
        p.update_streak(day)
    assert p.streak_days == 3 and "streak_3" in p.unlocked
    p.update_streak(20)     # gap resets
    assert p.streak_days == 1


def test_tracker_unlocks_from_activity():
    t = ProgressTracker()
    new = t.record("CreateTable", 5.0)
    assert "first_query" in new and "first_table" in new
    t.record("Similar", 0.5)
    t.record("EdgeCreate", 2.0)
    snap = t.progress
    assert {"first_vector", "first_graph", "sub_ms",
            "all_engines"} <= snap.unlocked
    for _ in range(100):
        t.record("Select", 1.5)
    assert "queries_100" in t.progress.unlocked
    t.record_embeddings(1500)
    assert "embeddings_1000" in t.progress.unlocked
    s = t.snapshot()
    assert s["level"] >= 2 and s["queries"] >= 100
    # hidden achievements stay hidden until unlocked
    assert all(a["id"] != "checkpointer" for a in s["achievements"])
    t.record("CheckpointRollback", 1.0)
    s2 = t.snapshot()
    assert any(a["id"] == "checkpointer" and a["unlocked"]
               for a in s2["achievements"])


@pytest.fixture()
def rest():
    from neumann_tpu.server.rest import RestServer

    srv = RestServer()
    srv.serve()
    yield srv
    srv.stop()


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r, body


def test_rest_achievements_and_viz(rest):
    conn = http.client.HTTPConnection("127.0.0.1", rest.port, timeout=10)
    conn.request("POST", "/query",
                 json.dumps({"query": "NODE CREATE p {n: 'a'}"}).encode(),
                 {"Content-Type": "application/json"})
    conn.getresponse().read()
    conn.request("POST", "/query",
                 json.dumps({"query": "NODE CREATE p {n: 'b'}"}).encode(),
                 {"Content-Type": "application/json"})
    conn.getresponse().read()
    conn.request("POST", "/query",
                 json.dumps({"query": "EDGE CREATE 0 -> 1 : r"}).encode(),
                 {"Content-Type": "application/json"})
    conn.getresponse().read()
    conn.close()

    r, body = _get(rest.port, "/achievements")
    assert r.status == 200
    snap = json.loads(body)
    assert "first_query" in snap["unlocked"]
    assert "first_graph" in snap["unlocked"]

    r, body = _get(rest.port, "/graph/viz")
    assert r.status == 200
    assert r.getheader("Content-Type") == "image/svg+xml"
    svg = body.decode()
    assert svg.startswith("<svg") and "circle" in svg and "line" in svg

    r, body = _get(rest.port, "/")
    html = body.decode()
    assert "progress" in html and "<svg" in html


def test_tier_xp_values():
    from neumann_tpu.server.gamification import TIER_XP

    p = UserProgress()
    assert p.unlock("queries_10000") == TIER_XP["gold"] == 400
    p2 = UserProgress()
    assert p2.unlock("streak_30") == 1000    # platinum


def test_streak_threshold_exact():
    p = UserProgress()
    for day in range(1, 8):
        p.update_streak(day)
    assert p.streak_days == 7 and "streak_7" in p.unlocked
    p2 = UserProgress()
    for day in range(1, 7):
        p2.update_streak(day)
    assert "streak_7" not in p2.unlocked


def test_level_progress_math():
    p = UserProgress()
    p.xp = 250                      # level 2 spans [100, 300)
    assert p.level == 2
    lp = p.level_progress()
    assert lp == {"level": 2, "xp": 250, "into_level": 150,
                  "needed": 200}


def test_query_threshold_exact():
    t = ProgressTracker()
    for _ in range(99):
        t.record("Select", 5.0)
    assert "queries_100" not in t.progress.unlocked
    t.record("Select", 5.0)
    assert "queries_100" in t.progress.unlocked


def test_engine_kind_matching_exact():
    t = ProgressTracker()
    t.record("NotAKind", 5.0)
    assert t.progress.engines_used == set()
    t.record("Select", 5.0)
    assert t.progress.engines_used == {"relational"}


def test_embedding_threshold_exact():
    t = ProgressTracker()
    t.record_embeddings(999)
    assert "embeddings_1000" not in t.progress.unlocked
    t.record_embeddings(1000)
    assert "embeddings_1000" in t.progress.unlocked


def test_catalog_thresholds_recorded():
    assert get_achievement("streak_7").threshold == 7
    assert get_achievement("queries_100").threshold == 100
    assert get_achievement("embeddings_1000").threshold == 1000


def test_streak_gap_of_two_resets():
    p = UserProgress()
    p.update_streak(1)
    p.update_streak(2)
    assert p.streak_days == 2
    p.update_streak(4)          # gap of exactly 2 days resets
    assert p.streak_days == 1


def test_all_engines_requires_exactly_three():
    t = ProgressTracker()
    t.record("Select", 5.0)     # one engine only
    assert "all_engines" not in t.progress.unlocked
