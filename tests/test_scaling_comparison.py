"""Embedded-DB scaling comparison (stress_tests/
postgresql_scaling_comparison.rs analog, with stdlib sqlite3 as the
reference database): bulk insert, indexed point lookup, full-scan
aggregate, and inner join at increasing scales. Asserts results match,
our scaling stays near-linear, and the vectorized paths (aggregate,
join) hold a sane ratio against sqlite's C engine."""

import sqlite3
import time

from neumann_tpu.engines.condition import Condition as C
from neumann_tpu.engines.relational import Column, RelationalEngine

SCALES = (1_000, 20_000)


def _build(n):
    # timings are thread-CPU (time.thread_time): the scaling
    # assertions must measure the WORK this thread does, not the
    # machine's worst moment — wall-clock samples were hostage to
    # whatever else the suite (or the host) left running (observed
    # 140x for 20x rows under load vs 7 ms in isolation, and a 5x
    # point-lookup spike from GIL contention). Best-of-3 on fresh
    # engines besides, against scheduler noise in thread_time itself
    rows = [{"id": i, "grp": i % 97, "score": float(i % 1000) / 7}
            for i in range(n)]
    t_ins = float("inf")
    for _ in range(3):
        eng = RelationalEngine()
        eng.create_table("t", [
            Column("id", "int", primary_key=True),
            Column("grp", "int"),
            Column("score", "float"),
        ])
        t0 = time.thread_time()
        eng.insert_many("t", rows)
        t_ins = min(t_ins, time.thread_time() - t0)
    eng.create_index("t", "id")

    s_ins = float("inf")
    for rep in range(3):
        db = sqlite3.connect(":memory:")
        db.execute("CREATE TABLE t (id INTEGER PRIMARY KEY,"
                   " grp INTEGER, score REAL)")
        t0 = time.thread_time()
        db.executemany("INSERT INTO t VALUES (?, ?, ?)",
                       [(r["id"], r["grp"], r["score"]) for r in rows])
        db.commit()
        s_ins = min(s_ins, time.thread_time() - t0)
        if rep < 2:
            db.close()
    return eng, db, t_ins, s_ins


def _bench(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.thread_time()
        out = fn()
        best = min(best, time.thread_time() - t0)
    return out, best


def test_scaling_vs_sqlite():
    history = {}
    for n in SCALES:
        eng, db, t_ins, s_ins = _build(n)

        # full-scan aggregate
        (ours, t_agg) = _bench(lambda: eng.sum_column("t", "score"))
        (ref, s_agg) = _bench(
            lambda: db.execute("SELECT SUM(score) FROM t").fetchone()[0])
        assert abs(ours - ref) < 1e-6 * max(1.0, abs(ref))

        # indexed point lookups (100 of them)
        ids = list(range(0, n, max(1, n // 100)))[:100]

        def ours_pts():
            return [eng.select("t", C.cmp("id", "=", i))[0]["score"]
                    for i in ids]

        def ref_pts():
            return [db.execute(
                "SELECT score FROM t WHERE id = ?", (i,)).fetchone()[0]
                for i in ids]

        (o_rows, t_pt) = _bench(ours_pts)
        (r_rows, s_pt) = _bench(ref_pts)
        assert o_rows == r_rows

        # self-join on the group key (count of matched pairs)
        def ours_join():
            return len(eng.join("t", "t", "grp", "grp"))

        def ref_join():
            # materialize the joined rows like ours does (COUNT(*)
            # alone skips the output cost entirely)
            return len(db.execute(
                "SELECT a.id, a.grp, a.score, b.id, b.grp, b.score"
                " FROM t a JOIN t b ON a.grp = b.grp").fetchall())

        # join only at the smaller scale: pair counts grow ~n^2/97
        if n == SCALES[0]:
            (o_cnt, t_join) = _bench(ours_join, reps=1)
            (r_cnt, s_join) = _bench(ref_join, reps=1)
            assert o_cnt == r_cnt
            # the vectorized sort-merge join must beat sqlite's
            # nested-loop-over-index at this shape
            assert t_join < s_join * 10, (t_join, s_join)

        history[n] = {"insert": t_ins, "agg": t_agg, "pt": t_pt,
                      "sql_insert": s_ins, "sql_agg": s_agg,
                      "sql_pt": s_pt}
        db.close()

    lo, hi = history[SCALES[0]], history[SCALES[-1]]
    factor = SCALES[-1] / SCALES[0]
    # diagnostic for failures under full-suite load: leaked daemon
    # threads from earlier tests share the GIL with this measurement
    import threading

    load = (f"threads={threading.active_count()}",
            [t.name for t in threading.enumerate()][:12])
    # near-linear scaling: 20x data must not cost more than ~60x time
    assert hi["insert"] < lo["insert"] * factor * 3, (hi, lo, load)
    assert hi["agg"] < max(lo["agg"], 1e-4) * factor * 3, (hi, lo, load)
    # indexed lookups must NOT scale with n (hash index: ~O(1));
    # allow generous jitter on a shared VM
    assert hi["pt"] < lo["pt"] * 5
    # vectorized aggregate stays within 10x of sqlite's C scan
    assert hi["agg"] < hi["sql_agg"] * 10, (hi["agg"], hi["sql_agg"])
