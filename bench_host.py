"""Host-path benchmarks mirroring the reference's BASELINE.md rows.

The reference's published numbers are Rust/criterion on Apple M-series
(BASELINE.md): storage core put/get/scan, WAL, snapshots, relational
insert/scan/lookup/join/aggregates, graph BFS, parser throughput, chain
commits, and conflict checks. This suite measures our equivalents so
BENCHMARKS.md can compare line by line — the device path (SIMILAR
scans) is covered by bench.py / bench_all.py; this file is everything
that runs on the host (plus the consensus pair-scan, which we run on
device as one matmul).

Usage: python bench_host.py [--quick]   # prints one JSON line per row
"""

import json
import sys
import time

import numpy as np

QUICK = "--quick" in sys.argv


def rate(n, seconds):
    return n / seconds if seconds > 0 else float("inf")


def timeit(fn, *args, reps=1):
    """Best-of-reps wall time (criterion-style: the minimum is the
    least-noise estimate on a shared VM)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


ROWS = []


def report(name, value, unit, ref=None, note=""):
    row = {"metric": name, "value": round(value, 1), "unit": unit}
    if ref is not None:
        row["vs_reference"] = round(value / ref, 2)
    if note:
        row["note"] = note
    ROWS.append(row)
    print(json.dumps(row))


def bench_store():
    from neumann_tpu.store.tensor_store import (
        TensorData, TensorStore, TensorValue)

    n = 20_000 if QUICK else 200_000
    store = TensorStore()
    datas = [TensorData.with_values(v=TensorValue.scalar(i))
             for i in range(n)]
    keys = [f"user:{i}" for i in range(n)]

    t0 = time.perf_counter()
    for k, d in zip(keys, datas):
        store.put(k, d)
    report("store put", rate(n, time.perf_counter() - t0), "ops/s",
           ref=2_000_000, note="reference: in-memory writes 2.0M/s")

    t0 = time.perf_counter()
    for k in keys:
        store.get(k)
    report("store get", rate(n, time.perf_counter() - t0), "ops/s",
           ref=3_800_000, note="reference: in-memory reads 3.8M/s")

    store.scan("user:1")   # warm: flush the write-behind key buffer
    t = timeit(lambda: store.scan("user:1"), reps=5)
    m = store.scan_count("user:1")
    report("store scan (prefix)", rate(m, t), "keys/s",
           note=f"{m} keys; reference: 1K keys in 191us = 5.2M/s")
    t = timeit(lambda: store.scan_count("user:1"), reps=5)
    report("store scan_count", 1e6 * t, "us", note="reference: 41us")

    # columnar embedding ingest (ingest_matrix, zero-copy adopt): the
    # product mass-write path the 10M served corpus loads through
    from neumann_tpu.engines.vector import VectorEngine

    eng = VectorEngine()
    eng.config.mesh_auto = False
    ni = 50_000 if QUICK else 400_000
    mat = np.random.default_rng(0).standard_normal(
        (ni, 768)).astype(np.float32)
    ikeys = [f"e{i}" for i in range(ni)]
    t0 = time.perf_counter()
    eng.ingest_matrix(ikeys, mat, copy=False)
    report("columnar ingest (768d, zero-copy)",
           rate(ni, time.perf_counter() - t0), "rows/s",
           ref=2_000_000, note="reference: in-memory writes 2.0M/s")
    return store, keys


def bench_wal(tmp):
    from neumann_tpu.store.tensor_store import (
        TensorData, TensorStore, TensorValue)

    n = 5_000 if QUICK else 50_000
    emb = np.random.default_rng(0).standard_normal(128).astype(
        np.float32)

    store = TensorStore()
    store.open_durable(tmp / "wal_batched.log", sync_mode="batched")
    data = TensorData.with_values(e=TensorValue.vector(emb))
    t0 = time.perf_counter()
    for i in range(n):
        store.put(f"emb:{i}", data)
    store.wal_flush()
    report("WAL durable put (128d, batched fsync)",
           rate(n, time.perf_counter() - t0), "ops/s", ref=50_000,
           note="reference's own stated Batched band: 10K-50K ops/s "
                "(wal.rs:146-149)")

    store_m = TensorStore()
    store_m.open_durable(tmp / "wal_manual.log", sync_mode="manual")
    t0 = time.perf_counter()
    for i in range(n):
        store_m.put(f"emb:{i}", data)
    dt = time.perf_counter() - t0
    store_m.wal_flush()
    report("WAL durable put (128d, manual sync / group commit)",
           rate(n, dt), "ops/s", ref=1_400_000,
           note="reference: 1.4M/s (its headline is manual-sync "
                "append throughput)")

    ns = 200 if QUICK else 1_000
    store2 = TensorStore()
    store2.open_durable(tmp / "wal_imm.log", sync_mode="immediate")
    t0 = time.perf_counter()
    for i in range(ns):
        store2.put(f"emb:{i}", data)
    report("WAL durable put (fsync per write)",
           rate(ns, time.perf_counter() - t0), "ops/s", ref=260,
           note="reference: 260/s")

    store3 = TensorStore()
    t = timeit(lambda: store3.recover(tmp / "wal_batched.log"))
    report("WAL replay (128d embedding records, 570B/rec)", rate(n, t),
           "records/s", ref=25_000_000,
           note="reference: 25M records/s (measured on 10K small "
                "records — see below for the like-for-like size)")

    store3b = TensorStore()
    t = timeit(lambda: store3b.recover(tmp / "wal_batched.log",
                                       verify="lazy"))
    report("WAL replay (570B records, verify='lazy')", rate(n, t),
           "records/s", ref=25_000_000,
           note="payload CRC deferred to first access (still checked "
                "before any byte is used); replay touches only frame "
                "headers")

    # software-path ceiling: encode+frame with the disk removed — the
    # durable-put rows above are writeback-bound on cloud VMs
    from neumann_tpu.store import codec as _codec

    ext = _codec._native()
    if ext is not None:
        fb = ext.framebuf_new()
        ne = n
        t0 = time.perf_counter()
        for i in range(ne):
            ext.framebuf_append(fb, 0, "emb:1", data)
            if not (i & 4095):
                ext.framebuf_take(fb)
        report("WAL encode+frame only (no disk)",
               rate(ne, time.perf_counter() - t0), "ops/s",
               ref=1_400_000,
               note="isolates the software put path from the VM's "
                    "disk writeback rate")

    # like-for-like with the reference's replay bench: 10K SMALL records
    # (its tensor-store wal bench replays scalar puts, ~40B/record)
    store4 = TensorStore()
    store4.open_durable(tmp / "wal_small.log", sync_mode="batched")
    sdata = TensorData.with_values(v=TensorValue.scalar(42))
    for i in range(10_000):
        store4.put(f"key:{i}", sdata)
    store4.wal_flush()
    store5 = TensorStore()
    t = timeit(lambda: store5.recover(tmp / "wal_small.log"), reps=5)
    report("WAL replay (small records, ~40B/rec)", rate(10_000, t),
           "records/s", ref=25_000_000, note="reference: 25M records/s")

    # replay floor: frame walk + CRC with the overlay map removed —
    # replay/floor attributes the hash-map share, floor/memory-rate
    # attributes the CRC+walk share (round-3 ask: >=20M rec/s or a
    # measured proof of the floor)
    from neumann_tpu.store import codec as _codec0

    ext0 = _codec0._native()
    if ext0 is not None and hasattr(ext0, "wal_walk_floor"):
        logbytes = (tmp / "wal_small.log").read_bytes()
        t = timeit(lambda: ext0.wal_walk_floor(logbytes), reps=5)
        report("WAL replay floor (walk+CRC only, no map)",
               rate(10_000, t), "records/s",
               note="same parse as replay minus upserts")
        t = timeit(lambda: ext0.wal_walk_floor(logbytes, 1), reps=5)
        report("WAL replay floor (walk only, lazy CRC)",
               rate(10_000, t), "records/s",
               note="header chain walk alone")


def bench_snapshot(tmp):
    from neumann_tpu.store.tensor_store import (
        TensorData, TensorStore, TensorValue)

    n = 10_000
    store = TensorStore()
    for i in range(n):
        store.put(f"k:{i}", TensorData.with_values(
            a=TensorValue.scalar(i), b=TensorValue.scalar(f"val{i}")))
    t = timeit(lambda: store.save_snapshot(tmp / "snap.ntpu"))
    report("snapshot save 10K items", 1e3 * t, "ms", note="ref: 12.6ms")
    fresh = TensorStore()
    t = timeit(lambda: fresh.load_snapshot(tmp / "snap.ntpu"))
    report("snapshot load 10K items", 1e3 * t, "ms", note="ref: 10.7ms")


def bench_relational():
    from neumann_tpu.engines.condition import Condition
    from neumann_tpu.engines.relational import Column, RelationalEngine

    n = 5_000
    eng = RelationalEngine()
    cols = [Column("id", "int"), Column("name", "text"),
            Column("score", "float")]
    eng.create_table("users", cols)
    rows = [{"id": i, "name": f"user{i}", "score": float(i % 100)}
            for i in range(n)]

    t0 = time.perf_counter()
    for r in rows:
        eng.insert("users", r)
    report("relational insert", rate(n, time.perf_counter() - t0),
           "rows/s", ref=320_000, note="reference: 320K rows/s")

    eng.create_table("users2", cols)
    t = timeit(lambda: eng.insert_many("users2", rows))
    report("relational batch insert", rate(n, t), "rows/s",
           ref=688_000, note="reference: 688K rows/s")

    t = timeit(lambda: eng.select("users", None), reps=5)
    report("relational full scan 5K", rate(n, t), "rows/s",
           ref=949_000, note="reference: 949K rows/s")

    eng.create_index("users", "id")
    t = timeit(lambda: eng.select("users", Condition.eq("id", 2500)),
               reps=50)
    report("relational indexed lookup", 1e6 * t, "us",
           note="reference: 2.93us")

    nj = 2_000 if QUICK else 10_000
    eng.create_table("a", [Column("k", "int"), Column("x", "int")])
    eng.create_table("b", [Column("k", "int"), Column("y", "int")])
    eng.insert_many("a", [{"k": i % 1000, "x": i} for i in range(nj)])
    eng.insert_many("b", [{"k": i % 1000, "y": i} for i in range(nj)])
    t = timeit(lambda: eng.join("a", "b", "k", "k"), reps=3)
    out_rows = len(eng.join("a", "b", "k", "k"))
    report(f"inner join {nj}x{nj}", rate(out_rows, t), "rows/s",
           ref=2_200_000, note=f"{out_rows} output rows; ref 2.2M/s")

    nm = 100_000 if QUICK else 1_000_000
    eng.create_table("big", [Column("v", "int")])
    eng.insert_many("big", [{"v": int(x)} for x in range(nm)])
    t = timeit(lambda: eng.count("big", None), reps=3)
    report(f"COUNT(*) over {nm} rows", 1e3 * t, "ms",
           note="reference: 2.1ms @1M")
    t = timeit(lambda: eng.sum_column("big", "v"), reps=3)
    report(f"SUM over {nm} rows", 1e3 * t, "ms",
           note="reference: 8.5ms @1M")


def bench_graph():
    from neumann_tpu.engines.graph import GraphEngine

    n = 2_000 if QUICK else 10_000
    eng = GraphEngine()
    ids = eng.batch_create_nodes([("person", {"i": i})
                                  for i in range(n)])
    rng = np.random.default_rng(0)
    edges = [(ids[rng.integers(n)], ids[rng.integers(n)], "knows", None)
             for _ in range(4 * n)]
    t0 = time.perf_counter()
    eng.batch_create_edges(edges)
    report("graph batch edge insert",
           rate(4 * n, time.perf_counter() - t0), "edges/s")

    eng.traverse(ids[0])         # build the adjacency view
    t0 = time.perf_counter()
    visited = eng.traverse(ids[0])
    dt = time.perf_counter() - t0
    report("graph BFS traverse (warm adjacency)",
           1e9 * dt / max(len(visited), 1), "ns/node",
           note=f"{len(visited)} nodes; reference: 3us/node")


def bench_parser():
    from neumann_tpu.lang.parser import parse

    stmts = [
        "SELECT name, score FROM users WHERE id = 42",
        "INSERT INTO users VALUES (1, 'alice', 3.5)",
        "SIMILAR 'user:alice' TOP 10",
        "NODE CREATE person {name: 'bob'}",
        "FIND ENTITY WHERE age > 30 LIMIT 5",
    ]
    n = 2_000 if QUICK else 20_000
    # best-of-3: parse is a ~0.5us/op microbench, so one descheduling
    # blip skews a single pass by 30%+ on a shared VM (criterion-style
    # repeat-and-take-best, same as the reference's bench harness)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            parse(stmts[i % len(stmts)])
        best = max(best, rate(n, time.perf_counter() - t0))
    report("parser (cold)", best,
           "queries/s", ref=1_900_000, note="reference: 1.9M/s")

    from neumann_tpu.lang.parser import parse_cached, parse_param

    # distinct literals, repeated SHAPE: the parameterized-template
    # tier (bulk INSERT / point-lookup workloads land here)
    shaped = [f"INSERT INTO pbench VALUES ({i}, 'name{i}', {i % 7})"
              for i in range(n)]
    parse_param(shaped[0])
    t0 = time.perf_counter()
    for s in shaped:
        parse_param(s)
    report("parser (cold, seen shape — parameterized template)",
           rate(n, time.perf_counter() - t0), "queries/s",
           ref=1_900_000,
           note="literal-spine rebuild off the cached shape template")

    t0 = time.perf_counter()
    for i in range(10 * n):
        parse_cached(stmts[i % len(stmts)])
    report("parser (statement cache, router path)",
           rate(10 * n, time.perf_counter() - t0), "queries/s",
           ref=1_900_000, note="repeated statements skip the parse")


def bench_chain():
    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store.tensor_store import (
        TensorData, TensorStore, TensorValue)

    chain = TensorChain(TensorStore())
    n = 100 if QUICK else 500
    # warmup: first commits pay one-time imports + a jax compile for
    # the consensus kernel (criterion warms up too)
    for i in range(50):
        tx = chain.begin()
        tx.put(f"warm:{i}", TensorData.with_values(
            v=TensorValue.scalar(i)))
        chain.commit(tx)
    t0 = time.perf_counter()
    for i in range(n):
        tx = chain.begin()
        tx.put(f"k:{i}", TensorData.with_values(
            v=TensorValue.scalar(i)))
        chain.commit(tx)
    report("chain tx commit (single put)",
           1e6 * (time.perf_counter() - t0) / n, "us",
           note="reference: 432us")


def bench_consensus():
    """Conflict pair checks: two device matmuls over ALL pairs.

    Timed with the rep-difference chain (like bench.py): the dev
    tunnel's host<->device transfer would otherwise dominate and the
    reference number is compute-only too."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.chain.consensus import pairwise_codes_kernel

    b, d = (512, 256) if QUICK else (4096, 768)
    rng = np.random.default_rng(0)
    deltas = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    inc = np.zeros((b, 600), np.float32)
    for i in range(b):
        inc[i, i % 600] = 1.0
        inc[i, (i + 1) % 600] = 1.0
    inc = jnp.asarray(inc)
    th = tuple(np.float32(x) for x in (0.95, 0.5, 0.1, 0.3))

    @functools.partial(jax.jit, static_argnames="reps")
    def chain(dl, a, reps):
        def body(i, carry):
            cur, acc = carry
            codes = pairwise_codes_kernel(cur, a, *th)
            s = jnp.sum(codes.astype(jnp.int32))
            cur = cur + 1e-30 * s.astype(jnp.float32)
            return cur, acc + s
        _, acc = lax.fori_loop(0, reps, body, (dl, jnp.int32(0)))
        return acc

    def timed(r):
        t0 = time.perf_counter()
        int(chain(deltas, inc, r))
        return time.perf_counter() - t0

    # the tunnel's sync jitter is tens of ms; grow the rep spread until
    # the difference clearly rises above it
    r1, r2 = 2, 64
    timed(r1)
    while True:
        timed(r2)
        t = min((timed(r2) - timed(r1)) / (r2 - r1) for _ in range(3))
        if t * (r2 - r1) > 0.05 or r2 >= 4096:
            break
        r2 *= 4
    t = max(t, 1e-12)
    pairs = b * (b - 1) / 2
    report("conflict pair checks", rate(pairs, t), "pairs/s",
           ref=52_000_000,
           note=f"batch {b}x{d}d dense; reference: 52M/s @99% sparse")


def bench_router_mixed():
    """End-to-end mixed workload through router.execute (reference:
    455 queries/s, benchmarks/index.md:47)."""
    from neumann_tpu.router.router import QueryRouter

    r = QueryRouter()
    r.execute("CREATE TABLE users (id INT PRIMARY KEY, name TEXT, "
              "age INT)")
    rng = np.random.default_rng(0)
    for i in range(200):
        r.execute(f"INSERT INTO users VALUES ({i}, 'u{i}', {i % 80})")
        nid = r.execute(f"NODE CREATE person {{ i: {i} }}").value
        if i:
            r.execute(f"EDGE CREATE {nid - 1} -> {nid} : knows")
    for i in range(512):
        vec = ", ".join(f"{x:.3f}" for x in rng.standard_normal(64))
        r.execute(f"EMBED STORE 'd{i}' [{vec}]")
    r.execute("SIMILAR 'd0' TOP 5")           # compile the scan once

    stmts = []
    for i in range(100):
        stmts += [
            f"SELECT name FROM users WHERE id = {i % 200}",
            f"SELECT COUNT(*) FROM users WHERE age > {i % 60}",
            f"INSERT INTO users VALUES ({1000 + i}, 'x', 1)",
            f"NEIGHBORS {i % 190} OUTGOING : knows",
            f"UPDATE users SET age = {i % 70} WHERE id = {i % 200}",
        ]
    n = 200 if QUICK else len(stmts)
    t0 = time.perf_counter()
    for s in stmts[:n]:
        r.execute(s)
    report("query router mixed workload (SQL + graph)",
           rate(n, time.perf_counter() - t0), "queries/s", ref=455,
           note="point reads/aggregates/writes/traversals; vector "
                "statements ride the device benches (per-query "
                "dispatch through the dev tunnel adds ~30ms that a "
                "locally attached TPU does not)")


def _backend_alive(timeout_s: float = 180.0) -> bool:
    """Probe jax backend init in a subprocess (the axon tunnel has been
    observed to HANG jax.devices() for hours; a hung tunnel must not
    stall the host-path rows, which need no device at all)."""
    import os
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, env=dict(os.environ),
            capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os
    import tempfile
    from pathlib import Path

    # SIMILAR statements in the mixed-router phase and the
    # conflict-pairs row touch the device; with the tunnel hung, fall
    # back to CPU jax so every host row still reports (device-path
    # rows are then CPU numbers, flagged on stderr). The axon site
    # hook pre-imports jax at interpreter startup, so retarget through
    # jax.config (the BACKEND is still uninitialized at this point —
    # env vars alone would be read too late).
    if not _backend_alive():
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        print("[bench_host] accelerator backend unreachable: device "
              "ops run on CPU jax for this run", file=sys.stderr,
              flush=True)

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        bench_store()
        bench_wal(tmp)
        bench_snapshot(tmp)
    bench_relational()
    bench_graph()
    bench_parser()
    bench_router_mixed()
    bench_chain()
    bench_consensus()
    print(json.dumps({"metric": "host-path suite", "rows": len(ROWS)}))


if __name__ == "__main__":
    main()
