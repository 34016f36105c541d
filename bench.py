"""Headline benchmark: SIMILAR top-10 over a 10M x 768 int8 corpus.

Three recorded paths, all on however many chips are present (one under
the driver):

1. Batched brute scan (throughput): ops.rerank.int8_pooled_rerank_topk —
   two-pass. First pass: int8 MXU matmul with pooling expressed as a
   free dot dimension (XLA fuses the segmented max into the matmul
   consumer) selecting C=8k candidates; second pass: gather those rows
   and rescore in exact f32 against the UNQUANTIZED query. The gather
   touches Q x C rows vs the N-row scan, so throughput stays at the
   single-pass HBM rate while recall@10 returns to candidate-coverage
   level (the single-pass loss was query-side int8 + pooled mantissa
   truncation, not selection).
2. Single-query IVF-nprobe (latency): ops.ivf FIXED-window layout
   (disjoint `window`-row windows over the cluster-sorted corpus,
   probed by their normalized mean rows — window_mean_centroids) + the
   same rerank pass. This is the p99 < 5 ms path from BASELINE.md's
   target block; recall@10 is reported against an exact full-corpus
   oracle (f32 queries, f32 math — ops.quant.int8_exact_topk) over an
   nprobe sweep, and the headline nprobe is the smallest reaching
   recall >= 0.99.
3. IVF build (honesty): by default the index is built for real ON
   DEVICE — balance-aware k-means (Lloyd + split-fattest reseeding,
   parallel.partitioner.kmeans_device) over a 256K-row sample,
   full-corpus assignment, and a relayout into learned-cluster-sorted
   order — with the build time recorded. The corpus relayout avoids a
   second 7.7 GB buffer by REGENERATING each chunk from its recorded
   PRNG key and scattering rows to their learned positions (the dev
   tunnel moves ~MB/s, so a host round-trip is not viable).
   NEUMANN_BENCH_FAST=1 (or --fast-build) skips the k-means and keeps
   the generator's cluster order — the sort an offline k-means
   recovers. Probe centroids are window means in BOTH modes.

The corpus is a mixture of Gaussians generated directly on device.
Clustered data is the realistic regime for embedding corpora; the brute
scan's cost is data-independent either way.

Timing methodology: the dev TPU is behind an async tunnel where
block_until_ready does not block and any host sync costs ~30 ms, so
scans are repeated INSIDE jit via lax.fori_loop with a data dependence
(query perturbed by a tiny function of the previous scores), and
per-iter time is the difference between two rep counts — tunnel
overhead cancels.

Baseline: the reference's measured brute-force rate at 768d is 367
ns/vec per query on Apple M-series (docs/book/src/benchmarks/
vector-engine.md:32). Scan of 10M vectors => 3.67 s/query => 0.2725
QPS. vs_baseline = our per-query throughput / that rate.

Prints ONE JSON line.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REF_NS_PER_VEC_768 = 367.0  # vector-engine.md:32

_T0 = time.time()


def _phase(msg):
    """Progress to stderr (stdout carries only the JSON line); most of
    the wall time is remote AOT compiles through the dev tunnel."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


# The remote compile service's latency is wildly variable (the same 1M
# program has compiled in 12 s and in 900 s on the same day; a trivial
# matmul once took 210 s). The OPTIONAL phases — batched IVF, the extra
# recall-curve points, the Pallas core — are skipped once the soft
# deadline passes so the essential numbers (brute+rerank QPS, IVF
# latency + recall at one nprobe, recall-vs-fp32 oracle) always make it
# into the recorded JSON before any driver timeout.
_DEADLINE_S = float(os.environ.get("NEUMANN_BENCH_DEADLINE", "3300"))


def _past_deadline(what: str) -> bool:
    if time.time() - _T0 <= _DEADLINE_S:
        return False
    _phase(f"soft deadline {_DEADLINE_S:.0f}s passed: skipping {what}")
    return True


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast if the TPU tunnel is hung. jax.devices() on a healthy
    backend returns in seconds (observed outages hang it for hours);
    probing in a SUBPROCESS keeps this interpreter's jax uninitialized
    so the real run below is unaffected."""
    import subprocess

    detail = ""
    for attempt in range(3):  # observed outages are sometimes transient
        if attempt:
            _phase(f"backend probe failed ({detail.strip()[-120:]}); "
                   f"retrying in 120s ({attempt + 1}/3)")
            time.sleep(120)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices()"],
                timeout=timeout_s, env=dict(os.environ),
                capture_output=True)
            if r.returncode == 0:
                return
            detail = (r.stderr or b"").decode()[-400:]
        except subprocess.TimeoutExpired:
            detail = f"jax.devices() hung for {timeout_s:.0f}s (tunnel down?)"
    print(json.dumps({
        "metric": "similar_top10_qps", "value": 0, "unit": "qps",
        "vs_baseline": 0,
        "error": f"backend unavailable: {detail}"}), flush=True)
    sys.exit(1)




def _served_phase(on_tpu, d, k):
    """End-to-end serving numbers on the PRODUCT path (VERDICT r4 #1).

    Ingests the headline-scale corpus through VectorEngine.ingest_matrix
    (columnar product ingest), serves it over real gRPC through the
    binary PointsService data plane (native codec, raw-bytes handlers,
    coalescing multi-worker batchers), and reports:

    - served_ingest_s / served_ingest_rows_per_s  (10M through the
      product write path; ref README.md:264)
    - p50/p99_ms_served   unary binary Query, single caller
    - served_qps_concurrent   64 threads of unary binary queries
    - served_qps_stream       4 pipelined QueryStream clients
    - served_qps_batch        8 threads x 256-query QueryBatch RPCs
    - served_decomposition    p99_served = tunnel_floor + device path
      + rpc overhead, each measured (the non-tunnel serving cost is
      the BASELINE p99<5ms claim on a locally attached chip)

    Client and server share this VM's single core, so every number
    UNDERSTATES a real deployment: the grpc-python echo ceiling
    measured here is ~2.9K unary / ~8K stream msgs/s with zero work.
    """
    import gc
    import concurrent.futures as _fut

    import jax
    import jax.numpy as jnp

    served = {}
    try:
        if _past_deadline("served phase"):
            raise TimeoutError("soft deadline")

        from neumann_tpu.router import QueryRouter
        from neumann_tpu.server.client import NeumannClient
        from neumann_tpu.server.server import NeumannServer

        # tunnel sync floor: a trivial device->host readback
        tiny = jnp.zeros(8, jnp.float32) + 1
        float(np.asarray(tiny)[0])
        floors = []
        for _ in range(9):
            t0 = time.perf_counter()
            float(np.asarray(tiny + 1)[0])
            floors.append(time.perf_counter() - t0)
        floor_ms = float(np.percentile(floors, 50) * 1e3)
        served["host_sync_floor_ms"] = round(floor_ms, 2)

        n_srv = 10_000_000 if on_tpu else 20_000
        remaining = _DEADLINE_S - (time.time() - _T0)
        if on_tpu and remaining < 1500:
            # cold-cache runs can eat the budget before this phase;
            # a 2M corpus still exercises every serving path
            n_srv = 2_000_000
            _phase(f"served: only {remaining:.0f}s left, "
                   f"falling back to {n_srv} rows")
        d_srv = d
        rng = np.random.default_rng(17)
        _phase(f"served: generating {n_srv}x{d_srv} f32 on host")
        vecs = np.empty((n_srv, d_srv), np.float32)
        step = 1_000_000
        for s0 in range(0, n_srv, step):
            rng.standard_normal((min(step, n_srv - s0), d_srv),
                                dtype=np.float32,
                                out=vecs[s0: s0 + step])

        router = QueryRouter()
        router.vector.config.mesh_auto = False
        eng = router.vector
        _phase(f"served: ingesting {n_srv} rows (ingest_matrix)")
        gc.disable()
        t0 = time.perf_counter()
        try:
            eng.ingest_matrix([f"s{i}" for i in range(n_srv)], vecs,
                              copy=False)
        finally:
            gc.enable()
        ingest_s = time.perf_counter() - t0
        served["served_ingest_s"] = round(ingest_s, 1)
        served["served_ingest_rows_per_s"] = round(n_srv / ingest_s)
        _phase(f"served: ingest {ingest_s:.1f}s "
               f"({n_srv / ingest_s:,.0f} rows/s)")

        server = NeumannServer(router=router, port=0, max_workers=64)
        _phase("served: warmup (auto-IVF build + serving executables)")
        t0 = time.perf_counter()
        server.serve(block=False, warmup=True)
        served["served_warmup_s"] = round(time.perf_counter() - t0, 1)
        _phase(f"served: warmup {served['served_warmup_s']}s")
        try:
            client = NeumannClient.connect(
                f"127.0.0.1:{server.port}", retries=0)
            nq_pool = 1024
            qs = vecs[:nq_pool] + 0.05 * np.random.default_rng(
                19).standard_normal((nq_pool, d_srv)).astype(np.float32)

            # in-process engine latency: the device path the server
            # dispatches to (includes ONE tunnel floor via host_pull)
            eng.search_similar(qs[0], k)
            lat = []
            for i in range(60):
                t0 = time.perf_counter()
                eng.search_similar(qs[i % nq_pool], k)
                lat.append(time.perf_counter() - t0)
            eng_p50 = float(np.percentile(lat, 50) * 1e3)
            eng_p99 = float(np.percentile(lat, 99) * 1e3)
            _phase(f"served: engine in-process p50 {eng_p50:.1f} ms "
                   f"p99 {eng_p99:.1f} ms")

            # unary binary Query, single caller
            client.query_points("", qs[0], k, with_payload=False)
            lat = []
            for i in range(200):
                t0 = time.perf_counter()
                client.query_points("", qs[i % nq_pool], k,
                                    with_payload=False)
                lat.append(time.perf_counter() - t0)
            p50_served = float(np.percentile(lat, 50) * 1e3)
            p99_served = float(np.percentile(lat, 99) * 1e3)
            served["p50_ms_served"] = round(p50_served, 2)
            served["p99_ms_served"] = round(p99_served, 2)
            served["served_overhead_p99_ms"] = round(
                max(0.0, p99_served - eng_p99), 2)
            served["served_decomposition"] = {
                "tunnel_floor_ms": round(floor_ms, 2),
                "engine_inprocess_p50_ms": round(eng_p50, 2),
                "engine_inprocess_p99_ms": round(eng_p99, 2),
                "served_p50_ms": round(p50_served, 2),
                "served_p99_ms": round(p99_served, 2),
                "rpc_overhead_p50_ms": round(
                    max(0.0, p50_served - eng_p50), 2),
                "rpc_overhead_p99_ms": round(
                    max(0.0, p99_served - eng_p99), 2),
                "nontunnel_p50_ms": round(
                    max(0.0, p50_served - floor_ms), 2),
            }
            _phase(f"served: unary p50 {p50_served:.1f} ms "
                   f"p99 {p99_served:.1f} ms (floor {floor_ms:.1f})")

            # concurrent unary: 64 client threads
            def _one(i):
                client.query_points("", qs[i % nq_pool], k,
                                    with_payload=False)

            with _fut.ThreadPoolExecutor(max_workers=64) as ex:
                list(ex.map(_one, range(256)))
                t0 = time.perf_counter()
                n_conc = 2048
                list(ex.map(_one, range(n_conc)))
                dt = time.perf_counter() - t0
            served["served_qps_concurrent"] = round(n_conc / dt, 1)
            _phase(f"served: concurrent unary (64 threads) "
                   f"{served['served_qps_concurrent']} QPS")

            # pipelined stream: 4 QueryStream clients
            def _pipe(tid):
                with client.points_pipeline() as pipe:
                    nq = 2048
                    futs = [pipe.search(qs[(tid * 131 + i) % nq_pool],
                                        limit=k) for i in range(nq)]
                    for f in futs:
                        f.result(timeout=180)
                    return nq

            with _fut.ThreadPoolExecutor(max_workers=4) as ex:
                sum(ex.map(_pipe, range(4)))       # warm
                t0 = time.perf_counter()
                total = sum(ex.map(_pipe, range(4)))
                dt = time.perf_counter() - t0
            served["served_qps_stream"] = round(total / dt, 1)
            _phase(f"served: stream (4 pipelines) "
                   f"{served['served_qps_stream']} QPS")

            # QueryBatch: 8 threads x 256-query RPCs
            client.query_points_batch(qs[:256], limit=k)

            def _batch(i):
                s0 = (i * 256) % (nq_pool - 256)
                client.query_points_batch(qs[s0: s0 + 256], limit=k)
                return 256

            with _fut.ThreadPoolExecutor(max_workers=8) as ex:
                sum(ex.map(_batch, range(8)))      # warm
                t0 = time.perf_counter()
                total = sum(ex.map(_batch, range(32)))
                dt = time.perf_counter() - t0
            served["served_qps_batch"] = round(total / dt, 1)
            _phase(f"served: QueryBatch (8 threads x 256) "
                   f"{served['served_qps_batch']} QPS")

            # headline concurrent number = the fastest concurrent
            # product plane (unary / stream / batch are all real gRPC
            # round trips against the same server); per-plane numbers
            # stay published above, the path taken is named here
            served["served_qps_unary_concurrent"] = served.pop(
                "served_qps_concurrent")
            planes = {
                "unary": served["served_qps_unary_concurrent"],
                "query_stream": served.get("served_qps_stream", 0.0),
                "query_batch": served.get("served_qps_batch", 0.0),
            }
            best_plane = max(planes, key=lambda p: planes[p])
            served["served_qps_concurrent"] = planes[best_plane]
            served["served_concurrent_path"] = best_plane

            served["served_corpus_n"] = n_srv
        finally:
            server.stop()
    except Exception as e:  # noqa: BLE001 — bench must always print
        import traceback
        _phase(f"served phase failed: {type(e).__name__}: {e}")
        traceback.print_exc(file=sys.stderr)
    return served


def _device_health_probe(retries: int = 4, wait_s: float = 180.0):
    """Measure scan throughput on a small corpus before benching.

    A competing process on the chip (or a genuinely degraded tunnel
    host) makes every number garbage — a bench recorded concurrently
    with a leftover profiling run measured the 670 GB/s chain at
    25 GB/s (2026-08-20). Probe a 3.2 GB differenced scan first and
    wait out contention (up to ~retries*wait_s) before proceeding.
    Returns the last measured GB/s; the caller records it as
    `device_health_GBps`. The probe precomputes row_mult like every
    real caller — omitting it doubles the measured traffic (the scan
    recomputes corpus norms per pass) and halves the apparent rate.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.quant import int8_cosine_row_mult, int8_pooled_topk

    if jax.devices()[0].platform != "tpu":
        return None
    n = 1 << 22
    a = jnp.zeros((n, 768), jnp.int8)
    sc = jnp.ones(n, jnp.float32)
    rm = jax.jit(int8_cosine_row_mult)(a, sc)
    qs0 = jnp.ones((256, 768), jnp.float32)

    @jax.jit
    def chain(a, sc, rm, qs, reps):
        def body(i, carry):
            cur, acc = carry
            s, idx = int8_pooled_topk(a, sc, cur, 64, pool=2048,
                                      block_rows=1 << 20,
                                      selector="approx", row_mult=rm)
            cur = cur + 1e-30 * (s[0, 0]
                                 + idx[0, 0].astype(jnp.float32) * 1e-6)
            return cur, acc + s[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
        return acc

    def t(r):
        t0 = time.perf_counter()
        float(chain(a, sc, rm, qs0, jnp.int32(r)))
        return time.perf_counter() - t0

    gbps = 0.0
    for attempt in range(retries + 1):
        try:
            t(2)
            a1 = min(t(2) for _ in range(2))
            b1 = min(t(12) for _ in range(2))
            per = (b1 - a1) / 10
            gbps = n * 768 / per / 1e9
        except Exception as e:  # noqa: BLE001 — probe must not kill bench
            _phase(f"health probe failed ({e}); proceeding")
            return None
        if gbps >= 500.0:
            _phase(f"device health: {gbps:.0f} GB/s (ok)")
            return gbps
        if attempt < retries:
            _phase(f"device health: {gbps:.0f} GB/s — shared chip "
                   f"degraded, waiting {wait_s:.0f}s "
                   f"({attempt + 1}/{retries})")
            time.sleep(wait_s)
    _phase(f"device health: {gbps:.0f} GB/s — still degraded, "
           "benching anyway (numbers will understate the hardware)")
    return gbps


def main():
    fast_build = ("--fast-build" in sys.argv[1:]
                  or os.environ.get("NEUMANN_BENCH_FAST") == "1")
    _probe_backend()

    # persistent executables (SURVEY §7f): every compile below lands in
    # the on-disk cache, so re-runs (CI, server restarts, re-bench) skip
    # trace+compile — the TPU analogue of the reference's prebuilt
    # binaries. First-run numbers are unaffected (cache miss = compile).
    from neumann_tpu.utils.compile_cache import enable_persistent_cache
    cache_dir = enable_persistent_cache()
    if cache_dir:
        _phase(f"persistent compile cache at {cache_dir}")

    health_gbps = _device_health_probe()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.ivf import windowed_ivf_topk
    from neumann_tpu.ops.quant import (
        int8_cosine_row_mult,
        int8_exact_topk,
        scalar_quantize,
    )
    from neumann_tpu.ops.rerank import (
        gather_rerank_topk,
        int8_pooled_rerank_topk,
    )
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        n, d, q, k = 10_000_000, 768, 256, 10
        n_centers = 4096
        block_rows = 1 << 20
        # 2048-row pools + approx candidate cut: the r5 sweep
        # (tools/exp_pool_sweep.py) measured the chain at 664 GB/s /
        # 21.1K QPS vs 611/19.4K for the r4 1024/topk config, recall
        # 0.9984 vs 1.0 — the exact sort over [Q, N/pool] winner bits
        # was ~0.7 ms/pass and selection only needs top-10 SURVIVAL
        pool = 2048
        brute_selector = "approx:0.98"
        oracle_rows = 1 << 20
        # sweep DOWN to the knee so the curve actually curves
        nprobe_curve = (2, 4, 8, 16, 32, 64, 128)
        kmeans_sample = 1 << 18
        kmeans_iters = 10
    else:  # CPU smoke fallback so the bench always runs
        n, d, q, k = 100_000, 128, 16, 10
        n_centers = 256
        block_rows = 1 << 15
        pool = 64
        brute_selector = "approx:0.98"
        oracle_rows = 1 << 15
        nprobe_curve = (1, 2, 4, 8, 16)
        kmeans_sample = 1 << 14
        kmeans_iters = 6

    n_pad = -(-n // block_rows) * block_rows
    sigma = 0.25
    # rerank candidate count, both paths: 64 is the chain's floor and
    # covers the top-10 at 0.998+ (C=80 measured identical recall on
    # the shuffled-subset oracle but +0.15 ms of gather)
    cand = 64

    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    # cluster histogram (multinomial) and sorted-order offsets on host;
    # rows are generated directly in generator-cluster-sorted order (no
    # reorder pass, no second corpus in HBM). The real-build path below
    # re-sorts by LEARNED clusters via regeneration.
    rng = np.random.default_rng(0)
    counts = rng.multinomial(n, np.ones(n_centers) / n_centers)
    offsets = np.cumsum(counts)
    gen_starts = np.concatenate([[0], offsets[:-1]])
    offsets_dev = jnp.asarray(offsets.astype(np.int32))

    # FIXED-window layout (ops/ivf.py class docstring): the cluster-
    # sorted corpus is chopped into disjoint `window`-row windows and
    # probed by their normalized mean rows — k-means (or the
    # generator's order) only picks the sort; cluster-size skew cannot
    # inflate the read (a real device-kmeans build measured a 6x
    # fattest cluster before the balance fix — a cluster-sized window
    # would read 6x per probe). Every n_pad here is a multiple of
    # block_rows (a power of two >= 2^15), so any power-of-two window
    # up to that divides it.
    window = int(os.environ.get("NEUMANN_BENCH_WINDOW",
                                "2048" if on_tpu else "1024"))
    assert n_pad % window == 0
    starts_dev = jnp.arange(n_pad // window, dtype=jnp.int32) * window

    # generate the corpus on device in chunks (a one-shot generation
    # materializes f32 intermediates ~4x the corpus and OOMs HBM); the
    # int8 buffer is donated so each fill is in place. Padding rows
    # beyond n stay zero -> rmult 0 -> masked.
    chunk_rows = min(n, 1_000_000)
    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames="rows")
    def fill(c, sc, cents, offs, key, start, rows):
        idx = start + jnp.arange(rows, dtype=jnp.int32)
        assign = jnp.minimum(
            jnp.searchsorted(offs, idx, side="right"), cents.shape[0] - 1)
        chunk = cents[assign] + sigma * jax.random.normal(
            key, (rows, d), jnp.float32)
        cq, cs = scalar_quantize(chunk)
        c = lax.dynamic_update_slice(c, cq, (start, 0))
        sc = lax.dynamic_update_slice(sc, cs, (start,))
        return c, sc

    _phase("generating corpus")
    t_gen = time.perf_counter()
    chunk_keys = []          # recorded so the real build can regenerate
    done = 0
    while done < n:
        rows = min(chunk_rows, n - done)
        kn, sub = jax.random.split(kn)
        chunk_keys.append((sub, done, rows))
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    # sync BEFORE the build timer starts: the fills dispatch async and
    # would otherwise complete inside the build's first sync, billing
    # synthetic-corpus generation (10 x 1M x 768 RNG chunks — the most
    # tunnel-variable segment, 130-360 s observed) to ivf_build_s
    np.asarray(corpus_q[0, 0])
    _phase(f"corpus generated in {time.perf_counter() - t_gen:.1f}s")

    # ---------------- real on-device IVF build ------------------------
    build_mode = "generator-order+window-means"
    build_s = 0.0
    if fast_build:
        pass        # corpus is already generator-cluster-sorted;
        # probe centroids (window means) are computed below either way
    else:
        from neumann_tpu.parallel.partitioner import kmeans_device

        _phase("real IVF build: device k-means")
        t_b = time.perf_counter()
        ks, ka = jax.random.split(jax.random.PRNGKey(7))
        samp_idx = jax.random.choice(ks, n, (min(kmeans_sample, n),),
                                     replace=False)

        @jax.jit
        def take_norm(cq, sc, idx):
            x = cq[idx].astype(jnp.float32) * sc[idx][:, None]
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=1, keepdims=True), 1e-30)

        sample = take_norm(corpus_q, scale, samp_idx)
        np.asarray(sample[0, 0])    # real sync (block_until_ready
        _phase(f"  build: sample gather done "     # is a no-op here)
               f"(+{time.perf_counter() - t_b:.1f}s)")
        learned = kmeans_device(sample, n_centers, iters=kmeans_iters)
        np.asarray(learned[0, 0])
        _phase(f"  build: k-means done (+{time.perf_counter() - t_b:.1f}s)")
        del sample
        kcents = learned / jnp.maximum(
            jnp.linalg.norm(learned, axis=1, keepdims=True), 1e-30)

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames="rows")
        def assign_chunk(out, cq, cents, start, rows):
            # f32 on purpose: assignment must agree with the f32
            # query-side probe ranking or thin-margin rows become
            # unreachable (see ops/ivf.py assign_chunk note)
            x = lax.dynamic_slice(cq, (start, 0),
                                  (rows, cq.shape[1])).astype(jnp.float32)
            inv = lax.rsqrt(jnp.maximum(
                jnp.sum(x * x, axis=1, keepdims=True), 1e-30))
            a = jnp.argmax((x * inv) @ cents.T, axis=1).astype(jnp.int32)
            return lax.dynamic_update_slice(out, a, (start,))

        assign = jnp.zeros(n, jnp.int32)
        done = 0
        while done < n:
            rows = min(chunk_rows, n - done)
            assign = assign_chunk(assign, corpus_q, kcents,
                                  jnp.int32(done), rows)
            done += rows

        @jax.jit
        def layout_of(assign):
            counts = jnp.bincount(assign, length=n_centers)
            order = jnp.argsort(assign)                    # [n]
            inv = jnp.zeros(n, jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            return counts, inv

        np.asarray(assign[0])
        _phase(f"  build: full-corpus assignment done "
               f"(+{time.perf_counter() - t_b:.1f}s)")
        counts_dev, inv = layout_of(assign)
        counts_h = np.asarray(counts_dev)                  # 16 KB pull
        _phase(f"  build: argsort layout done "
               f"(+{time.perf_counter() - t_b:.1f}s)")
        del assign, kcents

        # relayout WITHOUT a second corpus buffer: free the generator-
        # sorted corpus, then regenerate each chunk from its recorded
        # key and scatter rows to their learned-sorted positions
        _phase("real IVF build: relayout by regeneration")
        del corpus_q, scale
        new_q = jnp.zeros((n_pad, d), jnp.int8)
        new_sc = jnp.ones(n_pad, jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames="rows")
        def refill(c, sc, cents, offs, key, inv, start, rows):
            idx = start + jnp.arange(rows, dtype=jnp.int32)
            a = jnp.minimum(
                jnp.searchsorted(offs, idx, side="right"),
                cents.shape[0] - 1)
            chunk = cents[a] + sigma * jax.random.normal(
                key, (rows, d), jnp.float32)
            cq, cs = scalar_quantize(chunk)
            dest = lax.dynamic_slice(inv, (start,), (rows,))
            return c.at[dest].set(cq), sc.at[dest].set(cs)

        for sub, start, rows in chunk_keys:
            new_q, new_sc = refill(new_q, new_sc, centers, offsets_dev,
                                   sub, inv, jnp.int32(start), rows)
        corpus_q, scale = new_q, new_sc
        del inv
        jax.block_until_ready(corpus_q)
        build_s = time.perf_counter() - t_b
        build_mode = "device-kmeans+window-means"
        _phase(f"real IVF build done in {build_s:.1f}s "
               f"(max cluster {int(counts_h.max())}, "
               f"{float(counts_h.max()) * n_centers / n:.2f}x fair)")

    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    # probe centroids: normalized per-window means of the sorted corpus
    from neumann_tpu.ops.ivf import window_mean_centroids

    _phase(f"window-mean probe centroids (w={window})")
    cents_n = window_mean_centroids(corpus_q, rmult, window)
    if not fast_build:
        jax.block_until_ready(cents_n)   # dispatches are async
        build_s = time.perf_counter() - t_b    # include centroid pass
    # queries drawn from the corpus distribution
    kq1, kq2 = jax.random.split(kq)
    q_assign = jax.random.randint(kq1, (q,), 0, n_centers)
    queries = centers[q_assign] + sigma * jax.random.normal(
        kq2, (q, d), jnp.float32)

    # ---------------- batched brute throughput ------------------------
    # two-pass inside one jit: pooled int8 select C + exact f32 rerank.
    # reps is a RUNTIME argument (fori_loop with traced bounds): one
    # compiled program serves every rep count — remote AOT compiles of
    # the 10M-row scan are minutes each and highly variable.
    @functools.partial(jax.jit, static_argnames=("nq",))
    def chain(corpus_q, scale, rmult, qs, reps, nq):
        def body(i, carry):
            cur, acc = carry
            s, idx = int8_pooled_rerank_topk(
                corpus_q, scale, cur, k, oversample=cand // k,
                pool=pool, block_rows=block_rows, n_valid=n,
                row_mult=rmult, selector=brute_selector)
            # data dependence so the loop can't be collapsed; the
            # perturbation is ~1e-30 and does not change the workload
            cur = cur + 1e-30 * (s[0, 0]
                                 + idx[0, 0].astype(jnp.float32) * 1e-6)
            return cur, acc + s[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
        return acc

    def timed(reps, nq):
        t0 = time.perf_counter()
        float(chain(corpus_q, scale, rmult, queries, jnp.int32(reps),
                    nq))
        return time.perf_counter() - t0

    _phase("brute batched scan (+rerank): compiling")
    r1, r2 = 2, 12
    timed(r1, q)  # one compile serves all rep counts
    timed(r2, q)  # warm both shapes'/cache paths
    # noise on this shared tunnel is positive-additive (scheduling /
    # tunnel hiccups only ever ADD time; observed +-7% run to run), so
    # min over more samples converges on the true per-iter floor
    t1 = min(timed(r1, q) for _ in range(6))
    t2 = min(timed(r2, q) for _ in range(6))
    batched_s = (t2 - t1) / (r2 - r1)
    qps = q / batched_s

    # attribution: the selection pass alone, same jit/fori pattern —
    # publishes what the exact rerank costs IN THIS RUN (VERDICT r4 #2
    # asked for measured numbers, not narrative)
    from neumann_tpu.ops.quant import int8_pooled_topk as _pooled_sel

    @functools.partial(jax.jit, static_argnames=("nq",))
    def chain_sel(corpus_q, scale, rmult, qs, reps, nq):
        def body(i, carry):
            cur, acc = carry
            s, idx = _pooled_sel(
                corpus_q, scale, cur, cand, pool=pool,
                block_rows=block_rows, n_valid=n, row_mult=rmult,
                selector=brute_selector)
            cur = cur + 1e-30 * (s[0, 0]
                                 + idx[0, 0].astype(jnp.float32) * 1e-6)
            return cur, acc + s[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
        return acc

    def timed_sel(reps):
        t0 = time.perf_counter()
        float(chain_sel(corpus_q, scale, rmult, queries,
                        jnp.int32(reps), q))
        return time.perf_counter() - t0

    _phase("selection-only attribution pass")
    pooled_s = rerank_ms = None
    try:
        timed_sel(r1)
        timed_sel(r2)
        s1t = min(timed_sel(r1) for _ in range(6))
        s2t = min(timed_sel(r2) for _ in range(6))
        pooled_s = (s2t - s1t) / (r2 - r1)
        rerank_ms = max(0.0, (batched_s - pooled_s) * 1e3)
        _phase(f"selection-only {pooled_s * 1e3:.2f} ms/iter "
               f"({n_pad * d / pooled_s / 1e9:.0f} GB/s); exact "
               f"rerank costs {rerank_ms:.2f} ms per {q}-query batch")
    except Exception as e:  # noqa: BLE001
        _phase(f"selection-only pass failed: {e}")

    _phase(f"brute batched done ({qps:.0f} QPS); batched IVF")

    # ---------------- batched IVF throughput (probe-sharing) -----------
    # The brute pooled scan is FLOP-bound past Q~256 (Q x N x d int8
    # MACs), capping ~21-22K QPS regardless of batch size. The batched
    # probe-sharing pass reads each cluster window once per batch and
    # scores only the queries that probed it — Q x nprobe x window MACs
    # — then reranks exactly. On TPU it rides the VMEM-fused Pallas
    # kernel (ops/pallas_kernels.batched_probe_pallas): top-2-per-pool
    # selection inside the window matmul, pool-winner probe selection,
    # packed-bits presel, MXU block-scan rank tables — the r4 profile
    # sweeps (scripts/profile_batched_ivf.py) measured 86.2K QPS @
    # recall@10 0.9953 at Q=8192/nprobe=128/presel=32 vs 19.4K brute
    # (the per-batch corpus read amortizes with Q; per-query MACs are
    # q_cap-bound and flat).
    bq = 8192 if on_tpu else 64
    b_nprobe = 128 if on_tpu else 8
    b_presel = 32 if on_tpu else 0
    pool_b = window // 128 if on_tpu else 1
    ivf_qps = 0.0
    ivf_batch_recall = None
    b_nprobe_used = None
    batched_curve = []       # [{nprobe, qps, recall_at_10}]
    try:
        if _past_deadline("batched IVF"):
            raise TimeoutError("soft deadline")
        from neumann_tpu.ops.ivf import _batched_core
        from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

        kqb1, kqb2 = jax.random.split(jax.random.PRNGKey(11))
        bq_assign = jax.random.randint(kqb1, (bq,), 0, n_centers)
        bqueries = centers[bq_assign] + sigma * jax.random.normal(
            kqb2, (bq, d), jnp.float32)
        m_b = k + 6
        validq = jnp.ones(bq, bool)
        nq_b = min(64, bq)
        _, ob = jax.jit(int8_exact_topk,
                        static_argnames=("k", "block_rows"))(
            corpus_q, rmult, bqueries[:nq_b], k,
            block_rows=min(block_rows, 256 * 1024))
        ob = np.asarray(ob)

        def rerank_b(buf, posb, cur, sc):
            if on_tpu:      # candidates are already presel survivors
                return gather_rerank_topk_chunked(
                    buf, posb, cur, k, "cosine", first_scores=sc,
                    dedup=False, chunk=128)
            return gather_rerank_topk_chunked(
                buf, posb, cur, k, "cosine", first_scores=sc,
                dedup=True, chunk=128, pre_select=8 * k + 16)

        def run_batched(npb_b):
            """(qps, recall@10) of the probe-sharing batched path at
            one nprobe — called per curve point."""
            expect = -(-bq * npb_b // cents_n.shape[0])
            # kernel MACs scale with q_cap: size to ~1.8x the uniform
            # expectation on a 64-multiple instead of a power of two
            # (256 -> 192 at Q=4096: 71.0K -> 79.2K QPS, zero overflow
            # on the clustered query mix; Q=8192 measured clean at 384)
            q_cap = max(64, (expect * 9 // 5) // 64 * 64)
            if on_tpu:
                core_x = _batched_core(m_b, npb_b, window, q_cap, 8,
                                       selection=pool_b,
                                       fused="pallas",
                                       probe_mode="pool",
                                       presel=b_presel)
            else:
                core_x = _batched_core(m_b, npb_b, window, q_cap, 8)

            @jax.jit
            def chain_x(buf, rm, cents, st, qs, reps):
                def body(i, carry):
                    cur, acc = carry
                    sc, posb, _ = core_x(buf, rm, cents, st, cur,
                                         validq)
                    s, p = rerank_b(buf, posb, cur, sc)
                    cur = cur + 1e-30 * (
                        s[0, 0] + p[0, 0].astype(jnp.float32) * 1e-6)
                    return cur, acc + s[0, 0]
                _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
                return acc

            def timed_x(reps):
                t0 = time.perf_counter()
                float(chain_x(corpus_q, rmult, cents_n, starts_dev,
                              bqueries, jnp.int32(reps)))
                return time.perf_counter() - t0

            rb1, rb2 = 1, 5
            timed_x(rb1)
            timed_x(rb2)
            tb1 = min(timed_x(rb1) for _ in range(3))
            tb2 = min(timed_x(rb2) for _ in range(3))
            qps_x = bq / ((tb2 - tb1) / (rb2 - rb1))
            sc_b, pos_b, _ = core_x(corpus_q, rmult, cents_n,
                                    starts_dev, bqueries, validq)
            _, pb = rerank_b(corpus_q, pos_b, bqueries, sc_b)
            pb = np.asarray(pb)[:nq_b]
            rec_x = float(np.mean([
                len(set(ob[r].tolist()) & set(pb[r].tolist())) / k
                for r in range(nq_b)]))
            return qps_x, rec_x

        _phase(f"batched IVF: compiling (nprobe={b_nprobe})")
        ivf_qps, ivf_batch_recall = run_batched(b_nprobe)
        _phase(f"batched IVF nprobe={b_nprobe}: {ivf_qps:.0f} QPS, "
               f"recall@10 {ivf_batch_recall:.4f}")
        b_nprobe_used = b_nprobe
        batched_curve.append({
            "nprobe": b_nprobe, "qps": round(ivf_qps, 1),
            "recall_at_10": round(ivf_batch_recall, 4)})
        # recall-vs-QPS curve for the batched path too (VERDICT r4 #3):
        # sweep DOWN so the curve shows the knee
        for npb_b in ((64, 32, 16) if on_tpu else (4, 2)):
            if _past_deadline(f"batched curve nprobe={npb_b}"):
                break
            try:
                qx, rx = run_batched(npb_b)
                batched_curve.append({
                    "nprobe": npb_b, "qps": round(qx, 1),
                    "recall_at_10": round(rx, 4)})
                _phase(f"batched IVF nprobe={npb_b}: {qx:.0f} QPS, "
                       f"recall@10 {rx:.4f}")
            except Exception as e:  # noqa: BLE001
                _phase(f"batched curve nprobe={npb_b} failed: {e}")
                break
        # headline = the fastest MEASURED batched point at recall >=
        # 0.99 (the r4 fixed nprobe=128 over-probed: the r5 sweep
        # measured 2.4x more QPS at nprobe=32 with recall unchanged)
        best_b = max((p for p in batched_curve
                      if p["recall_at_10"] >= 0.99),
                     key=lambda p: p["qps"], default=None)
        if best_b is not None and best_b["qps"] > ivf_qps:
            ivf_qps = best_b["qps"]
            ivf_batch_recall = best_b["recall_at_10"]
            b_nprobe_used = best_b["nprobe"]
            _phase(f"batched headline moves to nprobe="
                   f"{b_nprobe_used}: {ivf_qps:.0f} QPS")
    except Exception as e:  # noqa: BLE001 — bench must always print
        _phase(f"batched IVF path failed: {type(e).__name__}: {e}")

    _phase("single-query brute")
    # brute single-query per-iter latency across trials
    timed(r1, 1)
    timed(r2, 1)
    singles = []
    for _ in range(7):
        a = timed(r1, 1)
        b = timed(r2, 1)
        singles.append((b - a) / (r2 - r1))
    singles = [s for s in singles if s > 0] or [float("nan")]
    bp50 = float(np.percentile(singles, 50) * 1e3)
    bp99 = float(np.percentile(singles, 99) * 1e3)

    # ---------------- IVF recall curve (reranked) ----------------------
    # exact oracle: full-corpus scan, f32 queries, f32 math (the only
    # deviation from an all-f32 reference scan is corpus quantization)
    _phase("exact oracle scan (f32 queries)")
    nq_rec = min(q, 64)
    os_, oi = jax.jit(int8_exact_topk,
                      static_argnames=("k", "block_rows"))(
        corpus_q, rmult, queries[:nq_rec], k,
        block_rows=min(block_rows, 256 * 1024))
    oi = np.asarray(oi)

    kk = 4 * k + 16

    def ivf_core_for(nprobe, use_pallas, kq=k):
        kk_q = 4 * kq + 16

        def core(buf, rm, cents, st, qs):
            if use_pallas:
                from neumann_tpu.ops.pallas_kernels import (
                    ivf_windowed_topk_pallas,
                )

                s, pos = ivf_windowed_topk_pallas(
                    buf, rm, cents, st, qs, kk_q, nprobe, window)
            else:
                s, pos = windowed_ivf_topk(
                    buf, rm, cents, st, qs, kk_q, nprobe, window)
            return gather_rerank_topk(buf, pos, qs, kq, "cosine",
                                      first_scores=s, dedup=True)
        return core

    def ivf_recall(nprobe, use_pallas=False, kq=k, oracle=None):
        oracle = oi if oracle is None else oracle
        core = jax.jit(ivf_core_for(nprobe, use_pallas, kq))
        ids = []
        for r0 in range(0, nq_rec, 4):
            _, p_c = core(corpus_q, rmult, cents_n, starts_dev,
                          queries[r0: r0 + 4])
            ids.append(np.asarray(p_c))
        ids = np.concatenate(ids, axis=0)
        return float(np.mean([
            len(set(oracle[r].tolist()) & set(ids[r].tolist())) / kq
            for r in range(nq_rec)]))

    # single-query latency harness (used per curve point and for
    # the headline p50/p99 below)
    def measure_ivf(core, trials=7):
        @jax.jit
        def ivf_chain(buf, rmult, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                s, pos = core(buf, rmult, cents, st, cur)
                cur = cur + 1e-30 * (
                    s[0, 0] + pos[0, 0].astype(jnp.float32) * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs[:1], 0.0))
            return acc

        def ivf_timed(reps):
            t0 = time.perf_counter()
            float(ivf_chain(corpus_q, rmult, cents_n, starts_dev,
                            queries, jnp.int32(reps)))
            return time.perf_counter() - t0

        ri1, ri2 = 4, 44
        ivf_timed(ri1)
        ivf_timed(ri2)
        singles_ = []
        for _ in range(trials):
            a = ivf_timed(ri1)
            b = ivf_timed(ri2)
            singles_.append((b - a) / (ri2 - ri1))
        singles_ = [s for s in singles_ if s > 0] or [float("nan")]
        return (float(np.percentile(singles_, 50) * 1e3),
                float(np.percentile(singles_, 99) * 1e3))


    # full recall-vs-nprobe curve (BASELINE.md: the artifact the
    # reference does NOT publish — measured, >=5 points, not projected)
    curve = {}
    curve_full = []          # [{nprobe, recall_at_10, p50_ms, qps}]
    headline_nprobe = None
    for j, npb in enumerate(nprobe_curve):
        curve[npb] = round(ivf_recall(npb), 4)
        point = {"nprobe": npb, "recall_at_10": curve[npb]}
        try:
            if not _past_deadline(f"latency point nprobe={npb}"):
                cp50, cp99 = measure_ivf(
                    ivf_core_for(npb, False), trials=3)
                point["p50_ms"] = round(cp50, 3)
                point["p99_ms"] = round(cp99, 3)
                point["qps"] = round(1e3 / cp50, 1)
        except Exception as e:  # noqa: BLE001
            _phase(f"curve latency nprobe={npb} failed: {e}")
        curve_full.append(point)
        _phase(f"IVF curve nprobe={npb}: recall@10 {curve[npb]}"
               + (f", p50 {point['p50_ms']} ms, {point['qps']} QPS"
                  if "p50_ms" in point else ""))
        if headline_nprobe is None and curve[npb] >= 0.99:
            headline_nprobe = npb
        if j + 1 < len(nprobe_curve) and _past_deadline(
                "rest of the recall curve"):
            break
    if headline_nprobe is None:          # nothing reached 0.99
        headline_nprobe = max(curve, key=curve.get)
    ivf_recall_headline = curve[headline_nprobe]

    # ---------------- residual-loss attribution ------------------------
    # recall saturates below 1.0: is the residual loss probe-bound
    # (oracle row's window never probed -> more nprobe could help) or
    # selection/rerank-bound (window probed, row still lost -> kk /
    # in-window selection)? (VERDICT r4 #3)
    residual = {}
    try:
        if not _past_deadline("residual-loss attribution"):
            sat_np = max(curve)              # most-probed point
            core_sat = jax.jit(ivf_core_for(sat_np, False))
            ids_sat = []
            for r0 in range(0, nq_rec, 4):
                _, p_c = core_sat(corpus_q, rmult, cents_n,
                                  starts_dev, queries[r0: r0 + 4])
                ids_sat.append(np.asarray(p_c))
            ids_sat = np.concatenate(ids_sat, axis=0)
            cents_h = np.asarray(cents_n)            # [W, d] ~15 MB
            qh = np.asarray(queries[:nq_rec]).astype(np.float32)
            qn = qh / np.maximum(
                np.linalg.norm(qh, axis=1, keepdims=True), 1e-30)
            probe_rank = np.argsort(-(qn @ cents_h.T), axis=1)
            probed = probe_rank[:, :sat_np]          # [nq, sat_np]
            missed_probed = missed_unprobed = 0
            for r in range(nq_rec):
                got = set(ids_sat[r].tolist())
                pr = set(probed[r].tolist())
                for oid in oi[r].tolist():
                    if oid in got:
                        continue
                    if (oid // window) in pr:
                        missed_probed += 1
                    else:
                        missed_unprobed += 1
            total_true = nq_rec * k
            residual = {
                "nprobe": sat_np,
                "lost_in_probed_window": missed_probed,
                "lost_window_never_probed": missed_unprobed,
                "of_true_neighbors": total_true,
            }
            _phase(f"residual loss @nprobe={sat_np}: "
                   f"{missed_probed} lost inside probed windows, "
                   f"{missed_unprobed} in never-probed windows "
                   f"(of {total_true})")
            if missed_probed:
                # selection-bound loss: candidate cap kk is the lever —
                # measure recall with doubled kk to show recoverability
                def wide_core(buf, rm, cents, st, qs):
                    s, pos = windowed_ivf_topk(
                        buf, rm, cents, st, qs, 2 * kk, sat_np,
                        window)
                    return gather_rerank_topk(buf, pos, qs, k,
                                              "cosine",
                                              first_scores=s,
                                              dedup=True)
                wc = jax.jit(wide_core)
                ids_w = []
                for r0 in range(0, nq_rec, 4):
                    _, p_c = wc(corpus_q, rmult, cents_n, starts_dev,
                                queries[r0: r0 + 4])
                    ids_w.append(np.asarray(p_c))
                ids_w = np.concatenate(ids_w, axis=0)
                rec_w = float(np.mean([
                    len(set(oi[r].tolist())
                        & set(ids_w[r].tolist())) / k
                    for r in range(nq_rec)]))
                residual["recall_with_2x_candidates"] = round(rec_w, 4)
                _phase(f"residual: recall with 2x kk = {rec_w:.4f}")
    except Exception as e:  # noqa: BLE001
        _phase(f"residual attribution failed: {type(e).__name__}: {e}")

    # recall at k=1 and k=100 (same headline nprobe, own oracles)
    recall_k = {"10": ivf_recall_headline}
    try:
        if not _past_deadline("k=1/k=100 recall points"):
            for kq in (1, 100):
                _, o_kq = jax.jit(
                    int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
                    corpus_q, rmult, queries[:nq_rec], kq,
                    block_rows=min(block_rows, 256 * 1024))
                recall_k[str(kq)] = round(ivf_recall(
                    headline_nprobe, kq=kq, oracle=np.asarray(o_kq)),
                    4)
                _phase(f"IVF recall@{kq} (nprobe={headline_nprobe}): "
                       f"{recall_k[str(kq)]}")
    except Exception as e:  # noqa: BLE001
        _phase(f"k-sweep failed: {type(e).__name__}: {e}")

    # ---------------- single-query IVF latency ------------------------
    # Measured twice: the XLA windowed core and (when Mosaic is up) the
    # fused Pallas probe kernel; the faster one is the headline p99.
    _phase(f"IVF single-query latency (XLA core, nprobe="
           f"{headline_nprobe})")
    ip50, ip99 = measure_ivf(ivf_core_for(headline_nprobe, False))
    ivf_path = "xla"
    xla_p99 = ip99
    if window % 128 == 0 and not _past_deadline("Pallas core"):
        try:
            _phase(f"IVF XLA p99 {ip99:.2f} ms; Pallas core")
            pp50, pp99 = measure_ivf(
                ivf_core_for(headline_nprobe, True))
            if pp99 < ip99:
                ip50, ip99, ivf_path = pp50, pp99, "pallas"
                # headline recall must come through the headline core
                # (approx_max_k in the Pallas path can differ slightly)
                ivf_recall_headline = round(
                    ivf_recall(headline_nprobe, use_pallas=True), 4)
                _phase(f"IVF recall via Pallas core: "
                       f"{ivf_recall_headline}")
        except Exception:
            pass

    # ---------------- brute recall vs fp32 oracle ----------------------
    # measured on a SHUFFLED subset: engine slabs are insertion-ordered
    # (~random), and pooled selection assumes neighbors are
    # uncorrelated — the cluster-sorted bench layout (an IVF-only
    # memory optimization) would otherwise collide a query's whole
    # answer set into one pool and understate deployment recall.
    _phase("pooled+rerank recall oracle")
    perm = jax.random.permutation(jax.random.PRNGKey(3), oracle_rows)
    sub_q = corpus_q[:oracle_rows][perm]
    sub_scale = scale[:oracle_rows][perm]
    sub_rmult = jax.jit(int8_cosine_row_mult)(sub_q, sub_scale)
    # subset queries are perturbed SUBSET rows: the cluster-sorted 10M
    # corpus puts only a fraction of the clusters in the first 1M rows,
    # so corpus-wide queries would have no cluster in the subset and
    # their "top-10" would be meaningless loose ties; a perturbed
    # resident row reproduces the deployment shape (query's cluster
    # present, corpus shuffled)
    kq3, kq4 = jax.random.split(jax.random.PRNGKey(5))
    pick = jax.random.randint(kq3, (nq_rec,), 0, oracle_rows)
    qsub = (sub_q[pick].astype(jnp.float32) * sub_scale[pick][:, None]
            + (sigma / 2) * jax.random.normal(kq4, (nq_rec, d)))
    _, fi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        sub_q, sub_rmult, qsub, k, block_rows=min(block_rows,
                                                  256 * 1024))
    pool_rec = max(64, pool * oracle_rows // n_pad)
    _, qi = jax.jit(int8_pooled_rerank_topk,
                    static_argnames=("k", "oversample", "pool",
                                     "block_rows", "selector"))(
        sub_q, sub_scale, qsub, k, oversample=cand // k,
        pool=pool_rec, block_rows=block_rows,
        selector=brute_selector)
    fi = np.asarray(fi)
    qi = np.asarray(qi)
    recall = float(np.mean([
        len(set(fi[r].tolist()) & set(qi[r].tolist())) / k
        for r in range(nq_rec)]))
    # selection recall: does the exact top-k survive the pooled FIRST
    # pass's candidate set? (isolates selection loss from rerank)
    from neumann_tpu.ops.quant import int8_pooled_topk

    _, ci = jax.jit(int8_pooled_topk,
                    static_argnames=("k", "pool", "block_rows",
                                     "selector"))(
        sub_q, sub_scale, qsub, cand, pool=pool_rec,
        block_rows=block_rows, selector=brute_selector)
    ci = np.asarray(ci)
    sel_recall = float(np.mean([
        len(set(fi[r].tolist()) & set(ci[r].tolist())) / k
        for r in range(nq_rec)]))

    # ---------------- served (gRPC end-to-end, 10M corpus) -------------
    # The BASELINE p99 target is a SERVING number: vectors in, results
    # out, through the real gRPC server (binary PointsService paths +
    # native codec + coalescing batchers). Big device buffers from the
    # kernel phases are dropped first so the served engine's auto-IVF
    # fits HBM alongside nothing.
    import gc

    del corpus_q, scale, rmult, cents_n, sub_q, sub_scale, sub_rmult
    del qsub, fi, qi, ci
    gc.collect()

    ref_qps = 1e9 / (REF_NS_PER_VEC_768 * n)   # reference rate on this n
    # headline = the fastest batched path at recall >= 0.99; the brute
    # scan stays the headline when the batched IVF misses either bar
    headline_qps, headline_path = qps, "brute+rerank"
    if ivf_qps > qps and (ivf_batch_recall or 0) >= 0.99:
        headline_qps, headline_path = ivf_qps, "batched-ivf+rerank"
    row = {
        "metric": f"batched SIMILAR top-{k} QPS, {n}x{d} int8 corpus",
        "value": round(headline_qps, 2),
        "unit": "QPS",
        "vs_baseline": round(headline_qps / ref_qps, 1),
        "headline_path": headline_path,
        "qps_brute_batch": round(qps, 1),
        "qps_batched_ivf": round(ivf_qps, 1),
        "batched_ivf_recall_at_10": ivf_batch_recall,
        "batched_ivf_batch": bq,
        "batched_ivf_nprobe": (b_nprobe_used
                               if ivf_batch_recall is not None
                               else None),
        "p50_ms": round(ip50, 3),        # single-query via IVF+rerank
        "p99_ms": round(ip99, 3),        # (the BASELINE.md p99 target)
        "ivf_recall_at_10": ivf_recall_headline,
        "ivf_recall_curve": {str(kk_): v for kk_, v in curve.items()},
        "ivf_curve": curve_full,    # [{nprobe, recall_at_10, p50_ms, qps}]
        "ivf_batched_curve": batched_curve,
        "ivf_residual_loss": residual,
        "ivf_recall_k": recall_k,
        "ivf_nprobe": headline_nprobe,
        "ivf_window": window,
        "ivf_path": ivf_path,
        "ivf_build": build_mode,
        "ivf_build_s": round(build_s, 1),
        "ivf_p99_ms_xla": round(xla_p99, 3),
        "p50_ms_brute": round(bp50, 3),  # single-query full scan
        "p99_ms_brute": round(bp99, 3),
        "recall_at_10_vs_fp32": round(recall, 4),
        "selection_recall_at_10": round(sel_recall, 4),
        "rerank_candidates": cand,
        "brute_pool": pool,
        "brute_selector": brute_selector,
        "batch": q,
        "platform": dev.platform,
        "device_health_GBps": (round(health_gbps, 1)
                               if health_gbps else None),
        "scan_GBps": round(n_pad * d / batched_s / 1e9, 1),
        "scan_GBps_selection_only": (
            round(n_pad * d / pooled_s / 1e9, 1)
            if pooled_s else None),
        "rerank_ms_batch": (round(rerank_ms, 2)
                            if rerank_ms is not None else None),
    }
    # provisional line FIRST: the 10M served phase (auto-IVF build +
    # serving compiles) can run tens of minutes, and a driver that
    # times the whole script out must still find a parseable artifact
    # as the last stdout line. The final line below supersedes it.
    print(json.dumps(row), flush=True)
    _phase("kernel numbers emitted; starting served phase")
    served = _served_phase(on_tpu, d, k)
    if served:
        row.update(served)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
