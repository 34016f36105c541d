"""Headline benchmark: SIMILAR top-10 over a 10M x 768 int8 corpus.

Two recorded paths, both on however many chips are present (one under
the driver):

1. Batched brute scan (throughput): ops.quant.int8_pooled_topk — int8
   MXU matmul with pooling expressed as a free dot dimension (so XLA
   fuses the segmented max into the matmul consumer), the within-pool
   argmax carried in the low mantissa bits of the bitcast score, and an
   exact top-k over the [Q, N/pool] candidates. Measured 677 GB/s at
   Q=256 on v5e-1 vs a 739 GB/s matmul-only ceiling.
2. Single-query IVF-nprobe (latency): ops.ivf windowed cluster-sorted
   layout — each probe reads a fixed window at its cluster's offset, so
   HBM reads drop to ~nprobe/n_clusters of the corpus. This is the
   p99 < 5 ms path from BASELINE.md's target block; its recall@10 is
   measured against an exact full-corpus int8 oracle and reported.

The corpus is a mixture of Gaussians generated directly in
cluster-sorted order on device (the dev tunnel moves ~MB/s, so host
staging 7.7 GB is not viable); the generating centers serve as the IVF
centroids — exactly what an offline k-means build recovers. Clustered
data is also the realistic regime for embedding corpora; the brute
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


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast if the TPU tunnel is hung. jax.devices() on a healthy
    backend returns in seconds (observed outages hang it for hours);
    probing in a SUBPROCESS keeps this interpreter's jax uninitialized
    so the real run below is unaffected."""
    import os
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


def main():
    _probe_backend()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.ivf import windowed_ivf_topk
    from neumann_tpu.ops.quant import (
        int8_cosine_row_mult,
        int8_pooled_topk,
        scalar_quantize,
    )
    from neumann_tpu.ops.scan import topk_scan_jit

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        n, d, q, k = 10_000_000, 768, 256, 10
        n_centers = 4096
        block_rows = 1 << 20
        pool = 2048      # clustered corpora collide more per pool than
        oracle_rows = 1 << 20   # random ones; 2048 buys recall ~free
        nprobe = 72
    else:  # CPU smoke fallback so the bench always runs
        n, d, q, k = 100_000, 128, 16, 10
        n_centers = 256
        block_rows = 1 << 15
        pool = 128
        oracle_rows = 1 << 15
        nprobe = 16

    n_pad = -(-n // block_rows) * block_rows
    sigma = 0.25

    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    # cluster histogram (multinomial) and sorted-order offsets on host;
    # rows are generated directly in cluster-sorted order, so the IVF
    # layout needs no reorder pass (and no second corpus in HBM)
    rng = np.random.default_rng(0)
    counts = rng.multinomial(n, np.ones(n_centers) / n_centers)
    offsets = np.cumsum(counts)
    starts = np.concatenate([[0], offsets[:-1]])
    # 128-aligned windows: whole-block probes, which also lets the
    # fused Pallas probe kernel (scalar-prefetch block indexing) run
    window = int(min(n, ((int(counts.max()) + 127) // 128) * 128 + 128))
    starts_dev = jnp.asarray(
        ((np.clip(starts, 0, max(0, n - window)) // 128) * 128)
        .astype(np.int32))
    offsets_dev = jnp.asarray(offsets.astype(np.int32))

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
    done = 0
    while done < n:
        rows = min(chunk_rows, n - done)
        kn, sub = jax.random.split(kn)
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    # queries drawn from the corpus distribution
    kq1, kq2 = jax.random.split(kq)
    q_assign = jax.random.randint(kq1, (q,), 0, n_centers)
    queries = centers[q_assign] + sigma * jax.random.normal(
        kq2, (q, d), jnp.float32)

    # ---------------- batched brute throughput ------------------------
    # reps is a RUNTIME argument (fori_loop with traced bounds): one
    # compiled program serves every rep count — remote AOT compiles of
    # the 10M-row scan are minutes each and highly variable, so the
    # old per-rep-count static compile doubled the wall time
    @functools.partial(jax.jit, static_argnames=("nq",))
    def chain(corpus_q, scale, rmult, qs, reps, nq):
        def body(i, carry):
            cur, acc = carry
            s, idx = int8_pooled_topk(corpus_q, scale, cur, k, pool=pool,
                                      block_rows=block_rows, n_valid=n,
                                      row_mult=rmult)
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

    _phase("brute batched scan: compiling")
    r1, r2 = 2, 12
    timed(r1, q)  # one compile serves all rep counts
    timed(r2, q)  # warm both shapes'/cache paths
    t1 = min(timed(r1, q) for _ in range(3))
    t2 = min(timed(r2, q) for _ in range(3))
    batched_s = (t2 - t1) / (r2 - r1)
    qps = q / batched_s

    _phase(f"brute batched done ({q / ((t2 - t1) / (r2 - r1)):.0f} "
           "QPS); single-query brute")
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

    # ---------------- single-query IVF latency ------------------------
    # Measured twice: the XLA windowed core and (when Mosaic is up) the
    # fused Pallas probe kernel; the faster one is the headline p99.
    cents_n = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    def measure_ivf(core):
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
        for _ in range(7):
            a = ivf_timed(ri1)
            b = ivf_timed(ri2)
            singles_.append((b - a) / (ri2 - ri1))
        singles_ = [s for s in singles_ if s > 0] or [float("nan")]
        return (float(np.percentile(singles_, 50) * 1e3),
                float(np.percentile(singles_, 99) * 1e3))

    def xla_core(buf, rmult, cents, st, qs):
        return windowed_ivf_topk(buf, rmult, cents, st, qs,
                                 k, nprobe, window)

    _phase("IVF single-query (XLA core)")
    ip50, ip99 = measure_ivf(xla_core)
    ivf_path = "xla"
    xla_p99 = ip99
    ivf_windowed_topk_pallas = None
    if window % 128 == 0:
        try:
            from neumann_tpu.ops.pallas_kernels import (
                ivf_windowed_topk_pallas,
            )

            def pallas_core(buf, rmult, cents, st, qs):
                return ivf_windowed_topk_pallas(
                    buf, rmult, cents, st, qs, k, nprobe, window)

            _phase(f"IVF XLA p99 {ip99:.2f} ms; Pallas core")
            pp50, pp99 = measure_ivf(pallas_core)
            if pp99 < ip99:
                ip50, ip99, ivf_path = pp50, pp99, "pallas"
        except Exception:
            ivf_windowed_topk_pallas = None

    # IVF recall@10 vs the exact full-corpus int8 scan (positions are
    # row ids: the corpus is born cluster-sorted)
    _phase("recall oracles")
    nq_rec = min(q, 64)
    from neumann_tpu.ops.quant import int8_topk_scan_jit

    valid = jnp.arange(n_pad) < n
    _, oracle_idx = int8_topk_scan_jit(
        corpus_q, scale, queries[:nq_rec], k, "cosine", mask=valid,
        block_rows=block_rows)
    # small query batches: each query gathers [nprobe, window, d]
    # candidates, so a 64-wide batch would materialize ~32 GB in HBM.
    # Recall is measured through the SAME core the headline latency
    # used (the Pallas path when it won).
    def recall_core(qs):
        if ivf_path == "pallas":
            return ivf_windowed_topk_pallas(
                corpus_q, rmult, cents_n, starts_dev, qs,
                2 * k + 8, nprobe, window)
        return windowed_ivf_topk(
            corpus_q, rmult, cents_n, starts_dev, qs,
            2 * k + 8, nprobe, window)

    sv_parts, pv_parts = [], []
    for r0 in range(0, nq_rec, 4):
        s_c, p_c = recall_core(queries[r0: r0 + 4])
        sv_parts.append(np.asarray(s_c))
        pv_parts.append(np.asarray(p_c))
    oi = np.asarray(oracle_idx)
    pv = np.concatenate(pv_parts, axis=0)
    sv = np.concatenate(sv_parts, axis=0)
    recs = []
    for r in range(nq_rec):
        uniq = []
        seen = set()
        for j in range(pv.shape[1]):
            p = int(pv[r, j])
            if np.isfinite(sv[r, j]) and p not in seen:
                seen.add(p)
                uniq.append(p)
            if len(uniq) >= k:
                break
        recs.append(len(set(oi[r].tolist()) & set(uniq)) / k)
    ivf_recall = float(np.mean(recs))

    # brute-int8 recall@10 vs exact fp32 oracle on a subset. The subset
    # is SHUFFLED first: engine slabs are insertion-ordered (~random),
    # and the pooled scan's within-pool argmax assumes neighbors are
    # uncorrelated — the cluster-sorted bench layout (an IVF-only
    # memory optimization) would otherwise collide a query's whole
    # answer set into one pool and understate deployment recall.
    perm = jax.random.permutation(jax.random.PRNGKey(3), oracle_rows)
    sub_q = corpus_q[:oracle_rows][perm]
    sub_scale = scale[:oracle_rows][perm]
    sub_f32 = sub_q.astype(jnp.float32) * sub_scale[:, None]
    _, fi = topk_scan_jit(sub_f32, queries[:nq_rec], k, "cosine",
                          block_rows=block_rows)
    pool_rec = max(64, pool * oracle_rows // n_pad)
    _, qi = jax.jit(int8_pooled_topk,
                    static_argnames=("k", "pool", "block_rows"))(
        sub_q, sub_scale, queries[:nq_rec], k, pool=pool_rec,
        block_rows=block_rows, row_mult=rmult[:oracle_rows][perm])
    fi = np.asarray(fi)
    qi = np.asarray(qi)
    recall = float(np.mean([
        len(set(fi[r].tolist()) & set(qi[r].tolist())) / k
        for r in range(nq_rec)]))
    # selection recall: pooled top-k vs the EXACT scan over the same
    # int8 data — isolates pooling loss from int8-vs-fp32 quantization
    # (the reference stores f32; at 10Mx768 one 16 GB chip cannot)
    _, ei = int8_topk_scan_jit(
        sub_q, sub_scale, queries[:nq_rec], k, "cosine",
        block_rows=block_rows)
    ei = np.asarray(ei)
    sel_recall = float(np.mean([
        len(set(ei[r].tolist()) & set(qi[r].tolist())) / k
        for r in range(nq_rec)]))

    ref_qps = 1e9 / (REF_NS_PER_VEC_768 * n)   # reference rate on this n
    print(json.dumps({
        "metric": f"batched SIMILAR top-{k} QPS, {n}x{d} int8 corpus",
        "value": round(qps, 2),
        "unit": "QPS",
        "vs_baseline": round(qps / ref_qps, 1),
        "p50_ms": round(ip50, 3),        # single-query via auto-IVF
        "p99_ms": round(ip99, 3),        # (the BASELINE.md p99 target)
        "ivf_recall_at_10": round(ivf_recall, 4),
        "ivf_nprobe": nprobe,
        "ivf_window": window,
        "ivf_path": ivf_path,
        "ivf_p99_ms_xla": round(xla_p99, 3),
        "p50_ms_brute": round(bp50, 3),  # single-query full scan
        "p99_ms_brute": round(bp99, 3),
        "recall_at_10_vs_fp32": round(recall, 4),
        "selection_recall_at_10": round(sel_recall, 4),
        "batch": q,
        "platform": dev.platform,
        "scan_GBps": round(n_pad * d / batched_s / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
