"""Fixed-window vs legacy cluster-window IVF layout, at 10M-like density.

Generates a 2M x 768 clustered corpus with the 10M bench's rows-per-
cluster density (819 centers -> ~2442 rows/cluster), cluster-sorted on
device like bench.py, then measures for each layout:

  1. recall@10 vs an exact int8-oracle scan, over an nprobe sweep
     matched by ROWS READ per query;
  2. single-query latency (XLA windowed core + rerank);
  3. batched probe-sharing QPS at Q=1024 (+ recall).

Usage: python tools/exp_fixed_window.py [--windows 1024,2048] [--n 2000000]
"""

import argparse
import functools
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--centers", type=int, default=819)
    ap.add_argument("--windows", default="1024,2048")
    ap.add_argument("--batched", action="store_true",
                    help="also measure batched QPS per config")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.ivf import (
        window_mean_centroids, windowed_ivf_topk, batched_ivf_topk,
    )
    from neumann_tpu.ops.quant import (
        int8_cosine_row_mult, int8_exact_topk, scalar_quantize,
    )
    from neumann_tpu.ops.rerank import (
        gather_rerank_topk, gather_rerank_topk_chunked,
    )

    n, d, k = args.n, 768, 10
    n_centers = args.centers
    sigma = 0.25
    print(f"# device: {jax.devices()[0]}", flush=True)

    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    rng = np.random.default_rng(0)
    counts = rng.multinomial(n, np.ones(n_centers) / n_centers)
    offsets = np.cumsum(counts)
    offsets_dev = jnp.asarray(offsets.astype(np.int32))

    # legacy aligned layout (window sized to fattest cluster)
    starts_h = np.zeros(n_centers, np.int64)
    np.cumsum(counts[:-1], out=starts_h[1:])
    w_max = int(((counts.max() + 127) // 128) * 128 + 128)
    n_pad_base = ((n + 127) // 128) * 128

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames="rows")
    def fill(c, sc, cents, offs, key, start, rows):
        idx = start + jnp.arange(rows, dtype=jnp.int32)
        assign = jnp.minimum(
            jnp.searchsorted(offs, idx, side="right"),
            cents.shape[0] - 1)
        chunk = cents[assign] + sigma * jax.random.normal(
            key, (rows, d), jnp.float32)
        cq, cs = scalar_quantize(chunk)
        c = lax.dynamic_update_slice(c, cq, (start, 0))
        sc = lax.dynamic_update_slice(sc, cs, (start,))
        return c, sc

    # pad generously so every window size divides (lcm of 128-multiples
    # up to 2560 is big; just pad per-layout by slicing from a max pad)
    win_list = [int(w) for w in args.windows.split(",")]
    n_pad = n_pad_base
    for w in win_list:
        n_pad = max(n_pad, -(-n // w) * w)
    # make n_pad a common multiple of all requested windows
    def lcm(a, b):
        from math import gcd
        return a * b // gcd(a, b)
    m = 128
    for w in win_list:
        m = lcm(m, w)
    n_pad = -(-n_pad // m) * m

    t0 = time.time()
    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)
    done = 0
    while done < n:
        rows = min(1_000_000, n - done)
        kn, sub = jax.random.split(kn)
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    jax.block_until_ready(rmult)
    print(f"# corpus {n}x{d} generated in {time.time()-t0:.1f}s "
          f"(n_pad {n_pad})", flush=True)

    kq1, kq2 = jax.random.split(kq)
    nq = 64
    q_assign = jax.random.randint(kq1, (nq,), 0, n_centers)
    queries = centers[q_assign] + sigma * jax.random.normal(
        kq2, (nq, d), jnp.float32)

    print("# exact oracle", flush=True)
    _, oi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        corpus_q, rmult, queries, k, block_rows=256 * 1024)
    oi = np.asarray(oi)

    cents_gen = centers / jnp.linalg.norm(centers, axis=1,
                                          keepdims=True)
    starts_legacy = jnp.asarray(
        ((np.clip(starts_h, 0, max(0, n_pad - w_max)) // 128) * 128
         ).astype(np.int32))

    def recall_of(cents, starts, window, nprobe):
        kk = 4 * k + 16
        core = jax.jit(functools.partial(
            windowed_ivf_topk, k=kk, nprobe=nprobe, window=window))
        ids = []
        for r0 in range(0, nq, 4):
            s, p = core(corpus_q, rmult, cents, starts,
                        queries[r0:r0 + 4])
            _, pr = gather_rerank_topk(corpus_q, p, queries[r0:r0 + 4],
                                       k, "cosine", first_scores=s,
                                       dedup=True)
            ids.append(np.asarray(pr))
        ids = np.concatenate(ids)
        return float(np.mean([
            len(set(oi[r].tolist()) & set(ids[r].tolist())) / k
            for r in range(nq)]))

    def latency_of(cents, starts, window, nprobe):
        kk = 4 * k + 16

        def core(buf, rm, cents, st, qs):
            s, p = windowed_ivf_topk(buf, rm, cents, st, qs, kk,
                                     nprobe, window)
            return gather_rerank_topk(buf, p, qs, k, "cosine",
                                      first_scores=s, dedup=True)

        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                s, pos = core(buf, rm, cents, st, cur)
                cur = cur + 1e-30 * (s[0, 0] + pos[0, 0].astype(
                    jnp.float32) * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs[:1], 0.0))
            return acc

        def timed(reps):
            t0 = time.perf_counter()
            float(chain(corpus_q, rmult, cents, starts, queries,
                        jnp.int32(reps)))
            return time.perf_counter() - t0

        timed(4)
        timed(44)
        vals = []
        for _ in range(5):
            a = timed(4)
            b = timed(44)
            vals.append((b - a) / 40)
        return float(np.median([v for v in vals if v > 0]) * 1e3)

    def batched_of(cents, starts, window, nprobe, bq=1024):
        C = cents.shape[0]
        kb1, kb2 = jax.random.split(jax.random.PRNGKey(11))
        ba = jax.random.randint(kb1, (bq,), 0, n_centers)
        bqs = centers[ba] + sigma * jax.random.normal(kb2, (bq, d),
                                                      jnp.float32)
        m_b = k + 6
        expect = -(-bq * nprobe // C)
        q_cap = 1 << (max(32, 2 * expect) - 1).bit_length()
        validq = jnp.ones(bq, bool)

        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                sc, posb, _ = batched_ivf_topk(
                    buf, rm, cents, st, cur, nprobe, window, m_b,
                    q_cap, group=8, valid_q=validq)
                s, p = gather_rerank_topk_chunked(
                    buf, posb, cur, k, "cosine", first_scores=sc,
                    dedup=True, chunk=128, pre_select=8 * k + 16)
                cur = cur + 1e-30 * (s[0, 0] + p[0, 0].astype(
                    jnp.float32) * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

        def timed(reps):
            t0 = time.perf_counter()
            float(chain(corpus_q, rmult, cents, starts, bqs,
                        jnp.int32(reps)))
            return time.perf_counter() - t0

        t0 = time.time()
        timed(1)
        print(f"#   batched compile+1 {time.time()-t0:.1f}s",
              flush=True)
        timed(5)
        a = min(timed(1) for _ in range(3))
        b = min(timed(5) for _ in range(3))
        per = (b - a) / 4
        return bq / per, q_cap

    # --- legacy layout ---
    base_read = 72 * w_max  # the r2 operating point's bytes/query
    for npb in (48, 72):
        r = recall_of(cents_gen, starts_legacy, w_max, npb)
        print(f"legacy w={w_max} nprobe={npb} rows={npb*w_max}: "
              f"recall={r:.4f}", flush=True)
    lat = latency_of(cents_gen, starts_legacy, w_max, 72)
    print(f"legacy w={w_max} nprobe=72: p50~{lat:.3f} ms", flush=True)
    if args.batched:
        qps, qc = batched_of(cents_gen, starts_legacy, w_max, 72)
        print(f"legacy batched nprobe=72 q_cap={qc}: {qps:.0f} QPS",
              flush=True)

    # --- fixed windows ---
    for w in win_list:
        assert n_pad % w == 0
        n_w = n_pad // w
        starts_f = jnp.arange(n_w, dtype=jnp.int32) * w
        t0 = time.time()
        cents_f = window_mean_centroids(corpus_q, rmult, w)
        jax.block_until_ready(cents_f)
        t_c = time.time() - t0
        print(f"# fixed w={w}: n_w={n_w} cents in {t_c:.1f}s",
              flush=True)
        for npb in sorted({max(4, base_read // w // 2),
                           max(8, base_read // w),
                           max(8, base_read * 2 // w)}):
            npb = min(npb, n_w)
            r = recall_of(cents_f, starts_f, w, npb)
            print(f"fixed w={w} nprobe={npb} rows={npb*w}: "
                  f"recall={r:.4f}", flush=True)
        npb_eq = min(max(8, base_read // w), n_w)
        lat = latency_of(cents_f, starts_f, w, npb_eq)
        print(f"fixed w={w} nprobe={npb_eq}: p50~{lat:.3f} ms",
              flush=True)
        if args.batched:
            qps, qc = batched_of(cents_f, starts_f, w, npb_eq)
            print(f"fixed w={w} batched nprobe={npb_eq} q_cap={qc}: "
                  f"{qps:.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
