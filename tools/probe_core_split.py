"""Split the batched-IVF batch time into core-scan vs rerank at 10M.

Reuses the bench's exact corpus generation and program shapes (the
core+rerank chain is the one bench.py compiles, so it should be warm in
the remote compile cache); the core-only chain is the same subgraph
minus the rerank. Prints one JSON line per measurement.
"""

import functools
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.ivf import _batched_core, window_mean_centroids
    from neumann_tpu.ops.quant import int8_cosine_row_mult, scalar_quantize
    from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"# device: {dev}", file=sys.stderr, flush=True)
    if on_tpu:
        n, d, k = 10_000_000, 768, 10
        n_centers = 4096
        block_rows = 1 << 20
        window = int(os.environ.get("PROBE_WINDOW", "2048"))
        bq = 1024
        b_nprobe = int(os.environ.get("PROBE_NPROBE", "96"))
    else:
        n, d, k = 100_000, 128, 10
        n_centers = 256
        block_rows = 1 << 15
        window = 1024
        bq, b_nprobe = 64, 8
    n_pad = -(-n // block_rows) * block_rows
    sigma = 0.25

    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    rng = np.random.default_rng(0)
    counts = rng.multinomial(n, np.ones(n_centers) / n_centers)
    offsets_dev = jnp.asarray(np.cumsum(counts).astype(np.int32))
    starts_dev = jnp.arange(n_pad // window, dtype=jnp.int32) * window

    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)

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
        return (lax.dynamic_update_slice(c, cq, (start, 0)),
                lax.dynamic_update_slice(sc, cs, (start,)))

    done = 0
    while done < n:
        rows = min(1_000_000, n - done)
        kn, sub = jax.random.split(kn)
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    cents_n = window_mean_centroids(corpus_q, rmult, window)
    print(f"# corpus ready +{time.time():.0f}", file=sys.stderr,
          flush=True)

    kqb1, kqb2 = jax.random.split(jax.random.PRNGKey(11))
    bq_assign = jax.random.randint(kqb1, (bq,), 0, n_centers)
    bqueries = centers[bq_assign] + sigma * jax.random.normal(
        kqb2, (bq, d), jnp.float32)
    m_b = k + 6
    expect = -(-bq * b_nprobe // cents_n.shape[0])
    q_cap = 1 << (max(32, 2 * expect) - 1).bit_length()
    validq = jnp.ones(bq, bool)

    def make_core_only(selection, stream=False):
        core_b = _batched_core(m_b, b_nprobe, window, q_cap, 8,
                               selection, stream)

        @jax.jit
        def core_only(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                sc, posb, _ = core_b(buf, rm, cents, st, cur, validq)
                cur = cur + 1e-30 * (sc[0, 0]
                                     + posb[0, 0].astype(jnp.float32)
                                     * 1e-6)
                return cur, acc + sc[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc
        return core_only

    def make_full(selection, expand, stream=False):
        core_b = _batched_core(m_b, b_nprobe, window, q_cap, 8,
                               selection, stream)

        @jax.jit
        def full_chain(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                sc, posb, _ = core_b(buf, rm, cents, st, cur, validq)
                s, p = gather_rerank_topk_chunked(
                    buf, posb, cur, k, "cosine", first_scores=sc,
                    dedup=expand == 1, chunk=128,
                    pre_select=int(os.environ.get("PROBE_PRESEL",
                                                  str(8 * k + 16))),
                    expand_pool=expand)
                cur = cur + 1e-30 * (s[0, 0]
                                     + p[0, 0].astype(jnp.float32)
                                     * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc
        return full_chain

    def timed(fn, reps):
        t0 = time.perf_counter()
        float(fn(corpus_q, rmult, cents_n, starts_dev, bqueries,
                 jnp.int32(reps)))
        return time.perf_counter() - t0

    variants = [
        ("pool8_stream_core", make_core_only(8, stream=True)),
        ("pool8_stream+rerank", make_full(8, 8, stream=True)),
        ("approx_stream_core", make_core_only("approx", stream=True)),
        ("pool8_core", make_core_only(8)),
        ("pool8+rerank", make_full(8, 8)),
        ("pool16+rerank", make_full(16, 16)),
        ("core_only", make_core_only("approx")),
        ("core+rerank", make_full("approx", 1)),
    ]
    if "--recall" in sys.argv[1:]:
        from neumann_tpu.ops.quant import int8_exact_topk

        nq_r = min(64, bq)
        _, oi = jax.jit(int8_exact_topk,
                        static_argnames=("k", "block_rows"))(
            corpus_q, rmult, bqueries[:nq_r], k,
            block_rows=min(block_rows, 256 * 1024))
        oi = np.asarray(oi)
        for sel, exp in ((8, 8), (16, 16), ("approx", 1)):
            core_b = _batched_core(m_b, b_nprobe, window, q_cap, 8,
                                   sel)
            sc_b, pos_b, ov = core_b(corpus_q, rmult, cents_n,
                                     starts_dev, bqueries, validq)
            _, pb = gather_rerank_topk_chunked(
                corpus_q, pos_b, bqueries, k, "cosine",
                first_scores=sc_b, dedup=exp == 1, chunk=128,
                pre_select=8 * k + 16, expand_pool=exp)
            pb = np.asarray(pb)[:nq_r]
            rec = float(np.mean([
                len(set(oi[r].tolist()) & set(pb[r].tolist())) / k
                for r in range(nq_r)]))
            print(json.dumps({"recall_variant": str(sel),
                              "recall_at_10": round(rec, 4),
                              "overflow": int(ov)}), flush=True)

    for name, fn in variants:
        t0 = time.time()
        timed(fn, 1)
        print(f"# {name} compile+1: {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        timed(fn, 5)
        a = min(timed(fn, 1) for _ in range(3))
        b = min(timed(fn, 5) for _ in range(3))
        per = (b - a) / 4
        print(json.dumps({"variant": name, "batch_ms":
                          round(per * 1e3, 2),
                          "qps": round(bq / per, 1), "q_cap": q_cap,
                          "nprobe": b_nprobe, "window": window,
                          "n": n}), flush=True)


if __name__ == "__main__":
    main()
