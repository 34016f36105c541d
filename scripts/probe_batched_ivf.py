"""Real-TPU probe: batched-IVF (probe-sharing) throughput at 10M x 768.

Standalone validation for ops/ivf.batched_ivf_topk before it becomes a
bench.py headline row. Generates the clustered int8 corpus on device
(generator-center fast path, same shape as bench.py), then times:

  1. the batched probe-sharing pass + chunked exact rerank at Q=1024
  2. (optional --brute) the pooled brute scan at Q=256 for reference

Prints one JSON line per measurement.
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

    from neumann_tpu.ops.ivf import _batched_core
    from neumann_tpu.ops.quant import int8_cosine_row_mult, scalar_quantize
    from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    small = "--small" in sys.argv
    if small:
        n, d, n_centers, q_ivf = 1_000_000, 768, 1024, 1024
    else:
        n, d, n_centers, q_ivf = 10_000_000, 768, 4096, 1024
    k, nprobe = 10, 72
    sigma = 0.25
    n_pad = ((n + 127) // 128) * 128

    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    rng = np.random.default_rng(0)
    counts = rng.multinomial(n, np.ones(n_centers) / n_centers)
    offsets = np.cumsum(counts)
    offsets_dev = jnp.asarray(offsets.astype(np.int32))

    starts = np.zeros(n_centers, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    window = int(((int(counts.max()) + 127) // 128) * 128 + 128)
    window = min(window, n_pad)
    starts = ((np.clip(starts, 0, max(0, n_pad - window))
               // 128) * 128).astype(np.int32)
    starts_dev = jnp.asarray(starts)
    print(f"# window={window} max_cluster={int(counts.max())}",
          file=sys.stderr)

    chunk_rows = min(n, 1_000_000)
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
        c = lax.dynamic_update_slice(c, cq, (start, 0))
        sc = lax.dynamic_update_slice(sc, cs, (start,))
        return c, sc

    t0 = time.perf_counter()
    done = 0
    while done < n:
        rows = min(chunk_rows, n - done)
        kn, sub = jax.random.split(kn)
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    jax.block_until_ready(corpus_q)
    print(f"# corpus generated in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    cents_n = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    kq1, kq2 = jax.random.split(kq)
    q_assign = jax.random.randint(kq1, (q_ivf,), 0, n_centers)
    queries = centers[q_assign] + sigma * jax.random.normal(
        kq2, (q_ivf, d), jnp.float32)

    m = k + 6
    expect = -(-q_ivf * nprobe // n_centers)
    q_cap = 1 << (max(32, 2 * expect) - 1).bit_length()
    group = 8
    for a in sys.argv[1:]:          # --group=N / --qcap=N sweeps
        if a.startswith("--group="):
            group = int(a.split("=")[1])
        elif a.startswith("--qcap="):
            q_cap = int(a.split("=")[1])
    print(f"# Q={q_ivf} nprobe={nprobe} m={m} q_cap={q_cap} "
          f"group={group}", file=sys.stderr)

    core = _batched_core(m, nprobe, window, q_cap, group)
    valid = jnp.ones(q_ivf, bool)

    @jax.jit
    def batched_chain(buf, rm, cents, st, qs, reps):
        def body(i, carry):
            cur, acc = carry
            sc, pos, _ = core(buf, rm, cents, st, cur, valid)
            s, p = gather_rerank_topk_chunked(
                buf, pos, cur, k, "cosine", first_scores=sc,
                dedup=True, chunk=128, pre_select=8 * k + 16)
            cur = cur + 1e-30 * (s[0, 0]
                                 + p[0, 0].astype(jnp.float32) * 1e-6)
            return cur, acc + s[0, 0]

        _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
        return acc

    def timed(reps):
        t0 = time.perf_counter()
        float(batched_chain(corpus_q, rmult, cents_n, starts_dev,
                            queries, jnp.int32(reps)))
        return time.perf_counter() - t0

    print("# compiling batched chain", file=sys.stderr)
    t0 = time.perf_counter()
    timed(1)
    print(f"# compile+1 iter: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    r1, r2 = 1, 5
    timed(r2)
    t1 = min(timed(r1) for _ in range(3))
    t2 = min(timed(r2) for _ in range(3))
    per_batch = (t2 - t1) / (r2 - r1)
    qps = q_ivf / per_batch
    print(json.dumps({
        "metric": "batched_ivf_qps",
        "value": round(qps, 1),
        "unit": "QPS",
        "batch": q_ivf, "nprobe": nprobe, "m": m, "q_cap": q_cap,
        "group": group, "window": window,
        "batch_ms": round(per_batch * 1e3, 2),
        "n": n, "platform": dev.platform,
    }))

    # recall vs the exact int8 oracle on the first 64 queries
    from neumann_tpu.ops.quant import int8_exact_topk

    nq_rec = 64
    _, oi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        corpus_q, rmult, queries[:nq_rec], k, block_rows=256 * 1024)
    oi = np.asarray(oi)
    sc, pos, ovf = core(corpus_q, rmult, cents_n, starts_dev, queries,
                        valid)
    s, p = gather_rerank_topk_chunked(
        corpus_q, pos, queries, k, "cosine", first_scores=sc,
        dedup=True, chunk=128, pre_select=8 * k + 16)
    p = np.asarray(p)[:nq_rec]
    rec = float(np.mean([
        len(set(oi[r].tolist()) & set(p[r].tolist())) / k
        for r in range(nq_rec)]))
    print(json.dumps({"metric": "batched_ivf_recall_at_10",
                      "value": round(rec, 4),
                      "overflow": int(ovf)}))


if __name__ == "__main__":
    main()
