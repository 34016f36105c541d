"""Headline benchmark: batched SIMILAR top-10 over a 10M x 768 int8 corpus.

This is BASELINE.json config 5 ("Sharded 10M corpus: int8 embeddings,
per-shard top-k + merge") run on however many chips are present (one under
the driver). Also measures single-query latency and recall@10 vs an exact
fp32 oracle on a 1M-row subset, per the north-star definition.

Scan path: ops.quant.int8_pooled_topk — int8 MXU matmul with pooling
expressed as a free dot dimension (so XLA fuses the segmented max into the
matmul consumer), the within-pool argmax carried in the low mantissa bits
of the bitcast score, and an exact top-k over the [Q, N/pool] candidates.
Measured 677 GB/s at Q=256 on v5e-1 vs 658 GB/s for per-block
lax.approx_max_k and a 739 GB/s matmul-only ceiling.

Timing methodology: the dev TPU is behind an async tunnel where
block_until_ready does not block and any host sync costs ~30 ms, so the
scan is repeated INSIDE jit via lax.fori_loop with a data dependence
(query perturbed by a tiny function of the previous scores), and per-iter
time is the difference between two rep counts — tunnel overhead cancels.

Baseline: the reference's measured brute-force rate at 768d is 367 ns/vec
per query on Apple M-series (docs/book/src/benchmarks/vector-engine.md:32,
1,000x768 in 367 us). Scan of 10M vectors => 3.67 s/query => 0.2725 QPS.
vs_baseline = our per-query throughput / that rate.

Prints ONE JSON line.
"""

import functools
import json
import time

import numpy as np

REF_NS_PER_VEC_768 = 367.0  # vector-engine.md:32


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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
        block_rows = 1 << 20
        pool = 4096
        oracle_rows = 1 << 20
    else:  # CPU smoke fallback so the bench always runs
        n, d, q, k = 100_000, 128, 16, 10
        block_rows = 1 << 15
        pool = 128
        oracle_rows = 1 << 15

    n_pad = -(-n // block_rows) * block_rows

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    # generate the int8 corpus on device in chunks (a one-shot randint
    # materializes int32 intermediates ~4x the corpus and OOMs HBM);
    # the buffer is donated so each fill is in place. Padding rows beyond
    # n stay zero and are excluded via n_valid.
    chunk_rows = min(n, 1_000_000)
    corpus_q = jnp.zeros((n_pad, d), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=0, static_argnames="rows")
    def fill(c, key, start, rows):
        chunk = jax.random.bits(key, (rows, d), jnp.uint8).astype(jnp.int8)
        return lax.dynamic_update_slice(c, chunk, (start, 0))

    done = 0
    while done < n:
        rows = min(chunk_rows, n - done)
        kc, sub = jax.random.split(kc)
        corpus_q = fill(corpus_q, sub, jnp.int32(done), rows)
        done += rows
    scale = (0.5 + jax.random.uniform(kq, (n_pad,))) / 127.0
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    queries = jax.random.normal(jax.random.PRNGKey(7), (q, d), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps", "nq"))
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
        float(chain(corpus_q, scale, rmult, queries, reps, nq))
        return time.perf_counter() - t0

    # batched throughput: per-iter from rep-count difference
    r1, r2 = 2, 12
    timed(r1, q)  # compile both rep counts
    timed(r2, q)
    t1 = min(timed(r1, q) for _ in range(3))
    t2 = min(timed(r2, q) for _ in range(3))
    batched_s = (t2 - t1) / (r2 - r1)
    qps = q / batched_s

    # single-query per-iter latency distribution across trials
    timed(r1, 1)
    timed(r2, 1)
    singles = []
    for _ in range(7):
        a = timed(r1, 1)
        b = timed(r2, 1)
        singles.append((b - a) / (r2 - r1))
    singles = [s for s in singles if s > 0] or [float("nan")]
    p50 = float(np.percentile(singles, 50) * 1e3)
    p99 = float(np.percentile(singles, 99) * 1e3)

    # recall@10 vs exact fp32 oracle on a subset (first oracle_rows rows)
    sub_q = corpus_q[:oracle_rows]
    sub_scale = scale[:oracle_rows]
    sub_f32 = sub_q.astype(jnp.float32) * sub_scale[:, None]
    nq_rec = min(q, 64)
    _, oi = topk_scan_jit(sub_f32, queries[:nq_rec], k, "cosine",
                          block_rows=block_rows)
    # scale the pool down so the subset has the same pool COUNT as the
    # full corpus (collision odds depend on N/pool, not pool)
    pool_rec = max(64, pool * oracle_rows // n_pad)
    _, qi = jax.jit(int8_pooled_topk,
                    static_argnames=("k", "pool", "block_rows"))(
        sub_q, sub_scale, queries[:nq_rec], k, pool=pool_rec,
        block_rows=block_rows, row_mult=rmult[:oracle_rows])
    oi = np.asarray(oi)
    qi = np.asarray(qi)
    recall = float(np.mean([
        len(set(oi[r].tolist()) & set(qi[r].tolist())) / k
        for r in range(nq_rec)]))

    ref_qps = 1e9 / (REF_NS_PER_VEC_768 * n)   # reference rate on this n
    print(json.dumps({
        "metric": f"batched SIMILAR top-{k} QPS, {n}x{d} int8 corpus",
        "value": round(qps, 2),
        "unit": "QPS",
        "vs_baseline": round(qps / ref_qps, 1),
        "p50_ms": round(p50, 3),
        "p99_ms": round(p99, 3),
        "recall_at_10_vs_fp32": round(recall, 4),
        "batch": q,
        "platform": dev.platform,
        "scan_GBps": round(n_pad * d / batched_s / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
