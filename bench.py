"""Headline benchmark: batched SIMILAR top-10 over a 10M x 768 int8 corpus.

This is BASELINE.json config 5 ("Sharded 10M corpus: int8 embeddings,
per-shard top-k + merge") run on however many chips are present (one under
the driver). Also measures single-query latency and recall@10 vs an exact
fp32 oracle on a 1M-row subset, per the north-star definition.

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
        corpus_sqnorms,
        int8_topk_scan,
        int8_topk_scan_jit,
        scalar_quantize,
    )
    from neumann_tpu.ops.scan import topk_scan_jit

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        n, d, q, k = 10_000_000, 768, 64, 10
        oracle_rows = 1_000_000
        block_rows = 1_000_000
    else:  # CPU smoke fallback so the bench always runs
        n, d, q, k = 100_000, 128, 16, 10
        oracle_rows = 20_000
        block_rows = 50_000

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    # generate the int8 corpus on device in chunks (a one-shot randint
    # materializes int32 intermediates ~4x the corpus and OOMs HBM);
    # the buffer is donated so each fill is in place
    chunk_rows = min(n, 1_000_000)
    corpus_q = jnp.zeros((n, d), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(c, key, start):
        chunk = jax.random.bits(key, (chunk_rows, d), jnp.uint8).astype(
            jnp.int8)
        return lax.dynamic_update_slice(c, chunk, (start, 0))

    for ci in range(-(-n // chunk_rows)):
        kc, sub = jax.random.split(kc)
        corpus_q = fill(corpus_q, sub, jnp.int32(ci * chunk_rows))
    scale = (0.5 + jax.random.uniform(kq, (n,))) / 127.0
    sqnorm = jax.jit(corpus_sqnorms)(corpus_q, scale)
    queries = jax.random.normal(jax.random.PRNGKey(7), (q, d), jnp.float32)
    mask = None  # no tombstones: a fully-valid corpus skips the mask op

    @functools.partial(jax.jit, static_argnames=("reps", "nq"))
    def chain(corpus_q, scale, sqnorm, qs, reps, nq):
        def body(i, carry):
            cur, acc = carry
            s, idx = int8_topk_scan(corpus_q, scale, cur, k, "cosine",
                                    None, block_rows=block_rows,
                                    selection="approx",
                                    recall_target=0.95,
                                    corpus_sqnorm=sqnorm)
            # data dependence so the loop can't be collapsed; the
            # perturbation is ~1e-30 and does not change the workload
            cur = cur + 1e-30 * jnp.mean(s)
            return cur, acc + s[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
        return acc

    def timed(reps, nq):
        t0 = time.perf_counter()
        float(chain(corpus_q, scale, sqnorm, queries, reps, nq))
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

    # recall@10 vs exact fp32 oracle on a subset
    sub_q = corpus_q[:oracle_rows]
    sub_scale = scale[:oracle_rows]
    sub_f32 = sub_q.astype(jnp.float32) * sub_scale[:, None]
    _, oi = topk_scan_jit(sub_f32, queries, k, "cosine",
                          block_rows=block_rows)
    _, qi = int8_topk_scan_jit(sub_q, sub_scale, queries, k, "cosine",
                               block_rows=block_rows,
                               selection="approx", recall_target=0.95)
    oi = np.asarray(oi)
    qi = np.asarray(qi)
    recall = float(np.mean([
        len(set(oi[r].tolist()) & set(qi[r].tolist())) / k
        for r in range(q)]))

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
        "scan_GBps": round(n * d / batched_s / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
