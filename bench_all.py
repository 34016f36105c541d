"""Full benchmark sweep: the five BASELINE.json configs.

bench.py prints the single headline line for the driver; this script
reports every configuration from BASELINE.json (plus the reference
comparison) as a JSON array. Uses the same chained-in-jit timing as
bench.py (the dev tunnel's block_until_ready does not block).

  1. flat exact cosine SIMILAR top-5, 100K x 768 fp32
  2. batched multi-query: 64 x 768 vs 1M corpus, top-10
  3. predicate-filtered search (mask fused into the scan)
  4. hybrid graph-bitmask top-k (CONNECTED TO as a mask)
  5. 10M int8 corpus (the bench.py headline; see BENCH_r*.json)
"""

import functools
import json
import time

import numpy as np

REF_NS_PER_VEC_768 = 367.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.quant import f32_pooled_topk
    from neumann_tpu.ops.scan import topk_scan

    on_tpu = jax.devices()[0].platform == "tpu"
    scale = 1 if on_tpu else 64  # CPU smoke mode shrinks corpora
    # (pow2 divisor so pooled layouts still exist at smoke sizes)

    results = []

    def timed_chain(fn, corpus, qs, reps=(2, 10)):
        # corpus must be a jit ARGUMENT: closures become compile-request
        # constants and blow the remote compiler's size limit
        @functools.partial(jax.jit, static_argnames=("reps",))
        def chain(corpus, qs, reps):
            def body(_, carry):
                cur, acc = carry
                s, i = fn(corpus, cur)
                return cur + 1e-30 * jnp.mean(s), acc + s[0, 0]
            return lax.fori_loop(0, reps, body, (qs, 0.0))[1]

        def timed(r):
            a = time.perf_counter()
            float(chain(corpus, qs, r))
            return time.perf_counter() - a

        timed(reps[0])   # compile
        timed(reps[1])
        t1 = min(timed(reps[0]) for _ in range(3))
        t2 = min(timed(reps[1]) for _ in range(3))
        return (t2 - t1) / (reps[1] - reps[0])

    key = jax.random.PRNGKey(0)

    # -- 1: flat exact 100K x 768 fp32, single query, top-5 ----------------
    n1 = 100_000 // scale
    corpus1 = jax.random.normal(key, (n1, 768), jnp.float32)
    q1 = jax.random.normal(jax.random.PRNGKey(1), (1, 768), jnp.float32)
    per = timed_chain(
        lambda c, qs: topk_scan(c, qs, 5, "cosine"), corpus1, q1,
        (2, 10))
    ref_s = n1 * REF_NS_PER_VEC_768 / 1e9
    results.append({
        "config": f"flat exact cosine top-5, {n1}x768 fp32",
        "latency_ms": round(per * 1e3, 3),
        "qps": round(1 / per, 1),
        "vs_reference": round(ref_s / per, 1)})

    # -- 2: batched 64 queries vs 1M fp32 ----------------------------------
    n2 = (1 << 20) // scale   # pow2 like engine slab capacities
    corpus2 = jax.random.normal(key, (n2, 768), jnp.float32)
    q2 = jax.random.normal(jax.random.PRNGKey(2), (64, 768), jnp.float32)
    per = timed_chain(
        lambda c, qs: f32_pooled_topk(c, qs, 10, pool=512,
                                      block_rows=262_144),
        corpus2, q2)
    results.append({
        "config": f"batched 64-query top-10, {n2}x768 fp32 (pooled)",
        "batch_ms": round(per * 1e3, 3),
        "qps": round(64 / per, 1),
        "vs_reference": round(64 * n2 * REF_NS_PER_VEC_768 / 1e9 / per,
                              1)})

    # -- 3: predicate-filtered (10% selectivity mask fused) ----------------
    # a 10%-random mask fills essentially every pool, so the pooled
    # scan applies (the engine gate checks actual pool occupancy)
    mask = jnp.asarray(
        np.random.default_rng(0).random(n2) < 0.1)
    per = timed_chain(
        lambda c, qs: f32_pooled_topk(c, qs, 10, pool=512,
                                      block_rows=1 << 20, mask=mask),
        corpus2, q2)
    results.append({
        "config": f"predicate-filtered (10% pass), {n2}x768",
        "batch_ms": round(per * 1e3, 3),
        "qps": round(64 / per, 1),
        "note": "mask fused into scan; cost independent of selectivity"})

    # -- 4: hybrid graph-bitmask (sparse neighborhood mask) ----------------
    nbr = np.zeros(n2, bool)
    nbr[np.random.default_rng(1).choice(n2, 500, replace=False)] = True
    per = timed_chain(
        lambda c, qs: f32_pooled_topk(c, qs, 10, pool=512,
                                      block_rows=1 << 20,
                                      mask=jnp.asarray(nbr)),
        corpus2, q2)
    results.append({
        "config": f"hybrid CONNECTED-TO bitmask (500 nbrs), {n2}x768",
        "batch_ms": round(per * 1e3, 3),
        "qps": round(64 / per, 1),
        "note": "500 nbrs spread over ~450 of 2048 pools; pooled "
                "selection stays valid (occupancy-gated)"})

    # -- 5/6: sharded scan over the device mesh ----------------------------
    # On the 8-virtual-device CPU mesh this measures the REAL sharded
    # program (shard-local pooled scan + ICI all-gather merge) and its
    # scaling vs the identical 1-shard program; on v5e-8 the same
    # program divides the 10M-corpus single-chip scan time by the shard
    # count (per-shard HBM reads are 1/8), which is the p99 claim.
    devs = jax.devices()
    if len(devs) >= 2:
        from neumann_tpu.parallel import make_mesh
        from neumann_tpu.parallel.sharded_search import (
            ShardedCorpus,
            make_sharded_topk,
        )

        n6 = (1 << 21) // scale
        rng6 = np.random.default_rng(6)
        vecs6 = rng6.standard_normal((n6, 768)).astype(np.float32)
        q6 = rng6.standard_normal((8, 768)).astype(np.float32)

        def sharded_per_iter(n_shards):
            mesh = make_mesh(n_shards)
            sc = ShardedCorpus(mesh, 768, quantized=True)
            sc.load(vecs6)
            fn = make_sharded_topk(mesh, 10, "cosine",
                                   quantized=True)
            qp = jnp.asarray(
                np.pad(q6, ((0, 0), (0, sc.dim_pad - 768))))

            @functools.partial(jax.jit, static_argnames="reps")
            def chain6(c, s, sn, m, qs, reps):
                def body(_, carry):
                    cur, acc = carry
                    ss, _ = fn(c, s, sn, cur, m)
                    return cur + 1e-30 * ss[0, 0], acc + ss[0, 0]
                return lax.fori_loop(0, reps, body, (qs, 0.0))[1]

            def timed(r):
                a = time.perf_counter()
                float(chain6(sc.corpus, sc.scale, sc.sqnorm, sc.mask,
                             qp, r))
                return time.perf_counter() - a

            timed(2)
            timed(10)
            t1 = min(timed(2) for _ in range(3))
            t2 = min(timed(10) for _ in range(3))
            return (t2 - t1) / 8, sc.corpus.shape[0] // n_shards

        per8, rows8 = sharded_per_iter(len(devs))
        per1, _ = sharded_per_iter(1)
        results.append({
            "config": f"sharded int8 top-10, {n6}x768 over "
                      f"{len(devs)} devices (8-query batch)",
            "batch_ms": round(per8 * 1e3, 3),
            "batch_ms_1shard": round(per1 * 1e3, 3),
            "scaling_x": round(per1 / per8, 2),
            "rows_per_shard": rows8,
            "note": "shard-local pooled scan + all-gather top-k merge; "
                    "on v5e-8 per-shard HBM reads are 1/8 of the "
                    "single-chip scan -> ~1.4 ms + merge for 10M int8"})

        # -- 7: sharded windowed IVF (multi-chip p99 path) -----------------
        from neumann_tpu.parallel.sharded_search import ShardedIVFCorpus

        mesh7 = make_mesh(len(devs))
        ivf7 = ShardedIVFCorpus(mesh7, 768,
                                n_clusters=8 * len(devs), nprobe=4,
                                iters=4)
        ivf7.load(vecs6[: min(n6, 1 << 17)])
        q7 = vecs6[:1]
        ivf7.search(q7, 10)        # compile
        t0 = time.perf_counter()
        reps7 = 20
        for _ in range(reps7):
            ivf7.search(q7, 10)
        per7 = (time.perf_counter() - t0) / reps7
        results.append({
            "config": f"sharded windowed IVF top-10 over "
                      f"{len(devs)} devices (single query)",
            "query_ms": round(per7 * 1e3, 3),
            "note": "cluster-sharded probes on every shard + one "
                    "all-gather merge (includes host dispatch; the "
                    "jitted step alone is what rides serving batchers)"})
    else:
        results.append({
            "config": "sharded 10M int8 (headline)",
            "note": "see bench.py / BENCH_r*.json; run under the "
                    "8-device virtual mesh for the sharded entry"})
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
