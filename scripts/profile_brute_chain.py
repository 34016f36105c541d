"""Attribution for the chained brute scan (pooled select + exact rerank).

VERDICT r4 #2: the chained pipeline runs ~600 GB/s while the pooled
selection pass alone runs 664-684 GB/s — find the ~10%. This script
times, on the same synthetic 10M x 768 int8 corpus as bench.py:

  pooled-only     int8_pooled_topk at the chain's candidate count
  chain[C]        int8_pooled_rerank_topk at oversample C/k
  rerank[C]       gather_rerank_topk alone with prebuilt positions
                  (isolates the gather+rescore from the scan)
  rerank_sorted   same but positions pre-sorted ascending (HBM order)
  recall[C]       end-to-end recall@10 vs the exact oracle per C

Run: python scripts/profile_brute_chain.py [--small] [--q=256]
Prints one JSON line per measurement.
"""

import functools
import json
import sys
import time

import numpy as np

_REPO = __file__.rsplit("/", 2)[0]
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_T0 = time.time()


def _log(msg):
    print(f"[chain +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from neumann_tpu.ops.quant import (
        int8_cosine_row_mult,
        int8_exact_topk,
        int8_pooled_topk,
        scalar_quantize,
    )
    from neumann_tpu.ops.rerank import (
        gather_rerank_topk,
        int8_pooled_rerank_topk,
    )

    small = "--small" in sys.argv
    n = 1_000_000 if small else 10_000_000
    d, k = 768, 10
    Q = 256
    for a in sys.argv[1:]:
        if a.startswith("--q="):
            Q = int(a.split("=")[1])
    pool = 1024
    block_rows = 1 << 20
    n_pad = -(-n // block_rows) * block_rows
    n_centers = 4096
    sigma = 0.25
    _log(f"corpus {n}x{d} on {jax.devices()[0]}")

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)
    counts = np.full(n_centers, n // n_centers, np.int64)
    counts[: n % n_centers] += 1
    offsets = np.concatenate([[0], np.cumsum(counts)])
    offsets_dev = jnp.asarray(offsets[1:], jnp.int32)
    chunk_rows = 1 << 20

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames="rows")
    def fill(c, sc, cents, offs, key, start, rows):
        idx = start + jnp.arange(rows, dtype=jnp.int32)
        a = jnp.minimum(jnp.searchsorted(offs, idx, side="right"),
                        cents.shape[0] - 1)
        chunk = cents[a] + sigma * jax.random.normal(
            key, (rows, d), jnp.float32)
        cq, cs = scalar_quantize(chunk)
        return (lax.dynamic_update_slice(c, cq, (start, 0)),
                lax.dynamic_update_slice(sc, cs, (start,)))

    kf = jax.random.PRNGKey(7)
    done = 0
    while done < n:
        rows = min(chunk_rows, n - done)
        kf, sub = jax.random.split(kf)
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    np.asarray(corpus_q[0, 0])
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    _log("corpus ready")

    kq1, kq2 = jax.random.split(kq)
    q_assign = jax.random.randint(kq1, (Q,), 0, n_centers)
    queries = centers[q_assign] + sigma * jax.random.normal(
        kq2, (Q, d), jnp.float32)

    def timed_chain(fnbody, label):
        @jax.jit
        def chain(cq, sc, rm, qs, reps):
            def body(i, carry):
                cur, acc = carry
                s, idx = fnbody(cq, sc, rm, cur)
                cur = cur + 1e-30 * (
                    s[0, 0] + idx[0, 0].astype(jnp.float32) * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

        def t(r):
            t0 = time.perf_counter()
            float(chain(corpus_q, scale, rmult, queries,
                        jnp.int32(r)))
            return time.perf_counter() - t0

        r1, r2 = 2, 12
        t(r1)
        t(r2)
        a = min(t(r1) for _ in range(3))
        b = min(t(r2) for _ in range(3))
        per = (b - a) / (r2 - r1)
        gbps = n_pad * d / per / 1e9
        print(json.dumps({"part": label, "per_iter_ms":
                          round(per * 1e3, 3),
                          "qps": round(Q / per, 1),
                          "scan_GBps": round(gbps, 1)}), flush=True)
        return per

    # pooled-only at the chain's candidate width
    for c in (80,):
        _log(f"pooled-only c={c}")
        timed_chain(lambda cq, sc, rm, cur, c=c: int8_pooled_topk(
            cq, sc, cur, c, pool=pool, block_rows=block_rows,
            n_valid=n, row_mult=rm), f"pooled_only_c{c}")

    # full chain at several oversamples
    for ov in (8, 4, 3):
        _log(f"chain oversample={ov}")
        timed_chain(
            lambda cq, sc, rm, cur, ov=ov: int8_pooled_rerank_topk(
                cq, sc, cur, k, oversample=ov, pool=pool,
                block_rows=block_rows, n_valid=n, row_mult=rm),
            f"chain_c{max(ov * k, 64)}")

    # rerank alone with prebuilt positions
    kp = jax.random.PRNGKey(3)
    for c in (80, 64, 32):
        pos_fix = jax.random.randint(kp, (Q, c), 0, n, jnp.int32)
        pos_sorted = jnp.sort(pos_fix, axis=1)
        fs = jnp.ones((Q, c), jnp.float32)
        for label, pp in ((f"rerank_c{c}", pos_fix),
                          (f"rerank_sorted_c{c}", pos_sorted)):
            @jax.jit
            def rchain(cq, rm, qs, pp, fs, reps):
                def body(i, carry):
                    cur, acc = carry
                    s, idx = gather_rerank_topk(
                        cq, pp, cur, k, "cosine",
                        first_scores=fs, dedup=False, row_mult=rm)
                    cur = cur + 1e-30 * (
                        s[0, 0]
                        + idx[0, 0].astype(jnp.float32) * 1e-6)
                    return cur, acc + s[0, 0]
                _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
                return acc

            def t(r):
                t0 = time.perf_counter()
                float(rchain(corpus_q, rmult, queries, pp, fs,
                             jnp.int32(r)))
                return time.perf_counter() - t0

            r1, r2 = 4, 24
            t(r1)
            t(r2)
            a = min(t(r1) for _ in range(3))
            b = min(t(r2) for _ in range(3))
            per = (b - a) / (r2 - r1)
            print(json.dumps({"part": label,
                              "per_iter_ms": round(per * 1e3, 3)}),
                  flush=True)

    # recall vs exact oracle per oversample (64 queries)
    nq = min(64, Q)
    _, oi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        corpus_q, rmult, queries[:nq], k,
        block_rows=min(block_rows, 256 * 1024))
    oi = np.asarray(oi)
    for ov in (8, 4, 3):
        _, pi = jax.jit(functools.partial(
            int8_pooled_rerank_topk, k=k, oversample=ov, pool=pool,
            block_rows=block_rows, n_valid=n))(
            corpus_q, scale, queries[:nq], row_mult=rmult)
        pi = np.asarray(pi)
        rec = float(np.mean([
            len(set(oi[r].tolist()) & set(pi[r].tolist())) / k
            for r in range(nq)]))
        print(json.dumps({"part": f"recall_c{max(ov * k, 64)}",
                          "recall_at_10": round(rec, 4)}), flush=True)
    _log("done")


if __name__ == "__main__":
    main()
