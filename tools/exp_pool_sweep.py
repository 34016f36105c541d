"""Pool-size / selector sweep for the chained brute scan (VERDICT r4 #2).

The chain = int8 pooled selection + exact f32 rerank. Attribution
(scripts/profile_brute_chain.py) showed the pooled pass itself at
~12.4 ms/iter (648 GB/s) with the final exact ``lax.top_k`` over the
[Q, N/pool] winner-bits plane as the prime suspect beyond the matmul.
This sweep measures, on the same synthetic 10M x 768 int8 corpus as
bench.py (Q=256, k=10, C=80 candidates):

  - pooled-only and full-chain time per (pool, selector) config
  - selection recall@10 (oracle top-10 coverage within the C candidates)
  - end-to-end recall@10 after the exact rerank

Configs via --cfg=pool:selector (repeatable), e.g.
  python tools/exp_pool_sweep.py --cfg=1024:topk --cfg=1024:approx \
      --cfg=2048:approx
Default sweeps 1024/2048 x topk/approx. One JSON line per measurement.
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
    print(f"[sweep +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
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
    from neumann_tpu.ops.rerank import int8_pooled_rerank_topk

    small = "--small" in sys.argv
    n = 65_536 if small else 10_000_000
    d, k, Q, C = (128, 10, 64, 40) if small else (768, 10, 256, 80)
    for a in sys.argv[1:]:
        if a.startswith("--c="):
            C = int(a.split("=")[1])
    cfgs = []
    for a in sys.argv[1:]:
        if a.startswith("--cfg="):
            p, sel = a.split("=")[1].split(":", 1)
            cfgs.append((int(p), sel))
    if not cfgs:
        cfgs = [(1024, "topk"), (1024, "approx"), (2048, "topk"),
                (2048, "approx")]
    block_rows = (1 << 15) if small else (1 << 20)
    for a in sys.argv[1:]:
        if a.startswith("--br="):
            block_rows = int(a.split("=")[1])
    n_pad = -(-n // block_rows) * block_rows
    n_centers = 256 if small else 4096
    sigma = 0.25
    _log(f"corpus {n}x{d} on {jax.devices()[0]}; cfgs={cfgs}")

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)
    counts = np.full(n_centers, n // n_centers, np.int64)
    counts[: n % n_centers] += 1
    offsets = np.concatenate([[0], np.cumsum(counts)])
    offsets_dev = jnp.asarray(offsets[1:], jnp.int32)
    chunk_rows = block_rows

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

    # recall substrate: a SHUFFLED 1M subset with proportionally scaled
    # pool, exactly like bench.py's oracle — the cluster-sorted timing
    # layout would collide whole answer sets into single pools and
    # understate deployment recall (engine slabs are insertion-ordered)
    nq = 64
    sub_n = min(n, 1_000_000)
    perm = jax.random.permutation(jax.random.PRNGKey(3), sub_n)
    sub_q = corpus_q[:sub_n][perm]
    sub_scale = scale[:sub_n][perm]
    sub_rmult = jax.jit(int8_cosine_row_mult)(sub_q, sub_scale)
    kq3, kq4 = jax.random.split(jax.random.PRNGKey(5))
    pick = jax.random.randint(kq3, (nq,), 0, sub_n)
    qsub = (sub_q[pick].astype(jnp.float32) * sub_scale[pick][:, None]
            + (sigma / 2) * jax.random.normal(kq4, (nq, d)))
    _log("oracle (shuffled 1M subset)")
    _, oi = jax.jit(int8_exact_topk,
                    static_argnames=("k", "block_rows"))(
        sub_q, sub_rmult, qsub, k, block_rows=256 * 1024)
    oracle = [set(np.asarray(oi)[r].tolist()) for r in range(nq)]

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
            float(chain(corpus_q, scale, rmult, queries, jnp.int32(r)))
            return time.perf_counter() - t0

        r1, r2 = 2, 12
        t(r1)
        t(r2)
        a = min(t(r1) for _ in range(3))
        b = min(t(r2) for _ in range(3))
        per = (b - a) / (r2 - r1)
        print(json.dumps({
            "part": label, "per_iter_ms": round(per * 1e3, 3),
            "qps": round(Q / per, 1),
            "scan_GBps": round(n_pad * d / per / 1e9, 1)}), flush=True)
        return per

    for pool, sel in cfgs:
        _log(f"pool={pool} selector={sel}: pooled-only")
        timed_chain(
            lambda cq, sc, rm, cur, pool=pool, sel=sel:
                int8_pooled_topk(cq, sc, cur, C, pool=pool,
                                 block_rows=block_rows, n_valid=n,
                                 row_mult=rm, selector=sel),
            f"pooled_p{pool}_{sel}_c{C}_br{block_rows}")
        _log(f"pool={pool} selector={sel}: chain")
        timed_chain(
            lambda cq, sc, rm, cur, pool=pool, sel=sel:
                int8_pooled_rerank_topk(cq, sc, cur, k,
                                        oversample=C // k, pool=pool,
                                        block_rows=block_rows,
                                        n_valid=n, row_mult=rm,
                                        selector=sel),
            f"chain_p{pool}_{sel}_c{C}_br{block_rows}")

        # recall: selection coverage + end-to-end on the shuffled
        # subset, pool scaled proportionally (bench.py's pool_rec rule)
        pool_rec = max(64, pool * sub_n // n)
        _, cpos = jax.jit(functools.partial(
            int8_pooled_topk, pool=pool_rec, block_rows=block_rows,
            selector=sel), static_argnums=(3,))(
            sub_q, sub_scale, qsub, C, row_mult=sub_rmult)
        cpos = np.asarray(cpos)
        sel_rec = float(np.mean([
            len(oracle[r] & set(cpos[r].tolist())) / k
            for r in range(nq)]))
        _, fi = jax.jit(functools.partial(
            int8_pooled_rerank_topk, oversample=C // k, pool=pool_rec,
            block_rows=block_rows, selector=sel),
            static_argnums=(3,))(
            sub_q, sub_scale, qsub, k, row_mult=sub_rmult)
        fi = np.asarray(fi)
        end_rec = float(np.mean([
            len(oracle[r] & set(fi[r].tolist())) / k
            for r in range(nq)]))
        print(json.dumps({
            "part": f"recall_p{pool}_{sel}_c{C}", "pool_rec": pool_rec,
            "selection_recall_at_10": round(sel_rec, 4),
            "recall_at_10": round(end_rec, 4)}), flush=True)


if __name__ == "__main__":
    main()
