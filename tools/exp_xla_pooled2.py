"""XLA pooled scan v2: pooling via multi-free-dim dot_general.

dots = dot_general(qq [Q,d], block [G, pool, d]) -> [Q, G, pool]; the
pooled max then reduces the MINOR axis of the dot output (the shape class
XLA demonstrably fuses at ~729 GB/s for a full reduce), instead of a
reshape-then-reduce which XLA materializes.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from neumann_tpu.ops.quant import scalar_quantize, corpus_sqnorms, \
    _row_multiplier


def pooled_block_bits(qq, qmult, block3, rm2, pool, base, n_valid):
    """block3 [G, pool, d] i8, rm2 [G, pool] -> pooled bits [Q, G] i32."""
    dots = lax.dot_general(
        qq, block3,
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)  # [Q,G,pool]
    s = dots * qmult[:, :, None] * rm2[None, :, :] + 2.0
    qn, g, _ = s.shape
    gi = lax.broadcasted_iota(jnp.int32, s.shape, 1)
    pi = lax.broadcasted_iota(jnp.int32, s.shape, 2)
    bits = (lax.bitcast_convert_type(s, jnp.int32) & ~(pool - 1)) | pi
    row = base + gi * pool + pi
    bits = jnp.where(row < n_valid, bits, 0)
    return jnp.max(bits, axis=2)


def xla_pooled_topk2(corpus_q, row_mult, queries, k, pool=512,
                     block_rows=1_048_576, n_valid=None):
    """corpus_q [N, d] with N % block_rows == 0, block_rows % pool == 0."""
    queries = queries.astype(jnp.float32)
    qq, q_scale = scalar_quantize(queries)
    q_norm2 = jnp.sum((qq.astype(jnp.float32) * q_scale[:, None]) ** 2,
                      axis=1, keepdims=True)
    q_inv = lax.rsqrt(jnp.maximum(q_norm2, 1e-30))
    qmult = jnp.where(q_norm2 > 0, q_scale[:, None] * q_inv, 0.0)
    n, d = corpus_q.shape
    if n_valid is None:
        n_valid = n
    nblocks = n // block_rows
    g = block_rows // pool
    corpus_b = corpus_q.reshape(nblocks, g, pool, d)
    rm_b = row_mult.reshape(nblocks, g, pool)

    def step(carry, xs):
        bi, block3, rm2 = xs
        bits = pooled_block_bits(qq, qmult, block3, rm2, pool,
                                 bi * block_rows, n_valid)
        return carry, bits

    _, allbits = lax.scan(
        step, 0,
        (jnp.arange(nblocks, dtype=jnp.int32), corpus_b, rm_b))
    allbits = jnp.swapaxes(allbits, 0, 1).reshape(queries.shape[0], -1)
    tb, pos = lax.top_k(allbits, k)
    local = tb & (pool - 1)
    score = lax.bitcast_convert_type(tb & ~(pool - 1), jnp.float32) - 2.0
    rows = pos * pool + local
    dead = tb == 0
    return (jnp.where(dead, -jnp.inf, score),
            jnp.where(dead, -1, rows))


def main():
    n, d, k = 10_000_000, 768, 10
    block_rows = 1_048_576
    n_pad = -(-n // block_rows) * block_rows   # 10,485,760

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    corpus_q = jnp.zeros((n_pad, d), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=0, static_argnames="rows")
    def fill(c, key, start, rows):
        x = jax.random.bits(key, (rows, d), jnp.uint8).astype(jnp.int8)
        return lax.dynamic_update_slice(c, x, (start, 0))

    done = 0
    while done < n:   # pad rows stay zero
        rows = min(1_000_000, n - done)
        kc, sub = jax.random.split(kc)
        corpus_q = fill(corpus_q, sub, jnp.int32(done), rows)
        done += rows
    scale = (0.5 + jax.random.uniform(kq, (n_pad,))) / 127.0
    sqn = jax.jit(corpus_sqnorms)(corpus_q, scale)
    row_mult = jax.jit(
        lambda s, n2: _row_multiplier(s, n2, "cosine"))(scale, sqn)
    queries = jax.random.normal(jax.random.PRNGKey(7), (512, d),
                                jnp.float32)

    # correctness on a subset vs exact int8 oracle
    from neumann_tpu.ops.quant import int8_topk_scan_jit
    sub_rows = 512 * 512
    es, ei = int8_topk_scan_jit(corpus_q[:sub_rows], scale[:sub_rows],
                                queries[:64], k, "cosine",
                                block_rows=sub_rows)
    ei = np.asarray(ei)
    es = np.asarray(es)
    f = jax.jit(functools.partial(xla_pooled_topk2, k=k, pool=512,
                                  block_rows=sub_rows))
    ps, pi = f(corpus_q[:sub_rows], row_mult[:sub_rows], queries[:64])
    pi, ps = np.asarray(pi), np.asarray(ps)
    rec = float(np.mean([len(set(ei[r]) & set(pi[r])) / k
                         for r in range(64)]))
    serr = float(np.max(np.abs(ps[:, 0] - es[:, 0])))
    print(f"subset recall@{k} {rec:.4f} top1 err {serr:.2e}", flush=True)

    @functools.partial(jax.jit, static_argnames=("reps", "nq", "pool"))
    def chain_t(corpus_q, row_mult, qs, reps, nq, pool):
        def body(i, carry):
            cur, acc = carry
            s, idx = xla_pooled_topk2(corpus_q, row_mult, cur, k, pool,
                                      block_rows, n)
            cur = cur + 1e-30 * (s[0, 0] + idx[0, 0].astype(jnp.float32))
            return cur, acc + s[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
        return acc

    def timed(reps, nq, pool):
        t0 = time.perf_counter()
        float(chain_t(corpus_q, row_mult, queries, reps, nq, pool))
        return time.perf_counter() - t0

    for nq, pool in ((256, 4096), (256, 8192)):
        try:
            r1, r2 = 2, 10
            timed(r1, nq, pool)
            timed(r2, nq, pool)
            t1 = min(timed(r1, nq, pool) for _ in range(3))
            t2 = min(timed(r2, nq, pool) for _ in range(3))
            per = (t2 - t1) / (r2 - r1)
            print(f"Q={nq:4d} pool={pool:5d}: {per*1e3:7.2f} ms  "
                  f"QPS {nq/per:9.1f}  GB/s {n_pad*d/per/1e9:6.1f}",
                  flush=True)
        except Exception as e:
            print(f"Q={nq} pool={pool}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
