"""Experiment: where do the extra ~4.5ms go for single-query scans?

bench.py reports p50 ~15.5ms at Q=1 over 10M x 768 int8 while the HBM
read floor is ~10.9ms. Suspects: matrix-vector underutilization, the
pooled-selection VPU chain at Q=1, corpus layout [G, pool, d].
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from neumann_tpu.ops.quant import int8_cosine_row_mult, int8_pooled_topk

N, D = 10_000_000, 768
BLOCK = 1 << 20
N_PAD = -(-N // BLOCK) * BLOCK


def make_corpus():
    c = jnp.zeros((N_PAD, D), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=0, static_argnames="rows")
    def fill(c, key, start, rows):
        x = jax.random.bits(key, (rows, D), jnp.uint8).astype(jnp.int8)
        return lax.dynamic_update_slice(c, x, (start, 0))

    key = jax.random.PRNGKey(0)
    done = 0
    while done < N:
        rows = min(1_000_000, N - done)
        key, sub = jax.random.split(key)
        c = fill(c, sub, jnp.int32(done), rows)
        done += rows
    scale = (0.5 + jax.random.uniform(jax.random.PRNGKey(9),
                                      (N_PAD,))) / 127.0
    return c, scale


def timed(fn, *args, reps=(2, 8)):
    r1, r2 = reps
    fn(*args, r1)
    fn(*args, r2)
    t1 = min(_t(fn, args, r1) for _ in range(3))
    t2 = min(_t(fn, args, r2) for _ in range(3))
    return (t2 - t1) / (r2 - r1)


def _t(fn, args, r):
    t0 = time.perf_counter()
    float(fn(*args, r))
    return time.perf_counter() - t0


def main():
    print(jax.devices()[0])
    corpus, scale = make_corpus()
    rmult = jax.jit(int8_cosine_row_mult)(corpus, scale)

    # A: matmul-only floor at various Q
    @functools.partial(jax.jit, static_argnames=("reps", "nq"))
    def chain_mm(c, qs, reps, nq):
        def body(i, carry):
            cur, acc = carry
            qq = jnp.clip(jnp.round(cur), -127, 127).astype(jnp.int8)
            dots = lax.dot_general(
                qq, c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = jnp.max(dots, axis=1).astype(jnp.float32)
            cur = cur + 1e-30 * s[0]
            return cur, acc + s[0]
        _, acc = lax.fori_loop(0, reps, body,
                               (jnp.zeros((nq, D), jnp.float32) + 0.5,
                                0.0))
        return acc

    for nq in (1, 8, 256):
        t = timed(lambda c, q, reps, _nq=nq: chain_mm(c, q, reps, _nq),
                  corpus, jnp.zeros(1))
        print(f"A matmul-only Q={nq}: {t*1e3:.2f} ms "
              f"({N_PAD*D/t/1e9:.0f} GB/s)")

    # B: pooled scan at Q=1/8/256 and pool sizes
    queries = jax.random.normal(jax.random.PRNGKey(7), (256, D),
                                jnp.float32)

    @functools.partial(jax.jit,
                       static_argnames=("reps", "nq", "pool"))
    def chain_pool(c, s, rm, qs, reps, nq, pool):
        def body(i, carry):
            cur, acc = carry
            ts, ti = int8_pooled_topk(c, s, cur, 10, pool=pool,
                                      block_rows=BLOCK, n_valid=N,
                                      row_mult=rm)
            cur = cur + 1e-30 * (ts[0, 0]
                                 + ti[0, 0].astype(jnp.float32) * 1e-6)
            return cur, acc + ts[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
        return acc

    for nq in (1, 8, 256):
        for pool in (4096, 16384):
            t = timed(lambda c, s, rm, q, reps, _n=nq, _p=pool:
                      chain_pool(c, s, rm, q, reps, _n, _p),
                      corpus, scale, rmult, queries)
            print(f"B pooled Q={nq} pool={pool}: {t*1e3:.2f} ms "
                  f"({N_PAD*D/t/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
