"""Experiment: batch-size scaling of the 10M int8 scan (HBM-bound check).

Measures per-scan time at Q in {64, 128, 256} with the chained-rep
methodology from bench.py (tunnel-safe). If the scan is HBM-bound, QPS
should scale ~linearly with Q until the MXU saturates.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

from neumann_tpu.ops.quant import corpus_sqnorms, int8_topk_scan

n, d, k = 10_000_000, 768, 10
block_rows = 1_000_000

key = jax.random.PRNGKey(0)
kc, kq = jax.random.split(key)
chunk_rows = 1_000_000
corpus_q = jnp.zeros((n, d), jnp.int8)


@functools.partial(jax.jit, donate_argnums=0)
def fill(c, key, start):
    chunk = jax.random.bits(key, (chunk_rows, d), jnp.uint8).astype(jnp.int8)
    return lax.dynamic_update_slice(c, chunk, (start, 0))


for ci in range(-(-n // chunk_rows)):
    kc, sub = jax.random.split(kc)
    corpus_q = fill(corpus_q, sub, jnp.int32(ci * chunk_rows))
scale = (0.5 + jax.random.uniform(kq, (n,))) / 127.0
sqnorm = jax.jit(corpus_sqnorms)(corpus_q, scale)
queries = jax.random.normal(jax.random.PRNGKey(7), (256, d), jnp.float32)


@functools.partial(jax.jit, static_argnames=("reps", "nq"))
def chain(corpus_q, scale, sqnorm, qs, reps, nq):
    def body(i, carry):
        cur, acc = carry
        s, idx = int8_topk_scan(corpus_q, scale, cur, k, "cosine", None,
                                block_rows=block_rows, selection="approx",
                                recall_target=0.95, corpus_sqnorm=sqnorm)
        cur = cur + 1e-30 * jnp.mean(s)
        return cur, acc + s[0, 0]
    _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
    return acc


def timed(reps, nq):
    t0 = time.perf_counter()
    float(chain(corpus_q, scale, sqnorm, queries, reps, nq))
    return time.perf_counter() - t0


r1, r2 = 2, 10
for q in (64, 128, 256):
    timed(r1, q)
    timed(r2, q)
    t1 = min(timed(r1, q) for _ in range(3))
    t2 = min(timed(r2, q) for _ in range(3))
    per = (t2 - t1) / (r2 - r1)
    print(f"Q={q:4d}  per-scan {per*1e3:8.2f} ms  QPS {q/per:9.1f} "
          f"GB/s {n*d/per/1e9:6.1f}", flush=True)
