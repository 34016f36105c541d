"""Experiment: recall@10 vs rerank candidate count C.

The pooled first pass scores with an int8-quantized query; rows the
noisy ordering pushes below rank C never reach the rerank. Sweeps C on
a 1M x 768 clustered corpus (the bench's recall-oracle shape) against
the exact f32 oracle. Run on the real chip; prints one line per C.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

t0 = time.time()


def log(m):
    print(f"[+{time.time() - t0:6.1f}s] {m}", file=sys.stderr, flush=True)


import jax
import jax.numpy as jnp

from neumann_tpu.ops.quant import scalar_quantize
from neumann_tpu.ops.rerank import int8_pooled_rerank_topk
from neumann_tpu.ops.scan import topk_scan_jit

n, d, nq, k = 1 << 20, 768, 64, 10
n_centers = 410          # same rows/cluster (~2441) as the 10M bench
sigma = 0.25
key = jax.random.PRNGKey(0)
kc, kx, kq, kp = jax.random.split(key, 4)
centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
assign = jax.random.randint(kx, (n,), 0, n_centers)
corpus = centers[assign] + sigma * jax.random.normal(kx, (n, d))
q_assign = jax.random.randint(kq, (nq,), 0, n_centers)
queries = centers[q_assign] + sigma * jax.random.normal(kq, (nq, d))

cq, scale = scalar_quantize(corpus)
deq = cq.astype(jnp.float32) * scale[:, None]
log("oracle")
_, fi = topk_scan_jit(deq, queries, k, "cosine", block_rows=1 << 20)
fi = np.asarray(fi)
del deq, corpus

for pool in (64, 128):
    for c_over in (8, 16, 32, 64, 128):
        _, qi = jax.jit(int8_pooled_rerank_topk,
                        static_argnames=("k", "oversample", "pool"))(
            cq, scale, queries, k, oversample=c_over, pool=pool)
        qi = np.asarray(qi)
        rec = float(np.mean([
            len(set(fi[r].tolist()) & set(qi[r].tolist())) / k
            for r in range(nq)]))
        log(f"pool={pool} C={max(c_over * k, 64)} recall={rec:.4f}")
