"""Measure single-query latency at 10M x 768 int8: brute vs DeviceIVFInt8.

The north-star latency target is p99 < 5 ms. Brute reads the whole
corpus (~12 ms on one v5e chip); IVF nprobe reads nprobe/n_clusters of
it. Also measures recall@10 vs the brute int8 scan.
"""
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.ivf import DeviceIVFInt8
    from neumann_tpu.ops.quant import int8_topk_scan

    n, d, k = 10_000_000, 768, 10
    print("generating host corpus...", flush=True)
    rng = np.random.default_rng(0)
    corpus_q = rng.integers(-127, 128, size=(n, d), dtype=np.int8)
    scale = ((0.5 + rng.random(n)) / 127.0).astype(np.float32)

    t0 = time.perf_counter()
    ix = DeviceIVFInt8(d, n_clusters=1024, nprobe=32, iters=10)
    ix.build(corpus_q, scale, sample_rows=200_000)
    print(f"build: {time.perf_counter()-t0:.1f}s  stride={ix._stride} "
          f"padded_rows={ix._buf.shape[0]} "
          f"({ix._buf.shape[0]/n-1:+.1%} padding)", flush=True)

    queries = rng.standard_normal((64, d)).astype(np.float32)

    # recall vs brute int8 (on-device corpus in blocks to fit HBM? brute
    # needs the raw corpus on device: 7.5GB + padded 8+GB won't fit.
    # So brute recall uses a 2M-row slice with a proportionally-scaled
    # cluster count effect -- fair approximation of probe recall).
    sub = 2_000_000
    sub_q = jnp.asarray(corpus_q[:sub])
    sub_s = jnp.asarray(scale[:sub])
    _, ei = jax.jit(int8_topk_scan,
                    static_argnames=("k", "metric", "block_rows"))(
        sub_q, sub_s, jnp.asarray(queries), k, "cosine",
        block_rows=1_000_000)
    ei = np.asarray(ei)
    ix_sub = DeviceIVFInt8(d, n_clusters=256, nprobe=8, iters=10)
    ix_sub.build(corpus_q[:sub], scale[:sub], sample_rows=100_000)
    for nprobe in (8, 32):
        _, ii = ix_sub.search(queries, k, nprobe=nprobe)
        rec = np.mean([len(set(ei[r]) & set(ii[r])) / k
                       for r in range(64)])
        print(f"recall@10 (2M, 256 clusters, nprobe={nprobe}): "
              f"{rec:.3f}  [scan fraction {nprobe/256:.1%}]", flush=True)
    del ix_sub, sub_q, sub_s

    # latency: chained reps on the full 10M index
    buf, rmult, cents = ix._buf, ix._rmult, ix.centroids
    stride = ix._stride

    @functools.partial(jax.jit, static_argnames=("reps", "nq", "nprobe"))
    def chain(buf, rmult, cents, qs, reps, nq, nprobe):
        def body(i, carry):
            cur, acc = carry
            qn = cur / jnp.maximum(
                jnp.linalg.norm(cur, axis=1, keepdims=True), 1e-30)
            _, probe = lax.top_k(qn @ cents.T, nprobe)

            def one(qvec, probes):
                def gather(cidx):
                    b = lax.dynamic_slice(buf, (cidx * stride, 0),
                                          (stride, buf.shape[1]))
                    r = lax.dynamic_slice(rmult, (cidx * stride,),
                                          (stride,))
                    return b, r
                blocks, rms = jax.vmap(gather)(probes)
                cand = blocks.reshape(-1, buf.shape[1])
                sc = (cand.astype(jnp.float32) @ qvec) * rms.reshape(-1)
                sc = jnp.where(rms.reshape(-1) > 0, sc, -jnp.inf)
                s, _ = lax.top_k(sc, k)
                return s
            s = jax.vmap(one)(qn, probe)
            cur = cur + 1e-30 * s[0, 0]
            return cur, acc + s[0, 0]
        _, acc = lax.fori_loop(0, reps, body, (qs[:nq], 0.0))
        return acc

    def timed(reps, nq, nprobe):
        t0 = time.perf_counter()
        float(chain(buf, rmult, cents, jnp.asarray(queries), reps, nq,
                    nprobe))
        return time.perf_counter() - t0

    for nq, nprobe in ((1, 32), (16, 32)):
        r1, r2 = 2, 12
        timed(r1, nq, nprobe)
        timed(r2, nq, nprobe)
        t1 = min(timed(r1, nq, nprobe) for _ in range(3))
        t2 = min(timed(r2, nq, nprobe) for _ in range(3))
        per = (t2 - t1) / (r2 - r1)
        print(f"Q={nq:3d} nprobe={nprobe:3d}: {per*1e3:7.3f} ms/query-"
              f"batch  [scan {nprobe/1024:.1%} of corpus]", flush=True)


if __name__ == "__main__":
    main()
