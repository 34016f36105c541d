"""Ablation probe: which op dominates the batched-IVF scan step?

Times stripped-down variants of ops/ivf._batched_core's scan body on
the real chip (1M x 768 layout) to locate the bottleneck:

  full      the production kernel body
  nomask    drop the rmult where-mask
  notopk    replace approx_max_k(m) with a plain max (m=1 shape kept)
  laxtopk   lax.top_k instead of approx_max_k
  nogather  query block slice instead of per-cluster row gather
  mmonly    matmul + row-sum only (no selection at all)

Prints one JSON line per variant.
"""

import functools
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.quant import int8_cosine_row_mult, scalar_quantize

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    n, d, C, Q = 1_000_000, 768, 1024, 1024
    window, q_cap, m, group = 1280, 128, 16, 64
    nprobe = 72
    n_pad = ((n + 127) // 128) * 128

    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)
    # content doesn't matter for timing; uniform layout
    starts = jnp.asarray(
        (np.minimum(np.arange(C) * (n // C), n_pad - window)
         // 128 * 128).astype(np.int32))

    chunk = 250_000
    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames="rows")
    def fill(c, sc, key, start, rows):
        x = jax.random.normal(key, (rows, d), jnp.float32)
        cq, cs = scalar_quantize(x)
        return (lax.dynamic_update_slice(c, cq, (start, 0)),
                lax.dynamic_update_slice(sc, cs, (start,)))

    kk = kc
    for s0 in range(0, n, chunk):
        kk, sub = jax.random.split(kk)
        corpus_q, scale = fill(corpus_q, scale, sub, jnp.int32(s0),
                               min(chunk, n - s0))
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    qn = jax.random.normal(kq, (Q, d), jnp.float32)
    qn = qn / jnp.linalg.norm(qn, axis=1, keepdims=True)
    qn_b = qn.astype(jnp.bfloat16)
    tbl_q = jax.random.randint(jax.random.PRNGKey(3), (C, q_cap), 0, Q,
                               dtype=jnp.int32)

    qq_i8, qsc = jax.jit(scalar_quantize)(qn)

    def make(variant):
        def one(c):
            base = starts[c]
            block = lax.dynamic_slice(corpus_q, (base, 0), (window, d))
            rm = lax.dynamic_slice(rmult, (base,), (window,))
            if variant.startswith("int8"):
                # s8 x s8 MXU path: no bf16 corpus conversion at all.
                # one-hot select the slot queries in int8 (rows are
                # one-hot so the s32 result IS the int8 query row)
                qidx = tbl_q[c]
                oh = (qidx[:, None]
                      == jnp.arange(Q, dtype=jnp.int32)[None, :]
                      ).astype(jnp.int8)
                qsub = lax.dot_general(
                    oh, qq_i8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.int8)
                sc_slot = qsc[qidx]            # [q_cap] tiny gather
                dots = lax.dot_general(
                    qsub, block, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                mult = sc_slot[:, None] * rm[None, :]
                scores = jnp.where(rm[None, :] > 0,
                                   dots.astype(jnp.float32) * mult,
                                   -jnp.inf)
                if variant == "int8_notopk":
                    return jnp.max(scores, axis=1, keepdims=True) * \
                        jnp.ones((1, m))
                if variant == "int8_pool8":
                    # pooled max (pool=8) then exact top-k over pools:
                    # the max fuses into the matmul consumer chain
                    pooled = jnp.max(
                        scores.reshape(q_cap, window // 8, 8), axis=2)
                    s, _ = lax.top_k(pooled, m)
                    return s
                s, _ = lax.approx_max_k(scores, m)
                return s
            if variant == "nogather":
                qsub = lax.dynamic_slice(
                    qn_b, (jnp.minimum(c, Q - q_cap), 0), (q_cap, d))
            elif variant in ("onehot", "onehot_notopk"):
                # row gather as an MXU matmul: TPU row gathers cost
                # ~µs/row; a [q_cap, Q] one-hot x [Q, d] matmul does
                # the same selection at MXU rate
                oh = (tbl_q[c][:, None]
                      == jnp.arange(Q, dtype=jnp.int32)[None, :]
                      ).astype(jnp.bfloat16)
                qsub = jnp.dot(oh, qn_b,
                               preferred_element_type=jnp.bfloat16)
            else:
                qsub = qn_b[tbl_q[c]]
            dots = jnp.dot(qsub, block.astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
            if variant == "mmonly":
                return jnp.sum(dots, axis=1, keepdims=True) * \
                    jnp.ones((1, m))
            if variant == "nomask":
                scores = dots
            else:
                scores = jnp.where(rm[None, :] > 0,
                                   dots * rm[None, :], -jnp.inf)
            if variant in ("notopk", "onehot_notopk"):
                return jnp.max(scores, axis=1, keepdims=True) * \
                    jnp.ones((1, m))
            if variant == "laxtopk":
                s, _ = lax.top_k(scores, m)
                return s
            s, _ = lax.approx_max_k(scores, m)
            return s

        @jax.jit
        def run(reps):
            cgs = jnp.arange(C, dtype=jnp.int32).reshape(-1, group)

            def step(_, cg):
                return (), jax.vmap(one)(cg)

            def body(r, acc):
                _, ys = lax.scan(step, (), cgs)
                return acc + ys[0, 0, 0, 0] * 1e-30

            return lax.fori_loop(0, reps, body, 0.0)

        return run

    variants = [a.split("=", 1)[1].split(",") for a in sys.argv[1:]
                if a.startswith("--variants=")]
    for variant in (variants[0] if variants
                    else ("full", "notopk", "mmonly")):
        run = make(variant)

        def timed(r):
            t0 = time.perf_counter()
            float(run(jnp.int32(r)))
            return time.perf_counter() - t0

        timed(1)
        timed(3)
        t1 = min(timed(1) for _ in range(3))
        t2 = min(timed(3) for _ in range(3))
        ms = (t2 - t1) / 2 * 1e3
        print(json.dumps({"variant": variant,
                          "ms_per_pass": round(ms, 2)}))


if __name__ == "__main__":
    main()
