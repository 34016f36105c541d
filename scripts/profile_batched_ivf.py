"""Real-TPU cost split for the batched probe-sharing IVF at the bench
shape (10M x 768 int8, FIXED windows w=2048, nprobe=96).

BENCH_r03 showed the batched IVF at 10.4K QPS vs 19.4K brute while
reading ~2% of the bytes per query — VERDICT r3 item #1. This script
locates where the batch-time goes by timing variants of the pipeline
separately, each as one compiled program with in-jit rep differencing
(the dev tunnel's host-sync cost makes naive wall timing useless):

  core      _batched_core only (probe + invert + window scan + gather
            reassembly), no rerank
  full      core + gather_rerank_topk_chunked (the bench pipeline)
  probe     centroid top-nprobe only

Axes (CLI):  --q=1024  --stream=0|1  --sel=approx|<pool int>
             --m=16 --group=8 --qcap=0(auto) --nprobe=96 --window=2048
             --mode=core|full|probe  --small (1M corpus)

Examples:
  python scripts/profile_batched_ivf.py --mode=core --stream=0
  python scripts/profile_batched_ivf.py --mode=full --stream=1 --q=4096

Prints one JSON line per run on stdout; progress on stderr.
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

_T0 = time.time()


def _log(msg):
    print(f"[profile +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def arg(name, default, cast=int):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from neumann_tpu.ops.ivf import _batched_core, window_mean_centroids
    from neumann_tpu.ops.quant import int8_cosine_row_mult, scalar_quantize
    from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

    dev = jax.devices()[0]
    small = "--small" in sys.argv
    n = 1_000_000 if small else 10_000_000
    d, k = 768, 10
    n_centers = 512 if small else 4096
    window = arg("window", 2048)
    nprobe = arg("nprobe", 96)
    Q = arg("q", 1024)
    m = arg("m", k + 6)
    group = arg("group", 8)
    stream = bool(arg("stream", 0))
    sel = arg("sel", "approx", str)
    selection = int(sel) if sel != "approx" else "approx"
    mode = arg("mode", "full", str)
    fused_i = arg("fused", 0)
    fused = "pallas" if fused_i == 2 else bool(fused_i)
    probe_mode = arg("probe", "exact", str)
    expand = bool(arg("expand", 1))
    pre_sel = arg("presel", 8 * k + 16)
    core_presel = arg("presel2", 0)     # packed-bits top-2 presel
    sigma = 0.25
    n_pad = -(-n // window) * window

    key = jax.random.PRNGKey(0)
    kc, kq, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    rng = np.random.default_rng(0)
    counts = rng.multinomial(n, np.ones(n_centers) / n_centers)
    offsets_dev = jnp.asarray(np.cumsum(counts).astype(np.int32))
    starts_dev = jnp.arange(n_pad // window, dtype=jnp.int32) * window

    chunk_rows = min(n, 1_000_000)
    corpus_q = jnp.zeros((n_pad, d), jnp.int8)
    scale = jnp.ones(n_pad, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames="rows")
    def fill(c, sc, cents, offs, key, start, rows):
        idx = start + jnp.arange(rows, dtype=jnp.int32)
        assign = jnp.minimum(
            jnp.searchsorted(offs, idx, side="right"),
            cents.shape[0] - 1)
        chunk = cents[assign] + sigma * jax.random.normal(
            key, (rows, d), jnp.float32)
        cq, cs = scalar_quantize(chunk)
        return (lax.dynamic_update_slice(c, cq, (start, 0)),
                lax.dynamic_update_slice(sc, cs, (start,)))

    _log("generating corpus")
    done = 0
    while done < n:
        rows = min(chunk_rows, n - done)
        kn, sub = jax.random.split(kn)
        corpus_q, scale = fill(corpus_q, scale, centers, offsets_dev,
                               sub, jnp.int32(done), rows)
        done += rows
    rmult = jax.jit(int8_cosine_row_mult)(corpus_q, scale)
    _log("window-mean centroids")
    cents_n = window_mean_centroids(corpus_q, rmult, window)
    C = int(cents_n.shape[0])
    nprobe = min(nprobe, C)

    kq1, kq2 = jax.random.split(kq)
    q_assign = jax.random.randint(kq1, (Q,), 0, n_centers)
    queries = centers[q_assign] + sigma * jax.random.normal(
        kq2, (Q, d), jnp.float32)
    validq = jnp.ones(Q, bool)

    q_cap = arg("qcap", 0)
    if not q_cap:
        expect = -(-Q * nprobe // C)
        q_cap = 1 << (max(32, 2 * expect) - 1).bit_length()
    _log(f"mode={mode} Q={Q} nprobe={nprobe} window={window} C={C} "
         f"q_cap={q_cap} m={m} group={group} stream={stream} "
         f"sel={selection} fused={fused} expand={expand} "
         f"probe={probe_mode} presel2={core_presel}")

    core = _batched_core(m, nprobe, window, q_cap, group, selection,
                         stream, fused, probe_mode, core_presel)
    pool = selection if isinstance(selection, int) else 1
    xp = pool if (pool > 1 and expand) else 1

    if mode in ("mm", "scan"):
        # stripped scan bodies to isolate costs:
        #   mm    window matmul + one-hot select only (no selection op)
        #   scan  + selection (approx/pool)  [no probe/invert/reassembly]
        #   noinv full core minus the probe-invert (fixed fake tables)
        from neumann_tpu.ops.quant import scalar_quantize as _sq

        eff_g = group if C % group == 0 else 1
        nw = C * window
        tbl_fake = jax.random.randint(jax.random.PRNGKey(5),
                                      (C, q_cap), 0, Q, jnp.int32)

        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            corpus4 = buf[:nw].reshape(C // eff_g, eff_g, window, d)
            rm4 = rm[:nw].reshape(C // eff_g, eff_g, window)
            tbl4 = tbl_fake.reshape(C // eff_g, eff_g, q_cap)

            def body(i, carry):
                cur, acc = carry
                qn = cur / jnp.maximum(
                    jnp.linalg.norm(cur, axis=1, keepdims=True), 1e-30)
                qq_i8, qsc = _sq(qn)

                def score_window(block, rm2, qidx):
                    oh = (qidx[:, None]
                          == jnp.arange(Q, dtype=jnp.int32)[None, :]
                          ).astype(jnp.int8)
                    qsub = lax.dot_general(
                        oh, qq_i8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.int8)
                    dots = lax.dot_general(
                        qsub, block, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    mult = qsc[jnp.maximum(qidx, 0)][:, None] \
                        * rm2[None, :]
                    if mode == "mm":
                        return jnp.max(dots.astype(jnp.float32) * mult,
                                       axis=1)[:, None] \
                            * jnp.ones((1, m))
                    scores = jnp.where(rm2[None, :] > 0,
                                       dots.astype(jnp.float32) * mult,
                                       -jnp.inf)
                    if pool > 1:
                        s3 = (scores + 2.0).reshape(
                            q_cap, window // pool, pool)
                        pi = lax.broadcasted_iota(jnp.int32, s3.shape, 2)
                        bits = (lax.bitcast_convert_type(s3, jnp.int32)
                                & ~(pool - 1)) | pi
                        return jnp.max(bits, axis=2).astype(jnp.float32)
                    s, _ = lax.approx_max_k(scores, m)
                    return s

                def step(_, xs):
                    bl, rm2, tb = xs
                    return (), jax.vmap(score_window)(bl, rm2, tb)

                _, ys = lax.scan(step, (), (corpus4, rm4, tbl4))
                cur = cur + 1e-30 * ys[0, 0, 0, 0]
                return cur, acc + ys[0, 0, 0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc
    elif mode == "kernel":
        # fused-pallas pipeline WITHOUT the [Q, nprobe] reassembly
        # gather: probe + invert + one-hot qsel + kernel + decode,
        # reduced to a scalar. core - kernel = reassembly cost.
        from neumann_tpu.ops.pallas_kernels import (
            batched_probe_pallas,
            decode_strided_pool_bits,
        )
        from neumann_tpu.ops.quant import scalar_quantize as _sq2

        nw = C * window

        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            rm2 = rm[:nw].reshape(C, window)

            def body(i, carry):
                cur, acc = carry
                qn = cur / jnp.maximum(
                    jnp.linalg.norm(cur, axis=1, keepdims=True),
                    1e-30)
                _, probe = lax.top_k(qn @ cents.T, nprobe)
                seq = jnp.arange(Q * nprobe, dtype=jnp.int32)
                flat_c = probe.reshape(-1)
                order = jnp.argsort(flat_c)
                scl = flat_c[order]
                first = jnp.searchsorted(scl, scl, side="left")
                rank = (seq - first).astype(jnp.int32)
                fq = (seq // nprobe)[order]
                tbl_q = jnp.full((C, q_cap), -1, jnp.int32
                                 ).at[scl, rank].set(fq, mode="drop")
                qq_i8, qsc = _sq2(qn)
                oh = (tbl_q[:, :, None]
                      == jnp.arange(Q, dtype=jnp.int32)[None, None, :]
                      ).astype(jnp.int8)
                qsel = lax.dot_general(
                    oh.reshape(C * q_cap, Q), qq_i8,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.int8).reshape(C, q_cap, d)
                scm = jnp.where(tbl_q >= 0,
                                qsc[jnp.maximum(tbl_q, 0)], 0.0)
                wb = batched_probe_pallas(buf[:nw], rm2, qsel, scm,
                                          window)
                s, p = decode_strided_pool_bits(wb, window)
                val = jnp.max(s[0, 0]) + p[0, 0, 0].astype(jnp.float32)
                cur = cur + 1e-30 * val
                return cur, acc + val
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc
    elif mode == "probe":
        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                qn = cur / jnp.maximum(
                    jnp.linalg.norm(cur, axis=1, keepdims=True), 1e-30)
                s, p = lax.top_k(qn @ cents.T, nprobe)
                cur = cur + 1e-30 * (
                    s[0, 0] + p[0, 0].astype(jnp.float32) * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc
    elif mode == "core":
        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                sc, pos, _ = core(buf, rm, cents, st, cur, validq)
                cur = cur + 1e-30 * (
                    sc[0, 0] + pos[0, 0].astype(jnp.float32) * 1e-6)
                return cur, acc + sc[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc
    else:
        @jax.jit
        def chain(buf, rm, cents, st, qs, reps):
            def body(i, carry):
                cur, acc = carry
                sc, pos, _ = core(buf, rm, cents, st, cur, validq)
                if core_presel:
                    s, p = gather_rerank_topk_chunked(
                        buf, pos, cur, k, "cosine", first_scores=sc,
                        dedup=False, chunk=min(128, Q))
                else:
                    s, p = gather_rerank_topk_chunked(
                        buf, pos, cur, k, "cosine", first_scores=sc,
                        dedup=(pool == 1), chunk=min(128, Q),
                        pre_select=pre_sel, expand_pool=xp,
                        expand_window=(window if fused == "pallas"
                                       else 0))
                cur = cur + 1e-30 * (
                    s[0, 0] + p[0, 0].astype(jnp.float32) * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

    def timed(reps):
        t0 = time.perf_counter()
        float(chain(corpus_q, rmult, cents_n, starts_dev, queries,
                    jnp.int32(reps)))
        return time.perf_counter() - t0

    _log("compiling")
    t0 = time.perf_counter()
    timed(1)
    _log(f"compile+1 iter: {time.perf_counter() - t0:.1f}s")
    r1, r2 = (1, 5) if mode != "probe" else (8, 64)
    timed(r2)
    t1 = min(timed(r1) for _ in range(3))
    t2 = min(timed(r2) for _ in range(3))
    per_batch = (t2 - t1) / (r2 - r1)
    print(json.dumps({
        "mode": mode, "q": Q, "nprobe": nprobe, "window": window,
        "q_cap": q_cap, "m": m, "group": group, "stream": stream,
        "sel": str(selection), "presel": pre_sel, "n": n,
        "fused": str(fused), "expand": expand, "probe": probe_mode,
        "batch_ms": round(per_batch * 1e3, 3),
        "qps": round(Q / per_batch, 1),
    }), flush=True)

    if "--recall" in sys.argv and mode == "full":
        from neumann_tpu.ops.quant import int8_exact_topk

        _log("recall oracle")
        nq = min(64, Q)
        _, oi = jax.jit(int8_exact_topk,
                        static_argnames=("k", "block_rows"))(
            corpus_q, rmult, queries[:nq], k, block_rows=256 * 1024)
        sc, pos, ovf = core(corpus_q, rmult, cents_n, starts_dev,
                            queries, validq)
        if core_presel:
            _, p = gather_rerank_topk_chunked(
                corpus_q, pos, queries, k, "cosine", first_scores=sc,
                dedup=False, chunk=min(128, Q))
        else:
            _, p = gather_rerank_topk_chunked(
                corpus_q, pos, queries, k, "cosine", first_scores=sc,
                dedup=(pool == 1), chunk=min(128, Q),
                pre_select=pre_sel,
                expand_pool=xp,
                expand_window=(window if fused == "pallas" else 0))
        oi = np.asarray(oi)
        p = np.asarray(p)[:nq]
        rec = float(np.mean([
            len(set(oi[r].tolist()) & set(p[r].tolist())) / k
            for r in range(nq)]))
        print(json.dumps({"mode": "recall", "value": round(rec, 4),
                          "overflow": int(ovf)}), flush=True)


if __name__ == "__main__":
    main()
