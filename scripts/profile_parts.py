"""Micro-attribution for the batched probe-sharing IVF pipeline.

profile_batched_ivf.py times pipeline PREFIXES (probe / kernel / core /
full) — each a multi-minute remote compile of the 10M-row fused graph.
This script instead times each STAGE alone as its own small jit with
synthetic inputs for the upstream tensors, so compiles stay cheap and
the 32 ms kernel-mode cost (Q=1024) splits into parts:

  probe_topk / probe_approx   [Q, C] centroid scores -> top-nprobe
  invert                      argsort + searchsorted + rank + 2 scatters
  ohqsel                      one-hot [C*q_cap, Q] @ [Q, d] -> qsel
  kernel                      batched_probe_pallas with prebuilt qsel
  decode                      decode_strided_pool_bits + [Q, nprobe]
                              reassembly gather from prebuilt wb
  rerank                      gather_rerank_topk_chunked with prebuilt
                              pos/scores (presel x expand gather+rescore)

Run: python scripts/profile_parts.py [--q=1024] [--small] [--parts=a,b]
Prints one JSON line per part.
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
    print(f"[parts +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
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

    small = "--small" in sys.argv
    n = 1_000_000 if small else 10_000_000
    d, k = 768, 10
    window = arg("window", 2048)
    nprobe = arg("nprobe", 96)
    Q = arg("q", 1024)
    n_pad = -(-n // window) * window
    C = n_pad // window
    expect = -(-Q * nprobe // C)
    q_cap = arg("qcap", 0) or 1 << (max(32, 2 * expect) - 1).bit_length()
    pool = window // 128
    presel = arg("presel", 32)
    parts = arg("parts", "", str)
    parts = set(parts.split(",")) if parts else None
    _log(f"n={n} Q={Q} C={C} q_cap={q_cap} nprobe={nprobe} "
         f"window={window} pool={pool}")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    def timed(fn, *args, reps=(2, 10)):
        """Compile, then per-iter via rep differencing (fori inside)."""
        r1, r2 = reps

        def run(r):
            t0 = time.perf_counter()
            float(fn(*args, jnp.int32(r)))
            return time.perf_counter() - t0

        run(r1)
        run(r2)
        t1 = min(run(r1) for _ in range(3))
        t2 = min(run(r2) for _ in range(3))
        return (t2 - t1) / (r2 - r1)

    def emit(name, secs):
        print(json.dumps({"part": name, "q": Q, "ms": round(secs * 1e3,
                                                            3)}),
              flush=True)

    def want(name):
        return parts is None or name in parts

    # ---- probe: [Q, C] scores -> top-nprobe --------------------------
    cents = jax.random.normal(ks[0], (C, d), jnp.float32)
    cents = cents / jnp.linalg.norm(cents, axis=1, keepdims=True)
    qs = jax.random.normal(ks[1], (Q, d), jnp.float32)

    if want("probe"):
        @jax.jit
        def probe_topk(cents, qs, reps):
            def body(i, carry):
                cur, acc = carry
                qn = cur / jnp.maximum(
                    jnp.linalg.norm(cur, axis=1, keepdims=True), 1e-30)
                s, p = lax.top_k(qn @ cents.T, nprobe)
                cur = cur + 1e-30 * (s[0, 0] + p[0, 0] * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

        emit("probe_topk", timed(probe_topk, cents, qs))

        @jax.jit
        def probe_approx(cents, qs, reps):
            def body(i, carry):
                cur, acc = carry
                qn = cur / jnp.maximum(
                    jnp.linalg.norm(cur, axis=1, keepdims=True), 1e-30)
                s, p = lax.approx_max_k(qn @ cents.T, nprobe)
                cur = cur + 1e-30 * (s[0, 0] + p[0, 0] * 1e-6)
                return cur, acc + s[0, 0]
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

        emit("probe_approx", timed(probe_approx, cents, qs))

    # ---- invert: the table build from probe -------------------------
    probe0 = jax.random.randint(ks[2], (Q, nprobe), 0, C, jnp.int32)

    if want("invert"):
        @jax.jit
        def invert(probe, reps):
            def body(i, carry):
                pr, acc = carry
                seq = jnp.arange(Q * nprobe, dtype=jnp.int32)
                flat_c = pr.reshape(-1)
                order = jnp.argsort(flat_c)
                sc = flat_c[order]
                first = jnp.searchsorted(sc, sc, side="left")
                rank = (seq - first).astype(jnp.int32)
                fq = (seq // nprobe)[order]
                fr = (seq % nprobe)[order]
                tbl_q = jnp.full((C, q_cap), -1, jnp.int32
                                 ).at[sc, rank].set(fq, mode="drop")
                rank_of = jnp.full((Q, nprobe), q_cap, jnp.int32
                                   ).at[fq, fr].set(
                    jnp.where(rank < q_cap, rank, q_cap), mode="drop")
                v = tbl_q[0, 0] + rank_of[0, 0]
                pr = (pr + v) % C
                return pr, acc + v
            _, acc = lax.fori_loop(0, reps, body, (probe, 0))
            return acc

        emit("invert_argsort", timed(invert, probe0))

        @jax.jit
        def invert_hist(probe, reps):
            """Rank via histogram + exclusive cumsum over the query
            axis (no 98K-element sort): rank(q, r) = #{q' < q probing
            the same cluster}. hist/rank lookups ride one-hot compares
            fused into reductions; tbl scatter unchanged."""
            def body(i, carry):
                pr, acc = carry
                iota_c = jnp.arange(C, dtype=jnp.int32)
                onehot = (pr[:, :, None] == iota_c[None, None, :])
                hist = jnp.sum(onehot, axis=1, dtype=jnp.int32)  # [Q, C]
                csum = jnp.cumsum(hist, axis=0) - hist           # excl
                rank = jnp.sum(
                    jnp.where(onehot, csum[:, None, :], 0), axis=2,
                    dtype=jnp.int32)                             # [Q, P]
                fq = jnp.broadcast_to(
                    jnp.arange(Q, dtype=jnp.int32)[:, None],
                    (Q, nprobe)).reshape(-1)
                tbl_q = jnp.full((C, q_cap), -1, jnp.int32
                                 ).at[pr.reshape(-1),
                                      rank.reshape(-1)].set(
                    fq, mode="drop")
                rank_of = jnp.where(rank < q_cap, rank, q_cap)
                v = tbl_q[0, 0] + rank_of[0, 0]
                pr = (pr + v) % C
                return pr, acc + v
            _, acc = lax.fori_loop(0, reps, body, (probe, 0))
            return acc

        emit("invert_hist", timed(invert_hist, probe0))

        @jax.jit
        def invert_scatter(probe, reps):
            """hist built by scatter-add of the Q*nprobe probes, rank
            read back by take_along_axis — O(Q*C) bytes instead of the
            one-hot's O(Q*nprobe*C) compares."""
            def body(i, carry):
                pr, acc = carry
                fq2 = jnp.broadcast_to(
                    jnp.arange(Q, dtype=jnp.int32)[:, None],
                    (Q, nprobe))
                hist = jnp.zeros((Q, C), jnp.int32).at[
                    fq2.reshape(-1), pr.reshape(-1)].add(
                    1, mode="drop")
                csum = jnp.cumsum(hist, axis=0) - hist
                rank = jnp.take_along_axis(
                    csum, jnp.minimum(pr, C - 1), axis=1)
                tbl_q = jnp.full((C, q_cap), -1, jnp.int32
                                 ).at[pr.reshape(-1),
                                      jnp.where(rank < q_cap, rank,
                                                q_cap).reshape(-1)
                                      ].set(fq2.reshape(-1),
                                            mode="drop")
                rank_of = jnp.where(rank < q_cap, rank, q_cap)
                v = tbl_q[0, 0] + rank_of[0, 0]
                pr = (pr + v) % C
                return pr, acc + v
            _, acc = lax.fori_loop(0, reps, body, (probe, 0))
            return acc

        emit("invert_scatter", timed(invert_scatter, probe0))

        @jax.jit
        def invert_hist_take(probe, reps):
            """The committed variant: one-hot hist + cumsum, rank via
            take_along_axis (not a second one-hot sum)."""
            def body(i, carry):
                pr, acc = carry
                iota_c = jnp.arange(C, dtype=jnp.int32)
                onehot = (pr[:, :, None] == iota_c[None, None, :])
                hist = jnp.sum(onehot, axis=1, dtype=jnp.int32)
                csum = jnp.cumsum(hist, axis=0) - hist
                rank = jnp.take_along_axis(
                    csum, jnp.minimum(pr, C - 1), axis=1)
                fq2 = jnp.broadcast_to(
                    jnp.arange(Q, dtype=jnp.int32)[:, None],
                    (Q, nprobe))
                tbl_q = jnp.full((C, q_cap), -1, jnp.int32
                                 ).at[pr.reshape(-1),
                                      jnp.where(rank < q_cap, rank,
                                                q_cap).reshape(-1)
                                      ].set(fq2.reshape(-1),
                                            mode="drop")
                rank_of = jnp.where(rank < q_cap, rank, q_cap)
                v = tbl_q[0, 0] + rank_of[0, 0]
                pr = (pr + v) % C
                return pr, acc + v
            _, acc = lax.fori_loop(0, reps, body, (probe, 0))
            return acc

        emit("invert_hist_take", timed(invert_hist_take, probe0))

        def _blockscan(hist):
            """Exclusive scan over the query axis via block-triangular
            MXU matmuls (the committed _batched_core path)."""
            qb = 256
            nb = Q // qb
            h3 = hist.reshape(nb, qb, C)
            tril = jnp.tril(jnp.ones((qb, qb), jnp.float32), k=-1)
            within = jnp.einsum(
                "ij,bjc->bic", tril, h3,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            bsum = jnp.sum(h3, axis=1)
            offs = jnp.cumsum(bsum, axis=0) - bsum
            return (within + offs[:, None, :]).reshape(Q, C
                                                       ).astype(jnp.int32)

        def _tail(pr, rank):
            fq2 = jnp.broadcast_to(
                jnp.arange(Q, dtype=jnp.int32)[:, None],
                (Q, nprobe)).reshape(-1)
            tbl_q = jnp.full((C, q_cap), -1, jnp.int32
                             ).at[pr.reshape(-1),
                                  jnp.where(rank < q_cap, rank,
                                            q_cap).reshape(-1)
                                  ].set(fq2, mode="drop")
            rank_of = jnp.where(rank < q_cap, rank, q_cap)
            return tbl_q[0, 0] + rank_of[0, 0]

        @jax.jit
        def invert_onehot_mxu(probe, reps):
            """Committed variant: one-hot hist + MXU block scan."""
            def body(i, carry):
                pr, acc = carry
                iota_c = jnp.arange(C, dtype=jnp.int32)
                onehot = (pr[:, :, None] == iota_c[None, None, :])
                hist = jnp.sum(onehot, axis=1, dtype=jnp.float32)
                csum = _blockscan(hist)
                rank = jnp.take_along_axis(
                    csum, jnp.minimum(pr, C - 1), axis=1)
                v = _tail(pr, rank)
                pr = (pr + v) % C
                return pr, acc + v
            _, acc = lax.fori_loop(0, reps, body, (probe, 0))
            return acc

        emit("invert_onehot_mxu", timed(invert_onehot_mxu, probe0))

        @jax.jit
        def invert_scatter_mxu(probe, reps):
            """Scatter-add hist + MXU block scan: O(Q*C) bytes for the
            hist instead of the one-hot's O(Q*nprobe*C) compares."""
            def body(i, carry):
                pr, acc = carry
                fq2 = jnp.broadcast_to(
                    jnp.arange(Q, dtype=jnp.int32)[:, None],
                    (Q, nprobe))
                hist = jnp.zeros((Q, C), jnp.float32).at[
                    fq2.reshape(-1), pr.reshape(-1)].add(
                    1.0, mode="drop")
                csum = _blockscan(hist)
                rank = jnp.take_along_axis(
                    csum, jnp.minimum(pr, C - 1), axis=1)
                v = _tail(pr, rank)
                pr = (pr + v) % C
                return pr, acc + v
            _, acc = lax.fori_loop(0, reps, body, (probe, 0))
            return acc

        emit("invert_scatter_mxu", timed(invert_scatter_mxu, probe0))

    # ---- one-hot qsel build ------------------------------------------
    from neumann_tpu.ops.quant import scalar_quantize

    tbl0 = jax.random.randint(ks[3], (C, q_cap), -1, Q, jnp.int32)

    if want("ohqsel"):
        @jax.jit
        def ohqsel(tbl, qs, reps):
            def body(i, carry):
                cur, acc = carry
                qq_i8, qsc = scalar_quantize(cur)
                oh = (tbl[:, :, None]
                      == jnp.arange(Q, dtype=jnp.int32)[None, None, :]
                      ).astype(jnp.int8)
                qsel = lax.dot_general(
                    oh.reshape(C * q_cap, Q), qq_i8,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.int8).reshape(C, q_cap, d)
                v = qsel[0, 0, 0].astype(jnp.float32)
                cur = cur + 1e-30 * v
                return cur, acc + v
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

        emit("ohqsel_matmul", timed(ohqsel, tbl0, qs))

        @jax.jit
        def takeqsel(tbl, qs, reps):
            def body(i, carry):
                cur, acc = carry
                qq_i8, qsc = scalar_quantize(cur)
                qsel = jnp.take(qq_i8, jnp.maximum(tbl.reshape(-1), 0),
                                axis=0).reshape(C, q_cap, d)
                v = qsel[0, 0, 0].astype(jnp.float32)
                cur = cur + 1e-30 * v
                return cur, acc + v
            _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
            return acc

        emit("ohqsel_take", timed(takeqsel, tbl0, qs))

    # ---- corpus (needed by kernel + rerank parts) --------------------
    need_corpus = want("kernel") or want("rerank")
    if need_corpus:
        _log("generating corpus")
        chunk_rows = min(n_pad, 1 << 20)
        corpus_q = jnp.zeros((n_pad, d), jnp.int8)

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames="rows")
        def fill(c, key, start, rows):
            chunk = jax.random.randint(key, (rows, d), -127, 128,
                                       jnp.int8)
            return lax.dynamic_update_slice(c, chunk, (start, 0))

        kf = ks[4]
        done = 0
        while done < n_pad:
            rows = min(chunk_rows, n_pad - done)
            kf, sub = jax.random.split(kf)
            corpus_q = fill(corpus_q, sub, jnp.int32(done), rows)
            done += rows
        rmult = jnp.full((n_pad,), 1e-3, jnp.float32)

    # ---- pallas kernel alone (prebuilt qsel) -------------------------
    if want("kernel"):
        from neumann_tpu.ops.pallas_kernels import batched_probe_pallas

        qsel0 = jax.random.randint(ks[5], (C, q_cap, d), -127, 128,
                                   jnp.int8)
        scm0 = jnp.full((C, q_cap), 1e-3, jnp.float32)
        rm2 = rmult.reshape(C, window)

        @jax.jit
        def kern(buf, rm2, qsel, scm, reps):
            def body(i, carry):
                qq, acc = carry
                wb = batched_probe_pallas(buf, rm2, qq, scm, window)
                v = wb[0, 0, 0].astype(jnp.float32)
                qq = (qq + wb[0, 0, 0].astype(jnp.int8)[None, None])
                return qq, acc + v
            _, acc = lax.fori_loop(0, reps, body, (qsel, 0.0))
            return acc

        _log("kernel compile")
        emit("kernel_pallas", timed(kern, corpus_q, rm2, qsel0, scm0,
                                    reps=(1, 5)))

    # ---- decode + reassembly gather ----------------------------------
    if want("decode"):
        from neumann_tpu.ops.pallas_kernels import (
            decode_strided_pool_bits,
        )

        wb0 = jax.random.randint(ks[6], (C, q_cap, 128), 0x3F800000,
                                 0x40400000, jnp.int32)
        probe1 = jax.random.randint(ks[7], (Q, nprobe), 0, C, jnp.int32)
        rank1 = jax.random.randint(ks[8], (Q, nprobe), 0, q_cap,
                                   jnp.int32)
        starts = jnp.arange(C, dtype=jnp.int32) * window

        @jax.jit
        def deco(wb, probe, rank, reps):
            def body(i, carry):
                w, acc = carry
                s, p = decode_strided_pool_bits(w, window)
                ysp = jnp.where(p < 0, -1, starts[:, None, None] + p)
                out_s = s[probe, rank]        # [Q, nprobe, 128]
                out_p = ysp[probe, rank]
                v = out_s[0, 0, 0] + out_p[0, 0, 0].astype(jnp.float32)
                w = w + jnp.int32(1)
                return w, acc + v
            _, acc = lax.fori_loop(0, reps, body, (wb, 0.0))
            return acc

        emit("decode_reassemble", timed(deco, wb0, probe1, rank1))

    # ---- rerank (prebuilt candidates) --------------------------------
    if want("rerank"):
        from neumann_tpu.ops.rerank import gather_rerank_topk_chunked

        ncand = nprobe * 128
        pos0 = jax.random.randint(ks[9], (Q, ncand), 0, n_pad,
                                  jnp.int32)
        fs0 = jax.random.normal(ks[10], (Q, ncand), jnp.float32)

        for ps in (presel, 16):
            @functools.partial(jax.jit, static_argnames="ps")
            def rer(buf, pos, fs, qs, reps, ps):
                def body(i, carry):
                    cur, acc = carry
                    s, p = gather_rerank_topk_chunked(
                        buf, pos, cur, k, "cosine", first_scores=fs,
                        dedup=False, chunk=128, pre_select=ps,
                        expand_pool=pool, expand_window=window)
                    v = s[0, 0] + p[0, 0].astype(jnp.float32) * 1e-6
                    cur = cur + 1e-30 * v
                    return cur, acc + v
                _, acc = lax.fori_loop(0, reps, body, (qs, 0.0))
                return acc

            _log(f"rerank presel={ps} compile")
            rer_p = functools.partial(rer, ps=ps)
            emit(f"rerank_presel{ps}",
                 timed(lambda *a: rer_p(a[0], a[1], a[2], a[3], a[4]),
                       corpus_q, pos0, fs0, qs, reps=(1, 5)))


if __name__ == "__main__":
    main()
