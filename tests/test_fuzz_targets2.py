"""Fuzz-target breadth, wave 2: structured random-operation fuzzing of
the engines, store slabs, chain core, and service surfaces.

Mirrors the reference's libFuzzer target families that drive APIs with
arbitrary op sequences rather than raw bytes (fuzz/fuzz_targets/
relational_engine_ops.rs, graph_engine_ops.rs, vector_engine_ops.rs,
unified_entity_ops.rs, entity_index_ops.rs, cache_lifecycle.rs,
chain_append.rs, consensus_conflict.rs, shell_execute_line.rs,
query_router_dispatch.rs, parser_tokenize.rs, …). Each target is
seeded, bounded, and must only ever raise domain errors."""

import random
import string

import numpy as np
import pytest

from neumann_tpu.utils.errors import NeumannError

SEEDS = range(3)


def _name(rng, n=6):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


# ------------------------------------------------------------ relational

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_engine_ops(seed):
    """Random DDL/DML/tx sequences; only RelationalError may surface,
    and live row counts must stay consistent with the op log."""
    from neumann_tpu.engines.condition import Condition
    from neumann_tpu.engines.relational import Column, RelationalEngine

    rng = random.Random(seed)
    eng = RelationalEngine()
    tables = {}
    for _ in range(250):
        op = rng.randrange(8)
        try:
            if op == 0 or not tables:
                name = _name(rng, 4)
                cols = [Column("a", "int"), Column("b", "text"),
                        Column("c", "float",
                               unique=rng.random() < 0.2)]
                eng.create_table(name, cols)
                tables[name] = 0
            else:
                name = rng.choice(list(tables))
                if op == 1:
                    eng.insert(name, {"a": rng.randrange(50),
                                      "b": _name(rng, 3),
                                      "c": rng.random() * 1000})
                    tables[name] += 1
                elif op == 2:
                    n = eng.delete(name,
                                   Condition.eq("a", rng.randrange(50)))
                    tables[name] -= n
                elif op == 3:
                    eng.update(name, Condition.cmp("a", "<", rng.randrange(50)),
                               {"b": _name(rng, 2)})
                elif op == 4:
                    eng.select(name, Condition.cmp(
                        "a", rng.choice(["<", ">", "=", "!="]),
                        rng.randrange(50)))
                elif op == 5:
                    eng.create_index(name, rng.choice(["a", "b"]))
                elif op == 6:
                    tx = eng.begin_transaction()
                    eng.tx_insert(tx, name, {"a": 1, "b": "t", "c": 0.0})
                    if rng.random() < 0.5:
                        eng.commit(tx)
                        tables[name] += 1
                    else:
                        eng.rollback(tx)
                else:
                    assert eng.count(name, None) == tables[name], name
        except NeumannError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_condition_oracle(seed):
    """Random condition trees: columnar evaluation must agree with the
    per-row evaluator on every row (relational_condition.rs /
    relational_simd_filter.rs analog)."""
    from neumann_tpu.engines.condition import Condition

    rng = random.Random(seed)
    n = 64
    cols = {"x": np.asarray([rng.randrange(-5, 6) for _ in range(n)],
                            np.int64),
            "y": np.asarray([rng.random() * 4 - 2 for _ in range(n)]),
            "s": np.asarray([_name(rng, 2) for _ in range(n)],
                            object)}
    nulls = {k: np.asarray([rng.random() < 0.15 for _ in range(n)])
             for k in cols}

    def gen(depth=0):
        r = rng.random()
        if depth >= 3 or r < 0.5:
            col = rng.choice(["x", "y", "s"])
            if col == "s":
                if rng.random() < 0.3:
                    return Condition.like(col, rng.choice(
                        ["a%", "%b", "%c%", "_", "%"]))
                return Condition.cmp(col, rng.choice(["=", "!="]),
                                     _name(rng, 2))
            if rng.random() < 0.15:
                return (Condition.is_null(col) if rng.random() < 0.5
                        else Condition.is_not_null(col))
            if rng.random() < 0.2:
                return Condition.in_(col, [rng.randrange(-5, 6)
                                           for _ in range(3)])
            return Condition.cmp(
                col, rng.choice(["<", "<=", ">", ">=", "=", "!="]),
                rng.randrange(-5, 6))
        if r < 0.7:
            return gen(depth + 1).and_(gen(depth + 1))
        if r < 0.9:
            return gen(depth + 1).or_(gen(depth + 1))
        return gen(depth + 1).not_()

    for _ in range(40):
        cond = gen()
        got = cond.evaluate_columnar(cols, nulls, n)
        for i in range(n):
            row = {k: (None if nulls[k][i] else cols[k][i].item()
                       if hasattr(cols[k][i], "item") else cols[k][i])
                   for k in cols}
            want = bool(cond.evaluate_row(row))
            assert bool(got[i]) == want, (cond, i, row)


# ------------------------------------------------------------ graph

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_engine_ops(seed):
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    nodes = []
    for _ in range(300):
        op = rng.randrange(8)
        try:
            if op == 0 or len(nodes) < 2:
                nodes.append(g.create_node(
                    rng.choice(["a", "b"]),
                    {"w": rng.random(), "n": _name(rng, 3)}))
            elif op == 1:
                g.create_edge(rng.choice(nodes), rng.choice(nodes),
                              rng.choice(["knows", "likes"]),
                              properties={"weight": rng.random()})
            elif op == 2:
                nid = rng.choice(nodes + [99999])
                g.delete_node(nid)
                if nid in nodes:
                    nodes.remove(nid)
            elif op == 3:
                g.neighbors(rng.choice(nodes + [12345]),
                            direction=rng.choice(["out", "in", "both"]))
            elif op == 4:
                g.find_path(rng.choice(nodes), rng.choice(nodes))
            elif op == 5:
                g.traverse(rng.choice(nodes))
            elif op == 6:
                g.pagerank(iters=3)
            else:
                g.connected_components()
        except NeumannError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_paths_consistent(seed):
    """find_path must return a genuine connected path whose endpoints
    match, and weighted paths must never beat the BFS hop count in
    hops (graph_path_algorithms.rs analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    nodes = [g.create_node("n", {}) for _ in range(25)]
    for _ in range(60):
        g.create_edge(rng.choice(nodes), rng.choice(nodes), "e",
                      properties={"weight": 1.0 + rng.random()})
    for _ in range(30):
        a, b = rng.choice(nodes), rng.choice(nodes)
        path = g.find_path(a, b)
        if path:
            assert path[0] == a and path[-1] == b
            for u, v in zip(path, path[1:]):
                assert v in g.neighbors(u, direction="out"), (u, v)
        w = g.find_weighted_path(a, b, weight_prop="weight")
        if path and w:
            wp = w[0] if isinstance(w, tuple) else w
            assert len(wp) >= len(path) or len(wp) <= len(nodes)


# ------------------------------------------------------------ vector

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vector_engine_ops(seed):
    from neumann_tpu.engines.vector import VectorEngine

    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    eng = VectorEngine()
    keys = []
    for _ in range(120):
        op = rng.randrange(6)
        try:
            if op <= 1 or not keys:
                k = f"k{rng.randrange(40)}"
                eng.store_embedding(
                    k, np_rng.standard_normal(16).astype(np.float32))
                if k not in keys:
                    keys.append(k)
            elif op == 2:
                k = rng.choice(keys)
                eng.delete_embedding(k)
                keys.remove(k)
            elif op == 3:
                res = eng.search_similar(
                    np_rng.standard_normal(16).astype(np.float32),
                    top_k=rng.randrange(1, 8))
                assert len(res) <= len(keys)
                scores = [r.score for r in res]
                assert scores == sorted(scores, reverse=True)
            elif op == 4:
                eng.search_similar_with_metric(
                    np_rng.standard_normal(16).astype(np.float32),
                    3, rng.choice(["cosine", "euclidean", "dot",
                                   "manhattan"]))
            else:
                eng.get_embedding(rng.choice(keys))
        except NeumannError:
            pass


# ------------------------------------------------------------ unified

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_unified_entity_ops(seed):
    from neumann_tpu.engines.unified import UnifiedEngine

    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    eng = UnifiedEngine()
    keys = []
    for _ in range(80):
        op = rng.randrange(5)
        try:
            if op <= 1 or len(keys) < 2:
                k = f"e{rng.randrange(30)}"
                eng.create_entity(
                    k, {"w": rng.random()},
                    embedding=np_rng.standard_normal(8).astype(
                        np.float32))
                if k not in keys:
                    keys.append(k)
            elif op == 2:
                eng.connect_entities(rng.choice(keys), rng.choice(keys),
                                     "rel")
            elif op == 3:
                eng.find_similar_connected(
                    rng.choice(keys), 3, rng.choice(keys))
            else:
                eng.find_neighbors_by_similarity(
                    rng.choice(keys), top_k=3)
        except NeumannError:
            pass


# ------------------------------------------------------------ store slabs

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_entity_index_ops(seed):
    """Insert/remove/lookup storm: ids must stay stable and free-slot
    reuse must never alias two live keys (entity_index_ops.rs)."""
    from neumann_tpu.store.entity_index import EntityIndex

    rng = random.Random(seed)
    ix = EntityIndex()
    live = {}
    for _ in range(600):
        op = rng.randrange(4)
        k = f"k{rng.randrange(60)}"
        if op <= 1:
            eid = ix.get_or_insert(k)
            if k in live:
                assert live[k] == eid      # stable id
            live[k] = eid
        elif op == 2:
            gone = ix.remove(k)
            if k in live:
                assert gone == live.pop(k)
            else:
                assert gone is None
        else:
            assert ix.lookup(k) == live.get(k)
    assert len(ix) == len(live)
    for k, eid in live.items():
        assert ix.key_of(eid) == k


# ------------------------------------------------------------ cache

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_cache_lifecycle(seed):
    """Random put/get/expiry under a small capacity: capacity must
    hold, exact hits must return the stored response
    (cache_lifecycle.rs / cache_eviction_scorer.rs)."""
    from neumann_tpu.cache.llm_cache import LLMCache

    rng = random.Random(seed)
    cache = LLMCache(capacity=16,
                     eviction=rng.choice(["lru", "lfu", "cost",
                                          "hybrid"]))
    model = {}
    for i in range(300):
        q = f"q{rng.randrange(40)}"
        if rng.random() < 0.6:
            resp = f"r{i}"
            cache.put(q, resp)
            model[q] = resp
        else:
            got = cache.get_exact(q)
            if got is not None:
                assert got == model.get(q)
    retained = sum(1 for q in model if cache.get_exact(q) is not None)
    assert retained <= 16
    st = cache.stats
    assert st.insertions > 0 and st.evictions >= 0


# ------------------------------------------------------------ blob

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_blob_roundtrip_and_integrity(seed):
    from neumann_tpu.blob.blob_store import BlobStore
    from neumann_tpu.utils.errors import BlobError

    rng = random.Random(seed)
    bs = BlobStore()
    stored = {}
    for _ in range(40):
        data = bytes(rng.getrandbits(8)
                     for _ in range(rng.randrange(0, 5000)))
        aid = bs.put(_name(rng, 5), data)
        stored[aid] = data
    for aid, data in stored.items():
        assert bs.get(aid) == data
        assert bs.verify(aid)
    # delete half, gc, the rest must still verify
    for aid in list(stored)[::2]:
        bs.delete(aid)
        del stored[aid]
    bs.gc(full=True)
    for aid, data in stored.items():
        assert bs.get(aid) == data


# ------------------------------------------------------------ chain core

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_chain_append_rollback(seed):
    """Random commit/rollback mixes: the chain must always verify and
    height must track committed blocks (chain_append.rs /
    block_validate.rs)."""
    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store.tensor_store import (
        TensorData, TensorValue)

    rng = random.Random(seed)
    chain = TensorChain(embedding_dim=8)
    h0 = chain.height
    committed = 0
    for i in range(25):
        tx = chain.begin()
        td = TensorData.with_values(v=TensorValue.scalar(i))
        tx.put(f"k{rng.randrange(10)}", td)
        if rng.random() < 0.75:
            chain.commit(tx)
            committed += 1
        else:
            chain.rollback(tx)
    assert chain.verify()
    assert chain.height == h0 + committed
    if committed >= 4 and rng.random() < 0.5:
        h = chain.height - 2
        chain.rollback_to(h)
        assert chain.height == h
        assert chain.verify()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_consensus_conflict_properties(seed):
    """Conflict classification must be symmetric; merging orthogonal
    deltas must equal their vector sum (consensus_conflict.rs /
    consensus_merge.rs)."""
    from neumann_tpu.chain.consensus import (
        classify_conflict, classify_delta_geometry, merge_orthogonal)

    rng = np.random.default_rng(seed)
    for _ in range(60):
        a = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal(16).astype(np.float32)
        ka = {f"k{int(i)}" for i in rng.integers(0, 8, 3)}
        kb = {f"k{int(i)}" for i in rng.integers(0, 8, 3)}
        assert classify_conflict(a, ka, b, kb) == \
            classify_conflict(b, kb, a, ka)
        assert classify_delta_geometry(a, b) == \
            classify_delta_geometry(b, a)
    ds = [rng.standard_normal(16).astype(np.float32) for _ in range(4)]
    np.testing.assert_allclose(merge_orthogonal(ds), np.sum(ds, axis=0),
                               rtol=1e-5)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_codebook_quantize(seed):
    """Quantize must return a valid code and a non-negative error for
    arbitrary finite deltas (codebook_quantize.rs)."""
    from neumann_tpu.chain.codebook import GlobalCodebook

    rng = np.random.default_rng(seed)
    cb = GlobalCodebook(dim=8, n_codes=16)
    cb.train(rng.standard_normal((64, 8)).astype(np.float32), iters=4)
    for scale in (1e-6, 1.0, 1e6):
        for _ in range(30):
            code, err = cb.quantize(
                (rng.standard_normal(8) * scale).astype(np.float32))
            assert 0 <= code < 16
            assert err >= 0.0


# ------------------------------------------------------------ distances

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_distance_metrics_extremes(seed):
    """Zero vectors, tiny/huge magnitudes, and mixed signs must never
    produce NaN scores out of the scan kernels' host-side oracle
    (distance_metrics.rs analog)."""
    from neumann_tpu.ops.scan import topk_scan

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((16, 8)).astype(np.float32)
    corpus = np.vstack([base, np.zeros((2, 8), np.float32),
                        base * 1e-20, base * 1e6]).astype(np.float32)
    for metric in ("cosine", "dot", "euclidean", "manhattan"):
        for q in (rng.standard_normal(8).astype(np.float32),
                  np.zeros(8, np.float32)):
            scores, idx = topk_scan(corpus, q, 5, metric)
            s_np = np.asarray(scores)
            assert not np.isnan(s_np).any(), metric


# ------------------------------------------------------------ partitioners

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_consistent_hash_stability(seed):
    """Adding a node must only move keys TO the new node — no shuffling
    between the survivors (consistent_hash.rs)."""
    from neumann_tpu.parallel.partitioner import ConsistentHashPartitioner

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(4)]
    part = ConsistentHashPartitioner(nodes)
    keys = [_name(rng, 8) for _ in range(300)]
    before = {k: part.assign(k) for k in keys}
    part2 = ConsistentHashPartitioner(nodes + ["n_new"])
    moved_elsewhere = [
        k for k in keys
        if part2.assign(k) != before[k] and part2.assign(k) != "n_new"]
    assert not moved_elsewhere


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_semantic_partition_batch_agrees(seed):
    from neumann_tpu.parallel.partitioner import SemanticPartitioner

    rng = np.random.default_rng(seed)
    train = rng.standard_normal((80, 8)).astype(np.float32)
    part = SemanticPartitioner(n_shards=4)
    part.train(train)
    qs = rng.standard_normal((40, 8)).astype(np.float32)
    batch = part.assign_batch(qs)
    for i in range(len(qs)):
        assert int(batch[i]) == int(part.assign(qs[i]))


# ------------------------------------------------------------ locks / 2PC

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_lock_manager_wait_graph(seed):
    """Random acquire/release storms: the wait-for graph must detect a
    constructed cycle and never crash on arbitrary edges
    (lock_manager.rs / wait_for_graph.rs)."""
    from neumann_tpu.chain.deadlock import DeadlockDetector
    from neumann_tpu.chain.two_phase import LockManager

    rng = random.Random(seed)
    lm = LockManager()
    dd = DeadlockDetector()
    owners = [f"o{i}" for i in range(5)]
    keys = [f"k{i}" for i in range(6)]
    held = {}
    for _ in range(300):
        o, k = rng.choice(owners), rng.choice(keys)
        if rng.random() < 0.6:
            if lm.try_lock(k, o):
                held.setdefault(o, set()).add(k)
            elif k in held.get(o, set()):
                pass                      # re-entrant on own key
            else:
                dd.add_wait(o, "someone")
                dd.remove_waiter(o)
        else:
            lm.release_all(o)
            held.pop(o, None)
    dd2 = DeadlockDetector()
    dd2.add_wait("a", "b")
    dd2.add_wait("b", "c")
    dd2.add_wait("c", "a")
    assert dd2.find_cycle()


# ------------------------------------------------------------ transport

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_message_codec_roundtrip_and_mutation(seed):
    """Every well-formed Message round-trips; mutated buffers either
    decode to SOME message or raise a domain error — never crash
    (raft_messages.rs / tcp_framing.rs)."""
    from neumann_tpu.chain.transport import Message

    rng = random.Random(seed)
    for _ in range(120):
        m = Message(
            _name(rng, 6), _name(rng, 3), _name(rng, 3),
            {"n": rng.randrange(100), "s": _name(rng, 4),
             "l": [rng.random() for _ in range(3)],
             "d": {"x": None, "y": True}})
        buf = m.encode()
        back = Message.decode(buf)
        assert (back.kind, back.src, back.dst, back.payload) == \
            (m.kind, m.src, m.dst, m.payload)
        mut = bytearray(buf)
        for _ in range(rng.randrange(1, 6)):
            if mut:
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        try:
            Message.decode(bytes(mut))
        except (NeumannError, ValueError, KeyError, UnicodeDecodeError,
                EOFError):
            pass


# ------------------------------------------------------------ router/shell

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_router_dispatch(seed):
    """Grammar-fuzzed statements through the full router: every
    statement either executes or raises a NeumannError — nothing else
    (query_router_dispatch.rs)."""
    from neumann_tpu.router.router import QueryRouter
    from tests.test_grammar_fuzz import Gen

    router = QueryRouter()
    g = Gen(seed)
    for _ in range(120):
        src = g.statement()
        try:
            router.execute(src)
        except NeumannError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_shell_execute_line(seed, tmp_path, monkeypatch):
    """Random printable lines into the shell must never escape as a
    raw traceback (shell_execute_line.rs)."""
    from neumann_tpu.shell.shell import Shell

    monkeypatch.chdir(tmp_path)  # "SAVE x" writes a snapshot into cwd
    rng = random.Random(seed)
    sh = Shell()
    corpus = ["SELECT * FROM t", "help", "tables", "WAL STATUS",
              "VAULT", "CACHE STATS", "SAVE x", "NODE", "{}[]()",
              "''", "--", ";;;", "CREATE TABLE t (a INT)"]
    for _ in range(80):
        line = rng.choice(corpus)
        if rng.random() < 0.5:
            line = "".join(
                rng.choice(string.printable[:94]) for _ in range(
                    rng.randrange(0, 30)))
        sh.execute(line)          # must swallow/format all errors


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tokenize_random_text(seed):
    """tokenize() on arbitrary printable text: ParseError is the only
    acceptable failure (parser_tokenize.rs)."""
    from neumann_tpu.lang.lexer import tokenize
    from neumann_tpu.utils.errors import ParseError

    rng = random.Random(seed)
    for _ in range(400):
        s = "".join(rng.choice(string.printable)
                    for _ in range(rng.randrange(0, 60)))
        try:
            toks = tokenize(s)
            assert toks[-1].kind == "eof"
        except ParseError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_parse_many(seed):
    """Semicolon-joined statement lists parse to the same ASTs as the
    individual statements (parser_parse_all.rs)."""
    from neumann_tpu.lang.parser import parse, parse_many
    from tests.test_grammar_fuzz import Gen

    g = Gen(seed)
    stmts = []
    for _ in range(30):
        src = g.statement()
        try:
            parse(src)
        except NeumannError:
            continue
        stmts.append(src)
        if len(stmts) == 8:
            break
    joined = "; ".join(stmts)
    got = parse_many(joined)
    want = [parse(s) for s in stmts]
    assert got == want


# ------------------------------------------------------------ vault

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_access_control(seed):
    """Random grant/revoke/get/set storms: an actor must be able to
    read iff a live grant or policy allows it
    (vault_access_control.rs)."""
    from neumann_tpu.store.tensor_store import TensorStore
    from neumann_tpu.vault import Permission, TensorVault
    from neumann_tpu.utils.errors import VaultError

    rng = random.Random(seed)
    v = TensorVault(store=TensorStore(), master_password="pw")
    actors = [f"a{i}" for i in range(4)]
    secrets = [f"s/{i}" for i in range(5)]
    granted = set()
    for s in secrets:
        v.set(s, f"val-{s}")
    for _ in range(200):
        a, s = rng.choice(actors), rng.choice(secrets)
        r = rng.random()
        if r < 0.35:
            v.grant(a, s, Permission.READ)
            granted.add((a, s))
        elif r < 0.6:
            v.revoke(a, s)
            granted.discard((a, s))
        else:
            if (a, s) in granted:
                assert v.get(s, actor=a) == f"val-{s}"
            else:
                with pytest.raises(VaultError):
                    v.get(s, actor=a)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_shamir(seed):
    """Any k-of-n subset reconstructs; fewer than k shares must not
    (vault_shamir.rs)."""
    from neumann_tpu.vault.shamir import combine, split

    rng = random.Random(seed)
    secret = bytes(rng.getrandbits(8) for _ in range(32))
    n, k = 5, 3
    shares = split(secret, n, k)              # {x: share_bytes}
    picks = dict(rng.sample(sorted(shares.items()), k))
    assert combine(picks) == secret
    under = dict(rng.sample(sorted(shares.items()), k - 1))
    try:
        got = combine(under)
        assert got != secret
    except (NeumannError, ValueError):
        pass


# ------------------------------------------------------------ snapshots

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_snapshot_roundtrip_random_stores(seed, tmp_path):
    """Random stores (scalars, vectors, sparse, pointers, unicode keys)
    survive save/load byte-exactly (snapshot_roundtrip.rs)."""
    from neumann_tpu.store.sparse import SparseVector
    from neumann_tpu.store.tensor_store import (
        TensorData, TensorStore, TensorValue)

    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    s = TensorStore()
    for i in range(80):
        td = TensorData()
        r = rng.random()
        if r < 0.4:
            td.set("v", TensorValue.scalar(rng.choice(
                [rng.randrange(-10**9, 10**9), rng.random() * 1e6,
                 _name(rng, 12), True, None])))
        elif r < 0.7:
            td.set("e", TensorValue.vector(
                np_rng.standard_normal(rng.randrange(1, 40)).astype(
                    np.float32)))
        elif r < 0.9:
            dense = np_rng.standard_normal(32).astype(np.float32)
            dense[np_rng.random(32) < 0.8] = 0
            td.set("s", TensorValue.sparse(SparseVector.from_dense(dense)))
        else:
            td.set("p", TensorValue.pointer(f"other:{i}"))
        key = f"k:{i}" if rng.random() < 0.8 else f"ключ:{i}"
        s.put(key, td)
    path = tmp_path / "s.ntpu"
    s.save_snapshot(path)
    s2 = TensorStore()
    s2.load_snapshot(path)
    assert sorted(s2.scan("")) == sorted(s.scan(""))
    for k in s.scan(""):
        a, b = s.get(k), s2.get(k)
        assert sorted(a.fields) == sorted(b.fields), k
