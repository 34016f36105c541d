"""Fuzz-target breadth, wave 5: storage slabs, TT compression,
blob store, checkpoints, relational constraints/transactions, and the
graph engine surface.

Mirrors the remaining reference libFuzzer families
(fuzz/fuzz_targets/: slab_router_ops.rs, tensor_wal_roundtrip.rs,
atomic_io.rs, sparse_vector_roundtrip.rs, graph_tensor_ops.rs,
tt_roundtrip.rs, tt_batch.rs, tt_metrics.rs, svd_randomized.rs,
compress_snapshot.rs, delta_apply.rs, blob_chunker.rs,
blob_metadata_roundtrip.rs, durable_blob_crash.rs,
checkpoint_snapshot_parse.rs, relational_constraint.rs,
relational_index_serialization.rs, relational_transaction.rs,
graph_aggregation.rs, graph_batch_ops.rs, graph_constraints.rs,
graph_degree.rs, graph_index_ops.rs, graph_pattern_matching.rs).
Each target drives seeded random operation sequences and checks a
semantic oracle, not just absence of crashes."""

import os
import random
import string

import numpy as np
import pytest

SEEDS = range(2)


def _rand_key(rng, prefixes=("emb:", "node:", "edge:", "table:",
                             "_cache:", "meta:", "")):
    prefix = rng.choice(prefixes)
    body = "".join(rng.choices(string.ascii_lowercase + string.digits,
                               k=rng.randint(1, 12)))
    return prefix + body


# ------------------------------------------------------------ storage

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_slab_router_ops(seed):
    """Random put/get/delete/exists/scan across every slab prefix must
    agree with a dict oracle (slab_router_ops.rs analog)."""
    from neumann_tpu.store.tensor_store import (TensorStore, TensorData,
                                                TensorValue)

    rng = random.Random(seed)
    store = TensorStore()
    oracle = {}
    for step in range(300):
        op = rng.randrange(5)
        key = _rand_key(rng)
        if op == 0:
            val = rng.randrange(1 << 40)
            data = TensorData().set("id", TensorValue.scalar(val)).set(
                "name", TensorValue.scalar(f"item_{val}"))
            store.put(key, data)
            oracle[key] = val
        elif op == 1:
            got = store.get(key)
            if key in oracle:
                assert got is not None
                assert got.get("id").value == oracle[key]
            else:
                assert got is None
        elif op == 2:
            assert store.delete(key) == (key in oracle)
            oracle.pop(key, None)
        elif op == 3:
            assert store.exists(key) == (key in oracle)
        else:
            prefix = _rand_key(rng)[:rng.randint(0, 6)]
            got = sorted(store.scan(prefix))
            want = sorted(k for k in oracle if k.startswith(prefix))
            assert got == want
            assert store.scan_count(prefix) == len(want)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tensor_wal_roundtrip(seed, tmp_path):
    """Arbitrary put/delete mixes must replay byte-identically from the
    WAL, including vector payloads and unicode keys
    (tensor_wal_roundtrip.rs analog)."""
    from neumann_tpu.store.tensor_store import (TensorStore, TensorData,
                                                TensorValue)

    rng = random.Random(seed)
    wal = str(tmp_path / "w.wal")
    store = TensorStore()
    store.open_durable(wal, sync_mode="manual")
    oracle = {}
    for step in range(200):
        key = _rand_key(rng, prefixes=("k:", "emb:", "uni:é中"))
        if rng.random() < 0.75:
            data = TensorData().set("n", TensorValue.scalar(step))
            if rng.random() < 0.4:
                vec = np.asarray([rng.uniform(-2, 2)
                                  for _ in range(rng.randint(1, 9))],
                                 dtype=np.float32)
                data.set("v", TensorValue.vector(vec))
                oracle[key] = (step, vec.tolist())
            else:
                oracle[key] = (step, None)
            store.put(key, data)
        else:
            store.delete(key)
            oracle.pop(key, None)
    store.wal_flush()

    fresh = TensorStore()
    n = fresh.recover(wal)
    assert n > 0
    assert sorted(fresh.scan("")) == sorted(oracle)
    for key, (n_val, vec) in oracle.items():
        data = fresh.get(key)
        assert data.get("n").value == n_val
        if vec is not None:
            assert np.allclose(np.asarray(data.get("v").value,
                                          dtype=np.float32), vec)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_atomic_io(seed, tmp_path):
    """A crash between tmp-write and rename must leave the previous
    snapshot fully readable: loads never see a half-written file
    (atomic_io.rs analog)."""
    from neumann_tpu.store.tensor_store import (TensorStore, TensorData,
                                                TensorValue)

    rng = random.Random(seed)
    snap = str(tmp_path / "s.ntpu")
    store = TensorStore()
    for i in range(50):
        store.put(f"k:{i}", TensorData().set("v", TensorValue.scalar(i)))
    store.save_snapshot(snap)

    # Simulate the crash: a newer generation dies before rename.
    leftovers = 0
    for gen in range(3):
        store.put(f"k:new{gen}",
                  TensorData().set("v", TensorValue.scalar(100 + gen)))
        tmp = snap + f".tmp{gen}"
        with open(tmp, "wb") as fh:
            blob = open(snap, "rb").read()
            fh.write(blob[:rng.randint(0, max(1, len(blob) - 1))])
        leftovers += 1

    fresh = TensorStore()
    fresh.load_snapshot(snap)
    assert fresh.scan_count("k:") == 50
    for i in range(50):
        assert fresh.get(f"k:{i}").get("v").value == i
    assert leftovers == 3


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_sparse_vector_roundtrip(seed):
    """from_dense -> to_dense is exact above threshold; every sparse
    metric matches its dense oracle (sparse_vector_roundtrip.rs
    analog)."""
    from neumann_tpu.store.sparse import SparseVector

    rng = np.random.default_rng(seed)
    for trial in range(40):
        dim = int(rng.integers(1, 64))
        a = rng.standard_normal(dim).astype(np.float32)
        b = rng.standard_normal(dim).astype(np.float32)
        # Randomly zero out entries to hit real sparsity.
        a[rng.random(dim) < 0.6] = 0.0
        b[rng.random(dim) < 0.6] = 0.0
        sa, sb = SparseVector.from_dense(a), SparseVector.from_dense(b)
        assert np.allclose(sa.to_dense(), a)
        assert sa.nnz == int(np.count_nonzero(a))
        assert np.isclose(sa.dot(sb), float(a @ b), atol=1e-4)
        assert np.isclose(sa.dot_dense(b), float(a @ b), atol=1e-4)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 0 and nb > 0:
            assert np.isclose(sa.cosine_similarity(sb),
                              float(a @ b) / (na * nb), atol=1e-4)
        sup_a, sup_b = set(np.flatnonzero(a)), set(np.flatnonzero(b))
        union = len(sup_a | sup_b)
        if union:
            assert np.isclose(sa.jaccard(sb),
                              len(sup_a & sup_b) / union, atol=1e-6)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_tensor_ops(seed):
    """Random node/edge insert/delete with neighbor queries must agree
    with a dict-of-sets adjacency oracle (graph_tensor_ops.rs
    analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    nodes = []
    edges = {}          # eid -> (src, dst)
    adj = {}            # src -> {dst}
    for step in range(200):
        op = rng.randrange(4)
        if op == 0 or not nodes:
            nid = g.create_node("n", {"i": step})
            nodes.append(nid)
            adj.setdefault(nid, set())
        elif op == 1 and len(nodes) >= 2:
            src, dst = rng.choice(nodes), rng.choice(nodes)
            eid = g.create_edge(src, dst, "e")
            edges[eid] = (src, dst)
            if dst != src:      # self-loops are not neighbors
                adj[src].add(dst)
        elif op == 2 and edges:
            eid = rng.choice(list(edges))
            src, dst = edges.pop(eid)
            assert g.delete_edge(eid)
            if not any(e == (src, dst) for e in edges.values()):
                adj[src].discard(dst)
        else:
            nid = rng.choice(nodes)
            got = {n for n in g.neighbors(nid, direction="out")}
            assert got == adj.get(nid, set())


# ------------------------------------------------------ TT compression

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tt_roundtrip(seed):
    """tt_decompose -> tt_reconstruct stays within the configured error
    budget for arbitrary finite vectors at power-of-two dims
    (tt_roundtrip.rs analog)."""
    from neumann_tpu.compress.tensor_train import (TTConfig, tt_decompose,
                                                   tt_reconstruct)

    rng = np.random.default_rng(seed)
    for p in (4, 5, 6, 8, 10):
        dim = 2 ** p
        v = rng.standard_normal(dim).astype(np.float32)
        v[rng.random(dim) < 0.3] = 0.0
        tt = tt_decompose(v, TTConfig.high_accuracy(dim))
        rec = tt_reconstruct(tt)
        assert rec.shape == v.shape
        err = np.linalg.norm(rec - v) / max(np.linalg.norm(v), 1e-9)
        assert err < 0.35, (p, err)
        # Degenerate vectors must not produce NaNs.
        zeros = tt_reconstruct(tt_decompose(np.zeros(dim, np.float32),
                                            TTConfig.for_dim(dim)))
        assert np.all(np.isfinite(zeros))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tt_batch(seed, tmp_path):
    """StreamingTTWriter/stream_tt roundtrip: every key comes back, in
    order, with the reconstruction the in-memory TT gives
    (tt_batch.rs analog)."""
    from neumann_tpu.compress.streaming_tt import (StreamingTTWriter,
                                                   stream_tt, stream_dense)
    from neumann_tpu.compress.tensor_train import tt_reconstruct

    rng = np.random.default_rng(seed)
    dim = 256
    path = str(tmp_path / "b.stt")
    want = {}
    with StreamingTTWriter(path, dim=dim) as w:
        for i in range(rng.integers(3, 20)):
            key = f"vec{i}"
            v = rng.standard_normal(dim).astype(np.float32)
            tt = w.add(key, v)
            want[key] = tt_reconstruct(tt)
    got = {k: tt_reconstruct(tt) for k, tt in stream_tt(path)}
    assert got.keys() == want.keys()
    for k in want:
        assert np.allclose(got[k], want[k], atol=1e-5)
    dense = dict(stream_dense(path))
    for k in want:
        assert np.allclose(dense[k], want[k], atol=1e-5)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tt_metrics(seed):
    """tt_dot / tt_norm / tt_cosine_similarity computed in TT form must
    match the dense oracle on the reconstructions (tt_metrics.rs
    analog)."""
    from neumann_tpu.compress.tensor_train import (
        TTConfig, tt_cosine_similarity, tt_decompose, tt_dot,
        tt_dot_dense, tt_norm, tt_reconstruct)

    rng = np.random.default_rng(seed)
    dim = 512
    for trial in range(10):
        a = rng.standard_normal(dim).astype(np.float32)
        b = rng.standard_normal(dim).astype(np.float32)
        ta = tt_decompose(a, TTConfig.high_accuracy(dim))
        tb = tt_decompose(b, TTConfig.high_accuracy(dim))
        ra, rb = tt_reconstruct(ta), tt_reconstruct(tb)
        assert np.isclose(tt_dot(ta, tb), float(ra @ rb),
                          rtol=1e-3, atol=1e-2)
        assert np.isclose(tt_norm(ta), np.linalg.norm(ra),
                          rtol=1e-3, atol=1e-3)
        assert np.isclose(tt_dot_dense(ta, b), float(ra @ b),
                          rtol=1e-3, atol=1e-2)
        cos = tt_cosine_similarity(ta, tb)
        want = float(ra @ rb) / (np.linalg.norm(ra) * np.linalg.norm(rb))
        assert np.isclose(cos, want, atol=1e-3)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_svd_randomized(seed):
    """Reconstruction error is monotonically non-increasing in max_rank
    and hits ~zero at full rank (svd_randomized.rs analog)."""
    from neumann_tpu.compress.tensor_train import TTConfig, tt_decompose, \
        tt_reconstruct

    rng = np.random.default_rng(seed)
    dim = 256
    v = rng.standard_normal(dim).astype(np.float32)
    errs = []
    for rank in (1, 2, 4, 8, 16, 64):
        tt = tt_decompose(v, TTConfig.for_dim(dim, max_rank=rank))
        errs.append(np.linalg.norm(tt_reconstruct(tt) - v))
    for lo, hi in zip(errs[1:], errs[:-1]):
        assert lo <= hi + 1e-4
    assert errs[-1] < 1e-3 * np.linalg.norm(v) + 1e-4


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_compress_snapshot(seed, tmp_path):
    """Compressed snapshots (NTPZ) of stores holding embeddings must
    roundtrip: every key and scalar exact, embeddings within the TT
    budget (compress_snapshot.rs analog)."""
    from neumann_tpu.store.tensor_store import (TensorStore, TensorData,
                                                TensorValue)

    rng = np.random.default_rng(seed)
    store = TensorStore()
    want_vecs = {}
    for i in range(30):
        data = TensorData().set("i", TensorValue.scalar(i))
        if i % 2 == 0:
            v = rng.standard_normal(128).astype(np.float32)
            data.set("emb", TensorValue.vector(v))
            want_vecs[f"e:{i}"] = v
        store.put(f"e:{i}", data)
    snap = str(tmp_path / "c.ntpz")
    store.save_snapshot_compressed(snap)

    fresh = TensorStore()
    fresh.load_snapshot(snap)
    assert fresh.scan_count("e:") == 30
    for i in range(30):
        assert fresh.get(f"e:{i}").get("i").value == i
    for key, v in want_vecs.items():
        got = np.asarray(fresh.get(key).get("emb").value, dtype=np.float32)
        cos = float(got @ v) / (np.linalg.norm(got) * np.linalg.norm(v))
        assert cos > 0.98, (key, cos)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_delta_apply(seed):
    """Delta/varint/RLE codecs are exact inverses on arbitrary inputs,
    including pathological runs and huge gaps (delta_apply.rs
    analog)."""
    from neumann_tpu.compress.codecs import (delta_decode_ids,
                                             delta_encode_ids, rle_decode,
                                             rle_encode, varint_decode,
                                             varint_encode)

    rng = random.Random(seed)
    for trial in range(50):
        n = rng.randint(0, 200)
        ids = sorted(rng.sample(range(1 << 50), n)) if n else []
        assert delta_decode_ids(delta_encode_ids(ids)) == ids
        vals = [rng.randrange(1 << 62) for _ in range(n)]
        assert varint_decode(varint_encode(vals)) == vals
        # RLE: bias toward runs.
        raw = b"".join(bytes([rng.randrange(4)]) * rng.randint(1, 30)
                       for _ in range(rng.randint(0, 20)))
        assert rle_decode(rle_encode(raw)) == raw


# ----------------------------------------------------------- blob

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_blob_chunker(seed):
    """Arbitrary write-call slicings of the same payload produce one
    logical blob (dedup), and reads return the exact bytes
    (blob_chunker.rs analog)."""
    from neumann_tpu.blob.blob_store import BlobStore

    rng = random.Random(seed)
    bs = BlobStore()
    payload = bytes(rng.randrange(256)
                    for _ in range(rng.randint(0, 300_000)))
    ids = []
    for trial in range(3):
        w = bs.writer(f"obj{trial}")
        pos = 0
        while pos < len(payload):
            step = rng.randint(1, 70_000)
            w.write(payload[pos:pos + step])
            pos += step
        ids.append(w.finish())
    for aid in ids:
        assert bs.get(aid) == payload
        assert bs.verify(aid)
        assert b"".join(bs.read_stream(aid)) == payload
    # Dedup: identical content must share chunks; deleting one copy
    # must not corrupt the others.
    bs.delete(ids[0])
    for aid in ids[1:]:
        assert bs.get(aid) == payload
    bs.gc(full=True)
    for aid in ids[1:]:
        assert bs.verify(aid)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_blob_metadata_roundtrip(seed):
    """Tags, entity links, and string metadata survive arbitrary
    set/unset sequences and reverse lookups stay consistent
    (blob_metadata_roundtrip.rs analog)."""
    from neumann_tpu.blob.blob_store import BlobStore

    rng = random.Random(seed)
    bs = BlobStore()
    aids = [bs.put(f"n{i}", bytes([i]) * 10) for i in range(5)]
    tags = {aid: set() for aid in aids}
    links = {aid: set() for aid in aids}
    for step in range(120):
        aid = rng.choice(aids)
        op = rng.randrange(5)
        word = rng.choice(["alpha", "beta", "g/mm@a", "ü"])
        if op == 0:
            bs.tag(aid, word)
            tags[aid].add(word)
        elif op == 1:
            bs.untag(aid, word)
            tags[aid].discard(word)
        elif op == 2:
            bs.link(aid, word)
            links[aid].add(word)
        elif op == 3:
            bs.unlink(aid, word)
            links[aid].discard(word)
        else:
            bs.meta_set(aid, "k", word)
            assert bs.meta_get(aid, "k") == word
    for aid in aids:
        assert set(bs.info(aid)["tags"]) == tags[aid]
        assert set(bs.links(aid)) == links[aid]
    for word in ("alpha", "beta", "g/mm@a", "ü"):
        assert set(bs.by_tag(word)) == {a for a in aids if word in tags[a]}
        assert set(bs.for_entity(word)) == {a for a in aids
                                            if word in links[a]}


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_durable_blob_crash(seed, tmp_path):
    """Blobs written through a durable store must survive a crash
    (WAL replay) bit-exactly; a blob cut off mid-write must not
    appear (durable_blob_crash.rs analog)."""
    from neumann_tpu.blob.blob_store import BlobStore
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    wal = str(tmp_path / "b.wal")
    store = TensorStore()
    store.open_durable(wal, sync_mode="manual")
    bs = BlobStore(store)
    payload = bytes(rng.randrange(256) for _ in range(150_000))
    aid = bs.put("keep", payload)
    # Torn write: start another blob but "crash" before finish().
    w = bs.writer("torn")
    w.write(b"half-written")
    store.wal_flush()

    fresh = TensorStore()
    assert fresh.recover(wal) > 0
    bs2 = BlobStore(fresh)
    assert bs2.get(aid) == payload
    assert bs2.verify(aid)
    assert not [x for x in bs2.list() if "torn" in str(x)]


def test_fuzz_checkpoint_snapshot_parse(tmp_path):
    """Corrupting checkpoint artifacts on disk must surface as clean
    errors or verification failures, never a crash, and intact
    checkpoints keep rolling back (checkpoint_snapshot_parse.rs
    analog)."""
    from neumann_tpu.checkpoint.manager import CheckpointManager
    from neumann_tpu.store.tensor_store import (TensorStore, TensorData,
                                                TensorValue)

    rng = random.Random(0)
    store = TensorStore()
    for i in range(20):
        store.put(f"k:{i}", TensorData().set("v", TensorValue.scalar(i)))
    mgr = CheckpointManager(store, str(tmp_path))
    cp = mgr.create("good")["id"] if isinstance(mgr.create("good"), dict) \
        else None
    # create() may return the id directly; normalize.
    cps = mgr.list()
    assert cps
    target = cps[0]["id"] if isinstance(cps[0], dict) else cps[0]

    # Corrupt every non-index file a few ways; ops must not crash.
    files = [p for p in os.listdir(str(tmp_path))]
    for name in files:
        path = os.path.join(str(tmp_path), name)
        if not os.path.isfile(path):
            continue
        blob = open(path, "rb").read()
        for mode in range(3):
            mutated = bytearray(blob)
            if mode == 0 and mutated:
                mutated = mutated[:rng.randint(0, len(mutated))]
            elif mode == 1 and mutated:
                mutated[rng.randrange(len(mutated))] ^= 0xFF
            else:
                mutated = b"\x00" * 16
            open(path, "wb").write(bytes(mutated))
            try:
                mgr2 = CheckpointManager(TensorStore(), str(tmp_path))
                mgr2.list()
                mgr2.rollback(target)
            except Exception as exc:        # noqa: BLE001
                assert not isinstance(exc, (SystemExit, MemoryError))
        open(path, "wb").write(blob)

    # Intact again: rollback restores the original 20 keys.
    store.put("k:extra", TensorData().set("v", TensorValue.scalar(99)))
    mgr.rollback(target)
    assert store.scan_count("k:") == 20


# ------------------------------------------------------- relational

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_constraint(seed):
    """PK/UNIQUE/NOT NULL/FK inserts and deletes must be accepted or
    rejected exactly when a dict oracle says so
    (relational_constraint.rs analog)."""
    from neumann_tpu.engines.condition import Condition as C
    from neumann_tpu.engines.relational import (Column, ForeignKey,
                                                RelationalEngine)
    from neumann_tpu.utils.errors import RelationalError

    rng = random.Random(seed)
    eng = RelationalEngine()
    eng.create_table("parent", [
        Column("id", "int", primary_key=True),
        Column("tag", "text", unique=True, nullable=True),
    ])
    eng.create_table("child", [
        Column("id", "int", primary_key=True),
        Column("pid", "int", nullable=False,
               references=ForeignKey("parent", "id", on_delete="restrict")),
    ])
    parents, children = {}, {}        # pid -> tag, cid -> pid
    for step in range(150):
        op = rng.randrange(4)
        if op == 0:
            pid = rng.randrange(20)
            tag = rng.choice([None, f"t{rng.randrange(10)}"])
            tags = {t for t in parents.values() if t is not None}
            ok = pid not in parents and (tag is None or tag not in tags)
            try:
                eng.insert("parent", {"id": pid, "tag": tag})
                assert ok, (pid, tag)
                parents[pid] = tag
            except RelationalError:
                assert not ok
        elif op == 1:
            cid, pid = rng.randrange(40), rng.randrange(20)
            ok = cid not in children and pid in parents
            try:
                eng.insert("child", {"id": cid, "pid": pid})
                assert ok
                children[cid] = pid
            except RelationalError:
                assert not ok
        elif op == 2 and parents:
            pid = rng.choice(sorted(parents))
            referenced = pid in children.values()
            try:
                eng.delete("parent", C.eq("id", pid))
                assert not referenced
                parents.pop(pid)
            except RelationalError:
                assert referenced
        else:
            # NOT NULL violation must always reject.
            with pytest.raises(RelationalError):
                eng.insert("child", {"id": 999, "pid": None})


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_index_serialization(seed, tmp_path):
    """Hash and btree indexes must give scan-identical answers before
    and after a snapshot save/load cycle
    (relational_index_serialization.rs analog)."""
    from neumann_tpu.engines.condition import Condition as C
    from neumann_tpu.engines.relational import Column, RelationalEngine
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    store = TensorStore()
    eng = RelationalEngine(store)
    eng.create_table("t", [Column("id", "int"), Column("v", "int"),
                           Column("s", "text")])
    eng.create_index("t", "v")
    eng.create_btree_index("t", "id")
    rows = []
    for i in range(300):
        row = {"id": i, "v": rng.randrange(25), "s": f"s{i % 7}"}
        eng.insert("t", row)
        rows.append(row)

    def probe(engine):
        out = []
        for v in range(25):
            got = engine.select("t", C.eq("v", v))
            out.append(sorted(r["id"] for r in got))
        got = engine.select("t", C.cmp("id", "<", 40))
        out.append(sorted(r["id"] for r in got))
        return out

    before = probe(eng)
    want = [sorted(r["id"] for r in rows if r["v"] == v)
            for v in range(25)] + [list(range(40))]
    assert before == want

    snap = str(tmp_path / "r.ntpu")
    store.save_snapshot(snap)
    fresh_store = TensorStore()
    fresh = RelationalEngine(fresh_store)   # hooks attach, then replay
    fresh_store.load_snapshot(snap)
    assert probe(fresh) == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_transaction(seed):
    """Random tx_insert/update/delete sequences ending in commit or
    rollback must leave the table exactly as the oracle predicts,
    and uncommitted state must stay invisible
    (relational_transaction.rs analog)."""
    from neumann_tpu.engines.condition import Condition as C
    from neumann_tpu.engines.relational import Column, RelationalEngine

    rng = random.Random(seed)
    eng = RelationalEngine()
    eng.create_table("t", [Column("id", "int")])
    committed = set()
    for round_ in range(20):
        tx = eng.begin_transaction()
        pending = set(committed)
        ops = rng.randint(1, 10)
        for _ in range(ops):
            op = rng.randrange(3)
            if op == 0:
                i = rng.randrange(30)
                if i not in pending:
                    eng.tx_insert(tx, "t", {"id": i})
                    pending.add(i)
            elif op == 1 and pending:
                old = rng.choice(sorted(pending))
                new = rng.randrange(30)
                if new not in pending or new == old:
                    eng.tx_update(tx, "t", C.eq("id", old), {"id": new})
                    pending.discard(old)
                    pending.add(new)
            elif pending:
                i = rng.choice(sorted(pending))
                eng.tx_delete(tx, "t", C.eq("id", i))
                pending.discard(i)
        # Outside the tx, only committed rows are visible.
        outside = {r["id"] for r in eng.select("t")}
        assert outside == committed
        inside = {r["id"] for r in eng.tx_select(tx, "t")}
        assert inside == pending
        if rng.random() < 0.5:
            eng.commit(tx)
            committed = pending
        else:
            eng.rollback(tx)
        assert {r["id"] for r in eng.select("t")} == committed


# ------------------------------------------------------------ graph

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_aggregation(seed):
    """node_count / edge_count / triangle_count match brute-force
    oracles under random graph mutation (graph_aggregation.rs
    analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    nodes, edge_set, edges = [], set(), {}
    for step in range(120):
        op = rng.randrange(4)
        if op == 0 or len(nodes) < 3:
            nodes.append(g.create_node("n"))
        elif op == 1:
            src, dst = rng.sample(nodes, 2)
            if (src, dst) not in edge_set:
                eid = g.create_edge(src, dst, "e")
                edges[eid] = (src, dst)
                edge_set.add((src, dst))
        elif op == 2 and edges:
            eid = rng.choice(list(edges))
            edge_set.discard(edges.pop(eid))
            g.delete_edge(eid)
    assert g.node_count() == len(nodes)
    assert g.edge_count() == len(edge_set)
    und = {frozenset(e) for e in edge_set}
    tri = sum(1 for i, a in enumerate(nodes)
              for b in nodes[i + 1:]
              for c in nodes
              if c > b and {frozenset((a, b)), frozenset((b, c)),
                            frozenset((a, c))} <= und)
    assert g.triangle_count() == tri


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_batch_ops(seed):
    """batch_create_nodes/edges must be observationally identical to
    the same singles (graph_batch_ops.rs analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    n = rng.randint(1, 60)
    items = [("lbl%d" % (i % 3), {"i": i}) for i in range(n)]

    g1, g2 = GraphEngine(), GraphEngine()
    ids1 = g1.batch_create_nodes(items)
    ids2 = [g2.create_node(lbl, props) for lbl, props in items]
    assert len(ids1) == len(ids2) == n

    pairs = [(rng.choice(ids1), rng.choice(ids1), "e", None)
             for _ in range(min(40, n * 2))]
    g1.batch_create_edges(pairs)
    remap = dict(zip(ids1, ids2))
    for src, dst, et, _ in pairs:
        g2.create_edge(remap[src], remap[dst], et)

    assert g1.node_count() == g2.node_count()
    assert g1.edge_count() == g2.edge_count()
    for a, b in zip(ids1, ids2):
        assert g1.get_node(a)["properties"]["i"] == \
            g2.get_node(b)["properties"]["i"]
        got1 = sorted(remap[x] for x in g1.neighbors(a, direction="out"))
        got2 = sorted(g2.neighbors(b, direction="out"))
        assert got1 == got2


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_constraints(seed):
    """Unique constraints reject exactly the duplicate property values
    the oracle predicts, and dropping the constraint re-admits them
    (graph_constraints.rs analog)."""
    from neumann_tpu.engines.graph import GraphEngine
    from neumann_tpu.utils.errors import GraphError

    rng = random.Random(seed)
    g = GraphEngine()
    g.create_constraint("uniq_email", "node", "email",
                        "unique", label="user")
    used = set()
    for step in range(80):
        email = f"u{rng.randrange(30)}@x"
        ok = email not in used
        try:
            g.create_node("user", {"email": email})
            assert ok, email
            used.add(email)
        except GraphError:
            assert not ok
        # Other labels are unconstrained.
        g.create_node("robot", {"email": email})
    names = [c["name"] for c in g.list_constraints()]
    assert names == ["uniq_email"]
    assert g.drop_constraint("uniq_email")
    g.create_node("user", {"email": next(iter(used))})  # now admitted


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_degree(seed):
    """In/out/all neighbor counts track the adjacency oracle under
    churn, including self-loops (graph_degree.rs analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    nodes = [g.create_node("n") for _ in range(12)]
    outs = {n: [] for n in nodes}
    ins = {n: [] for n in nodes}
    for step in range(150):
        src, dst = rng.choice(nodes), rng.choice(nodes)
        g.create_edge(src, dst, "e")
        if dst != src:          # self-loops are not neighbors
            outs[src].append(dst)
            ins[dst].append(src)
    for n in nodes:
        assert sorted(g.neighbors(n, direction="out")) == \
            sorted(set(outs[n]))
        assert sorted(g.neighbors(n, direction="in")) == \
            sorted(set(ins[n]))
        both = set(outs[n]) | set(ins[n])
        assert sorted(g.neighbors(n, direction="both")) == sorted(both)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_index_ops(seed):
    """Property-indexed lookups equal full scans across random create/
    drop/mutate interleavings (graph_index_ops.rs analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    props = {}
    indexed = False
    for step in range(150):
        op = rng.randrange(5)
        if op == 0:
            nid = g.create_node("n", {"city": f"c{rng.randrange(8)}"})
            props[nid] = g.get_node(nid)["properties"]["city"]
        elif op == 1 and not indexed:
            g.create_property_index("city")
            indexed = True
        elif op == 2 and indexed:
            g.drop_property_index("city")
            indexed = False
        elif op == 3 and props:
            nid = rng.choice(list(props))
            assert g.delete_node(nid)
            props.pop(nid)
        else:
            city = f"c{rng.randrange(8)}"
            got = sorted(g.find_nodes_by_property("city", city))
            want = sorted(n for n, c in props.items() if c == city)
            assert got == want, (step, indexed)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_pattern_matching(seed):
    """Cypher MATCH patterns (label + property + edge constraints)
    return exactly the brute-force matches
    (graph_pattern_matching.rs analog)."""
    from neumann_tpu.router.router import QueryRouter

    rng = random.Random(seed)
    r = QueryRouter()
    g = r.graph
    people, cities = [], []
    for i in range(rng.randint(4, 14)):
        people.append(g.create_node("Person", {"age": rng.randrange(5)}))
    for i in range(rng.randint(2, 5)):
        cities.append(g.create_node("City", {"name": f"c{i}"}))
    lives = set()
    for p in people:
        if rng.random() < 0.8:
            c = rng.choice(cities)
            g.create_edge(p, c, "LIVES_IN")
            lives.add((p, c))

    for age in range(5):
        res = r.execute(
            f"MATCH (p:Person {{age: {age}}})-[:LIVES_IN]->(c:City) "
            f"RETURN p, c")
        rows = res.rows if hasattr(res, "rows") else res
        want = {(p, c) for (p, c) in lives
                if g.get_node(p)["properties"]["age"] == age}
        assert len(rows) == len(want), (age, rows, want)
