"""Fuzz-target breadth, wave 3: index structures, codecs, durability
state machines, vault intel, and oracle-checked engine paths.

Mirrors the remaining reference libFuzzer families not yet covered by
waves 1-2 (fuzz/fuzz_targets/: hnsw_search.rs, raft_stateful_sequence.rs,
quorum_tracker.rs, compress_ids.rs, compress_rle.rs, tt_serialization.rs,
tt_config_validation.rs, delta_vector_roundtrip.rs, archetype_registry.rs,
checkpoint_state.rs, regional_mmap_crud.rs, tiered CRUD, storage_sparse
_vector.rs, snapshot_buffer.rs, hlc_ordering.rs, membership_convergence.rs,
block_validate.rs, cache_eviction_scorer.rs, cache_semantic_search.rs,
vault_cipher.rs, vault_audit_roundtrip.rs, vault_dependency.rs,
vault_heat_kernel.rs, slab_entity_index.rs, voronoi_snapshot.rs,
relational_join.rs, relational_aggregate.rs, relational_value_cmp.rs,
relational_schema_parsing.rs, parser_parse_expr.rs, query_router_cursor.rs,
shell_wal_replay.rs, graph_centrality.rs, session_dedup.rs,
tx_id_generation.rs).  Each target is seeded, bounded, and asserts a
semantic invariant — not just absence of crashes."""

import random
import string

import numpy as np
import pytest

from neumann_tpu.utils.errors import NeumannError

SEEDS = range(2)


def _name(rng, n=5):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


# ------------------------------------------------------------- indexes

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_hnsw_search_vs_bruteforce(seed):
    """Random mixed-mode inserts + searches: results must rank close to
    the brute-force oracle (hnsw_search.rs analog)."""
    from neumann_tpu.ops.hnsw import HNSWConfig, HNSWIndex

    rng = np.random.default_rng(seed)
    dim = 24
    ix = HNSWIndex(dim, HNSWConfig(m=8, ef_construction=60, ef_search=40),
                   seed=seed)
    dense = []
    for i in range(120):
        v = rng.standard_normal(dim).astype(np.float32)
        mode = i % 3
        if mode == 0:
            ix.insert(v)
        elif mode == 1:
            ix.insert_quantized(v)
        else:
            ix.insert_auto(v)
        dense.append(v)
    mat = np.stack(dense)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    hits = 0
    for _ in range(10):
        q = rng.standard_normal(dim).astype(np.float32)
        got = [nid for nid, _ in ix.search_with_ef(q, 5, ef=60)]
        qn = q / np.linalg.norm(q)
        want = set(np.argsort(-(matn @ qn))[:5].tolist())
        hits += len(set(got) & want)
    assert hits >= 25, f"recall {hits}/50 too low for ef=60"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_hnsw_serialization_roundtrip(seed):
    """to_bytes/from_bytes after random mixed inserts: same results,
    same stats; mutated payloads must raise, never segfault."""
    from neumann_tpu.ops.hnsw import HNSWIndex
    from neumann_tpu.store.sparse import SparseVector

    rng = np.random.default_rng(seed)
    ix = HNSWIndex(16, seed=seed)
    for i in range(60):
        v = rng.standard_normal(16).astype(np.float32)
        (ix.insert, ix.insert_quantized, ix.insert_binary,
         lambda x: ix.insert_sparse(SparseVector.from_dense(x)),
         ix.insert_tt)[i % 5](v)
    blob = ix.to_bytes()
    back = HNSWIndex.from_bytes(blob)
    q = rng.standard_normal(16).astype(np.float32)
    assert ([i for i, _ in ix.search(q, 5)]
            == [i for i, _ in back.search(q, 5)])
    pyr = random.Random(seed)
    for _ in range(20):
        mut = bytearray(blob)
        for _ in range(pyr.randrange(1, 8)):
            mut[pyr.randrange(len(mut))] ^= 1 << pyr.randrange(8)
        try:
            HNSWIndex.from_bytes(bytes(mut))
        except Exception:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_slab_entity_index(seed):
    """EntityIndex + EmbeddingSlab random assign/set/remove: device
    view must agree with a shadow dict (slab_entity_index.rs /
    sparse_embedding_slab.rs analog)."""
    from neumann_tpu.store import EmbeddingSlab, EntityIndex

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    ix = EntityIndex()
    slab = EmbeddingSlab(dim=8, min_capacity=4)
    shadow = {}
    for _ in range(300):
        op = rng.randrange(4)
        key = f"e{rng.randrange(60)}"
        if op <= 1:
            rid = ix.get_or_insert(key)
            vec = nprng.standard_normal(8).astype(np.float32)
            slab.set_rows(np.asarray([rid]), vec[None])
            shadow[rid] = vec
        elif op == 2 and shadow:
            rid = rng.choice(list(shadow))
            slab.clear_row(rid)
            del shadow[rid]
        else:
            assert ix.get_or_insert(key) == ix.get_or_insert(key)
    emb, valid = slab.device_view()
    valid = np.asarray(valid)
    emb = np.asarray(emb)
    for rid, vec in shadow.items():
        assert valid[rid], rid
        np.testing.assert_allclose(emb[rid, :8], vec, rtol=1e-6)
    live = {r for r in range(valid.shape[0]) if valid[r]}
    assert live == set(shadow), "tombstones leaked into the valid mask"


# -------------------------------------------------------------- codecs

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_compress_ids_roundtrip(seed):
    """delta+varint id codec: roundtrip on hostile id patterns, and
    truncated buffers never crash (compress_ids.rs analog)."""
    from neumann_tpu.compress.codecs import (delta_decode_ids,
                                             delta_encode_ids,
                                             varint_decode, varint_encode)

    rng = random.Random(seed)
    for _ in range(40):
        n = rng.randrange(0, 50)
        ids = sorted(rng.randrange(0, 1 << rng.choice([4, 16, 40]))
                     for _ in range(n))
        assert delta_decode_ids(delta_encode_ids(ids)) == ids
        vals = [rng.randrange(0, 1 << 50) for _ in range(n)]
        assert varint_decode(varint_encode(vals)) == vals
        buf = delta_encode_ids(ids)
        for cut in (0, len(buf) // 2, max(len(buf) - 1, 0)):
            try:
                delta_decode_ids(buf[:cut])
            except Exception:
                pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_compress_rle_roundtrip(seed):
    """RLE: roundtrip on runs/noise, decode of arbitrary bytes never
    crashes (compress_rle.rs analog)."""
    from neumann_tpu.compress.codecs import rle_decode, rle_encode

    rng = random.Random(seed)
    for _ in range(40):
        style = rng.randrange(3)
        if style == 0:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        elif style == 1:
            data = b"".join(bytes([rng.randrange(256)]) * rng.randrange(1, 600)
                            for _ in range(rng.randrange(5)))
        else:
            data = b""
        assert rle_decode(rle_encode(data)) == data
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(30)))
        try:
            rle_decode(junk)
        except Exception:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tt_serialization(seed):
    """TT save/load + streaming writer: reconstruction must match the
    in-memory TT for every stored vector (tt_serialization.rs /
    streaming_format.rs analog)."""
    from neumann_tpu.compress.streaming_tt import (StreamingTTWriter,
                                                   stream_dense, stream_tt)
    from neumann_tpu.compress.tensor_train import (load_tt, save_tt,
                                                   tt_decompose,
                                                   tt_reconstruct)

    rng = np.random.default_rng(seed)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tts = []
        for i in range(8):
            dim = int(rng.choice([16, 64, 128]))
            v = rng.standard_normal(dim).astype(np.float32)
            tts.append((f"k{i}", tt_decompose(v)))
        path = f"{d}/batch.npz"
        save_tt(path, tts)
        back = load_tt(path)
        assert [k for k, _ in back] == [k for k, _ in tts]
        for (_, a), (_, b) in zip(tts, back):
            np.testing.assert_allclose(tt_reconstruct(a), tt_reconstruct(b),
                                       rtol=1e-5, atol=1e-5)
        spath = f"{d}/stream.ntts"
        w = StreamingTTWriter(spath, dim=64)
        want = {}
        for i in range(6):
            v = rng.standard_normal(64).astype(np.float32)
            want[f"s{i}"] = tt_reconstruct(w.add(f"s{i}", v))
        w.close()
        assert [k for k, _ in stream_tt(spath)] == list(want)
        for k, dn in stream_dense(spath):
            np.testing.assert_allclose(want[k], dn, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tt_config_validation(seed):
    """Random TTConfig ranks/dims: decompose must either raise a clear
    error or reconstruct within the rank-limited error bound
    (tt_config_validation.rs analog)."""
    from neumann_tpu.compress.tensor_train import (TTConfig, tt_decompose,
                                                   tt_norm, tt_reconstruct)

    rng = np.random.default_rng(seed)
    pyr = random.Random(seed)
    for _ in range(15):
        dim = pyr.choice([8, 12, 64, 100, 256, 768])
        v = rng.standard_normal(dim).astype(np.float32)
        cfg = TTConfig.for_dim(dim, max_rank=pyr.choice([1, 2, 8, 64]))
        try:
            tt = tt_decompose(v, cfg)
        except NeumannError:
            continue
        rec = tt_reconstruct(tt)
        assert rec.shape == v.shape
        assert np.isfinite(rec).all()
        assert abs(tt_norm(tt) - np.linalg.norm(rec)) < 1e-2


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_delta_vector_and_archetypes(seed):
    """DeltaVector + ArchetypeRegistry: encode/decode identity within
    threshold, batch == singles (delta_vector_roundtrip.rs /
    archetype_registry.rs analog)."""
    from neumann_tpu.store.delta_vector import (ArchetypeRegistry,
                                                DeltaVector, KMeansConfig)

    rng = np.random.default_rng(seed)
    dim = 16
    centers = rng.standard_normal((3, dim)).astype(np.float32) * 4
    sample = np.concatenate([
        c + 0.05 * rng.standard_normal((40, dim)).astype(np.float32)
        for c in centers])
    reg = ArchetypeRegistry(threshold=0.001)
    reg.discover_archetypes(sample, KMeansConfig(k=3, iters=10, seed=seed))
    vecs = sample[rng.integers(0, len(sample), 20)]
    batch = reg.encode_batch(vecs)
    for v, dv in zip(vecs, batch):
        single = reg.encode(v)
        assert single.archetype == dv.archetype
        np.testing.assert_allclose(reg.decode(dv), v, atol=0.01)
    nnz_frac, ratio = reg.compression_stats(batch)
    assert 0.0 <= nnz_frac <= 1.0 and ratio > 0
    ref = rng.standard_normal(dim).astype(np.float32)
    dense = ref + 0.001 * rng.standard_normal(dim).astype(np.float32)
    dv = DeltaVector.from_dense_with_reference(dense, ref, archetype=0,
                                               threshold=0.01)
    np.testing.assert_allclose(dv.to_dense(ref), ref, atol=0.02)


# ----------------------------------------------------------- durability

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_checkpoint_state(seed):
    """Random checkpoint/mutate/rollback/delete sequences: the store
    must always match the shadow captured at checkpoint time
    (checkpoint_state.rs analog)."""
    import tempfile

    from neumann_tpu.checkpoint.manager import CheckpointManager
    from neumann_tpu.store.tensor_store import TensorData, TensorStore

    rng = random.Random(seed)
    with tempfile.TemporaryDirectory() as d:
        store = TensorStore()
        mgr = CheckpointManager(store, d, retention=5)
        shadow = {}
        checkpoints = []

        for i in range(60):
            op = rng.randrange(6)
            if op <= 1:
                k = f"k:{rng.randrange(20)}"
                val = rng.randrange(1000)
                store.put(k, TensorData.with_values(v=val))
                shadow[k] = val
            elif op == 2 and shadow:
                k = rng.choice(list(shadow))
                store.delete(k)
                del shadow[k]
            elif op == 3:
                cid = mgr.create(name=f"cp{i}")
                checkpoints.append((cid, dict(shadow)))
            elif op == 4 and checkpoints:
                cid, state = rng.choice(checkpoints)
                try:
                    mgr.rollback(cid)
                except NeumannError:
                    continue
                shadow = dict(state)
                for k, v in state.items():
                    got = store.get(k)
                    assert got is not None and got.get("v").value == v
            elif op == 5 and checkpoints:
                cid, _ = checkpoints.pop(rng.randrange(len(checkpoints)))
                mgr.delete(cid)
        for k, v in shadow.items():
            got = store.get(k)
            assert got is not None and got.get("v").value == v


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_regional_mmap_crud(seed):
    """RegionalStore random put/flush/compact: every key must remain
    reachable, region loads return only that region's keys
    (regional_mmap_crud.rs analog)."""
    import tempfile

    from neumann_tpu.parallel.partitioner import VoronoiPartitioner
    from neumann_tpu.store.regional import RegionalStore

    rng = np.random.default_rng(seed)
    pyr = random.Random(seed)
    seeds = rng.standard_normal((4, 8)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        rs = RegionalStore(d, VoronoiPartitioner(seeds),
                           flush_threshold=16)
        shadow = {}
        for i in range(120):
            if pyr.random() < 0.8 or not shadow:
                k = f"k{i}"
                v = rng.standard_normal(8).astype(np.float32)
                rs.put(k, v, f"payload-{i}".encode())
                shadow[k] = (v, f"payload-{i}".encode())
            elif pyr.random() < 0.5:
                rs.flush()
            else:
                rs.compact()
        found = {}
        for region in range(4):
            for k, payload in rs.load_region(region):
                found[k] = payload
        for k, (v, payload) in shadow.items():
            assert found.get(k) == payload, k
        cands = rs.knn_candidates(seeds[0], nprobe=4)
        assert {k for k, _ in cands} == set(shadow)
        rs.close()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tiered_store_crud(seed):
    """TieredStore random CRUD + migration/compaction vs a shadow dict
    (tiered CRUD analog)."""
    import tempfile

    from neumann_tpu.store.tensor_store import TensorData
    from neumann_tpu.store.tiered import TieredStore

    rng = random.Random(seed)
    with tempfile.TemporaryDirectory() as d:
        ts = TieredStore(d)
        shadow = {}
        for i in range(250):
            op = rng.randrange(10)
            k = f"k:{rng.randrange(40)}"
            if op <= 4:
                ts.put(k, TensorData.with_values(v=i))
                shadow[k] = i
            elif op <= 6:
                got = ts.get(k)
                assert (got.get("v").value if got else None) \
                    == shadow.get(k)
            elif op == 7:
                assert ts.delete(k) == (k in shadow)
                shadow.pop(k, None)
            elif op == 8:
                ts.migrate_cold(max_items=rng.randrange(1, 10),
                                min_idle_s=0.0)
            else:
                ts.compact()
        assert len(ts) == len(shadow)
        for k, v in shadow.items():
            assert ts.get(k).get("v").value == v
        ts.close()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_storage_sparse_vector(seed):
    """SparseVector through TensorStore + WAL replay: values survive
    the full durability loop (storage_sparse_vector.rs analog)."""
    import tempfile

    from neumann_tpu.store.sparse import SparseVector
    from neumann_tpu.store.tensor_store import TensorData, TensorStore

    rng = np.random.default_rng(seed)
    with tempfile.TemporaryDirectory() as d:
        wal_path = f"{d}/wal.log"
        store = TensorStore()
        store.open_durable(wal_path, sync_mode="manual")
        shadow = {}
        for i in range(40):
            dense = rng.standard_normal(32).astype(np.float32)
            dense[rng.random(32) < 0.7] = 0.0
            sv = SparseVector.from_dense(dense)
            store.put(f"sv:{i}", TensorData.with_values(s=sv))
            shadow[f"sv:{i}"] = sv
        store.wal_flush()
        back = TensorStore()
        assert back.recover(wal_path) == len(shadow)
        for k, sv in shadow.items():
            got = back.get(k).get("s").value
            np.testing.assert_allclose(got.to_dense(), sv.to_dense(),
                                       rtol=1e-6)


# ----------------------------------------------------------- chain core

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_raft_stateful_sequence(seed):
    """3-node Raft under a random scheduler with drops and dups:
    election safety (<=1 leader/term) and log matching on committed
    entries (raft_stateful_sequence.rs analog)."""
    from neumann_tpu.chain.raft import RaftConfig, RaftNode

    rng = random.Random(seed)
    ids = ["a", "b", "c"]
    cfg = RaftConfig(heartbeat_interval=1, election_timeout_min=4,
                     election_timeout_max=8)
    nodes = {i: RaftNode(i, [p for p in ids if p != i], config=cfg,
                         seed=seed) for i in ids}
    inflight = []
    leaders_by_term = {}
    committed = {}
    for step in range(400):
        nid = rng.choice(ids)
        node = nodes[nid]
        out = node.tick()
        if node.state == "leader":
            prev = leaders_by_term.setdefault(node.term, nid)
            assert prev == nid, f"two leaders in term {node.term}"
            if rng.random() < 0.3:
                node.propose({"n": step})
                out += node._broadcast_append()
        inflight.extend(out)
        rng.shuffle(inflight)
        deliver = inflight[:6]
        del inflight[:6]
        for msg in deliver:
            if rng.random() < 0.1:
                continue                      # drop
            if msg.dst in nodes:
                inflight.extend(nodes[msg.dst].handle(msg))
                if rng.random() < 0.05:       # duplicate delivery
                    inflight.extend(nodes[msg.dst].handle(msg))
        for i in ids:
            for idx, payload in nodes[i].take_committed():
                if idx in committed:
                    assert committed[idx] == payload, \
                        f"divergent commit at {idx}"
                else:
                    committed[idx] = payload


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_quorum_tracker(seed):
    """Joint-consensus quorum math: random old/new config pairs and ack
    sets — quorum iff majority in BOTH configs (quorum_tracker.rs /
    quorum_formula.rs analog)."""
    from neumann_tpu.chain.raft import RaftNode

    rng = random.Random(seed)
    node = RaftNode("n0", ["n1", "n2"], seed=seed)
    for _ in range(60):
        old = {"n0"} | {f"n{i}" for i in range(1, rng.randrange(2, 6))}
        new = {f"m{i}" for i in range(rng.randrange(1, 6))}
        node.voters = set(new)
        node.joint_old = set(old) if rng.random() < 0.7 else None
        acks = {p for p in old | new if rng.random() < 0.6}
        want = len(acks & new) * 2 > len(new)
        if node.joint_old is not None:
            want = want and len(acks & old) * 2 > len(old)
        assert node._quorum_set(acks) == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_block_validate(seed):
    """Block mutation: any header field change must break the block
    signature and the chain hash links (block_validate.rs analog)."""
    import hashlib
    import hmac as hmac_mod

    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store.tensor_store import TensorData

    rng = random.Random(seed)
    chain = TensorChain()
    for i in range(4):
        tx = chain.begin()
        tx.put(f"k:{i}", TensorData.with_values(v=i))
        chain.commit(tx)
    assert chain.verify()
    blk = chain.get_block(rng.randrange(1, chain.height))
    assert blk.verify_signature(b"neumann")
    for field_name, bad in (("height", blk.height + 1),
                            ("prev_hash", "f" * 64),
                            ("state_root", "0" * 64)):
        orig = getattr(blk, field_name)
        setattr(blk, field_name, bad)
        assert not blk.verify_signature(b"neumann"), field_name
        setattr(blk, field_name, orig)
    # a recomputed signature with the wrong key still fails
    forged = hmac_mod.new(b"wrong-key", blk.header_bytes(),
                          hashlib.sha256).hexdigest()
    orig_sig = blk.signature
    blk.signature = forged
    assert not blk.verify_signature(b"neumann")
    blk.signature = orig_sig
    assert chain.verify()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_hlc_ordering(seed):
    """HLC under random skewed clocks + message exchange: timestamps
    are totally ordered, never regress locally, and receives dominate
    the remote timestamp (hlc_ordering.rs analog)."""
    from neumann_tpu.chain.hlc import HLC, HLCTimestamp

    rng = random.Random(seed)
    wall = {n: 1000 for n in "abc"}

    def mk(n):
        return HLC(n, now_ms=lambda n=n: wall[n])

    clocks = {n: mk(n) for n in "abc"}
    last = {n: None for n in "abc"}
    for _ in range(300):
        n = rng.choice("abc")
        wall[n] += rng.choice([0, 0, 1, 5, -2])
        if rng.random() < 0.5:
            ts = clocks[n].now()
        else:
            m = rng.choice([x for x in "abc" if x != n])
            remote = clocks[m].now()
            ts = clocks[n].update(remote)
            assert remote < ts
        if last[n] is not None:
            assert last[n] < ts, "local HLC regressed"
        last[n] = ts
        assert HLCTimestamp.unpack(ts.pack()) == ts


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_membership_convergence(seed):
    """Random gossip exchange schedule with drops: once message flow is
    reliable, all nodes converge to the same alive view
    (membership_convergence.rs / gossip_timestamp_order.rs analog)."""
    from neumann_tpu.chain.gossip import GossipNode

    rng = random.Random(seed)
    ids = [f"n{i}" for i in range(5)]
    nodes = {i: GossipNode(i, ids, seed=seed) for i in ids}
    inflight = []
    for phase, drop in ((0, 0.3), (1, 0.0)):
        for _ in range(300):
            nid = rng.choice(ids)
            inflight.extend(nodes[nid].tick())
            rng.shuffle(inflight)
            batch = inflight[:8]
            del inflight[:8]
            for msg in batch:
                if phase == 0 and rng.random() < drop:
                    continue
                if msg.dst in nodes:
                    inflight.extend(nodes[msg.dst].handle(msg))
    views = [tuple(sorted(nodes[i].alive_peers() + [i])) for i in ids]
    assert len(set(views)) == 1, f"divergent views: {views}"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_session_dedup(seed):
    """ValidatingInbox: malformed, oversized, and wrong-field messages
    are rejected; well-formed ones pass through exactly once per
    delivery (session_dedup.rs / message_validate.rs analog)."""
    from neumann_tpu.chain.message_validation import validate
    from neumann_tpu.chain.transport import Message

    rng = random.Random(seed)
    valid = {
        "ping": lambda: {"members": {}},
        "vote_req": lambda: {"term": rng.randrange(100),
                             "last_index": 0, "last_term": 0},
        "append_entries": lambda: {
            "term": 1, "prev_index": 0, "prev_term": 0,
            "leader_commit": 0,
            "entries": [{"term": 1, "payload": {}}]
            * rng.choice([0, 1, 3])},
        "tx_commit": lambda: {"tx": "t1"},
    }
    accepted = 0
    for _ in range(200):
        if rng.random() < 0.4:
            kind = rng.choice(list(valid))
            msg = Message(kind, "src", "dst", valid[kind]())
            ok, why = validate(msg)
            assert ok, f"well-formed {kind} rejected: {why}"
            accepted += 1
            continue
        kind = rng.choice(["ping", "ack", "vote_req", "append",
                           "tx_prepare", "gossip", "", "x" * 300])
        payload = {}
        if rng.random() < 0.5:
            payload["term"] = rng.choice([-5, 0, 3, 2**70, "NaN"])
        if rng.random() < 0.3:
            payload["entries"] = ["e"] * rng.choice([0, 1, 10_001])
        ok, why = validate(Message(kind, "src", "dst", payload))
        assert isinstance(ok, bool) and isinstance(why, str)
        if kind in ("", "x" * 300, "append", "gossip"):
            assert not ok, f"unknown kind {kind!r} accepted"
    assert accepted > 0


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tx_id_generation(seed):
    """2PC coordinator tx ids: unique and monotonic under interleaved
    begins; aborts of unknown txs are harmless (tx_id_generation.rs /
    tx_abort_msg.rs analog)."""
    from neumann_tpu.chain.transport import Message
    from neumann_tpu.chain.two_phase import (TwoPhaseCoordinator,
                                             TwoPhaseParticipant)
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    store = TensorStore()
    part = TwoPhaseParticipant("p0", store)
    coord = TwoPhaseCoordinator("c0")
    seen = set()
    for i in range(40):
        tx, _msgs = coord.begin({"p0": [
            {"op": "put", "key": f"k:{i}", "fields": {"v": i}}]})
        assert tx not in seen
        seen.add(tx)
        out = part.handle(Message("tx_abort", "c0", "p0",
                                  {"tx": f"ghost-{rng.randrange(99)}"}))
        assert store.get(f"k:{i}") is None, "abort of unknown tx mutated"
        assert all(m.kind in ("tx_ack",) for m in out)


# --------------------------------------------------------------- vault

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_cipher_hostile_values(seed):
    """Random unicode secrets through set/get/rotate: exact roundtrip,
    unauthorized actors always denied (vault_cipher.rs /
    vault_ops.rs analog)."""
    from neumann_tpu.utils.errors import VaultError
    from neumann_tpu.vault.vault import TensorVault

    rng = random.Random(seed)
    vault = TensorVault(master_password="pw")
    shadow = {}
    alphabet = string.printable + "πλ∞嗯\U0001f39b "
    for i in range(60):
        key = f"s{rng.randrange(12)}"
        val = "".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 80)))
        op = rng.randrange(4)
        try:
            if op <= 1:
                vault.set(key, val)
                shadow[key] = val
            elif op == 2 and key in shadow:
                vault.rotate(key, val)
                shadow[key] = val
            elif key in shadow:
                assert vault.get(key) == shadow[key]
        except VaultError:
            pass
    for key, val in shadow.items():
        assert vault.get(key) == val
        with pytest.raises(VaultError):
            vault.get(key, actor="entity:mallory")


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_audit_roundtrip(seed):
    """Every vault op leaves a well-formed audit event; denied ops are
    audited as denied (vault_audit_roundtrip.rs analog)."""
    from neumann_tpu.utils.errors import VaultError
    from neumann_tpu.vault.vault import Permission, TensorVault

    rng = random.Random(seed)
    vault = TensorVault(master_password="pw")
    vault.set("a", "1")
    vault.grant("entity:bob", "a", Permission.READ)
    denied = 0
    for _ in range(40):
        actor = rng.choice(["root", "entity:bob", "entity:eve"])
        try:
            if rng.random() < 0.5:
                vault.get("a", actor=actor)
            else:
                vault.set("a", _name(rng), actor=actor)
        except VaultError:
            denied += 1
    log = vault.audit_log(limit=500)
    assert denied > 0 and len(log) >= 40
    for ev in log:
        assert set(ev) >= {"actor", "action", "key"}, ev
    assert any(not ev.get("ok", True) for ev in log), \
        "denials never audited"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_heat_kernel_trust(seed):
    """Heat-kernel trust over random grant graphs: scores finite,
    non-negative, seeds hottest (vault_heat_kernel.rs analog)."""
    from neumann_tpu.vault.intel import HeatKernelTrust
    from neumann_tpu.vault.vault import Permission, TensorVault

    rng = random.Random(seed)
    vault = TensorVault(master_password="pw")
    entities = [f"entity:e{i}" for i in range(8)]
    for i in range(6):
        vault.set(f"s{i}", str(i))
    for _ in range(25):
        vault.grant(rng.choice(entities), f"s{rng.randrange(6)}",
                    rng.choice([Permission.READ, Permission.WRITE]))
    hk = HeatKernelTrust(vault)
    trust = hk.trust_from([entities[0]])
    assert all(np.isfinite(v) and v >= -1e-9 for v in trust.values())
    if len(trust) > 1:
        assert trust.get(entities[0], 0.0) >= max(
            v for k, v in trust.items() if k != entities[0]) - 1e-6


# --------------------------------------------------------------- cache

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_cache_eviction_scorer(seed):
    """All eviction strategies under random traffic: capacity bound
    holds (cache_eviction_scorer.rs / cache_lifecycle.rs analog)."""
    from neumann_tpu.cache.llm_cache import LLMCache

    rng = random.Random(seed)
    for strategy in ("lru", "lfu", "cost", "hybrid"):
        cache = LLMCache(capacity=16, eviction=strategy)
        for i in range(120):
            q = f"query {rng.randrange(40)}"
            if rng.random() < 0.6:
                cache.put(q, f"resp{i}")
            else:
                cache.get(q)
            assert len(cache) <= 16, strategy


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_cache_semantic_search(seed):
    """Semantic layer: near-duplicate embeddings hit, orthogonal ones
    miss (cache_semantic_search.rs analog)."""
    from neumann_tpu.cache.llm_cache import LLMCache

    rng = np.random.default_rng(seed)
    embs = {}

    def embedder(text):
        return embs[text]

    cache = LLMCache(capacity=64, semantic_threshold=0.9,
                     embedder=embedder)
    base = {}
    for i in range(20):
        e = rng.standard_normal(32).astype(np.float32)
        e /= np.linalg.norm(e)
        cache.put(f"q{i}", f"r{i}", embedding=e)
        base[i] = e
    for i in range(20):
        near = base[i] + 0.01 * rng.standard_normal(32).astype(np.float32)
        embs[f"unseen {i}"] = near / np.linalg.norm(near)
        got = cache.get(f"unseen {i}")
        assert got == f"r{i}", f"near-duplicate {i} missed"
    hits = 0
    for i in range(10):
        ortho = rng.standard_normal(32).astype(np.float32)
        embs[f"novel {i}"] = ortho / np.linalg.norm(ortho)
        if cache.get(f"novel {i}") is not None:
            hits += 1
    assert hits <= 2, "orthogonal queries should essentially never hit"


# ---------------------------------------------------------- relational

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_join_oracle(seed):
    """inner/left/right/full joins on random tables vs a brute-force
    nested-loop oracle (relational_join.rs analog)."""
    from neumann_tpu.engines.relational import Column, RelationalEngine

    rng = random.Random(seed)
    eng = RelationalEngine()
    eng.create_table("l", [Column("k", "int"), Column("a", "text")])
    eng.create_table("r", [Column("k", "int"), Column("b", "text")])
    lrows = [(rng.randrange(6), _name(rng, 2))
             for _ in range(rng.randrange(1, 15))]
    rrows = [(rng.randrange(6), _name(rng, 2))
             for _ in range(rng.randrange(1, 15))]
    for k, a in lrows:
        eng.insert("l", {"k": k, "a": a})
    for k, b in rrows:
        eng.insert("r", {"k": k, "b": b})
    for how in ("inner", "left", "right", "full"):
        got = sorted(((r["l.k"], r["l.a"], r["r.k"], r["r.b"])
                      for r in eng.join("l", "r", "k", "k", how=how)),
                     key=lambda t: tuple((x is None, x) for x in t))
        want = []
        lmatch, rmatch = set(), set()
        for li, (lk, la) in enumerate(lrows):
            for ri, (rk, rb) in enumerate(rrows):
                if lk == rk:
                    want.append((lk, la, rk, rb))
                    lmatch.add(li)
                    rmatch.add(ri)
        if how in ("left", "full"):
            want += [(lk, la, None, None)
                     for li, (lk, la) in enumerate(lrows)
                     if li not in lmatch]
        if how in ("right", "full"):
            want += [(None, None, rk, rb)
                     for ri, (rk, rb) in enumerate(rrows)
                     if ri not in rmatch]
        want.sort(key=lambda t: tuple((x is None, x) for x in t))
        assert got == want, how


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_aggregate_oracle(seed):
    """GROUP BY aggregates on random data vs a hand-rolled oracle
    (relational_aggregate.rs analog)."""
    from neumann_tpu.engines.relational import Column, RelationalEngine

    rng = random.Random(seed)
    eng = RelationalEngine()
    eng.create_table("t", [Column("g", "text"), Column("x", "int"),
                           Column("y", "float")])
    rows = [(rng.choice("abc"), rng.randrange(-10, 11),
             rng.random() * 10) for _ in range(rng.randrange(2, 40))]
    for g, x, y in rows:
        eng.insert("t", {"g": g, "x": x, "y": y})
    got = {r["g"]: r for r in eng.group_by(
        "t", ["g"], [("count", "", "n"), ("sum", "x", "sx"),
                     ("min", "x", "mn"), ("max", "x", "mx"),
                     ("avg", "y", "ay")])}
    for g in set(r[0] for r in rows):
        members = [r for r in rows if r[0] == g]
        assert got[g]["n"] == len(members)
        assert got[g]["sx"] == sum(r[1] for r in members)
        assert got[g]["mn"] == min(r[1] for r in members)
        assert got[g]["mx"] == max(r[1] for r in members)
        assert abs(got[g]["ay"]
                   - sum(r[2] for r in members) / len(members)) < 1e-9


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_relational_schema_parsing(seed):
    """Random DDL through the real parser + router: create, insert,
    select roundtrip (relational_schema_parsing.rs analog)."""
    from neumann_tpu.router.router import QueryRouter

    rng = random.Random(seed)
    r = QueryRouter()
    for t in range(5):
        cols = [(f"c{j}", rng.choice(["INT", "TEXT", "FLOAT", "BOOL"]))
                for j in range(rng.randrange(1, 5))]
        name = f"t{t}"
        ddl = f"CREATE TABLE {name} (" + ", ".join(
            f"{c} {ty}" for c, ty in cols) + ")"
        r.execute(ddl)
        vals = []
        for c, ty in cols:
            vals.append({"INT": str(rng.randrange(100)),
                         "TEXT": f"'{_name(rng, 3)}'",
                         "FLOAT": f"{rng.random():.3f}",
                         "BOOL": rng.choice(["true", "false"])}[ty])
        r.execute(f"INSERT INTO {name} ({', '.join(c for c, _ in cols)})"
                  f" VALUES ({', '.join(vals)})")
        res = r.execute(f"SELECT * FROM {name}")
        assert len(res.rows) == 1


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_parser_expr_oracle(seed):
    """Random expression trees evaluated by lang.expr vs a Python
    oracle (parser_parse_expr.rs analog)."""
    from neumann_tpu.lang.expr import Bin, Col, Lit

    rng = random.Random(seed)
    row = {"a": 7, "b": -3, "c": 2.5}

    def gen(depth=0):
        if depth >= 4 or rng.random() < 0.4:
            if rng.random() < 0.5:
                name = rng.choice(list(row))
                return Col(name), row[name]
            v = rng.choice([0, 1, -4, 2.5, 10])
            return Lit(v), v
        op = rng.choice(["+", "-", "*", "/", "%"])
        le, lv = gen(depth + 1)
        re_, rv = gen(depth + 1)
        if lv == "err" or rv == "err" or (op in "/%" and rv == 0):
            return Bin(op, le, re_), "err"
        want = {"+": lv + rv, "-": lv - rv, "*": lv * rv,
                "/": lv / rv if op == "/" else None,
                "%": lv % rv if op == "%" else None}[op]
        return Bin(op, le, re_), want

    for _ in range(60):
        expr, want = gen()
        if want == "err":
            with pytest.raises(NeumannError):
                expr.evaluate(row)
            continue
        got = expr.evaluate(row)
        assert got is not None and abs(got - want) < 1e-9, expr.label()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_router_cursor_pagination(seed):
    """Random page sizes: concatenated pages equal the full result,
    exhausted cursors terminate (query_router_cursor.rs analog)."""
    from neumann_tpu.router.router import QueryRouter

    rng = random.Random(seed)
    r = QueryRouter()
    r.execute("CREATE TABLE t (id INT, v TEXT)")
    n = rng.randrange(5, 60)
    for i in range(n):
        r.execute(f"INSERT INTO t (id, v) VALUES ({i}, 'x{i}')")
    full = r.execute("SELECT * FROM t").rows
    pages = []
    page, cur = r.execute_paginated("SELECT * FROM t",
                                    rng.randrange(1, 12))
    pages.extend(page)
    hops = 0
    while cur is not None and hops < 100:
        page, cur = r.execute_paginated("SELECT * FROM t",
                                        rng.randrange(1, 12), cursor=cur)
        pages.extend(page)
        hops += 1
    assert len(pages) == len(full) == n


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_shell_wal_replay(seed):
    """Random statement mix through a WAL-backed shell: a fresh shell
    on the same dir replays to identical table state
    (shell_wal_replay.rs analog)."""
    import io
    import tempfile

    from neumann_tpu.shell.shell import Shell

    rng = random.Random(seed)
    with tempfile.TemporaryDirectory() as d:
        sh = Shell(wal_dir=d, stdout=io.StringIO())
        sh.execute("CREATE TABLE t (id INT, v TEXT)")
        for i in range(rng.randrange(3, 25)):
            if rng.random() < 0.75:
                sh.execute(f"INSERT INTO t (id, v) VALUES ({i}, 'r{i}')")
            else:
                sh.execute(
                    f"DELETE FROM t WHERE id = {rng.randrange(30)}")
        sh.router.store.wal_flush()
        want = sh.router.execute("SELECT * FROM t").rows
        sh2 = Shell(wal_dir=d, stdout=io.StringIO())
        got = sh2.router.execute("SELECT * FROM t").rows
        assert sorted(map(str, got)) == sorted(map(str, want))


# ----------------------------------------------------------- graph/geo

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_graph_centrality(seed):
    """Centrality algorithms on random graphs: finite, bounded,
    deterministic under the same seed (graph_centrality.rs analog)."""
    from neumann_tpu.engines.graph import GraphEngine

    rng = random.Random(seed)
    g = GraphEngine()
    ids = [g.create_node("n", {"i": i}) for i in range(14)]
    for _ in range(30):
        a, b = rng.choice(ids), rng.choice(ids)
        if a != b:
            try:
                g.create_edge(a, b, "e")
            except NeumannError:
                pass
    bc = g.betweenness_centrality()
    cc = g.closeness_centrality()
    ec = g.eigenvector_centrality()
    for scores in (bc, cc, ec):
        assert scores and all(
            np.isfinite(v) and v >= -1e-12 for v in scores.values())
    assert g.betweenness_centrality() == bc, "non-deterministic"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_voronoi_partitioner(seed):
    """Voronoi assignment: batch == singles, region_of returns the
    seed, assignment is nearest-centroid (voronoi_snapshot.rs analog)."""
    from neumann_tpu.parallel.partitioner import VoronoiPartitioner

    rng = np.random.default_rng(seed)
    seeds = rng.standard_normal((5, 12)).astype(np.float32)
    part = VoronoiPartitioner(seeds)
    vecs = rng.standard_normal((40, 12)).astype(np.float32)
    batch = part.assign_batch(vecs)
    for i, v in enumerate(vecs):
        single = part.assign(v)
        assert single == batch[i]
        want = int(np.argmin(np.linalg.norm(seeds - v, axis=1)))
        assert single == want
    for r in range(5):
        np.testing.assert_allclose(part.region_of(r), seeds[r])


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_snapshot_stream_resume(seed):
    """Snapshot chunk streams under duplication: the receiver yields
    the exact blob only on completion, resume offsets are honest,
    aborts clear state (snapshot_buffer.rs / snapshot_hash.rs analog)."""
    from neumann_tpu.chain.snapshot_streaming import (SnapshotReceiver,
                                                      stream_snapshot)

    rng = random.Random(seed)
    blob = bytes(rng.randrange(256)
                 for _ in range(rng.randrange(1, 5000)))
    chunks = list(stream_snapshot("snap1", blob,
                                  chunk_size=rng.randrange(64, 512)))
    recv = SnapshotReceiver()
    out = None
    for i, ch in enumerate(chunks):
        if i < len(chunks) - 1 and rng.random() < 0.3:
            recv.receive(ch)            # duplicate a non-final chunk
        got = recv.receive(ch)
        if i < len(chunks) - 1:
            assert got is None
            assert recv.resume_offset("snap1") > 0
        else:
            out = got
    assert out == blob
    recv2 = SnapshotReceiver()
    recv2.receive(chunks[0])
    recv2.abort("snap1")
    assert recv2.resume_offset("snap1") == 0


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_partition_merge_convergence(seed):
    """Random divergent writes on two stores; merge must leave both
    sides identical with all phases run (partition_merge.rs analog)."""
    from neumann_tpu.chain.partition_merge import PartitionMerger
    from neumann_tpu.store.tensor_store import TensorData, TensorStore

    rng = random.Random(seed)
    base = TensorStore()
    for i in range(10):
        base.put(f"k:{i}", TensorData.with_values(v=i))
    left, right = TensorStore(), TensorStore()
    for s in (left, right):
        for k in base.keys():
            s.put(k, base.get(k))
    for _ in range(20):
        side = rng.choice([left, right])
        k = f"k:{rng.randrange(16)}"
        if rng.random() < 0.75:
            side.put(k, TensorData.with_values(v=rng.randrange(100)))
        elif side.get(k) is not None:
            side.delete(k)
    report = PartitionMerger().merge(left, right, base=base)
    assert set(left.keys()) == set(right.keys())
    for k in left.keys():
        lv, rv = left.get(k).get("v"), right.get(k).get("v")
        assert (lv and lv.value) == (rv and rv.value), k
    assert report.phases_completed


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_signing_roundtrip(seed):
    """Ed25519 identities: valid signatures verify, any message or
    signature mutation fails (gossip_signed.rs analog)."""
    from neumann_tpu.chain.signing import NodeIdentity

    rng = random.Random(seed)
    ident = NodeIdentity.from_seed(bytes([seed + 1]) * 32)
    for _ in range(15):
        msg = bytes(rng.randrange(256)
                    for _ in range(rng.randrange(1, 200)))
        sig = ident.sign(msg)
        assert NodeIdentity.verify(ident.public_bytes(), msg, sig)
        bad = bytearray(msg)
        bad[rng.randrange(len(bad))] ^= 0xFF
        assert not NodeIdentity.verify(ident.public_bytes(),
                                       bytes(bad), sig)
        bads = bytearray(sig)
        bads[rng.randrange(len(bads))] ^= 0xFF
        assert not NodeIdentity.verify(ident.public_bytes(), msg,
                                       bytes(bads))
