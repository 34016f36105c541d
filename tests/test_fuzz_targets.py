"""Fuzz-target breadth: seeded random/mutation fuzzing of every parser,
codec, and protocol surface (mirrors the reference's 139 libFuzzer
targets in fuzz/fuzz_targets/ — here as bounded pytest targets so they
run in CI; each target must never crash with a non-domain error)."""

import json
import random
import string

import numpy as np
import pytest

SEEDS = range(3)


def _rand_bytes(rng, n=512):
    return bytes(rng.getrandbits(8) for _ in range(rng.randrange(n)))


def _mutate(rng, blob: bytes, n_flips=8) -> bytes:
    b = bytearray(blob)
    for _ in range(rng.randrange(1, n_flips)):
        if not b:
            break
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
    return bytes(b)


# ------------------------------------------------------------- store/codec

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_snapshot_loads(seed):
    from neumann_tpu.store import snapshot
    from neumann_tpu.store.tensor_store import TensorData, TensorValue
    from neumann_tpu.utils.errors import StoreError

    rng = random.Random(seed)
    td = TensorData().set("v", TensorValue.scalar(1))
    good = snapshot.dumps({"k": td})
    for _ in range(150):
        blob = _mutate(rng, good) if rng.random() < 0.7 \
            else _rand_bytes(rng)
        try:
            snapshot.loads(blob)
        except StoreError:
            pass        # the only acceptable failure


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_raft_wal_replay(seed, tmp_path):
    from neumann_tpu.chain.raft_wal import RaftWal

    rng = random.Random(seed)
    p = tmp_path / "w"
    w = RaftWal(p)
    w.save_hard_state(2, "x")

    class E:
        def __init__(s):
            s.term, s.payload = 1, {"v": 1}
    w.append(1, [E(), E()])
    w.sync()
    good = open(p, "rb").read()
    for i in range(100):
        blob = _mutate(rng, good)
        p2 = tmp_path / f"m{i}"
        p2.write_bytes(blob)
        RaftWal(p2).load()      # must never raise


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_wal_overlay(seed, tmp_path):
    from neumann_tpu.store import codec
    from neumann_tpu.store.tensor_store import (
        TensorData,
        TensorStore,
        TensorValue,
    )
    from neumann_tpu.store.wal import TensorWal
    from neumann_tpu.utils.errors import StoreError

    if codec._native() is None:
        pytest.skip("no native codec")
    rng = random.Random(seed)
    p = str(tmp_path / "w")
    w = TensorWal(p, sync_mode="manual")
    for i in range(5):
        w.log_put(f"k{i}", TensorData().set(
            "v", TensorValue.vector(np.ones(4, np.float32))))
    w.flush()
    w.close()
    good = open(p, "rb").read()
    for i in range(100):
        blob = _mutate(rng, good)
        p2 = str(tmp_path / f"m{i}")
        open(p2, "wb").write(blob)
        s = TensorStore()
        try:
            s.recover(p2)
            for k in s.scan(""):
                d = s.get(k)
                if d is not None:
                    try:
                        list(d.fields.items())  # force lazy decode
                    except StoreError:
                        pass
        except StoreError:
            pass


# ----------------------------------------------------------------- vault

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_obfuscation_unpad(seed):
    from neumann_tpu.utils.errors import VaultError
    from neumann_tpu.vault.obfuscation import ObfuscationLayer

    rng = random.Random(seed)
    for _ in range(200):
        try:
            ObfuscationLayer.unpad(_rand_bytes(rng, 300))
        except VaultError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_metadata_aead(seed):
    from neumann_tpu.utils.errors import VaultError
    from neumann_tpu.vault.obfuscation import ObfuscationLayer

    rng = random.Random(seed)
    layer = ObfuscationLayer(bytes(range(32)))
    good = layer.encrypt_metadata({"a": 1})
    for _ in range(100):
        try:
            layer.decrypt_metadata(_mutate(rng, good))
        except VaultError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_policy_json(seed):
    from neumann_tpu.vault.policy import PolicyTemplate

    rng = random.Random(seed)
    good = PolicyTemplate("n", "a/*", "b/*", 1, None).to_json()
    for _ in range(100):
        blob = _mutate(rng, good.encode())
        try:
            PolicyTemplate.from_json(blob.decode("utf-8", "replace"))
        except (json.JSONDecodeError, TypeError, ValueError):
            pass


# ----------------------------------------------------------------- chain

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_raft_message_handling(seed):
    """Random well-typed-ish messages must never crash the core."""
    from neumann_tpu.chain.raft import RaftConfig, RaftNode
    from neumann_tpu.chain.transport import Message

    rng = random.Random(seed)
    kinds = ["vote_req", "vote_resp", "pre_vote_req", "pre_vote_resp",
             "append_entries", "append_resp", "install_snapshot",
             "timeout_now", "garbage_kind"]
    node = RaftNode("n0", ["n0", "n1", "n2"], RaftConfig())
    for _ in range(300):
        kind = rng.choice(kinds)
        payload = {
            "term": rng.randrange(0, 5),
            "last_index": rng.randrange(0, 5),
            "last_term": rng.randrange(0, 5),
            "prev_index": rng.randrange(0, 5),
            "prev_term": rng.randrange(0, 5),
            "entries": [{"term": rng.randrange(0, 3),
                         "payload": {"v": rng.randrange(9)}}
                        for _ in range(rng.randrange(0, 3))],
            "leader_commit": rng.randrange(0, 5),
            "granted": rng.random() < 0.5,
            "success": rng.random() < 0.5,
            "match": rng.randrange(0, 5),
            "config": None,
            "data": None,
        }
        node.handle(Message(kind, rng.choice(["n1", "n2", "zz"]),
                            "n0", payload))
        node.tick()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_gossip_membership_payloads(seed):
    from neumann_tpu.chain.gossip import GossipNode
    from neumann_tpu.chain.transport import Message

    rng = random.Random(seed)
    g = GossipNode("n0", ["n0", "n1", "n2"])
    statuses = ["alive", "suspect", "faulty"]
    for _ in range(300):
        members = {
            rng.choice(["n0", "n1", "n2", "nX"]): {
                "status": rng.choice(statuses),
                "inc": rng.randrange(0, 4),
                "v": rng.randrange(0, 9)}
            for _ in range(rng.randrange(0, 4))}
        kind = rng.choice(["ping", "ack", "ping_req", "ack_relay"])
        payload = {"members": members}
        if kind == "ping_req":
            payload["target"] = rng.choice(["n1", "n2", "zz"])
        if kind == "ack_relay":
            payload["target"] = rng.choice(["n1", None])
        g.handle(Message(kind, rng.choice(["n1", "n2"]), "n0", payload))
        g.tick()
    assert g.members["n0"].status == "alive"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_two_phase_messages(seed):
    from neumann_tpu.chain.transport import Message
    from neumann_tpu.chain.two_phase import (
        TwoPhaseCoordinator,
        TwoPhaseParticipant,
    )
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    coord = TwoPhaseCoordinator("c")
    part = TwoPhaseParticipant("p", TensorStore())
    tx, _ = coord.begin({"p": [{"op": "put", "key": "k",
                                "fields": {"v": 1}}]})
    kinds = ["tx_prepare", "tx_vote", "tx_commit", "tx_abort",
             "tx_ack", "junk"]
    for _ in range(300):
        payload = {"tx": rng.choice([tx, "nope", ""]),
                   "ok": rng.random() < 0.5,
                   "ops": [{"op": rng.choice(["put", "delete"]),
                            "key": f"k{rng.randrange(3)}",
                            "fields": {"v": 1}}]}
        m = Message(rng.choice(kinds), "c", "p", payload)
        part.handle(m)
        coord.handle(Message(rng.choice(kinds), "p", "c", payload))
        part.tick()
        coord.tick()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_snapshot_chunks(seed):
    from neumann_tpu.chain.snapshot_streaming import (
        SnapshotChunk,
        SnapshotReceiver,
    )
    from neumann_tpu.utils.errors import ChainError

    rng = random.Random(seed)
    rx = SnapshotReceiver()
    for _ in range(200):
        try:
            rx.receive(SnapshotChunk(
                snapshot_id=rng.choice(["a", "b"]),
                offset=rng.randrange(0, 64),
                total=rng.randrange(0, 64),
                sha256=rng.choice(["00" * 32, "zz"]),
                data=_rand_bytes(rng, 32)))
        except ChainError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_delta_replication_records(seed):
    from neumann_tpu.chain.delta_replication import DeltaReplicator
    from neumann_tpu.store.delta_vector import ArchetypeRegistry

    rng = random.Random(seed)
    reg = ArchetypeRegistry()
    reg.centroids = np.zeros((2, 4), np.float32)
    rep = DeltaReplicator(reg)
    for _ in range(150):
        rec = {"key": "k",
               "archetype": rng.randrange(-1, 4),
               "dim": rng.randrange(0, 8),
               "positions": [rng.randrange(-2, 8)
                             for _ in range(rng.randrange(0, 4))],
               "values": [rng.random()
                          for _ in range(rng.randrange(0, 4))]}
        try:
            rep.decode_batch([rec])
        except (ValueError, IndexError, KeyError):
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_hlc_and_message_validation(seed):
    from neumann_tpu.chain.hlc import HLC, HLCTimestamp
    from neumann_tpu.chain.message_validation import validate
    from neumann_tpu.chain.transport import Message

    rng = random.Random(seed)
    clock = HLC("n0")
    prev = clock.now()
    for _ in range(200):
        ts = clock.update(HLCTimestamp(rng.randrange(0, 2**40),
                                       rng.randrange(0, 100), "r"))
        assert prev < ts or prev._key() < ts._key()
        prev = clock.now()
        m = Message(
            rng.choice(["append_entries", "ping", "tx_prepare", "?"]),
            "".join(rng.choices(string.printable, k=rng.randrange(9))),
            "n0",
            {"term": rng.choice([0, -1, 2**62, "x", None])})
        ok, reason = validate(m)     # never raises; returns verdict
        assert isinstance(ok, bool) and isinstance(reason, str)


# ------------------------------------------------------------ compression

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tt_roundtrip(seed):
    from neumann_tpu.compress.tensor_train import (
        TTConfig,
        tt_decompose,
        tt_reconstruct,
    )

    rng = np.random.default_rng(seed)
    for _ in range(10):
        dim = int(rng.integers(4, 257))
        v = rng.standard_normal(dim).astype(np.float32)
        tt = tt_decompose(v, TTConfig.for_dim(dim))
        out = tt_reconstruct(tt)
        assert out.shape[0] >= dim or out.shape[0] == dim


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_quantization_roundtrip(seed):
    import jax.numpy as jnp

    from neumann_tpu.ops.quant import scalar_quantize

    rng = np.random.default_rng(seed)
    for _ in range(5):
        n, d = int(rng.integers(1, 64)), 128
        x = (rng.standard_normal((n, d)) *
             10.0 ** rng.integers(-3, 3)).astype(np.float32)
        q, s = scalar_quantize(jnp.asarray(x))
        back = np.asarray(q, np.float32) * np.asarray(s)[:, None]
        denom = max(float(np.abs(x).max()), 1e-9)
        assert float(np.abs(back - x).max()) / denom < 0.02


# ------------------------------------------------------------------ blob

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_blob_chunker(seed):
    from neumann_tpu.blob.blob_store import BlobStore

    rng = random.Random(seed)
    bs = BlobStore()
    for i in range(10):
        data = _rand_bytes(rng, 4096)
        art = bs.put(f"a{i}", data)
        assert bs.get(art) == data
        assert bs.verify(art)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_sparse_ops(seed):
    from neumann_tpu.store.sparse import SparseVector

    rng = np.random.default_rng(seed)
    for _ in range(30):
        d = int(rng.integers(1, 64))
        dense = rng.standard_normal(d).astype(np.float32)
        dense[rng.random(d) < 0.8] = 0.0
        sv = SparseVector.from_dense(dense)
        assert np.allclose(sv.to_dense(), dense, atol=1e-6)
        other = SparseVector.from_dense(
            rng.standard_normal(d).astype(np.float32))
        sv.dot(other)
        sv.cosine_similarity(other)
