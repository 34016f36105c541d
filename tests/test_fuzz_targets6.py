"""Fuzz-target breadth, wave 6: chain control-plane (sequence tracking,
partition status, 2PC persistence and deadlock flows, chain metrics),
transport rate limiting, parser/router robustness, cache metrics,
semantic partitioning, error hierarchy, and the vault intelligence
surface.

Mirrors the remaining reference libFuzzer families
(fuzz/fuzz_targets/: sequence_tracker_dos.rs, partition_status.rs,
block_request_validation.rs, snapshot_request_validation.rs,
distributed_tx_serialize.rs, dtx_deadlock_2pc_flow.rs,
dtx_persistence.rs, tx_wal_recovery.rs, lock_release_wal.rs,
chain_metrics.rs, semantic_partition.rs, cache_metric_roundtrip.rs,
tcp_rate_limit.rs, parser_parse.rs, query_router_async_dispatch.rs,
error_hierarchy.rs, vault_access_tensor.rs, vault_cipher_aad.rs,
vault_geo_routing.rs, vault_obfuscation.rs, vault_policy.rs).  Seeded,
bounded, oracle-checked."""

import random
import string
import threading

import numpy as np
import pytest

SEEDS = range(2)


# ------------------------------------------------------ chain control

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_sequence_tracker_dos(seed):
    """Arbitrary (sender, seq) floods never grow the tracker past
    max_entries, replays are rejected, and len/is_empty stay
    consistent (sequence_tracker_dos.rs analog)."""
    from neumann_tpu.chain.sequence import (SequenceTracker,
                                            SequenceTrackerConfig)

    rng = random.Random(seed)
    t = SequenceTracker(SequenceTrackerConfig(max_entries=100,
                                              cleanup_interval=50))
    last = {}
    for step in range(3000):
        sender = f"s{rng.randrange(400)}"
        seq = rng.randrange(1, 1 << 40)
        ok, reason = t.check_and_record(sender, seq)
        if ok:
            assert seq > last.get(sender, 0), (sender, seq)
            last[sender] = seq
        elif "replay" in reason:
            assert seq <= last.get(sender, 0)
        else:
            assert "capacity" in reason
        assert len(t) <= 100
        assert t.is_empty == (len(t) == 0)
    # Replays always rejected; future timestamps rejected; stale too.
    t2 = SequenceTracker()
    assert t2.check_and_record("a", 5)[0]
    assert not t2.check_and_record("a", 5)[0]
    assert not t2.check_and_record("a", 4)[0]
    assert t2.check_and_record("a", 6)[0]
    assert t2.last_sequence("a") == 6
    now = 1_000_000_000_000
    assert not t2.check_and_record("b", 1, timestamp_ms=now + 10**6,
                                   now_ms=now)[0]
    assert not t2.check_and_record("b", 1, timestamp_ms=now - 10**7,
                                   now_ms=now)[0]
    assert t2.check_and_record("b", 1, timestamp_ms=now - 1000,
                               now_ms=now)[0]


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_partition_status(seed):
    """partition_status matches the quorum formula for every
    (total, healthy, grace) combination (partition_status.rs +
    quorum_formula.rs analog)."""
    from neumann_tpu.chain.gossip import (ALIVE, FAULTY, GossipConfig,
                                          GossipNode)

    rng = random.Random(seed)
    for trial in range(60):
        total = rng.randint(1, 12)
        healthy = rng.randint(0, total)
        peers = [f"n{i}" for i in range(total)]
        g = GossipNode("n0", peers, GossipConfig())
        # n0 is always a member; mark the rest per the draw
        order = sorted(g.members)
        for i, peer in enumerate(order):
            g.members[peer].status = ALIVE if i < healthy else FAULTY
        in_grace = rng.random() < 0.3
        g._tick = 0 if in_grace else 100
        status = g.partition_status(grace_ticks=10)
        if in_grace:
            assert status == "unknown"
        elif healthy >= total // 2 + 1:
            assert status == "quorum_reachable"
        elif healthy * 2 == total:
            assert status == "stalemate"
        else:
            assert status == "quorum_lost"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_request_validation(seed):
    """Randomized messages of every kind — junk fields, wrong types,
    oversized blobs, bad chunk offsets — never crash validate();
    well-formed ones pass (block_request_validation.rs +
    snapshot_request_validation.rs analog, over our snap_chunk /
    cluster / merge kinds)."""
    from neumann_tpu.chain.message_validation import (_OPTIONAL, _SCHEMAS,
                                                      validate)
    from neumann_tpu.chain.transport import Message

    rng = random.Random(seed)

    def junk():
        return rng.choice([
            None, True, -1, 2 ** 70, "x" * rng.choice([1, 10, 5000]),
            [], {}, [1, 2], {"a": 1}, 3.14,
        ])

    good = {
        int: lambda: rng.randrange(0, 1 << 30),
        bool: lambda: rng.random() < 0.5,
        str: lambda: "s" * rng.randint(1, 40),
        list: lambda: [],
        dict: lambda: {},
        "blob": lambda: "ab" * rng.randint(1, 64),
    }

    kinds = sorted(_SCHEMAS)
    for trial in range(400):
        kind = rng.choice(kinds + ["bogus_kind", ""])
        schema = _SCHEMAS.get(kind, {})
        payload = {}
        make_valid = rng.random() < 0.5
        for fname, ftype in schema.items():
            if make_valid or rng.random() < 0.8:
                payload[fname] = good[ftype]()
            elif rng.random() < 0.5:
                payload[fname] = junk()
            # else: leave the field out entirely
        for fname, ftype in _OPTIONAL.get(kind, {}).items():
            if rng.random() < 0.3:
                payload[fname] = (good[ftype]() if make_valid
                                  else junk())
        if kind == "snap_chunk" and make_valid:
            payload["total"] = rng.randrange(1, 1 << 20)
            payload["offset"] = rng.randrange(0, payload["total"])
        ok, reason = validate(Message(kind, "a", "b", payload))
        assert isinstance(ok, bool) and isinstance(reason, str)
        if kind not in _SCHEMAS:
            assert not ok
        elif make_valid and kind not in ("ping", "ack", "ping_req",
                                         "ack_relay", "merge_offer",
                                         "append_entries"):
            # kinds without deep-payload constraints must accept
            assert ok, (kind, reason, payload)
    # Deep checks: bad chunk geometry and oversized member maps reject.
    ok, _ = validate(Message("snap_chunk", "a", "b",
                             {"id": "s", "offset": 10, "total": 5,
                              "sha256": "0" * 64, "data": "ab"}))
    assert not ok
    ok, _ = validate(Message("merge_offer", "a", "b",
                             {"items": [{"key": "k"}],
                              "reply_to": "a", "oid": "a:1"}))
    assert not ok


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_distributed_tx_serialize(seed):
    """2PC coordinator WAL records always JSON-roundtrip and replaying
    them reconstructs the same decision state
    (distributed_tx_serialize.rs analog)."""
    import json

    from neumann_tpu.chain.two_phase import (TwoPhaseCoordinator,
                                             TwoPhaseParticipant)
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    records = []
    coord = TwoPhaseCoordinator("coord", wal=records.append)
    parts = {f"p{i}": TwoPhaseParticipant(f"p{i}", TensorStore())
             for i in range(3)}
    live = []
    for trial in range(12):
        ops = {nid: [{"op": "put", "key": f"k:{trial}",
                      "fields": {"v": trial}}]
               for nid in rng.sample(sorted(parts), rng.randint(1, 3))}
        tx, prepares = coord.begin(ops)
        live.append(tx)
        if rng.random() < 0.6:
            # deliver the prepares so votes come back
            queue = list(prepares)
            while queue:
                m = queue.pop(0)
                target = coord if m.dst == "coord" else parts.get(m.dst)
                if target is not None:
                    queue += target.handle(m)

    # Round-trip through JSON (what a WAL file would hold).
    replayed = [json.loads(json.dumps(r)) for r in records]
    fresh = TwoPhaseCoordinator("coord")
    fresh.recover(replayed)
    for tx in live:
        st = coord.state_of(tx)
        if st in ("committed", "aborted"):
            assert fresh.state_of(tx) == st, tx


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_dtx_deadlock_2pc_flow(seed):
    """Random cross-locked transactions: the deadlock detector breaks
    every cycle, all transactions reach a terminal state, and locks
    are fully released (dtx_deadlock_2pc_flow.rs +
    dtx_wait_graph_lock_integration.rs analog)."""
    from neumann_tpu.chain.deadlock import DeadlockDetector
    from neumann_tpu.chain.two_phase import (LockManager,
                                             TwoPhaseCoordinator,
                                             TwoPhaseParticipant)
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    store = TensorStore()
    locks, det = LockManager(), DeadlockDetector()
    part = TwoPhaseParticipant("p0", store, locks=locks, detector=det)
    coord = TwoPhaseCoordinator("coord")
    keys = [f"k:{i}" for i in range(4)]
    txs = []
    for i in range(6):
        chosen = rng.sample(keys, rng.randint(1, 3))
        ops = {"p0": [{"op": "put", "key": k, "fields": {"v": i}}
                      for k in chosen]}
        tx, prepares = coord.begin(ops)
        txs.append(tx)
        for m in prepares:
            for out in part.handle(m):
                coord.handle(out)
    # Pump ticks until quiescent.
    for _ in range(120):
        msgs = coord.tick() + part.tick()
        progressed = False
        queue = list(msgs)
        while queue:
            m = queue.pop(0)
            progressed = True
            target = coord if m.dst == "coord" else part
            queue += target.handle(m)
        if not progressed and all(
                coord.state_of(t) in ("committed", "aborted")
                for t in txs):
            break
    for t in txs:
        assert coord.state_of(t) in ("committed", "aborted"), t
    for k in keys:
        assert locks.owner_of(k) is None, k
    assert det.find_cycle() is None


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_dtx_persistence(seed):
    """Participant redo-log: a crash between the "committing" decision
    record and the "committed" completion record must replay exactly
    that transaction's ops on recovery; fully-completed and aborted
    txs must not be re-applied (dtx_persistence.rs +
    tx_wal_recovery.rs analog)."""
    from neumann_tpu.chain.transport import Message
    from neumann_tpu.chain.two_phase import TwoPhaseParticipant
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    records = []
    part = TwoPhaseParticipant("p0", TensorStore(), wal=records.append)
    for i in range(10):
        tx = f"t{i}"
        out = part.handle(Message("tx_prepare", "coord", "p0",
                                  {"tx": tx, "ops": [
                                      {"op": "put", "key": f"k:{i}",
                                       "fields": {"v": i}}]}))
        if not (out and out[0].payload.get("ok")):
            continue
        kind = "tx_commit" if rng.random() < 0.6 else "tx_abort"
        part.handle(Message(kind, "coord", "p0", {"tx": tx}))

    committing_ix = [i for i, r in enumerate(records)
                     if r.get("phase") == "committing"]
    if not committing_ix:
        return
    # Crash mid-apply: keep the log up to AND INCLUDING one
    # "committing" record, drop its "committed" completion.
    cut = rng.choice(committing_ix)
    prefix = records[: cut + 1]
    torn_tx = records[cut]["tx"]
    store2 = TensorStore()
    part2 = TwoPhaseParticipant("p0", store2)
    part2.recover(prefix)
    # The torn tx's ops were redone onto the store.
    for op in records[cut]["ops_list"]:
        got = store2.get(op["key"])
        assert got is not None, op
        assert got.get("v").value == op["fields"]["v"]
    assert part2.locks.owner_of(records[cut]["ops_list"][0]["key"]) \
        is None
    # Every tx with a completed or aborted record was NOT re-applied
    # (its effects live in the durable store, not the redo path).
    redone = {torn_tx}
    for r in prefix:
        if r.get("phase") in ("committed", "aborted") and \
                r["tx"] not in redone:
            for op in (r.get("ops_list") or []):
                assert store2.get(op["key"]) is None


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_lock_release_wal(seed):
    """Locks held by decided transactions never survive recovery — a
    crash between decision and release cannot wedge future txs
    (lock_release_wal.rs + dtx_state_cleanup.rs analog)."""
    from neumann_tpu.chain.transport import Message
    from neumann_tpu.chain.two_phase import TwoPhaseParticipant
    from neumann_tpu.store.tensor_store import TensorStore

    rng = random.Random(seed)
    records = []
    part = TwoPhaseParticipant("p0", TensorStore(),
                               wal=records.append)
    for i in range(8):
        tx = f"t{i}"
        part.handle(Message("tx_prepare", "coord", "p0",
                            {"tx": tx, "ops": [
                                {"op": "put", "key": f"k:{i % 3}",
                                 "fields": {"v": i}}]}))
        if rng.random() < 0.7:
            kind = "tx_commit" if rng.random() < 0.5 else "tx_abort"
            part.handle(Message(kind, "coord", "p0", {"tx": tx}))
    part2 = TwoPhaseParticipant("p0", TensorStore())
    part2.recover(records)
    # After recovery every key is either free or held by a tx that is
    # still genuinely undecided in the log.
    decided = {r["tx"] for r in records
               if r.get("phase") in ("committing", "committed",
                                     "aborted", "applied")}
    for i in range(3):
        owner = part2.locks.owner_of(f"k:{i}")
        assert owner is None or owner not in decided


def test_fuzz_chain_metrics():
    """Metrics counters and timing stats always reconcile with the
    operations performed (chain_metrics.rs analog)."""
    from neumann_tpu.chain.tensor_chain import TensorChain
    from neumann_tpu.store.tensor_store import (TensorData, TensorStore,
                                                TensorValue)

    store = TensorStore()
    chain = TensorChain(store)
    n_commit, n_rollback = 0, 0
    for i in range(12):
        tx = chain.begin()
        tx.put(f"k:{i}", TensorData().set("v", TensorValue.scalar(i)))
        if i % 3 == 2:
            chain.rollback(tx)
            n_rollback += 1
        else:
            chain.commit(tx)
            n_commit += 1
    snap = chain.metrics.snapshot()
    assert snap["commits"] == n_commit
    assert snap["rollbacks"] == n_rollback
    assert snap["commit_timing"]["count"] == n_commit
    assert snap["commit_timing"]["avg_us"] >= 0.0
    chain.metrics.commit.reset()
    assert chain.metrics.snapshot()["commit_timing"]["count"] == 0


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_semantic_partition(seed):
    """SemanticPartitioner.assign always lands in [0, n_shards), equals
    the nearest-centroid oracle, and assign_batch matches singles
    (semantic_partition.rs analog)."""
    from neumann_tpu.parallel.partitioner import SemanticPartitioner

    rng = np.random.default_rng(seed)
    for trial in range(6):
        n_shards = int(rng.integers(1, 8))
        dim = int(rng.integers(4, 64))
        sample = rng.standard_normal((64, dim)).astype(np.float32)
        p = SemanticPartitioner(n_shards)
        p.train(sample, iters=5)
        queries = rng.standard_normal((16, dim)).astype(np.float32)
        batch = np.asarray(p.assign_batch(queries))
        for q, b in zip(queries, batch):
            s = p.assign(q)
            assert 0 <= s < n_shards
            assert s == int(b)
            # nearest-centroid-by-cosine oracle
            c = np.asarray(p.centroids)
            cn = c / np.maximum(
                np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
            qn = q / max(float(np.linalg.norm(q)), 1e-30)
            sims = cn @ qn
            assert np.isclose(sims[s], sims.max(), atol=1e-5)


# --------------------------------------------------- transport / cache

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tcp_rate_limit(seed):
    """Token bucket: a flood from one peer is capped at bucket_size +
    refill, other peers are unaffected, and tokens regrow
    (tcp_rate_limit.rs analog)."""
    from neumann_tpu.chain.transport import PeerRateLimiter

    rng = random.Random(seed)
    lim = PeerRateLimiter(bucket_size=20, refill_rate=1000.0)
    fake_now = [0.0]
    lim._now = lambda: fake_now[0]

    passed = sum(1 for _ in range(200) if lim.check("flood"))
    assert passed == 20                      # burst only, no time passes
    assert lim.limited == 180
    assert lim.check("other")                # independent bucket
    fake_now[0] += 0.005                     # 5 ms -> 5 tokens
    regrown = sum(1 for _ in range(10) if lim.check("flood"))
    assert regrown == 5
    fake_now[0] += 10.0                      # full refill, capped
    assert lim.available_tokens("flood") == 20
    # Random interleavings never exceed the theoretical budget.
    lim2 = PeerRateLimiter(bucket_size=10, refill_rate=100.0)
    t = [0.0]
    lim2._now = lambda: t[0]
    granted = 0
    for step in range(300):
        t[0] += rng.random() * 0.01
        if lim2.check("p"):
            granted += 1
    assert granted <= 10 + int(t[0] * 100.0) + 1


def test_fuzz_tcp_rate_limit_live():
    """A live TcpTransport with a tight limiter drops the flood but
    keeps the connection usable (tcp_rate_limit.rs end-to-end)."""
    from neumann_tpu.chain.transport import (PeerRateLimiter,
                                             TcpTransport)

    rx = TcpTransport("rx", rate_limiter=PeerRateLimiter(
        bucket_size=5, refill_rate=0.001))
    tx = TcpTransport("tx")
    try:
        tx.connect("rx", rx.address)
        for i in range(50):
            assert tx.send("rx", "timeout_now", {"term": i})
        got = []
        while True:
            m = rx.recv(timeout=0.5)
            if m is None:
                break
            got.append(m)
        assert 1 <= len(got) <= 6       # burst bucket only
        assert rx.rate_limiter.limited >= 44
    finally:
        tx.close()
        rx.close()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_cache_metric_roundtrip(seed):
    """CacheStats counters reconcile with the observed hit/miss
    sequence and cost accounting is linear in tokens saved
    (cache_metric_roundtrip.rs analog)."""
    from neumann_tpu.cache.llm_cache import LLMCache

    rng = random.Random(seed)
    cache = LLMCache(capacity=64)
    prompts = [f"prompt number {i}" for i in range(20)]
    hits = misses = 0
    for step in range(200):
        p = rng.choice(prompts)
        got = cache.get(p)
        if got is None:
            misses += 1
            cache.put(p, f"resp-{p}")
        else:
            hits += 1
            assert got == f"resp-{p}"
    s = cache.stats
    assert s.hits == hits
    assert s.misses == misses
    assert s.insertions == len(prompts)
    assert 0.0 <= s.hit_rate() <= 1.0
    assert np.isclose(s.cost_saved_usd(0.002),
                      s.tokens_saved / 1000 * 0.002)
    assert s.cost_saved_usd(0.0) == 0.0


# ------------------------------------------------------ parser / router

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_parser_parse(seed):
    """Random byte soup and mutated statements either parse or raise
    ParseError — never any other exception — and parse is stable
    (same input -> same AST repr) (parser_parse.rs analog)."""
    from neumann_tpu.lang.parser import parse
    from neumann_tpu.utils.errors import NeumannError

    rng = random.Random(seed)
    seeds_txt = [
        "SELECT * FROM t WHERE a = 1",
        "INSERT INTO t (a, b) VALUES (1, 'x')",
        "SIMILAR 'user:1' TOP 5",
        "NODE CREATE (:Person {name: 'x'})",
        "VAULT SET k = 'v'",
        "CACHE STATS", "CHAIN STATS", "CHECKPOINT",
    ]
    alphabet = string.printable
    for trial in range(300):
        if rng.random() < 0.5:
            txt = "".join(rng.choices(alphabet, k=rng.randint(0, 60)))
        else:
            txt = list(rng.choice(seeds_txt))
            for _ in range(rng.randint(1, 6)):
                op = rng.randrange(3)
                pos = rng.randrange(max(len(txt), 1))
                if op == 0 and txt:
                    txt[pos] = rng.choice(alphabet)
                elif op == 1:
                    txt.insert(pos, rng.choice(alphabet))
                elif txt:
                    del txt[pos % len(txt)]
            txt = "".join(txt)
        try:
            first = repr(parse(txt))
        except NeumannError:
            first = None
        except RecursionError:
            continue
        try:
            second = repr(parse(txt))
        except NeumannError:
            second = None
        except RecursionError:
            continue
        assert first == second, txt


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_query_router_async_dispatch(seed):
    """Concurrent execute() from many threads on one router: no crash,
    no cross-talk, every thread sees its own rows
    (query_router_async_dispatch.rs analog)."""
    from neumann_tpu.router.router import QueryRouter
    from neumann_tpu.utils.errors import NeumannError

    rng = random.Random(seed)
    r = QueryRouter()
    r.execute("CREATE TABLE t (id INT, owner TEXT)")
    errors = []

    def worker(wid: int):
        try:
            mine = 0
            for i in range(25):
                op = rng.random()       # shared rng: races are fine
                if op < 0.5:
                    r.execute(f"INSERT INTO t (id, owner) VALUES "
                              f"({wid * 1000 + i}, 'w{wid}')")
                    mine += 1
                elif op < 0.8:
                    res = r.execute(
                        f"SELECT * FROM t WHERE owner = 'w{wid}'")
                    rows = res.rows or []
                    assert all(row["owner"] == f"w{wid}"
                               for row in rows)
                    assert len(rows) <= 25
                else:
                    try:
                        r.execute("".join(rng.choices(
                            string.printable, k=20)))
                    except NeumannError:
                        pass
        except Exception as exc:            # noqa: BLE001
            errors.append((wid, repr(exc)))

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors


def test_fuzz_error_hierarchy():
    """Every public error type derives from NeumannError, carries its
    message, and catching the base class catches them all
    (error_hierarchy.rs analog)."""
    from neumann_tpu.utils import errors as E

    subclasses = [v for v in vars(E).values()
                  if isinstance(v, type) and issubclass(v, Exception)
                  and v is not E.NeumannError]
    assert len(subclasses) >= 8
    for cls in subclasses:
        assert issubclass(cls, E.NeumannError), cls
        exc = cls("message with ünicode % {} 42")
        assert "message with ünicode % {} 42" in str(exc)
        try:
            raise exc
        except E.NeumannError as caught:
            assert caught is exc
    # The base is NOT a catch-all for unrelated exceptions.
    assert not issubclass(ValueError, E.NeumannError)


# -------------------------------------------------------------- vault

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_cipher_aad(seed):
    """Any single-byte tamper of a stored ciphertext, or a swap of two
    secrets' blobs (AAD cross-check), must fail decryption — never
    return wrong plaintext (vault_cipher_aad.rs analog)."""
    from neumann_tpu.store.tensor_store import (TensorData, TensorStore,
                                                TensorValue)
    from neumann_tpu.utils.errors import VaultError
    from neumann_tpu.vault.vault import TensorVault

    rng = random.Random(seed)
    store = TensorStore()
    v = TensorVault(store, master_password="pw")
    v.set("alpha", "secret-one")
    v.set("beta", "secret-two")
    skeys = [k for k in store.scan("") if "secret" in k or "alpha" in k
             or "beta" in k]
    # find the two cipher-bearing records
    blobs = {}
    for k in store.scan(""):
        data = store.get(k)
        if data is not None and data.get("cipher") is not None:
            blobs[k] = data.get("cipher").value
    assert len(blobs) >= 2, skeys

    for k, blob in blobs.items():
        for _ in range(6):
            mutated = bytearray(blob)
            mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
            td = TensorData().set("cipher",
                                  TensorValue.scalar(bytes(mutated)))
            store.put(k, td)
            name = "alpha" if "alpha" in k else "beta"
            with pytest.raises(VaultError):
                v.get(name)
        store.put(k, TensorData().set("cipher",
                                      TensorValue.scalar(blob)))
    # Cross-swap: beta's ciphertext under alpha's key must fail (AAD
    # binds the ciphertext to its secret name).
    (ka, ba), (kb, bb) = sorted(blobs.items())[:2]
    store.put(ka, TensorData().set("cipher", TensorValue.scalar(bb)))
    with pytest.raises(VaultError):
        v.get("alpha" if "alpha" in ka else "beta")
    store.put(ka, TensorData().set("cipher", TensorValue.scalar(ba)))
    assert v.get("alpha") == "secret-one"
    assert v.get("beta") == "secret-two"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_obfuscation(seed):
    """pad/unpad roundtrips all lengths, padded sizes leak only a
    bucket, obfuscated key names are deterministic and collision-free
    (vault_obfuscation.rs analog)."""
    from neumann_tpu.vault.obfuscation import ObfuscationLayer

    rng = random.Random(seed)
    layer = ObfuscationLayer(bytes(range(32)))
    names = set()
    for n in list(range(0, 70)) + [255, 256, 1000, 4096]:
        pt = bytes(rng.randrange(256) for _ in range(n))
        padded = ObfuscationLayer.pad(pt)
        assert len(padded) > len(pt)
        assert ObfuscationLayer.unpad(padded) == pt
        name = f"secret/{n}"
        ob = layer.obfuscate_key(name)
        assert ob != name
        assert layer.obfuscate_key(name) == ob   # deterministic
        names.add(ob)
    assert len(names) == 74                       # no collisions
    # Unpad rejects corrupt padding rather than returning junk silently.
    for _ in range(20):
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(1, 64)))
        try:
            out = ObfuscationLayer.unpad(blob)
            assert isinstance(out, bytes)
        except Exception as exc:                 # noqa: BLE001
            assert not isinstance(exc, (SystemExit, MemoryError))
    # Metadata encryption roundtrips dicts.
    meta = {"a": 1, "b": "x", "nested": {"c": [1, 2]}}
    assert layer.decrypt_metadata(layer.encrypt_metadata(meta)) == meta


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_policy(seed):
    """Policy templates: JSON roundtrip, evaluate() returns exactly the
    matching templates, permission_for picks the strongest grant
    (vault_policy.rs analog)."""
    from neumann_tpu.store.tensor_store import TensorStore
    from neumann_tpu.vault.policy import PolicyEngine, PolicyTemplate

    rng = random.Random(seed)
    eng = PolicyEngine(TensorStore())
    defined = []
    for i in range(8):
        tpl = PolicyTemplate(
            name=f"pol{i}",
            match_pattern=rng.choice(["svc-*", "user-*", "*", "ops-?"]),
            secret_pattern=rng.choice(["db/*", "*", "api/key?"]),
            permission=rng.choice([1, 2, 3]))
        eng.define(tpl)
        defined.append(tpl)
        assert PolicyTemplate.from_json(tpl.to_json()) == tpl
    listed = {t.name for t in eng.list()}
    assert listed == {t.name for t in defined}

    import fnmatch
    for entity in ["svc-a", "user-bob", "ops-1", "other", ""]:
        got = {m.policy_name for m in eng.evaluate(entity)}
        want = {t.name for t in defined
                if fnmatch.fnmatch(entity, t.match_pattern)}
        assert got == want, entity
        for secret in ["db/main", "api/key1", "zzz"]:
            p = eng.permission_for(entity, secret)
            matching = [t.permission for t in defined
                        if fnmatch.fnmatch(entity, t.match_pattern)
                        and fnmatch.fnmatch(secret, t.secret_pattern)]
            if not matching:
                assert p is None
            else:
                assert p == max(matching)
    # remove() really removes
    assert eng.remove("pol0")
    assert not eng.remove("pol0")
    assert "pol0" not in {t.name for t in eng.list()}


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_access_tensor(seed):
    """AccessTensor marginals always reconcile with the raw audit
    events fed in (vault_access_tensor.rs analog)."""
    from neumann_tpu.store.tensor_store import TensorStore
    from neumann_tpu.vault.intel import AccessTensor, AccessTensorConfig
    from neumann_tpu.vault.vault import Permission, TensorVault

    rng = random.Random(seed)
    v = TensorVault(TensorStore(), master_password="pw")
    actors = [f"svc{i}" for i in range(4)]
    secrets = [f"s{i}" for i in range(3)]
    counts = {}
    for s in secrets:
        v.set(s, "x")
    for a in actors:
        for s in secrets:
            v.grant(a, s, Permission.READ)
    for step in range(60):
        a, s = rng.choice(actors), rng.choice(secrets)
        v.get(s, actor=a)
        counts[a] = counts.get(a, 0) + 1
    t = AccessTensor(v, AccessTensorConfig(operations=("get",)))
    act = t.entity_activity()
    for a, n in counts.items():
        assert act.get(a, 0) == n, (a, act)
    assert sum(t.secret_activity().values()) == sum(counts.values())
    hot = t.hot_pairs(k=3)
    assert len(hot) <= 3
    assert all(h[2] > 0 for h in hot)
    for a in actors:
        prof = t.temporal_profile(a)
        assert prof.sum() == counts.get(a, 0)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_vault_geo_routing(seed):
    """ManifoldPlacer: the primary region is always a defined region,
    replicas are distinct, and with locality weight 1.0 the primary
    is the geographically nearest region to the accessor centroid
    (vault_geo_routing.rs analog)."""
    from neumann_tpu.vault.placement import (ManifoldPlacer,
                                             PlacementConfig, VaultRegion)
    from neumann_tpu.vault.sync import GeoCoordinate

    rng = random.Random(seed)
    placer = ManifoldPlacer(PlacementConfig(locality_weight=1.0,
                                            load_balance_weight=0.0,
                                            replication_weight=0.0,
                                            replica_count=2))
    regions = []
    for i in range(4):
        r = VaultRegion(name=f"r{i}",
                        center=GeoCoordinate(rng.uniform(-10, 10),
                                             rng.uniform(-10, 10)),
                        capacity=100, current_load=rng.randrange(50))
        regions.append(r)
        placer.add_region(r)
    entities = {}
    for i in range(6):
        c = GeoCoordinate(rng.uniform(-10, 10), rng.uniform(-10, 10))
        placer.set_entity_location(f"e{i}", c)
        entities[f"e{i}"] = c

    for trial in range(10):
        accs = rng.sample(sorted(entities), rng.randint(1, 4))
        rec = placer.recommend_placement("sec", accs)
        names = {r.name for r in regions}
        assert rec.primary_region in names
        assert rec.primary_region not in rec.replica_regions
        assert len(set(rec.replica_regions)) == len(rec.replica_regions)
        cent = np.mean([[entities[a].x, entities[a].y, 0.0]
                        for a in accs], axis=0)
        dists = {r.name: np.linalg.norm(
            cent - [r.center.x, r.center.y, 0.0]) for r in regions}
        assert np.isclose(dists[rec.primary_region],
                          min(dists.values()), atol=1e-6)
