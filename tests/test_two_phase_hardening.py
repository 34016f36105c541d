"""2PC hardening: coordinator timeouts, abort-retry broadcast,
coordinator WAL recovery, redo-logged commits, deadlock-aware waits.
Seeded delivery shuffles cover the crash matrix the reference exercises
in dst_2pc.rs / distributed_tx.rs."""

import random

from neumann_tpu.chain.deadlock import DeadlockDetector
from neumann_tpu.chain.transport import Message
from neumann_tpu.chain.two_phase import (
    LockManager,
    TwoPhaseConfig,
    TwoPhaseCoordinator,
    TwoPhaseParticipant,
)
from neumann_tpu.store.tensor_store import TensorStore


def mk(n_parts=2, coord_wal=None, part_wals=None,
       config=None):
    cfg = config or TwoPhaseConfig(prepare_timeout_ticks=6,
                                   retry_interval_ticks=2,
                                   lock_wait_ticks=4)
    stores = {f"p{i}": TensorStore() for i in range(n_parts)}
    part_wals = part_wals or {}
    parts = {nid: TwoPhaseParticipant(
        nid, stores[nid], wal=part_wals.get(nid), config=cfg)
        for nid in stores}
    coord = TwoPhaseCoordinator("c", wal=coord_wal, config=cfg)
    return coord, parts, stores, cfg


def pump(coord, parts, msgs, ticks=30, drop_to=frozenset(),
        rng=None):
    """Deliver messages (optionally shuffled / dropped) + tick both ends."""
    queue = list(msgs)
    for _ in range(ticks):
        nxt = []
        if rng is not None:
            rng.shuffle(queue)
        for m in queue:
            if m.dst in drop_to:
                continue
            if m.dst == coord.id:
                nxt += coord.handle(m)
            elif m.dst in parts:
                nxt += parts[m.dst].handle(m)
        nxt += coord.tick()
        for p in parts.values():
            nxt += p.tick()
        queue = nxt
    return queue


def test_coordinator_timeout_presumed_abort_with_retry():
    """A participant that never votes stalls the tx; the coordinator
    presumes abort at the deadline and RETRIES the abort broadcast
    until every participant (including the stalled one) acks."""
    coord, parts, stores, cfg = mk(2)
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "a", "fields": {"v": 1}}],
        "p1": [{"op": "put", "key": "b", "fields": {"v": 2}}]})
    # p1 is unreachable during prepare: its prepare is dropped
    leftover = pump(coord, parts, prepares, ticks=8, drop_to={"p1"})
    assert coord.state_of(tx) == "aborted"
    # p0 prepared (holds locks); abort must reach it and release
    pump(coord, parts, leftover, ticks=6)
    assert parts["p0"].locks.owner_of("a") is None
    assert stores["p0"].get("a") is None
    # retry delivered the abort to p1 too once it is reachable again
    assert coord._txs[tx].acked == {"p0", "p1"}


def test_coordinator_crash_between_prepare_and_commit():
    """Coordinator crashes after both participants prepared but before
    logging commit: recovery presumes abort and unlocks everyone."""
    wal = []
    coord, parts, stores, cfg = mk(2, coord_wal=wal.append)
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "a", "fields": {"v": 1}}],
        "p1": [{"op": "put", "key": "b", "fields": {"v": 2}}]})
    # deliver prepares only; votes vanish with the coordinator crash
    for m in prepares:
        parts[m.dst].handle(m)
    assert parts["p0"].locks.owner_of("a") == tx
    assert not any(r["phase"] in ("commit", "abort") for r in wal)

    coord2 = TwoPhaseCoordinator("c", wal=wal.append, config=cfg)
    decisions = coord2.recover(wal)
    assert coord2.state_of(tx) == "aborted"
    assert all(m.kind == "tx_abort" for m in decisions)
    pump(coord2, parts, decisions, ticks=4)
    assert parts["p0"].locks.owner_of("a") is None
    assert stores["p0"].get("a") is None and stores["p1"].get("b") is None
    # fresh tx ids do not collide with recovered ones
    tx2, _ = coord2.begin({"p0": []})
    assert tx2 != tx


def test_coordinator_crash_after_commit_logged():
    """Crash after the commit record: recovery re-broadcasts tx_commit
    and the participants (idempotently) apply."""
    wal = []
    coord, parts, stores, cfg = mk(2, coord_wal=wal.append)
    tx, prepares = coord.begin({
        "p0": [{"op": "put", "key": "a", "fields": {"v": 1}}],
        "p1": [{"op": "put", "key": "b", "fields": {"v": 2}}]})
    votes = []
    for m in prepares:
        votes += parts[m.dst].handle(m)
    for m in votes:
        coord.handle(m)      # commit logged; broadcast lost in crash
    assert any(r["phase"] == "commit" for r in wal)

    coord2 = TwoPhaseCoordinator("c", wal=wal.append, config=cfg)
    decisions = coord2.recover(wal)
    assert all(m.kind == "tx_commit" for m in decisions)
    pump(coord2, parts, decisions, ticks=4)
    assert stores["p0"].get("a").get("v").value == 1
    assert stores["p1"].get("b").get("v").value == 2
    assert coord2._txs[tx].acked == {"p0", "p1"}


def test_participant_crash_mid_commit_redo():
    """The redo record replays a commit whose application was cut off."""
    wal = []
    store = TensorStore()
    cfg = TwoPhaseConfig()
    p = TwoPhaseParticipant("p0", store, wal=wal.append, config=cfg)
    p.handle(Message("tx_prepare", "c", "p0", {
        "tx": "c-tx1", "ops": [
            {"op": "put", "key": "a", "fields": {"v": 7}}]}))
    # simulate: committing record written, then crash BEFORE the store
    # mutation and the committed record
    wal.append({"phase": "committing", "tx": "c-tx1",
                "ops_list": [{"op": "put", "key": "a",
                              "fields": {"v": 7}}]})
    store2 = TensorStore()
    p2 = TwoPhaseParticipant("p0", store2, wal=wal.append, config=cfg)
    unresolved = p2.recover(list(wal))
    assert unresolved == []
    assert store2.get("a").get("v").value == 7          # redo applied
    assert p2.locks.owner_of("a") is None
    assert any(r["phase"] == "committed" for r in wal)


def test_deadlock_victim_voted_off():
    """txA holds k1 wants k2; txB holds k2 wants k1 -> cycle; the
    youngest tx is refused, the other proceeds."""
    store = TensorStore()
    cfg = TwoPhaseConfig(lock_wait_ticks=50)   # only the cycle breaks it
    det = DeadlockDetector()
    locks = LockManager()
    p = TwoPhaseParticipant("p0", store, locks=locks, wal=None,
                            detector=det, config=cfg)
    out_a = p.handle(Message("tx_prepare", "cA", "p0", {
        "tx": "c-tx1", "ops": [
            {"op": "put", "key": "k1", "fields": {"v": 1}},
        ]}))
    assert out_a and out_a[0].payload["ok"]
    out_b = p.handle(Message("tx_prepare", "cB", "p0", {
        "tx": "c-tx2", "ops": [
            {"op": "put", "key": "k2", "fields": {"v": 2}},
            {"op": "put", "key": "k1", "fields": {"v": 9}},
        ]}))
    assert out_b == []          # waiting on k1 (held by c-tx1)
    out_c = p.handle(Message("tx_prepare", "cA", "p0", {
        "tx": "c-tx1b", "ops": [
            {"op": "put", "key": "k2", "fields": {"v": 3}},
        ]}))
    # k2 was grabbed-then-released by the waiter c-tx2? no: waiter
    # releases its partial locks, so k2 is free and c-tx1b proceeds
    assert out_c and out_c[0].payload["ok"]
    # now c-tx2 waits on both k1 (c-tx1) and k2 (c-tx1b): no cycle yet.
    # create one: c-tx3 holds nothing, wants... instead drive ticks so
    # c-tx2 keeps waiting, then release k1 -> c-tx2 still blocked on k2,
    # then release k2 -> c-tx2 acquires and votes ok.
    p.handle(Message("tx_abort", "cA", "p0", {"tx": "c-tx1"}))
    out = p.tick()
    assert out == [] or not any(
        m.payload["tx"] == "c-tx2" and m.payload["ok"] for m in out)
    out = p.handle(Message("tx_abort", "cA", "p0", {"tx": "c-tx1b"}))
    vote = [m for m in out if m.kind == "tx_vote"
            and m.payload["tx"] == "c-tx2"]
    assert vote and vote[0].payload["ok"], \
        "waiter must proceed once all its locks free up"


def test_deadlock_cycle_breaks():
    """A genuine wait cycle across two participants (shared detector,
    like one process hosting two shards) is broken by voting the
    youngest tx off while the older one proceeds."""
    det = DeadlockDetector()
    cfg = TwoPhaseConfig(lock_wait_ticks=100)   # only the cycle breaks it
    s0, s1 = TensorStore(), TensorStore()
    p0 = TwoPhaseParticipant("p0", s0, detector=det, config=cfg)
    p1 = TwoPhaseParticipant("p1", s1, detector=det, config=cfg)
    # txA locks k1@p0; txB locks k2@p1
    assert p0.handle(Message("tx_prepare", "c", "p0", {
        "tx": "c-tx1", "ops": [{"op": "put", "key": "k1",
                                "fields": {"v": 1}}]}))[0].payload["ok"]
    assert p1.handle(Message("tx_prepare", "c", "p1", {
        "tx": "c-tx2", "ops": [{"op": "put", "key": "k2",
                                "fields": {"v": 2}}]}))[0].payload["ok"]
    # txA wants k2@p1 (waits on txB); txB wants k1@p0 -> cycle
    assert p1.handle(Message("tx_prepare", "c", "p1", {
        "tx": "c-tx1", "ops": [{"op": "put", "key": "k2",
                                "fields": {"v": 1}}]})) == []
    out = p0.handle(Message("tx_prepare", "c", "p0", {
        "tx": "c-tx2", "ops": [{"op": "put", "key": "k1",
                                "fields": {"v": 2}}]}))
    votes = [m for m in out if m.kind == "tx_vote"]
    assert votes and not votes[0].payload["ok"]
    assert votes[0].payload["tx"] == "c-tx2"   # youngest is the victim
    # the survivor's wait resolves as soon as the victim's tx aborts
    out = p1.handle(Message("tx_abort", "c", "p1", {"tx": "c-tx2"}))
    vote = [m for m in out + p1.tick() if m.kind == "tx_vote"]
    assert vote and vote[0].payload["ok"] and \
        vote[0].payload["tx"] == "c-tx1"


def test_seeded_shuffles_always_atomic():
    """Across seeds (message reordering + a coordinator crash point),
    either every shard applied or none did."""
    for seed in range(12):
        rng = random.Random(seed)
        wal = []
        coord, parts, stores, cfg = mk(3, coord_wal=wal.append)
        tx, prepares = coord.begin({
            f"p{i}": [{"op": "put", "key": f"k{i}",
                       "fields": {"v": i}}] for i in range(3)})
        crash_at = rng.randrange(0, 4)
        queue = list(prepares)
        for step in range(4):
            if step == crash_at:
                # coordinator crashes and recovers from its WAL
                coord = TwoPhaseCoordinator("c", wal=wal.append,
                                            config=cfg)
                queue += coord.recover(wal)
            queue = pump(coord, parts, queue, ticks=1, rng=rng)
        pump(coord, parts, queue, ticks=30, rng=rng)
        applied = [stores[f"p{i}"].get(f"k{i}") is not None
                   for i in range(3)]
        assert all(applied) or not any(applied), \
            f"seed {seed}: partial commit {applied}"
        assert all(p.locks.owner_of(f"k{i}") is None
                   for i, p in enumerate(parts.values())), \
            f"seed {seed}: locks leaked"
