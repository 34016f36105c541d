"""Bounded model checking of the sans-IO Raft core.

The reference pairs its Raft with TLA+ specs; here the deterministic
sans-IO design (raft.py) lets us model-check THE IMPLEMENTATION
directly: breadth-first exploration of every interleaving of
{tick node, deliver pending message, drop pending message} for a small
cluster, with state dedup, asserting the Raft safety invariants in
every reachable state:

  I1 election safety   — at most one leader per term
  I2 log matching      — same (index, term) implies same payload
  I3 leader completeness (observed form) — committed entries never
     diverge: one node's committed prefix never contradicts another's

This is bounded (max_states cap), so it is a falsifier, not a proof —
the same trade TLC makes with finite models. specs/TensorRaft.tla holds
the declarative spec for full TLC runs outside this image.
"""

from __future__ import annotations

import json
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from neumann_tpu.chain.raft import RaftConfig, RaftNode


@dataclass
class CheckResult:
    ok: bool
    states_explored: int
    frontier_truncated: bool
    violation: Optional[str] = None
    trace: List[str] = field(default_factory=list)


def _clone_node(n: RaftNode) -> RaftNode:
    """Fast structural copy. Safe because the sans-IO core treats log
    entries and message payloads as immutable, and the model config
    pins election timeouts (min == max) so the shared RNG cannot make
    branches diverge."""
    m = RaftNode.__new__(RaftNode)
    m.__dict__ = dict(n.__dict__)
    m.log = list(n.log)
    m.voters = set(n.voters)
    m.learners = set(n.learners)
    m.joint_old = set(n.joint_old) if n.joint_old is not None else None
    m.next_index = dict(n.next_index)
    m.match_index = dict(n.match_index)
    m._votes = set(n._votes)
    m._pre_votes = set(n._pre_votes)
    return m


def _digest(nodes: Dict[str, RaftNode], pending: Tuple) -> str:
    """Canonical state fingerprint for dedup."""
    parts = []
    for nid in sorted(nodes):
        n = nodes[nid]
        parts.append((nid, n.state, n.term, n.voted_for, n.commit_index,
                      n.leader_id, n._elapsed,
                      tuple((e.term, json.dumps(e.payload, sort_keys=True))
                            for e in n.log)))
    msgs = tuple(sorted(
        (m.kind, m.src, m.dst, json.dumps(m.payload, sort_keys=True))
        for m in pending))
    return repr((parts, msgs))


def _check_invariants(nodes: Dict[str, RaftNode]) -> Optional[str]:
    # I1: at most one leader per term
    leaders: Dict[int, str] = {}
    for n in nodes.values():
        if n.state == "leader":
            if n.term in leaders:
                return (f"I1 violated: {leaders[n.term]} and {n.id} "
                        f"both lead term {n.term}")
            leaders[n.term] = n.id
    # I2: log matching on (index, term)
    by_index: Dict[Tuple[int, int], str] = {}
    for n in nodes.values():
        for i, e in enumerate(n.log):
            key = (n.snapshot_index + i + 1, e.term)
            blob = json.dumps(e.payload, sort_keys=True)
            if key in by_index and by_index[key] != blob:
                return f"I2 violated at index {key[0]} term {key[1]}"
            by_index[key] = blob
    # I3: committed prefixes agree
    ns = list(nodes.values())
    for a in ns:
        for b in ns:
            upto = min(a.commit_index, b.commit_index)
            for idx in range(1, upto + 1):
                ta, tb = a.term_at(idx), b.term_at(idx)
                if ta is not None and tb is not None and ta != tb:
                    return (f"I3 violated: commit divergence at {idx} "
                            f"({a.id}:{ta} vs {b.id}:{tb})")
    return None


def check_raft(n_nodes: int = 2, max_states: int = 20_000,
               propose_at_leader: bool = True,
               allow_drops: bool = True,
               max_pending: int = 4,
               config: Optional[RaftConfig] = None) -> CheckResult:
    """Exploration over all interleavings from a fresh cluster.

    ``max_pending`` bounds the in-flight message channel (actions that
    would emit more messages are disabled above it) — the finite-model
    bound, exactly as a TLC channel constraint."""
    cfg = config or RaftConfig(election_timeout_min=2,
                               election_timeout_max=2,
                               heartbeat_interval=1)
    ids = [f"n{i}" for i in range(n_nodes)]

    def initial():
        return ({i: RaftNode(i, ids, cfg, seed=0) for i in ids}, ())

    start = initial()
    seen = {_digest(*start)}
    frontier = deque([(*start, [])])
    explored = 0
    truncated = False

    while frontier:
        nodes, pending, trace = frontier.popleft()  # BFS: shallow first
        explored += 1
        bad = _check_invariants(nodes)
        if bad:
            return CheckResult(False, explored, truncated, bad, trace)
        if explored >= max_states:
            truncated = True
            break

        successors: List[Tuple[dict, tuple, str]] = []

        def fork(action, label):
            nn = {nid: _clone_node(n) for nid, n in nodes.items()}
            pp = list(pending)
            out = action(nn, pp)
            successors.append((nn, tuple(pp + list(out or [])), label))

        # tick each node (only while the channel has headroom)
        if len(pending) < max_pending:
            for nid in ids:
                fork(lambda nn, pp, nid=nid: nn[nid].tick(),
                     f"tick {nid}")
        # deliver each pending message
        for i in range(len(pending)):
            def deliver(nn, pp, i=i):
                msg = pp.pop(i)
                if msg.dst in nn:
                    return nn[msg.dst].handle(msg)
                return []
            fork(deliver, f"deliver {pending[i].kind} "
                          f"{pending[i].src}->{pending[i].dst}")
        # drop each pending message
        if allow_drops:
            for i in range(len(pending)):
                def drop(nn, pp, i=i):
                    pp.pop(i)
                fork(drop, f"drop {pending[i].kind}")
        # a leader may propose (limit log depth to bound the space)
        if propose_at_leader and len(pending) < max_pending:
            for nid in ids:
                if nodes[nid].state == "leader" and \
                        len(nodes[nid].log) < 3:
                    fork(lambda nn, pp, nid=nid:
                         nn[nid].propose({"v": len(nn[nid].log)}) and [],
                         f"propose@{nid}")

        for nn, pp, label in successors:
            d = _digest(nn, pp)
            if d not in seen:
                seen.add(d)
                frontier.append((nn, pp, trace + [label]))

    return CheckResult(True, explored, truncated)
