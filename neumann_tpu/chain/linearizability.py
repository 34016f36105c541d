"""Linearizability checking for register histories.

Parity with the reference's checker (integration_tests/src/
linearizability.rs, 707 LoC): given a history of operations with
invoke/complete timestamps over a single register, decide whether some
linearization — a total order consistent with real-time precedence and
register semantics — exists. Wing & Gong depth-first search with
memoization on (linearized-set, register-value), which is exact and fast
for the history sizes chaos tests produce.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import FrozenSet, List, Optional, Set, Tuple


@dataclass(frozen=True)
class Op:
    client: str
    kind: str               # "write" | "read"
    value: object           # written value / observed value
    invoke: float
    complete: float

    def __post_init__(self):
        if self.complete < self.invoke:
            raise ValueError("complete before invoke")


@dataclass
class CheckResult:
    ok: bool
    reason: str = ""
    order: Optional[List[Op]] = None


def check_register(history: List[Op],
                   initial=None) -> CheckResult:
    """Search for a valid linearization of a single-register history."""
    n = len(history)
    if n == 0:
        return CheckResult(True, "empty history")
    ops = sorted(history, key=lambda o: o.invoke)
    idx = {op: i for i, op in enumerate(ops)}

    # precedence: op a really-happens-before b if a.complete < b.invoke
    def precedes(a: Op, b: Op) -> bool:
        return a.complete < b.invoke

    seen: Set[Tuple[FrozenSet[int], object]] = set()
    order: List[Op] = []

    def minimal_pending(done: FrozenSet[int]) -> List[Op]:
        """Ops whose every real-time predecessor is already linearized."""
        pending = [op for op in ops if idx[op] not in done]
        out = []
        for op in pending:
            if all(idx[o] in done or not precedes(o, op)
                   for o in pending if o is not op):
                out.append(op)
        return out

    def dfs(done: FrozenSet[int], value) -> bool:
        if len(done) == n:
            return True
        key = (done, value)
        if key in seen:
            return False
        seen.add(key)
        for op in minimal_pending(done):
            if op.kind == "write":
                order.append(op)
                if dfs(done | {idx[op]}, op.value):
                    return True
                order.pop()
            else:  # read must observe the current value
                if op.value == value:
                    order.append(op)
                    if dfs(done | {idx[op]}, value):
                        return True
                    order.pop()
        return False

    if dfs(frozenset(), initial):
        return CheckResult(True, "linearizable", list(order))
    return CheckResult(False,
                       f"no valid linearization for {n} operations")
