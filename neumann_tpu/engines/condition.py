"""Predicate condition tree shared by the relational engine and router.

Parity with relational_engine::Condition (relational_engine/src/lib.rs:
561-659: comparison ops, AND/OR/NOT, IN, LIKE, IS NULL). Two evaluation
modes:

* ``evaluate_row`` — per-row dict evaluation (small scans, tx overlays);
* ``evaluate_columnar`` — vectorized numpy evaluation over whole columns,
  producing the selection bitmap that the reference builds with hand-SIMD
  (relational_engine/src/simd.rs:6-311). The same bitmap feeds device-side
  masked vector scans for hybrid queries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import numpy as np

_OPS = ("=", "!=", "<", "<=", ">", ">=")


def _like_to_regex(pattern: str) -> "re.Pattern":
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$", re.DOTALL)


@dataclass(frozen=True)
class Condition:
    op: str                      # cmp op | "and" | "or" | "not" | "in" |
    #                              "like" | "is_null" | "is_not_null" | "true"
    column: Optional[str] = None
    value: object = None
    left: Optional["Condition"] = None
    right: Optional["Condition"] = None

    # -- constructors ------------------------------------------------------
    @staticmethod
    def cmp(column: str, op: str, value) -> "Condition":
        if op == "==":
            op = "="
        if op == "<>":
            op = "!="
        if op not in _OPS:
            raise ValueError(f"bad comparison op {op}")
        return Condition(op, column, value)

    @staticmethod
    def eq(column, value):
        return Condition("=", column, value)

    @staticmethod
    def in_(column: str, values: Sequence) -> "Condition":
        return Condition("in", column, tuple(values))

    @staticmethod
    def like(column: str, pattern: str) -> "Condition":
        return Condition("like", column, pattern)

    @staticmethod
    def is_null(column: str) -> "Condition":
        return Condition("is_null", column)

    @staticmethod
    def is_not_null(column: str) -> "Condition":
        return Condition("is_not_null", column)

    @staticmethod
    def true() -> "Condition":
        return Condition("true")

    def and_(self, other: "Condition") -> "Condition":
        return Condition("and", left=self, right=other)

    def or_(self, other: "Condition") -> "Condition":
        return Condition("or", left=self, right=other)

    def not_(self) -> "Condition":
        return Condition("not", left=self)

    # -- introspection / serialization --------------------------------------
    def columns(self) -> set:
        """All column names referenced anywhere in this tree."""
        out = set()
        if self.column is not None:
            out.add(self.column)
        for side in (self.left, self.right):
            if side is not None:
                out |= side.columns()
        return out

    def to_dict(self) -> dict:
        d: dict = {"op": self.op}
        if self.column is not None:
            d["column"] = self.column
        if self.value is not None:
            v = self.value
            d["value"] = list(v) if isinstance(v, tuple) else v
        if self.left is not None:
            d["left"] = self.left.to_dict()
        if self.right is not None:
            d["right"] = self.right.to_dict()
        return d

    @staticmethod
    def from_dict(d: dict) -> "Condition":
        v = d.get("value")
        if d["op"] == "in" and isinstance(v, list):
            v = tuple(v)
        return Condition(
            d["op"], d.get("column"), v,
            Condition.from_dict(d["left"]) if d.get("left") else None,
            Condition.from_dict(d["right"]) if d.get("right") else None)

    # -- row evaluation ------------------------------------------------------
    def evaluate_row(self, row: Dict[str, object]) -> bool:
        op = self.op
        if op == "true":
            return True
        if op == "exists":
            raise ValueError("unresolved subquery condition (EXISTS)")
        if type(self.value).__name__ == "Subquery":
            raise ValueError("unresolved subquery condition")
        if op == "and":
            return self.left.evaluate_row(row) and self.right.evaluate_row(row)
        if op == "or":
            return self.left.evaluate_row(row) or self.right.evaluate_row(row)
        if op == "not":
            return not self.left.evaluate_row(row)
        val = row.get(self.column)
        if op == "is_null":
            return val is None
        if op == "is_not_null":
            return val is not None
        if val is None:
            return False  # SQL three-valued logic collapses to False
        if op == "in":
            return val in self.value
        if op == "like":
            return isinstance(val, str) and bool(
                _like_to_regex(self.value).match(val))
        try:
            if op == "=":
                return val == self.value
            if op == "!=":
                return val != self.value
            if op == "<":
                return val < self.value
            if op == "<=":
                return val <= self.value
            if op == ">":
                return val > self.value
            if op == ">=":
                return val >= self.value
        except TypeError:
            return False
        raise ValueError(f"bad condition op {op}")

    # -- columnar evaluation ---------------------------------------------------
    def evaluate_columnar(self, columns: Dict[str, np.ndarray],
                          nulls: Dict[str, np.ndarray],
                          n: int) -> np.ndarray:
        """Vectorized evaluation -> bool[n] selection bitmap.

        ``columns[name]`` is the raw value array (typed numpy or object),
        ``nulls[name]`` a bool array marking NULLs.
        """
        op = self.op
        if op == "true":
            return np.ones(n, bool)
        if op == "exists" or type(self.value).__name__ == "Subquery":
            raise ValueError("unresolved subquery condition")
        if op == "and":
            return self.left.evaluate_columnar(columns, nulls, n) & \
                self.right.evaluate_columnar(columns, nulls, n)
        if op == "or":
            return self.left.evaluate_columnar(columns, nulls, n) | \
                self.right.evaluate_columnar(columns, nulls, n)
        if op == "not":
            return ~self.left.evaluate_columnar(columns, nulls, n)
        if self.column not in columns:
            return np.zeros(n, bool)
        col = columns[self.column]
        null = nulls[self.column]
        if op == "is_null":
            return null.copy()
        if op == "is_not_null":
            return ~null
        valid = ~null
        if op == "in":
            out = np.zeros(n, bool)
            for v in self.value:
                out |= self._cmp_vec(col, "=", v)
            return out & valid
        if op == "like":
            rx = _like_to_regex(self.value)
            out = np.fromiter(
                (isinstance(v, str) and bool(rx.match(v)) for v in col),
                bool, count=n)
            return out & valid
        if col.dtype == object and null.any() and op not in ("=", "!="):
            # ordered compares on object columns choke on None; substitute
            # the probe value at null slots (result ANDed out by `valid`)
            col = col.copy()
            col[null] = self.value
        return self._cmp_vec(col, op, self.value) & valid

    @staticmethod
    def _cmp_vec(col: np.ndarray, op: str, value) -> np.ndarray:
        n = len(col)
        try:
            with np.errstate(invalid="ignore"):
                if op == "=":
                    res = col == value
                elif op == "!=":
                    res = col != value
                elif op == "<":
                    res = col < value
                elif op == "<=":
                    res = col <= value
                elif op == ">":
                    res = col > value
                else:
                    res = col >= value
        except TypeError:
            return np.zeros(n, bool)
        if not isinstance(res, np.ndarray):
            # incompatible dtype comparison collapsed to a scalar
            return np.full(n, bool(res))
        return res.astype(bool)
