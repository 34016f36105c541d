"""Scalar expression trees for SELECT items.

The reference's select list takes full expressions (neumann_parser
ast.rs: SelectItem.expr is an Expr; operator/CASE/CAST surface in
docs/book/src/reference/functions.md:83-160). Here expressions are
evaluated row-wise in the router after the engine fetch; NULL
propagates through arithmetic like SQL (any NULL operand -> NULL).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from neumann_tpu.engines.condition import Condition
from neumann_tpu.utils.errors import NeumannError


class Expr:
    def evaluate(self, row: dict):
        raise NotImplementedError

    def label(self) -> str:
        raise NotImplementedError

    def map_cols(self, fn) -> "Expr":
        """Structurally rewrite column names (alias/qualifier fixes)."""
        return self


@dataclass(frozen=True)
class Col(Expr):
    name: str

    def evaluate(self, row: dict):
        return row.get(self.name)

    def label(self) -> str:
        return self.name

    def map_cols(self, fn) -> "Expr":
        return Col(fn(self.name))


@dataclass(frozen=True)
class Lit(Expr):
    value: object

    def evaluate(self, row: dict):
        return self.value

    def label(self) -> str:
        return repr(self.value)


@dataclass(frozen=True)
class Bin(Expr):
    op: str          # + - * / %
    left: Expr
    right: Expr

    def evaluate(self, row: dict):
        a = self.left.evaluate(row)
        b = self.right.evaluate(row)
        if a is None or b is None:
            return None
        try:
            if self.op == "+":
                return a + b
            if self.op == "-":
                return a - b
            if self.op == "*":
                return a * b
            if self.op == "/":
                return a / b
            if self.op == "%":
                return a % b
        except ZeroDivisionError:
            raise NeumannError("division by zero") from None
        except TypeError:
            raise NeumannError(
                f"bad operands for {self.op}: {a!r}, {b!r}") from None
        raise NeumannError(f"unknown operator {self.op}")

    def label(self) -> str:
        def side(e):
            lbl = e.label()
            return f"({lbl})" if isinstance(e, Bin) else lbl

        return f"{side(self.left)} {self.op} {side(self.right)}"

    def map_cols(self, fn) -> "Expr":
        return Bin(self.op, self.left.map_cols(fn),
                   self.right.map_cols(fn))


@dataclass(frozen=True)
class Case(Expr):
    whens: Tuple[Tuple[Condition, Expr], ...]
    else_: Optional[Expr] = None

    def evaluate(self, row: dict):
        for cond, result in self.whens:
            if cond.evaluate_row(row):
                return result.evaluate(row)
        return self.else_.evaluate(row) if self.else_ else None

    def label(self) -> str:
        return "case"

    def map_cols(self, fn) -> "Expr":
        from dataclasses import replace as _r

        def fix_cond(c):
            if c is None:
                return None
            kw = {}
            if c.column is not None:
                kw["column"] = fn(c.column)
            return _r(c, left=fix_cond(c.left),
                      right=fix_cond(c.right), **kw)

        return Case(tuple((fix_cond(c), r.map_cols(fn))
                          for c, r in self.whens),
                    self.else_.map_cols(fn) if self.else_ else None)


_CASTS = {
    "int": int, "float": float, "text": str,
    "bool": lambda v: bool(v) if not isinstance(v, str)
    else v.lower() in ("true", "t", "1"),
}


@dataclass(frozen=True)
class Cast(Expr):
    expr: Expr
    ctype: str       # int/float/text/bool

    def evaluate(self, row: dict):
        v = self.expr.evaluate(row)
        if v is None:
            return None
        fn = _CASTS.get(self.ctype)
        if fn is None:
            raise NeumannError(f"cannot CAST to {self.ctype}")
        try:
            return fn(v)
        except (TypeError, ValueError):
            raise NeumannError(
                f"cannot CAST {v!r} to {self.ctype}") from None

    def label(self) -> str:
        return f"cast({self.expr.label()} as {self.ctype})"

    def map_cols(self, fn) -> "Expr":
        return Cast(self.expr.map_cols(fn), self.ctype)
