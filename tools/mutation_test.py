"""Mutation testing harness.

Parity with the reference's mutation-testing gate (cargo-mutants in its
CI): generate single-operator mutants of a target module via AST
rewriting, run the covering tests against each, and report killed vs
surviving mutants. A surviving mutant is a behavior change no test
noticed — a test-coverage hole.

Usage:
  python tools/mutation_test.py neumann_tpu/ops/quant.py \
      tests/test_ops_scan.py [--max-mutants 20] [--timeout 120]

Exit code 1 when any mutant survives (CI-gateable).
"""

from __future__ import annotations

import argparse
import ast
import copy
import os
import random
import shutil
import subprocess
import sys
import tempfile

_COMPARE_SWAPS = {
    ast.Lt: ast.LtE, ast.LtE: ast.Lt,
    ast.Gt: ast.GtE, ast.GtE: ast.Gt,
    ast.Eq: ast.NotEq, ast.NotEq: ast.Eq,
}
_BINOP_SWAPS = {
    ast.Add: ast.Sub, ast.Sub: ast.Add,
    ast.Mult: ast.Div, ast.Div: ast.Mult,
}
_BOOL_SWAPS = {ast.And: ast.Or, ast.Or: ast.And}


class _MutationFinder(ast.NodeVisitor):
    """Collect every mutation site. Each site carries an occurrence
    ordinal so two sites of the same kind on one line stay distinct
    when the mutant is re-applied to a fresh parse."""

    def __init__(self):
        self.sites = []  # (lineno, kind, node, extra, ordinal)
        self._counts = {}

    def _add(self, lineno, kind, node, extra):
        key = (lineno, kind, extra)
        ordinal = self._counts.get(key, 0)
        self._counts[key] = ordinal + 1
        self.sites.append((lineno, kind, node, extra, ordinal))

    def visit_Compare(self, node: ast.Compare):
        for i, op in enumerate(node.ops):
            if type(op) in _COMPARE_SWAPS:
                self._add(node.lineno, "compare", node, i)
        self.generic_visit(node)

    def visit_BinOp(self, node: ast.BinOp):
        if type(node.op) in _BINOP_SWAPS:
            self._add(node.lineno, "binop", node, None)
        self.generic_visit(node)

    def visit_BoolOp(self, node: ast.BoolOp):
        if type(node.op) in _BOOL_SWAPS:
            self._add(node.lineno, "boolop", node, None)
        self.generic_visit(node)

    def visit_Constant(self, node: ast.Constant):
        if isinstance(node.value, bool):
            self._add(getattr(node, "lineno", 0), "bool-const", node,
                      None)
        elif isinstance(node.value, int) and 0 < abs(node.value) < 1000:
            self._add(node.lineno, "int-const", node, None)
        self.generic_visit(node)


def _apply(site, tree_src: str) -> str:
    """Re-parse and apply the i-th mutation site (indices are stable for
    the same source)."""
    lineno, kind, _node, extra, ordinal = site
    tree = ast.parse(tree_src)
    finder = _MutationFinder()
    finder.visit(tree)
    for s in finder.sites:
        if s[0] == lineno and s[1] == kind and s[3] == extra \
                and s[4] == ordinal:
            node = s[2]
            break
    else:
        raise LookupError("mutation site vanished")
    if kind == "compare":
        node.ops[extra] = _COMPARE_SWAPS[type(node.ops[extra])]()
    elif kind == "binop":
        node.op = _BINOP_SWAPS[type(node.op)]()
    elif kind == "boolop":
        node.op = _BOOL_SWAPS[type(node.op)]()
    elif kind == "bool-const":
        node.value = not node.value
    elif kind == "int-const":
        node.value = node.value + 1
    return ast.unparse(ast.fix_missing_locations(tree))


def _describe(site) -> str:
    lineno, kind, node, extra, _ordinal = site
    if kind == "compare":
        op = type(node.ops[extra]).__name__
        return f"line {lineno}: {op} -> {_COMPARE_SWAPS[type(node.ops[extra])].__name__}"
    if kind == "binop":
        op = type(node.op).__name__
        return f"line {lineno}: {op} -> {_BINOP_SWAPS[type(node.op)].__name__}"
    if kind == "boolop":
        op = type(node.op).__name__
        return f"line {lineno}: {op} -> {_BOOL_SWAPS[type(node.op)].__name__}"
    if kind == "bool-const":
        return f"line {lineno}: {node.value} -> {not node.value}"
    return f"line {lineno}: {node.value} -> {node.value + 1}"


def run(target: str, tests: list, max_mutants: int, timeout: int,
        seed: int) -> int:
    src = open(target, encoding="utf-8").read()
    finder = _MutationFinder()
    finder.visit(ast.parse(src))
    sites = finder.sites
    rng = random.Random(seed)
    if len(sites) > max_mutants:
        sites = rng.sample(sites, max_mutants)
        sites.sort(key=lambda s: s[0])
    print(f"{len(sites)} mutants of {target} "
          f"(from {len(finder.sites)} candidate sites)")

    backup = target + ".mutbak"
    shutil.copy(target, backup)
    killed = survived = skipped = 0
    try:
        for i, site in enumerate(sites):
            desc = _describe(site)
            try:
                mutated = _apply(site, src)
            except LookupError:
                skipped += 1
                continue
            with open(target, "w", encoding="utf-8") as f:
                f.write(mutated)
            try:
                proc = subprocess.run(
                    [sys.executable, "-m", "pytest", "-x", "-q",
                     "--no-header", *tests],
                    capture_output=True, timeout=timeout,
                    env={**os.environ, "JAX_PLATFORMS": "cpu"})
                dead = proc.returncode != 0
            except subprocess.TimeoutExpired:
                dead = True  # infinite loop counts as caught
            tag = "KILLED  " if dead else "SURVIVED"
            print(f"  [{i + 1}/{len(sites)}] {tag} {desc}")
            if dead:
                killed += 1
            else:
                survived += 1
    finally:
        shutil.move(backup, target)

    total = killed + survived
    score = 100.0 * killed / total if total else 100.0
    print(f"\nmutation score: {killed}/{total} killed ({score:.0f}%)"
          + (f", {skipped} skipped" if skipped else ""))
    return 1 if survived else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target", help="module file to mutate")
    ap.add_argument("tests", nargs="+", help="pytest targets to run")
    ap.add_argument("--max-mutants", type=int, default=20)
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    return run(args.target, args.tests, args.max_mutants, args.timeout,
               args.seed)


if __name__ == "__main__":
    sys.exit(main())
