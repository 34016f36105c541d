"""Mutation-testing harness for the consensus safety core.

cargo-mutants analog (the reference runs it over tensor_chain's safety
files and reports a 97.8% kill rate, MUTATION_TESTING_RESULTS.md): we
generate single-point mutants of the chain safety modules with ast
rewrites, run the focused chain test subset against each, and report
the kill rate. A surviving mutant = logic no test observes.

Usage:
    python tools/mutation_test.py [--per-file 30] [--seed 0] [--files ...]

Mutation operators (one site per mutant):
  cmp    <  <->  <=,  >  <->  >=,  ==  <->  !=
  bool   and <-> or
  not    drop a `not`
  const  small int n -> n + 1
  ret    return True <-> return False
"""

from __future__ import annotations

import argparse
import ast
import copy
import random
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEFAULT_FILES = [
    "neumann_tpu/chain/raft.py",
    "neumann_tpu/chain/two_phase.py",
    "neumann_tpu/chain/gossip.py",
    "neumann_tpu/chain/hlc.py",
]

# the fast chain subset (~12s green): a mutant that survives it but
# would die under the slower cluster/DST tiers still counts as a
# coverage signal for THIS tier, and keeping the loop ~15s/mutant is
# what makes the sweep runnable in CI
TESTS = [
    "tests/test_chain.py",
    "tests/test_raft_wal.py",
    "tests/test_two_phase_hardening.py",
    "tests/test_mutation_gaps.py",
]

_CMP_SWAP = {ast.Lt: ast.LtE, ast.LtE: ast.Lt, ast.Gt: ast.GtE,
             ast.GtE: ast.Gt, ast.Eq: ast.NotEq, ast.NotEq: ast.Eq}


def _tunable_consts(tree: ast.AST):
    """Constant nodes that are DEFAULTS (dataclass/class-body field
    defaults, function-arg defaults): tuning knobs, not logic — their
    mutants are trivially 'surviving' and only add noise. Tests pin
    the knobs that are protocol-semantic (see test_mutation_gaps.py)."""
    skip = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            for item in node.body:
                v = getattr(item, "value", None)
                if isinstance(item, (ast.AnnAssign, ast.Assign)) and \
                        isinstance(v, ast.Constant):
                    skip.add(id(v))
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in (list(node.args.defaults)
                      + list(node.args.kw_defaults)):
                if isinstance(d, ast.Constant):
                    skip.add(id(d))
    return skip


def _sites(tree: ast.AST):
    """Yield (node, kind, detail) mutation sites."""
    skip_consts = _tunable_consts(tree)
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and id(node) in skip_consts:
            continue
        if isinstance(node, ast.Compare) and len(node.ops) == 1 and \
                type(node.ops[0]) in _CMP_SWAP:
            yield node, "cmp", type(node.ops[0]).__name__
        elif isinstance(node, ast.BoolOp):
            yield node, "bool", type(node.op).__name__
        elif isinstance(node, ast.UnaryOp) and \
                isinstance(node.op, ast.Not):
            yield node, "not", ""
        elif isinstance(node, ast.Constant) and \
                isinstance(node.value, int) and \
                not isinstance(node.value, bool) and \
                0 <= node.value <= 8:
            yield node, "const", str(node.value)
        elif isinstance(node, ast.Return) and \
                isinstance(node.value, ast.Constant) and \
                isinstance(node.value.value, bool):
            yield node, "ret", str(node.value.value)


def _mutate(tree: ast.AST, index: int):
    """Apply the index-th site's mutation to a DEEP COPY; returns
    (mutated_tree, description) or None."""
    tree = copy.deepcopy(tree)
    for i, (node, kind, detail) in enumerate(_sites(tree)):
        if i != index:
            continue
        line = getattr(node, "lineno", 0)
        if kind == "cmp":
            new = _CMP_SWAP[type(node.ops[0])]()
            node.ops = [new]
            return tree, f"L{line}: {detail} -> {type(new).__name__}"
        if kind == "bool":
            node.op = ast.Or() if isinstance(node.op, ast.And) \
                else ast.And()
            return tree, f"L{line}: {detail} swapped"
        if kind == "not":
            # replace `not X` with `X`
            return _replace(tree, node, node.operand), \
                f"L{line}: not dropped"
        if kind == "const":
            node.value = node.value + 1
            return tree, f"L{line}: {detail} -> {node.value}"
        if kind == "ret":
            node.value.value = not node.value.value
            return tree, f"L{line}: return {detail} flipped"
    return None


def _replace(tree, old, new):
    class R(ast.NodeTransformer):
        def visit(self, node):
            if node is old:
                return new
            return self.generic_visit(node)
    return R().visit(tree)


def _isolated_copy() -> Path:
    """Copy the package + tests into a tempdir so mutants are written
    there, never into the live working tree (a parallel test run or a
    `git add -A` during a sweep must never observe mutated source)."""
    import shutil
    import tempfile

    sandbox = Path(tempfile.mkdtemp(prefix="mutation-sweep-"))
    for sub in ("neumann_tpu", "tests"):
        shutil.copytree(REPO / sub, sandbox / sub,
                        ignore=shutil.ignore_patterns("__pycache__"))
    shutil.copy2(REPO / "pyproject.toml", sandbox / "pyproject.toml")
    return sandbox


def run(files, per_file, seed, timeout, tests=None):
    tests = tests or TESTS
    import os
    import shutil

    rng = random.Random(seed)
    killed, survived, skipped = [], [], []
    t_start = time.time()
    sandbox = _isolated_copy()
    # the live tree must not shadow the sandbox on sys.path
    env = dict(os.environ)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and Path(p).resolve() != REPO]
    env["PYTHONPATH"] = os.pathsep.join([str(sandbox), *pp])
    for rel in files:
        path = sandbox / rel
        original = path.read_bytes()
        tree = ast.parse(original)
        n_sites = sum(1 for _ in _sites(tree))
        picks = sorted(rng.sample(range(n_sites),
                                  min(per_file, n_sites)))
        print(f"{rel}: {n_sites} sites, testing {len(picks)} mutants",
              flush=True)
        for idx in picks:
            m = _mutate(tree, idx)
            if m is None:
                continue
            mtree, desc = m
            try:
                src = ast.unparse(ast.fix_missing_locations(mtree))
                compile(src, rel, "exec")
            except (SyntaxError, ValueError):
                skipped.append((rel, desc))
                continue
            try:
                path.write_text(src)
                r = subprocess.run(
                    [sys.executable, "-m", "pytest", "-x", "-q",
                     "-p", "no:cacheprovider", *tests],
                    cwd=sandbox, env=env, capture_output=True,
                    timeout=timeout)
                if r.returncode != 0:
                    killed.append((rel, desc))
                    tag = "KILLED"
                else:
                    survived.append((rel, desc))
                    tag = "SURVIVED"
            except subprocess.TimeoutExpired:
                killed.append((rel, desc + " (timeout)"))
                tag = "KILLED(timeout)"
            finally:
                path.write_bytes(original)
            print(f"  [{tag}] {rel} {desc}", flush=True)
    shutil.rmtree(sandbox, ignore_errors=True)
    total = len(killed) + len(survived)
    rate = 100.0 * len(killed) / total if total else 0.0
    dur = time.time() - t_start
    print(f"\n{len(killed)}/{total} mutants killed "
          f"({rate:.1f}%) in {dur:.0f}s; {len(skipped)} skipped")
    return killed, survived, skipped, rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-file", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--timeout", type=int, default=120)
    ap.add_argument("--files", nargs="*", default=DEFAULT_FILES)
    ap.add_argument("--report", default=None,
                    help="write MUTATION_TESTING.md-style report here")
    ap.add_argument("--tests", nargs="*", default=None,
                    help="override the test subset run per mutant")
    args = ap.parse_args()
    killed, survived, skipped, rate = run(
        args.files, args.per_file, args.seed, args.timeout,
        tests=args.tests)
    if args.report:
        lines = [
            "# Mutation testing (chain safety core)\n",
            "cargo-mutants analog (`tools/mutation_test.py`): "
            "single-point ast mutants of the consensus safety modules, "
            "each run against the chain test subset "
            f"({', '.join(TESTS)}).\n",
            f"**Kill rate: {rate:.1f}%** "
            f"({len(killed)}/{len(killed) + len(survived)} mutants "
            f"killed; seed {args.seed}, {args.per_file}/file).\n",
            "Reference baseline: 97.8% on tensor_chain safety files "
            "(MUTATION_TESTING_RESULTS.md).\n",
        ]
        if survived:
            lines.append("## Surviving mutants (untested logic)\n")
            for rel, desc in survived:
                lines.append(f"- `{rel}` {desc}")
            lines.append("")
        Path(args.report).write_text("\n".join(lines))
        print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
