"""Line-coverage report via sys.monitoring (PEP 669), no deps.

Parity with the reference's cargo-llvm-cov 95%-per-crate CI gate
(.github/workflows/ci.yml:172-245 there): measures which executable
lines of neumann_tpu/ the test suite reaches. First-hit DISABLE makes
the instrumentation near-free (same trick as utils/covfuzz.py).

Executable lines come from the compiled code objects themselves
(co_lines over the full nested-code tree), so the denominator is what
the interpreter could actually execute — not a source-line guess.

Usage:
    python tools/coverage_report.py [pytest args...]
    python tools/coverage_report.py --min 80 tests/   # gate at 80%

Caveats: subprocess work (multiprocess cluster tests, native C++) is
not attributed; module-import lines count only if imported after
startup (the runner installs monitoring before importing the package).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "neumann_tpu")
if REPO not in sys.path:
    sys.path.insert(0, REPO)    # argv[0] is tools/, not the repo root

covered: dict = {}

TOOL = 3


def _on_line(code, line):
    f = code.co_filename
    if f.startswith(PKG):
        covered.setdefault(f, set()).add(line)
    return sys.monitoring.DISABLE       # first hit only


# Explicit file-level exclusions, matching the reference's practice of
# excluding generated code from its 95% gate. Every entry needs a
# reason — implicit exclusions would make the number a lie.
EXCLUDED_FILES = {
    # generated protobuf descriptor stubs (vendored, not authored)
    "neumann_tpu/server/neumann_pb2.py",
    "neumann_tpu/server/reflection_pb2.py",
}


def _excluded_lines(path: str, src: bytes) -> set:
    """Lines opted out with `# pragma: no cover` — a pragma on a
    def/class/if/try header excludes that whole block (coverage.py
    semantics). Device-only branches (real-TPU Pallas paths the CPU
    suite cannot reach) are the intended use; each pragma is an
    explicit, grep-able exclusion."""
    import ast

    text = src.decode("utf-8", "replace")
    marked = {i + 1 for i, ln in enumerate(text.splitlines())
              if "pragma: no cover" in ln}
    if not marked:
        return set()
    out = set(marked)
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return out
    for node in ast.walk(tree):
        start = getattr(node, "lineno", None)
        end = getattr(node, "end_lineno", None)
        if start in marked and end:
            out.update(range(start, end + 1))
    return out


def _executable_lines(path: str) -> set:
    with open(path, "rb") as fh:
        src = fh.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    skip = _excluded_lines(path, src)
    lines: set = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None and ln > 0 and ln not in skip:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def main() -> int:
    args = sys.argv[1:]
    gate = None
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    if args and args[0] == "--min":
        gate = float(args[1])
        args = args[2:]
    if not args:
        args = ["tests/", "-q"]

    mon = sys.monitoring
    mon.use_tool_id(TOOL, "nncov")
    mon.register_callback(TOOL, mon.events.LINE, _on_line)
    mon.set_events(TOOL, mon.events.LINE)

    import pytest

    rc = pytest.main(args)
    mon.set_events(TOOL, 0)

    rows = []
    tot_exec = tot_cov = 0
    miss: dict = {}
    for root, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            if os.path.relpath(path, REPO) in EXCLUDED_FILES:
                continue
            ex = _executable_lines(path)
            if not ex:
                continue
            cov = covered.get(path, set()) & ex
            tot_exec += len(ex)
            tot_cov += len(cov)
            rel = os.path.relpath(path, REPO)
            rows.append((rel, len(cov), len(ex)))
            if ex - cov:
                miss[rel] = sorted(ex - cov)
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(miss, fh)

    rows.sort(key=lambda r: r[1] / r[2])
    print("\n== line coverage (sys.monitoring, first-hit) ==")
    for rel, c, e in rows:
        pct = 100.0 * c / e
        flag = "  " if pct >= 80 else "<<"
        print(f"{flag} {pct:5.1f}%  {c:5d}/{e:<5d}  {rel}")
    pct = 100.0 * tot_cov / max(tot_exec, 1)
    print(f"\nTOTAL {pct:.1f}% ({tot_cov}/{tot_exec} executable lines)")
    if gate is not None and pct < gate:
        print(f"FAIL: below --min {gate}%")
        return 2
    return int(rc)


if __name__ == "__main__":
    raise SystemExit(main())
