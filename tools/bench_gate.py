"""Benchmark regression gate.

Parity with the reference's per-crate criterion regression thresholds
(bench-thresholds.toml + .github/workflows/bench-pr.yml): runs the
host-path suite in quick mode and fails (exit 1) when any metric falls
below `baseline / allowed_factor`. Machine load swings host numbers by
~2x, so the default factor is a tripwire against order-of-magnitude
regressions, not a 5% fence.

Usage:
  python tools/bench_gate.py               # check against the file
  python tools/bench_gate.py --record      # rewrite the baseline file
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "..",
                             "bench-thresholds.json")

# metrics where SMALLER is better (latencies)
_SMALLER_BETTER = ("us", "ms", "ns/node")


def run_quick() -> dict:
    out = subprocess.run(
        [sys.executable, "bench_host.py", "--quick"],
        capture_output=True, text=True, timeout=1200,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    rows = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "value" in row:
            rows[row["metric"]] = (row["value"], row["unit"])
    if not rows:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        raise SystemExit("bench_host produced no metrics")
    return rows


def main() -> int:
    rows = run_quick()
    if "--record" in sys.argv:
        payload = {m: {"value": v, "unit": u, "allowed_factor": 3.0}
                   for m, (v, u) in rows.items()}
        with open(BASELINE_PATH, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"recorded {len(payload)} baselines to {BASELINE_PATH}")
        return 0

    with open(BASELINE_PATH) as f:
        base = json.load(f)
    failures = []
    for metric, spec in base.items():
        got = rows.get(metric)
        if got is None:
            failures.append(f"MISSING  {metric}")
            continue
        value, unit = got
        factor = spec.get("allowed_factor", 3.0)
        if unit in _SMALLER_BETTER:
            bad = value > spec["value"] * factor
            rel = value / spec["value"] if spec["value"] else 0
        else:
            bad = value < spec["value"] / factor
            rel = spec["value"] / value if value else float("inf")
        tag = "REGRESS" if bad else "ok"
        print(f"{tag:8s} {metric}: {value:g} {unit} "
              f"(baseline {spec['value']:g}, x{rel:.2f} off)")
        if bad:
            failures.append(metric)
    if failures:
        print(f"\n{len(failures)} gate failure(s): {failures}")
        return 1
    print(f"\nall {len(base)} benchmark gates pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
