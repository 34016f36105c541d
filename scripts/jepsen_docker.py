#!/usr/bin/env python
"""Docker Jepsen driver: acknowledged-writes workload + container
nemesis against deploy/docker-compose.jepsen.yml (3-node) or
docker-compose.jepsen-5node.yml.

Escalation tier above the in-process chaos (tests/
test_cluster_integration.py) and the multiprocess SIGKILL tier
(tests/test_multiprocess_cluster.py) — reference:
integration_tests/src/docker_jepsen.rs + scripts/jepsen-docker.sh.

Requires a docker daemon (not present in CI images; run on a dev box):

    docker compose -f deploy/docker-compose.jepsen.yml up -d --build
    python scripts/jepsen_docker.py --nodes 3
    docker compose -f deploy/docker-compose.jepsen.yml down -v
"""

from __future__ import annotations

import argparse
import random
import subprocess
import sys
import time

from neumann_tpu.chain.node import ClusterClient
from neumann_tpu.utils.errors import ChainError

COMPOSE = {3: "deploy/docker-compose.jepsen.yml",
           5: "deploy/docker-compose.jepsen-5node.yml"}


def _addr(i: int):
    return ("127.0.0.1", 17900 + i)


def _compose(compose_file: str, *args: str) -> None:
    subprocess.run(["docker", "compose", "-f", compose_file, *args],
                   check=True, capture_output=True)


def _insert(pool, stmt, deadline_s=30.0) -> bool:
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        for addr in pool:
            try:
                c = ClusterClient(addr)
                try:
                    c.execute(stmt, timeout=5.0)
                    return True
                finally:
                    c.close()
            except (ChainError, OSError):
                time.sleep(0.3)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=3, choices=(3, 5))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--writes-per-round", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)
    compose_file = COMPOSE[args.nodes]
    ids = [f"n{i}" for i in range(args.nodes)]
    pool = [_addr(i) for i in range(args.nodes)]

    assert _insert(pool, "CREATE TABLE j (id INT)", 120.0), \
        "cluster never came up"
    acked: list[int] = []
    nxt = 0
    for rnd in range(args.rounds):
        for _ in range(args.writes_per_round):
            if _insert(pool, f"INSERT INTO j VALUES ({nxt})"):
                acked.append(nxt)
            nxt += 1
        victim = rng.choice(ids)
        print(f"[round {rnd}] SIGKILL {victim}", flush=True)
        _compose(compose_file, "kill", "-s", "SIGKILL", victim)
        for _ in range(args.writes_per_round):
            if _insert(pool, f"INSERT INTO j VALUES ({nxt})",
                       deadline_s=60.0):
                acked.append(nxt)
            nxt += 1
        _compose(compose_file, "start", victim)
        time.sleep(5.0)

    # convergence: every acknowledged write on every node
    deadline = time.time() + 120
    ok = False
    while time.time() < deadline and not ok:
        ok = True
        for addr in pool:
            try:
                c = ClusterClient(addr)
                try:
                    rows = sorted(r["id"] for r in
                                  c.execute("SELECT * FROM j")["rows"])
                finally:
                    c.close()
                if rows != sorted(acked):
                    ok = False
            except (ChainError, OSError):
                ok = False
        if not ok:
            time.sleep(2.0)
    print(f"acked={len(acked)} converged={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
