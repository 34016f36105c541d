"""Fuzz wave 7: targets for this round's newest machinery — the
optimized linearizability checker (differential vs a naive Wing & Gong
oracle), the hub's reorder buffer (no loss, bounded holding), membership
status callbacks (every transition reported exactly once), and DISTINCT
aggregates (random data vs sqlite)."""

import random
import urllib.parse

import numpy as np

from neumann_tpu.chain.linearizability import Op, check_register
from neumann_tpu.chain.transport import TransportHub


# ---------------------------------------------------------------- oracle

def _naive_check(history, initial=None) -> bool:
    """Reference WG implementation: frozenset memo, no reductions, no
    ordering heuristics — exact but slow; only for tiny histories."""
    ops = sorted(history, key=lambda o: o.invoke)
    n = len(ops)
    seen = set()

    def precedes(a, b):
        return a.complete < b.invoke

    def dfs(done, value):
        if len(done) == n:
            return True
        key = (done, value)
        if key in seen:
            return False
        seen.add(key)
        pending = [i for i in range(n) if i not in done]
        for i in pending:
            if any(j not in done and precedes(ops[j], ops[i])
                   for j in pending if j != i):
                continue
            op = ops[i]
            if op.kind == "read":
                if op.value != value:
                    continue
                nxt = value
            elif op.kind == "cas":
                exp, new, succeeded = op.value
                if succeeded != (value == exp):
                    continue
                nxt = new if succeeded else value
            else:
                nxt = op.value
            if dfs(done | {i}, nxt):
                return True
        return False

    return dfs(frozenset(), initial)


def _random_history(rng, n_ops, p_inf=0.15):
    """Random small register history; overlapping windows, sometimes
    indeterminate completes, reads of plausible-or-garbage values."""
    written = [None]
    h = []
    t = 0.0
    for i in range(n_ops):
        t += rng.random() * 2
        dur = rng.random() * 6
        comp = float("inf") if rng.random() < p_inf else t + dur
        roll = rng.random()
        if roll < 0.45:
            v = i + 1
            written.append(v)
            h.append(Op(f"c{i % 3}", "write", v, invoke=t, complete=comp))
        elif roll < 0.85:
            v = rng.choice(written + [999])
            h.append(Op(f"c{i % 3}", "read", v, invoke=t,
                        complete=min(comp, t + dur)))
        else:
            exp = rng.choice(written + [999])
            h.append(Op(f"c{i % 3}", "cas",
                        (exp, 1000 + i, rng.random() < 0.6),
                        invoke=t, complete=min(comp, t + dur)))
    return h


def test_fuzz_checker_differential_vs_naive_oracle():
    """300 random small histories: the optimized checker (bitmask +
    interval-order frontier + tail reduction + reads-first) agrees with
    the naive exact WG search on every one."""
    rng = random.Random(7)
    mismatches = []
    for trial in range(300):
        h = _random_history(rng, rng.randint(2, 9))
        fast = check_register(h).ok
        slow = _naive_check(h)
        if fast != slow:
            mismatches.append((trial, fast, slow, h))
    assert not mismatches, mismatches[:2]


def test_fuzz_checker_order_witness_is_valid():
    """When the checker says linearizable, replaying its returned order
    through register semantics must actually satisfy every op."""
    rng = random.Random(11)
    checked = 0
    for _ in range(300):
        h = _random_history(rng, rng.randint(2, 9))
        res = check_register(h)
        if not res.ok or res.order is None:
            continue
        checked += 1
        assert sorted(map(id, res.order)) == sorted(map(id, h))
        value = None
        for op in res.order:
            if op.kind == "write":
                value = op.value
            elif op.kind == "read":
                assert op.value == value, (op, value)
            else:
                exp, new, succeeded = op.value
                assert succeeded == (value == exp), (op, value)
                if succeeded:
                    value = new
        # real-time precedence respected
        pos = {id(op): i for i, op in enumerate(res.order)}
        for a in h:
            for b in h:
                if a.complete < b.invoke:
                    assert pos[id(a)] < pos[id(b)]
    assert checked > 50


# ---------------------------------------------------------- reorder fuzz

def test_fuzz_reorder_buffer_never_loses_messages():
    """Any (rate, buffer size, traffic) combination: every accepted
    message is eventually delivered exactly once after a flush."""
    rng = random.Random(3)
    for trial in range(40):
        hub = TransportHub(seed=trial)
        peers = [hub.register(f"p{i}") for i in range(3)]
        hub.reorder_probability = rng.random()
        hub.reorder_buffer_size = rng.randint(1, 16)
        sent = []
        for i in range(rng.randint(5, 60)):
            src = rng.randrange(3)
            dst = (src + 1 + rng.randrange(2)) % 3
            if peers[src].send(f"p{dst}", "m", {"i": i}):
                sent.append((dst, i))
        hub.flush_reordered()
        got = []
        for d, p in enumerate(peers):
            while True:
                m = p.recv()
                if m is None:
                    break
                got.append((d, m.payload["i"]))
        assert sorted(got) == sorted(sent), f"trial {trial}"
        assert len(hub._reorder_buf) == 0


# ------------------------------------------------- callback storm fuzz

def test_fuzz_membership_callbacks_report_every_transition():
    """Random gossip merges: the callback stream exactly reproduces
    the observable status changes of the member table."""
    from neumann_tpu.chain.gossip import GossipNode

    statuses = ["alive", "suspect", "faulty"]
    rng = random.Random(5)
    for trial in range(30):
        n = GossipNode("a", ["a", "b", "c", "d"], seed=trial)
        events = []
        n.on_status_change = lambda p, o, s: events.append((p, o, s))
        snapshot = {p: m.status for p, m in n.members.items()}
        for _ in range(60):
            peer = rng.choice(["b", "c", "d"])
            n._merge_membership({peer: {
                "status": rng.choice(statuses),
                "inc": rng.randint(0, 3),
                "v": rng.randint(0, 40)}})
        # replay events over the snapshot -> must land on live state
        for p, old, new in events:
            assert snapshot[p] == old, f"trial {trial}: stale old"
            snapshot[p] = new
        live = {p: m.status for p, m in n.members.items()}
        assert snapshot == live, f"trial {trial}"


# ------------------------------------------------- distinct aggs fuzz

def test_fuzz_distinct_aggregates_random_vs_sqlite():
    import sqlite3

    from neumann_tpu.router import QueryRouter

    rng = np.random.default_rng(9)
    for trial in range(5):
        r = QueryRouter()
        db = sqlite3.connect(":memory:")
        for ex in (r.execute, db.execute):
            ex("CREATE TABLE f (g INT, v FLOAT)")
        for _ in range(int(rng.integers(5, 60))):
            g = int(rng.integers(0, 4))
            v = round(float(rng.integers(0, 6)) * 0.5, 2)
            r.execute(f"INSERT INTO f VALUES ({g}, {v})")
            db.execute(f"INSERT INTO f VALUES ({g}, {v})")
        for q in ["SELECT COUNT(DISTINCT v) FROM f",
                  "SELECT SUM(DISTINCT v) FROM f",
                  "SELECT g, COUNT(DISTINCT v) FROM f GROUP BY g",
                  "SELECT g, AVG(DISTINCT v) FROM f GROUP BY g"]:
            ours = [tuple(row.values()) for row in r.execute(q).rows]
            ref = db.execute(q).fetchall()
            assert len(ours) == len(ref), (trial, q)
            for a, b in zip(ours, ref):
                for x, y in zip(a, b):
                    if isinstance(y, float):
                        assert abs(float(x) - y) < 1e-9, (trial, q, a, b)
                    else:
                        assert x == y, (trial, q, a, b)
        db.close()


# ------------------------------------------------ native materializer

def test_fuzz_rows_from_arrays_vs_python_oracle():
    """Random (names, dtypes, masks, duplicate-name) column sets: the
    C materializer agrees with a pure-Python zip build. Duplicate names
    previously corrupted the run memo (use-after-free)."""
    from neumann_tpu.native import pycodec

    ext = pycodec.load()
    if ext is None or not hasattr(ext, "rows_from_arrays"):
        import pytest

        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(13)
    for trial in range(60):
        n = int(rng.integers(0, 40))
        k = int(rng.integers(1, 7))
        name_pool = ["a", "b", "c", "a.b", "x"]
        names, arrays, masks = [], [], []
        for j in range(k):
            names.append(str(rng.choice(name_pool)))   # dups likely
            t = int(rng.integers(0, 4))
            if t == 0:
                arr = rng.integers(-3, 3, n).astype(np.int64)
            elif t == 1:
                # runs of repeats exercise the memo path
                arr = np.repeat(
                    rng.standard_normal(max(1, n // 3 + 1)),
                    3)[:n].astype(np.float64)
            elif t == 2:
                arr = rng.integers(0, 2, n).astype(bool)
            else:
                arr = np.array(
                    [str(x) for x in rng.integers(0, 5, n)],
                    dtype=object)
            arrays.append(arr)
            if rng.random() < 0.4 and n:
                m = rng.integers(0, 2, n).astype(bool)
                masks.append(m if m.any() else None)
            else:
                masks.append(None)
        got = ext.rows_from_arrays(tuple(names), arrays, masks)
        want = []
        for i in range(n):
            rec = {}
            for name, arr, m in zip(names, arrays, masks):
                v = None if (m is not None and m[i]) else arr[i]
                if isinstance(v, np.generic):
                    v = v.item()
                rec[name] = v
            want.append(rec)
        assert got == want, f"trial {trial}"


# ------------------------------------------------------ REST dispatch

def test_fuzz_rest_garbage_never_500s():
    """Random methods, paths, and bodies: client garbage maps to
    4xx (or succeeds), never a 500 — internal errors are reserved for
    genuine server bugs."""
    import json
    import urllib.error
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    rest = RestServer()
    rest.serve()
    base = f"http://127.0.0.1:{rest.port}"
    rng = random.Random(17)
    segs = ["collections", "points", "query", "scroll", "good", "%00",
            "..", "a" * 200, "ünï", "delete", "get", "zzz", ""]
    bodies = [b"", b"{not json", b"null", b"[]", b'{"points": 1}',
              b'{"points": [{}]}', b'{"vector": "nope"}',
              b'{"limit": "x"}', b'{"filter": {"bad": []}}',
              b'{"vectors": {"size": -1}}', b"\xff\xfe\x00",
              json.dumps({"points": [{"id": 1, "vector": []}]}).encode()]
    try:
        urllib.request.urlopen(
            urllib.request.Request(
                base + "/collections/good",
                data=json.dumps({"dimension": 2}).encode(),
                method="PUT",
                headers={"Content-Type": "application/json"}),
            timeout=5).read()
        hot_paths = ["/collections/good/points",
                     "/collections/good/points/query",
                     "/collections/good/points/scroll",
                     "/collections/good/points/delete",
                     "/collections/good/points/get",
                     "/collections/good"]
        fives = []
        for trial in range(250):
            if trial % 2:
                # half the budget hammers the REAL handlers, where
                # malformed bodies used to KeyError into 500s
                path = rng.choice(hot_paths)
            else:
                path = "/" + "/".join(
                    rng.choice(segs)
                    for _ in range(rng.randint(1, 4)))
            method = rng.choice(["GET", "PUT", "POST", "DELETE"])
            body = rng.choice(bodies) if method in ("PUT", "POST") \
                else None
            req = urllib.request.Request(
                base + urllib.parse.quote(path), data=body,
                method=method)
            if body is not None:
                req.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(req, timeout=5) as resp:
                    code = resp.status
                    resp.read()
            except urllib.error.HTTPError as e:
                code = e.code
                e.read()
            if code >= 500:
                fives.append((method, path, body, code))
        assert not fives, fives[:5]
    finally:
        rest.stop()
