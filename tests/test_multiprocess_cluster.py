"""Multiprocess Jepsen-style chaos: real OS processes, SIGKILL, restart.

The reference escalates its consensus testing in-process -> multiprocess
-> docker (integration_tests/src/process_jepsen.rs). This is the
multiprocess tier for TcpClusterNode: three `neumann-tpu-node` processes
over real sockets, a client workload of acknowledged inserts, the leader
killed with SIGKILL mid-workload, and the invariant that every
ACKNOWLEDGED write survives on the remaining replicas. The killed node
then restarts from its WAL dir and must catch back up.
"""

import os
import re
import signal
import socket
import subprocess
import sys
import threading
import time


from neumann_tpu.chain.node import ClusterClient
from neumann_tpu.utils.errors import ChainError


def _free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    try:
        for s in socks:
            s.bind(("127.0.0.1", 0))
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        return [s.getsockname()[1] for s in socks]
    finally:
        for s in socks:
            s.close()


class _Node:
    def __init__(self, nid, port, peers, wal_dir):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = "/root/repo"
        env.pop("XLA_FLAGS", None)
        self.nid = nid
        self.port = port
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "neumann_tpu.chain.node",
             "--id", nid, "--port", str(port), "--peers", peers,
             "--wal-dir", wal_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        self.lines = []
        self._t = threading.Thread(target=self._pump, daemon=True)
        self._t.start()

    def _pump(self):
        for line in self.proc.stdout:
            self.lines.append(line)

    def state(self):
        for line in reversed(self.lines):
            m = re.search(r"state=(\w+)", line)
            if m:
                return m.group(1)
        return None

    def store_len(self):
        for line in reversed(self.lines):
            m = re.search(r"store=(\d+)", line)
            if m:
                return int(m.group(1))
        return -1

    def kill(self):
        self.proc.send_signal(signal.SIGKILL)
        self.proc.wait(timeout=10)

    def stop(self):
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.proc.kill()


def _insert_with_retry(addr_pool, stmt, deadline_s=30.0):
    """Execute against any live node, retrying across nodes until acked.
    Returns True only for an acknowledged (committed) write."""
    deadline = time.time() + deadline_s
    last = None
    while time.time() < deadline:
        for addr in addr_pool:
            try:
                c = ClusterClient(addr)
                try:
                    c.execute(stmt, timeout=5.0)
                    return True
                finally:
                    c.close()
            except (ChainError, OSError) as e:
                last = e
                time.sleep(0.3)
    raise AssertionError(f"write never acked: {last}")



def test_multiprocess_leader_kill_and_rejoin(tmp_path):
    ports = _free_ports(3)
    ids = ["n0", "n1", "n2"]
    peer_str = {nid: ",".join(f"{p}=127.0.0.1:{ports[j]}"
                              for j, p in enumerate(ids) if p != nid)
                for nid in ids}
    nodes = {nid: _Node(nid, ports[i], peer_str[nid],
                        str(tmp_path / nid))
             for i, nid in enumerate(ids)}
    addrs = {nid: ("127.0.0.1", ports[i]) for i, nid in enumerate(ids)}
    try:
        # wait for a leader
        deadline = time.time() + 60
        leader_id = None
        while time.time() < deadline and leader_id is None:
            for nid, n in nodes.items():
                assert n.proc.poll() is None, (
                    f"{nid} died at startup:\n" + "".join(n.lines[-20:]))
                if n.state() == "leader":
                    leader_id = nid
            time.sleep(0.3)
        assert leader_id, "no leader elected"

        pool = list(addrs.values())
        _insert_with_retry(pool, "CREATE TABLE j (id INT)")
        acked = []
        for i in range(8):
            _insert_with_retry(pool, f"INSERT INTO j VALUES ({i})")
            acked.append(i)

        # -- nemesis: SIGKILL the current leader mid-workload ----------
        nodes[leader_id].kill()
        survivors = [nid for nid in ids if nid != leader_id]
        pool = [addrs[nid] for nid in survivors]
        for i in range(8, 16):
            _insert_with_retry(pool, f"INSERT INTO j VALUES ({i})",
                               deadline_s=60.0)
            acked.append(i)

        # every acknowledged write is on every survivor
        def rows_on(addr):
            c = ClusterClient(addr)
            try:
                return sorted(r["id"] for r in
                              c.execute("SELECT * FROM j")["rows"])
            finally:
                c.close()

        deadline = time.time() + 30
        while time.time() < deadline:
            got = [rows_on(addrs[nid]) for nid in survivors]
            if all(g == acked for g in got):
                break
            time.sleep(0.5)
        got = {nid: rows_on(addrs[nid]) for nid in survivors}
        for nid, g in got.items():
            assert g == acked, f"{nid} lost acknowledged writes: {g}"

        # -- the killed node restarts from its WAL dir and catches up --
        nodes[leader_id + "r"] = _Node(
            leader_id, ports[ids.index(leader_id)],
            peer_str[leader_id], str(tmp_path / leader_id))
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if rows_on(addrs[leader_id]) == acked:
                    break
            except (ChainError, OSError, AssertionError):
                pass
            time.sleep(1.0)
        assert rows_on(addrs[leader_id]) == acked, \
            "restarted node did not converge"
    finally:
        for n in nodes.values():
            n.stop()


def test_multiprocess_follower_sigkill_and_restart(tmp_path):
    """SIGKILL a FOLLOWER mid-workload; its raft WAL must bring it back
    with its vote/log intact (no double-vote => still exactly one
    leader), and it must converge on all acknowledged writes."""
    ports = _free_ports(3)
    ids = ["f0", "f1", "f2"]
    peer_str = {nid: ",".join(f"{p}=127.0.0.1:{ports[j]}"
                              for j, p in enumerate(ids) if p != nid)
                for nid in ids}
    nodes = {nid: _Node(nid, ports[i], peer_str[nid],
                        str(tmp_path / nid))
             for i, nid in enumerate(ids)}
    addrs = {nid: ("127.0.0.1", ports[i]) for i, nid in enumerate(ids)}
    try:
        deadline = time.time() + 60
        leader_id = None
        while time.time() < deadline and leader_id is None:
            for nid, n in nodes.items():
                assert n.proc.poll() is None, (
                    f"{nid} died at startup:\n" + "".join(n.lines[-20:]))
                if n.state() == "leader":
                    leader_id = nid
            time.sleep(0.3)
        assert leader_id, "no leader elected"
        follower_id = next(nid for nid in ids if nid != leader_id)

        pool = list(addrs.values())
        _insert_with_retry(pool, "CREATE TABLE fj (id INT)")
        acked = []
        for i in range(6):
            _insert_with_retry(pool, f"INSERT INTO fj VALUES ({i})")
            acked.append(i)

        # -- nemesis: SIGKILL a follower, keep writing on the quorum ---
        nodes[follower_id].kill()
        pool = [addrs[nid] for nid in ids if nid != follower_id]
        for i in range(6, 12):
            _insert_with_retry(pool, f"INSERT INTO fj VALUES ({i})",
                               deadline_s=60.0)
            acked.append(i)

        # -- restart the follower from its WAL dir ---------------------
        nodes[follower_id + "r"] = _Node(
            follower_id, ports[ids.index(follower_id)],
            peer_str[follower_id], str(tmp_path / follower_id))

        def rows_on(addr):
            c = ClusterClient(addr)
            try:
                return sorted(r["id"] for r in
                              c.execute("SELECT * FROM fj")["rows"])
            finally:
                c.close()

        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if rows_on(addrs[follower_id]) == acked:
                    break
            except (ChainError, OSError):
                pass
            time.sleep(1.0)
        assert rows_on(addrs[follower_id]) == acked, \
            "restarted follower did not converge (or double-applied)"
        # exactly one leader in the final cluster (no double-vote
        # split-brain after the restart)
        time.sleep(2.0)
        states = [n.state() for k, n in nodes.items()
                  if n.proc.poll() is None]
        assert states.count("leader") == 1, states
    finally:
        for n in nodes.values():
            n.stop()


def test_multiprocess_gossip_driven_membership(tmp_path):
    """Over real sockets: SIGKILL a follower with --auto-remove-faulty;
    SWIM detection must shrink the Raft config to the 2 survivors, and
    the restarted node must be re-added (learner -> voter) on heal."""
    ports = _free_ports(3)
    ids = ["g0", "g1", "g2"]
    peer_str = {nid: ",".join(f"{p}=127.0.0.1:{ports[j]}"
                              for j, p in enumerate(ids) if p != nid)
                for nid in ids}

    def spawn(nid):
        i = ids.index(nid)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = "/root/repo"
        env.pop("XLA_FLAGS", None)
        n = _Node.__new__(_Node)
        n.nid = nid
        n.port = ports[i]
        n.proc = subprocess.Popen(
            [sys.executable, "-m", "neumann_tpu.chain.node",
             "--id", nid, "--port", str(ports[i]),
             "--peers", peer_str[nid],
             "--wal-dir", str(tmp_path / nid),
             "--auto-remove-faulty", "--faulty-grace-ticks", "20"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        n.lines = []
        n._t = threading.Thread(target=n._pump, daemon=True)
        n._t.start()
        return n

    nodes = {nid: spawn(nid) for nid in ids}

    def voters_of(n):
        for line in reversed(n.lines):
            m = re.search(r"voters=([\w,]+)", line)
            if m:
                return set(m.group(1).split(","))
        return None

    try:
        deadline = time.time() + 60
        leader_id = None
        while time.time() < deadline and leader_id is None:
            for nid, n in nodes.items():
                assert n.proc.poll() is None, "".join(n.lines[-20:])
                if n.state() == "leader":
                    leader_id = nid
            time.sleep(0.3)
        assert leader_id, "no leader elected"
        victim = next(nid for nid in ids if nid != leader_id)
        nodes[victim].kill()

        # SWIM marks the victim faulty; the leader removes it
        deadline = time.time() + 120
        shrunk = False
        while time.time() < deadline and not shrunk:
            for nid in ids:
                if nid == victim:
                    continue
                v = voters_of(nodes[nid])
                if v is not None and victim not in v and len(v) == 2:
                    shrunk = True
            time.sleep(0.5)
        assert shrunk, "faulty voter never removed from the config"

        # heal: restart the victim; it must come back as a voter
        nodes[victim + "r"] = spawn(victim)
        deadline = time.time() + 180
        regrown = False
        while time.time() < deadline and not regrown:
            for key, n in nodes.items():
                if n.proc.poll() is not None:
                    continue
                v = voters_of(n)
                if v is not None and victim in v and len(v) == 3:
                    regrown = True
            time.sleep(0.5)
        assert regrown, "healed node never promoted back to voter"
    finally:
        for n in nodes.values():
            n.stop()
