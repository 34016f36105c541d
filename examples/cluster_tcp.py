"""Three-process Raft cluster over compressed TCP.

Each node is a separate OS process running the sans-IO RaftNode pumped
by a TcpTransport (deflate-compressed frames). The cluster elects a
leader, replicates a batch of entries, and every node prints what it
committed. Run:

    python examples/cluster_tcp.py

For TLS between nodes, issue certs with vault.pki.PkiEngine and pass
make_tls_contexts(cert, key, ca_pem=ca) into TcpTransport — see
tests/test_extended_modules.py::test_pki_issued_cert_works_for_tls_transport.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

BASE_PORT = 7841
NODES = {"n0": BASE_PORT, "n1": BASE_PORT + 1, "n2": BASE_PORT + 2}


def run_node(node_id: str, results) -> None:
    from neumann_tpu.chain.raft import RaftConfig, RaftNode
    from neumann_tpu.chain.transport import TcpTransport

    tr = TcpTransport(node_id, port=NODES[node_id], compress=True,
                      compress_min=128)
    node = RaftNode(node_id, list(NODES), RaftConfig(
        election_timeout_min=3, election_timeout_max=6),
        seed=int(node_id[1]))
    for peer, port in NODES.items():
        if peer == node_id:
            continue
        for _ in range(100):
            try:
                tr.connect(peer, ("127.0.0.1", port))
                break
            except OSError:
                time.sleep(0.1)

    committed = []
    proposed = 0
    deadline = time.time() + 20
    while time.time() < deadline and len(committed) < 5:
        for m in node.tick():
            tr.send(m.dst, m.kind, m.payload)
        for _ in range(50):
            msg = tr.recv(timeout=0.01)
            if msg is None:
                break
            for m in node.handle(msg):
                tr.send(m.dst, m.kind, m.payload)
        if node.state == "leader" and proposed < 5:
            node.propose({"seq": proposed, "from": node_id})
            proposed += 1
        committed += [p for _, p in node.take_committed()
                      if "noop" not in p]
    # keep pumping briefly so followers see the final commit index
    t_end = time.time() + 1.0
    while time.time() < t_end:
        for m in node.tick():
            tr.send(m.dst, m.kind, m.payload)
        msg = tr.recv(timeout=0.02)
        if msg is not None:
            for m in node.handle(msg):
                tr.send(m.dst, m.kind, m.payload)
        committed += [p for _, p in node.take_committed()
                      if "noop" not in p]
    results[node_id] = json.dumps(
        {"role": node.state, "term": node.term,
         "committed": committed})
    tr.close()


def main() -> None:
    mp.set_start_method("spawn", force=True)
    with mp.Manager() as mgr:
        results = mgr.dict()
        procs = [mp.Process(target=run_node, args=(nid, results))
                 for nid in NODES]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=60)
        print("three-process Raft over compressed TCP:")
        agreed = None
        for nid in sorted(NODES):
            info = json.loads(results.get(nid, "{}"))
            seq = [c["seq"] for c in info.get("committed", [])]
            print(f"  {nid}: {info.get('role', '?'):9s} "
                  f"term={info.get('term')} committed_seqs={seq}")
            if seq:
                assert agreed is None or seq == agreed[: len(seq)] \
                    or agreed == seq[: len(agreed)], "divergence!"
                if agreed is None or len(seq) > len(agreed):
                    agreed = seq
        print(f"  agreement on {len(agreed or [])} entries ✓")


if __name__ == "__main__":
    main()
