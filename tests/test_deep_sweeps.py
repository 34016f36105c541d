"""Deep assurance sweeps — the long-running versions of the chaos and
model-checking tiers, gated behind NEUMANN_DEEP=1 (the nightly stress
workflow sets it; the PR-gated suite skips them). Each sweep here was
first run ad hoc during round 2 and came back clean; this module makes
those runs reproducible."""

import os

import pytest

deep = pytest.mark.skipif(os.environ.get("NEUMANN_DEEP") != "1",
                          reason="set NEUMANN_DEEP=1 for deep sweeps")


@deep
def test_deep_dst_100_seeds_with_reordering():
    from neumann_tpu.chain.dst import DSTHarness, FaultAction

    bad = []
    for seed in range(100):
        h = DSTHarness(n_nodes=5, seed=seed)
        res = h.run(ticks=500, faults=[
            FaultAction(at_tick=30, kind="reorder_rate", rate=0.3),
            FaultAction(at_tick=100, kind="drop_rate", rate=0.1),
            FaultAction(at_tick=200, kind="partition",
                        groups=[{"n0", "n1", "n2"}, {"n3", "n4"}]),
            FaultAction(at_tick=330, kind="heal"),
            FaultAction(at_tick=340, kind="reorder_rate", rate=0.15),
            FaultAction(at_tick=440, kind="heal"),
        ])
        if not res.ok:
            bad.append((seed, res.violations))
    assert not bad, bad[:3]


@deep
def test_deep_jepsen_60_seeds_cas_multikey():
    from neumann_tpu.chain.dst import FaultAction
    from neumann_tpu.chain.jepsen import JepsenHarness

    bad = []
    for seed in range(60):
        h = JepsenHarness(5, seed=seed, n_keys=3)
        res = h.run(ticks=450, write_every=5, read_every=4,
                    cas_every=9, nemesis=[
                        FaultAction(at_tick=50, kind="reorder_rate",
                                    rate=0.2),
                        FaultAction(at_tick=130, kind="partition",
                                    groups=[{"n0", "n1", "n2"},
                                            {"n3", "n4"}]),
                        FaultAction(at_tick=250, kind="heal"),
                        FaultAction(at_tick=270, kind="drop_rate",
                                    rate=0.08),
                        FaultAction(at_tick=380, kind="heal"),
                    ])
        if not res.ok:
            bad.append((seed, res.check.reason))
    assert not bad, bad[:3]


@deep
def test_deep_model_check_bounds():
    from neumann_tpu.chain.model_check import (
        check_membership,
        check_raft,
        check_two_phase,
    )

    # bounds sized for the nightly job's budget (the Python BFS
    # explores ~8K states/min); deeper ad-hoc runs are documented in
    # COVERAGE.md
    for fn, kw in [(check_raft, dict(n_nodes=2, max_states=40_000)),
                   (check_raft, dict(n_nodes=3, max_states=40_000)),
                   (check_two_phase,
                    dict(n_parts=2, max_states=50_000)),
                   (check_two_phase,
                    dict(n_parts=3, max_states=50_000)),
                   (check_membership,
                    dict(n_nodes=3, max_states=40_000))]:
        r = fn(**kw)
        assert r.ok, (fn.__name__, kw, r.violation)


@deep
def test_deep_covfuzz_targets_100k():
    import struct

    from neumann_tpu.store import codec
    from neumann_tpu.store.tensor_store import TensorData
    from neumann_tpu.utils import covfuzz
    from neumann_tpu.utils.errors import NeumannError

    blob = codec.encode_data(TensorData.with_values(v=1.5))
    wal_seed = bytes([0]) + struct.pack("<I", 6) + b"user:1" + blob
    runs = [
        (covfuzz.target_parser,
         [b"SELECT COUNT(DISTINCT g) FROM t"], (NeumannError,)),
        (covfuzz.target_cypher,
         [b"MATCH (a)-[:R*1..2]->(b) RETURN COUNT(b)"],
         (NeumannError,)),
        (covfuzz.target_wal_record, [wal_seed], (NeumannError,)),
        (covfuzz.target_varint, [b"\x96\x01\x7f"], (ValueError,)),
        (covfuzz.target_rle, [b"\x03a\x02b"], (ValueError,)),
        (covfuzz.target_grpc_web_frames,
         [b"\x00\x00\x00\x00\x03abc\x80\x00\x00\x00\x00"],
         (ValueError,)),
        (covfuzz.target_sparse,
         [struct.pack("<8f", *([0.0, 1.5, 0.0, -2.0] * 2))],
         (NeumannError, ValueError)),
    ]
    for fn, seeds, allowed in runs:
        stats = covfuzz.fuzz(fn, seeds, allowed, max_execs=100_000,
                             seed=7)
        assert not stats.findings, (fn.__name__,
                                    stats.findings[:2])
