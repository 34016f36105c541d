"""Coverage-guided fuzzing sessions over the hostile-input surfaces.

These are short in-CI sessions of the libFuzzer-style loop in
utils/covfuzz (the reference runs 139 libFuzzer targets nightly —
SURVEY.md §4.8). Each test asserts zero findings (crashes outside the
target's allowed exception set) and that coverage feedback actually
grew the corpus (i.e. the loop is guided, not blind).
"""

import struct
import zlib

import pytest

from neumann_tpu.utils import covfuzz
from neumann_tpu.utils.errors import NeumannError


def _run(target, seeds, allowed, execs=1500, seconds=8.0):
    stats = covfuzz.fuzz(target, seeds, allowed, max_execs=execs,
                         max_seconds=seconds, seed=1234)
    assert stats.findings == [], stats.findings
    return stats


def test_parser_fuzz():
    seeds = [b"SELECT * FROM t WHERE id > 1",
             b"SIMILAR 'a' TOP 5 CONNECTED TO 'b'",
             b"NODE CREATE person {name: 'x'}",
             b"EMBED 'k' [1.0, 2.0] IN docs",
             b"MATCH (a)-[:KNOWS]->(b) RETURN a",
             b"SELECT COUNT(DISTINCT g), SUM(v) FROM t GROUP BY g",
             b"SELECT COALESCE(NULLIF(a, 0), ROUND(b, 2)) FROM t",
             b"SELECT UPPER(SUBSTR(name, 1, 3)) AS s FROM t"]
    stats = _run(covfuzz.target_parser, seeds, (NeumannError,))
    assert stats.new_coverage_inputs > 0
    assert stats.corpus_size > len(seeds)


def test_cypher_fuzz():
    seeds = [b"MATCH (a:Person)-[:KNOWS*1..3]->(b) WHERE a.x = 1 "
             b"RETURN b LIMIT 3",
             b"CREATE (n:Thing {k: 'v'})",
             b"MERGE (a)-[:R]->(b) DELETE a"]
    _run(covfuzz.target_cypher, seeds, (NeumannError,))


def test_wal_record_fuzz():
    # a well-formed put payload as seed: op + klen + key + data blob
    from neumann_tpu.store import codec
    from neumann_tpu.store.tensor_store import TensorData

    blob = codec.encode_data(TensorData.with_values(v=1.5))
    key = b"user:1"
    seed = bytes([0]) + struct.pack("<I", len(key)) + key + blob
    stats = _run(covfuzz.target_wal_record, [seed, b"\x01" + b"\x00" * 4],
                 (NeumannError,))
    assert stats.new_coverage_inputs > 0


def test_codec_fuzz():
    _run(covfuzz.target_varint, [b"\x96\x01\x7f", b""], (ValueError,))
    _run(covfuzz.target_rle, [b"\x03a\x02b", b""], (ValueError,),
         execs=800)


def test_grpc_web_frame_fuzz():
    good = b"\x00\x00\x00\x00\x03abc\x80\x00\x00\x00\x00"
    _run(covfuzz.target_grpc_web_frames, [good], (ValueError,), execs=800)


def test_sparse_fuzz():
    seeds = [struct.pack("<8f", *([0.0, 1.5, 0.0, -2.0] * 2))]
    _run(covfuzz.target_sparse, seeds, (NeumannError, ValueError),
         execs=600)


def test_fuzzer_detects_real_crashes():
    """The harness itself must catch and report a crash."""
    def buggy(data: bytes) -> None:
        if data.startswith(b"\x00\x01"):
            raise RuntimeError("boom")

    stats = covfuzz.fuzz(buggy, [b"\x00\x00seed"], (ValueError,),
                         max_execs=4000, max_seconds=10.0, seed=7,
                         path_filter="nothing-matches")
    # brute odds of hitting the 2-byte prefix via mutation are high over
    # 4000 runs of bit flips on a seed that is 1 bit away
    assert stats.findings, "fuzzer failed to find a planted crash"
    assert isinstance(stats.findings[0].error, RuntimeError)


def test_wal_decode_rejects_malformed_cleanly():
    """Regression for the fuzzer's first find: CRC-valid but malformed
    records must raise StoreError, not IndexError/struct.error."""
    from neumann_tpu.store.wal import decode_record
    from neumann_tpu.utils.errors import StoreError

    for bad in (b"", b"\x00", b"\x00\xff\xff\xff\xff",
                b"\x02\x00\x00\x00\x00", b"\x00\x04\x00\x00\x00ab"):
        with pytest.raises(StoreError):
            decode_record(bad)


def test_replay_stops_at_corruption(tmp_path):
    """End-to-end: torn/corrupt WAL tails stop replay cleanly."""
    from neumann_tpu.store.tensor_store import TensorData, TensorStore
    from neumann_tpu.store.wal import TensorWal

    path = tmp_path / "w.wal"
    st = TensorStore()
    st.open_durable(path, sync_mode="immediate")
    st.put("a", TensorData.with_values(v=1))
    st.put("b", TensorData.with_values(v=2))
    st.wal_flush()
    raw = path.read_bytes()
    path.write_bytes(raw + b"\x40\x00\x00\x00garbage")  # torn record
    assert [k for _, k, _ in TensorWal.replay(path)] == ["a", "b"]
    # flip a payload byte in record 2: replay keeps only record 1
    pos = 8 + struct.unpack_from("<I", raw, 0)[0]  # start of record 2
    corrupted = bytearray(raw)
    corrupted[pos + 9] ^= 0xFF
    path.write_bytes(bytes(corrupted))
    assert [k for _, k, _ in TensorWal.replay(path)] == ["a"]


def test_covfuzz_round2_targets():
    """Round-2 surfaces under the coverage-guided fuzzer: param parser,
    raft WAL, snapshots, obfuscation, the C++ WAL overlay."""
    import os

    from neumann_tpu.chain.raft_wal import RaftWal
    from neumann_tpu.store import codec, snapshot
    from neumann_tpu.store.tensor_store import TensorData, TensorValue
    from neumann_tpu.utils.errors import StoreError, VaultError

    # seeds: valid artifacts to mutate from
    td = TensorData().set("v", TensorValue.scalar(1))
    snap_seed = snapshot.dumps({"k": td})
    import tempfile

    d = tempfile.mkdtemp()
    w = RaftWal(os.path.join(d, "w"))
    w.save_hard_state(2, "n1")

    class E:
        term, payload = 1, {"v": 1}
    w.append(1, [E()])
    w.sync()
    rwal_seed = open(os.path.join(d, "w"), "rb").read()

    from neumann_tpu.store.wal import TensorWal

    p = os.path.join(d, "tw")
    tw = TensorWal(p, sync_mode="manual")
    tw.log_put("k", td)
    tw.flush()
    tw.close()
    overlay_seed = open(p, "rb").read()

    runs = [
        (covfuzz.target_parse_param,
         [b"INSERT INTO t VALUES (1, 'a')",
          b"SELECT * FROM t WHERE x = 5 LIMIT 2"], (Exception,)),
        (covfuzz.target_raft_wal, [rwal_seed], ()),
        (covfuzz.target_snapshot, [snap_seed], (StoreError,)),
        (covfuzz.target_obfuscation, [b"\x02\x00\x00\x00hi" + b"\0" * 250],
         (VaultError,)),
        (covfuzz.target_wal_overlay, [overlay_seed], (StoreError,)),
    ]
    for target, seeds, allowed in runs:
        stats = covfuzz.fuzz(target, seeds, allowed, max_execs=800,
                             seed=7)
        assert not stats.findings, (target.__name__, stats.findings[:2])
