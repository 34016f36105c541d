"""Fuzz-style robustness tests (reference: 139 libFuzzer targets).

No fuzzing engine ships in this image, so these are seeded random-input
sweeps asserting the *never crash* property: hostile bytes/strings may
only raise the module's typed errors, never arbitrary exceptions.
"""

import numpy as np
import pytest

from neumann_tpu.compress import codecs
from neumann_tpu.lang.lexer import tokenize
from neumann_tpu.lang.parser import parse
from neumann_tpu.store import codec as store_codec
from neumann_tpu.store.tensor_store import TensorData
from neumann_tpu.store.wal import TensorWal
from neumann_tpu.utils.errors import NeumannError, ParseError, StoreError


def test_parser_never_crashes_on_garbage(rng):
    corpus = [
        "", ";", "SELECT", "SELECT *", "SELECT * FROM", "(((((",
        "NODE CREATE { }", "SIMILAR", "EMBED STORE", "'" , "[1,",
        "CREATE TABLE t (", "MATCH (", "INSERT INTO t VALUES",
        "VAULT", "BLOB PUT", "CHAIN", "GRAPH", "PATH 1 TO",
        "SELECT * FROM t WHERE", "ENTITY CONNECT 'a' ->",
    ]
    # plus random printable garbage
    chars = np.array(list(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghij()[]{}'\",.;:<>=!*-+/ 0123456789_"))
    for i in range(300):
        n = int(rng.integers(1, 60))
        corpus.append("".join(rng.choice(chars, n)))
    for q in corpus:
        try:
            parse(q)
        except ParseError:
            pass  # the only acceptable failure


def test_lexer_never_crashes(rng):
    for i in range(200):
        raw = bytes(rng.integers(32, 127, int(rng.integers(1, 80)),
                                 dtype=np.uint8)).decode("ascii")
        try:
            tokenize(raw)
        except ParseError:
            pass


def test_router_never_crashes_on_garbage(rng):
    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    statements = [
        "MATCH (a DELETE a", "MERGE", "SELECT COUNT( FROM t",
        "SIMILAR [] TOP 0", "EMBED STORE 'k' []",
        "NODE GET 'not-an-int'", "PATH SHORTEST 'x' TO 'y'",
        "GRAPH PATTERN MATCH (", "CHECKPOINT 'x'",
        "BLOBS WHERE TYPE =", "CACHE SEMANTIC",
    ]
    for q in statements:
        try:
            r.execute(q)
        except NeumannError:
            pass  # typed errors only
        except (ValueError, TypeError) as e:
            pytest.fail(f"{q!r} leaked {type(e).__name__}: {e}")


def test_store_codec_never_crashes_on_random_bytes(rng):
    for i in range(300):
        buf = bytes(rng.integers(0, 256, int(rng.integers(0, 120)),
                                 dtype=np.uint8))
        try:
            store_codec.decode_data(buf)
        except StoreError:
            pass
        except (UnicodeDecodeError, ValueError):
            pass  # string fields may carry invalid utf-8/lengths


def test_store_codec_roundtrip_random(rng):
    from neumann_tpu.store.sparse import SparseVector
    from neumann_tpu.store.tensor_store import TensorValue

    for i in range(100):
        td = TensorData()
        for f in range(int(rng.integers(0, 6))):
            kind = int(rng.integers(0, 5))
            name = f"f{f}"
            if kind == 0:
                td.set(name, TensorValue.scalar(int(rng.integers(-1e9, 1e9))))
            elif kind == 1:
                td.set(name, TensorValue.scalar(float(rng.standard_normal())))
            elif kind == 2:
                n = int(rng.integers(0, 20))
                td.set(name, TensorValue.scalar(
                    bytes(rng.integers(0, 256, n, dtype=np.uint8))))
            elif kind == 3:
                td.set(name, TensorValue.vector(
                    rng.standard_normal(int(rng.integers(1, 32)))))
            else:
                dense = rng.standard_normal(16)
                dense[rng.random(16) < 0.7] = 0
                td.set(name, TensorValue.sparse(
                    SparseVector.from_dense(dense)))
        back = store_codec.decode_data(store_codec.encode_data(td))
        assert set(back.fields) == set(td.fields)


def test_wal_replay_never_crashes_on_corruption(tmp_path, rng):
    path = tmp_path / "wal.log"
    wal = TensorWal(path, sync_mode="immediate")
    for i in range(10):
        wal.log_put(f"k:{i}", TensorData.with_values(v=i))
    wal.close()
    blob = bytearray(path.read_bytes())
    for trial in range(50):
        corrupted = bytearray(blob)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(corrupted)))
            corrupted[pos] = int(rng.integers(0, 256))
        p2 = tmp_path / f"c{trial}.log"
        p2.write_bytes(bytes(corrupted))
        try:
            ops = list(TensorWal.replay(p2))
            assert len(ops) <= 10
        except (StoreError, UnicodeDecodeError):
            pass  # typed/decoding failure is acceptable; crashes are not


def test_varint_rle_never_crash_on_random(rng):
    for i in range(200):
        buf = bytes(rng.integers(0, 256, int(rng.integers(0, 60)),
                                 dtype=np.uint8))
        try:
            codecs.varint_decode(buf)
        except ValueError:
            pass
        try:
            codecs.rle_decode(buf)
        except ValueError:
            pass
        try:
            codecs.delta_decode_ids(buf)
        except ValueError:
            pass
