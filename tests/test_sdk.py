"""SDK parity tests: transactions, retry, asyncio client, numpy/pandas
integrations (mirrors neumann-py's test suite shape).
"""

import asyncio

import numpy as np
import pytest

from neumann_tpu.server import (
    NeumannClient,
    NeumannServer,
    RetryConfig,
    Transaction,
)
from neumann_tpu.utils.errors import NeumannError


@pytest.fixture
def srv():
    s = NeumannServer(port=0)
    s.serve()
    yield s
    s.stop()


@pytest.fixture
def cli(srv):
    c = NeumannClient.connect(f"127.0.0.1:{srv.port}")
    yield c
    c.close()


# ------------------------------------------------------------ transactions

def test_transaction_commit(cli):
    with cli.transaction() as tx:
        tx.execute("EMBED STORE 'tx1' [1.0, 0.0]")
    h = cli.execute("CHAIN HEIGHT")
    assert h.count == 1
    assert cli.execute("SIMILAR 'tx1' TOP 1").hits[0]["key"] == "tx1"


def test_transaction_rollback_on_error(cli):
    with pytest.raises(RuntimeError):
        with cli.transaction() as tx:
            tx.execute("EMBED STORE 'tx2' [1.0, 0.0]")
            raise RuntimeError("boom")
    assert cli.execute("CHAIN HEIGHT").count == 0


def test_transaction_state_machine(cli):
    tx = cli.transaction()
    with pytest.raises(NeumannError):
        tx.execute("SELECT 1")          # not begun
    tx.begin()
    with pytest.raises(NeumannError):
        tx.begin()                      # double begin
    tx.rollback()
    assert not tx.is_active
    with pytest.raises(NeumannError):
        tx.commit()


def test_embedded_transaction():
    cli = NeumannClient.embedded()
    with cli.transaction() as tx:
        tx.execute("EMBED STORE 'e' [0.5, 0.5]")
    assert cli.execute("CHAIN HEIGHT").count == 1


# ------------------------------------------------------------------ retry

def test_retry_backoff_and_give_up():
    from neumann_tpu.server.retry import backoff_delay, retry_call

    class Transient(Exception):
        def code(self):
            class C:
                name = "UNAVAILABLE"
            return C()

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise Transient()
        return "ok"

    cfg = RetryConfig(max_retries=5, initial_backoff_s=0.001)
    assert retry_call(flaky, cfg) == "ok"
    assert len(calls) == 3

    # non-retryable errors propagate immediately
    def bad():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        retry_call(bad, cfg)
    # backoff is exponential and capped
    d0 = backoff_delay(0, RetryConfig(jitter=0.0))
    d3 = backoff_delay(3, RetryConfig(jitter=0.0))
    assert d3 == pytest.approx(d0 * 8)
    assert backoff_delay(99, RetryConfig(jitter=0.0)) == 5.0


# ------------------------------------------------------------------- aio

def test_async_client(srv):
    from neumann_tpu.server.aio import AsyncNeumannClient

    async def main():
        async with AsyncNeumannClient.connect(
                f"127.0.0.1:{srv.port}") as cli:
            r = await cli.execute("CREATE TABLE a (x INT)")
            assert "created" in r.message
            await cli.execute("INSERT INTO a VALUES (1), (2)")
            rs = await cli.execute_batch(
                ["SELECT * FROM a", "SELECT COUNT(*) FROM a"])
            assert len(rs) == 2 and rs[1].rows[0]["count(*)"] == 2
            h = await cli.health()
            assert h["ok"]
            chunks = []
            async for c in cli.execute_stream("SELECT * FROM a"):
                chunks.append(c)
            assert sum(len(c.rows) for c in chunks) == 2
            async with cli.transaction() as tx:
                await tx.execute("EMBED STORE 'ak' [1.0]")
            hh = await cli.execute("CHAIN HEIGHT")
            assert hh.count == 1
            with pytest.raises(NeumannError):
                await cli.execute("SELECT * FROM missing_table")

    asyncio.run(main())


# ----------------------------------------------------------- integrations

def test_numpy_integration():
    from neumann_tpu.server.integrations import (
        cosine_similarity, euclidean_distance, normalize_vectors,
        parse_embedding, vector_to_insert, vectors_to_inserts)

    stmt = vector_to_insert("k", np.array([0.25, 0.5]), "col")
    assert stmt == "EMBED STORE 'k' [0.25, 0.5] IN col"
    cli = NeumannClient.embedded()
    cli.execute(stmt)                      # round-trips through parser
    stmts = vectors_to_inserts(["a", "b"], np.eye(2))
    assert len(stmts) == 2
    v = parse_embedding("[0.1, 0.2, 0.3]")
    assert v.shape == (3,) and v.dtype == np.float32
    with pytest.raises(NeumannError):
        parse_embedding("0.1, 0.2")
    assert cosine_similarity([1, 0], [1, 0]) == pytest.approx(1.0)
    assert cosine_similarity([1, 0], [0, 0]) == 0.0
    assert euclidean_distance([0, 0], [3, 4]) == pytest.approx(5.0)
    n = normalize_vectors([[3.0, 4.0], [0.0, 0.0]])
    assert np.allclose(np.linalg.norm(n[0]), 1.0) and not n[1].any()


def test_pandas_integration():
    pd = pytest.importorskip("pandas")
    from neumann_tpu.server.integrations import (
        dataframe_to_inserts, result_to_dataframe)

    cli = NeumannClient.embedded()
    cli.execute("CREATE TABLE people (name TEXT, age INT)")
    df = pd.DataFrame([{"name": "a'b", "age": 3},
                       {"name": "c", "age": None}])
    for stmt in dataframe_to_inserts(df, "people"):
        cli.execute(stmt)
    res = cli.execute("SELECT name, age FROM people ORDER BY name")
    out = result_to_dataframe(res)
    assert list(out["name"]) == ["a'b", "c"]
    assert out["age"].tolist()[0] == 3
