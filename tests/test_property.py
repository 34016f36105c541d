"""Property-based tests (hypothesis) — the reference's proptest tier
(tensor_chain/tests/proptest_{raft,2pc}.rs + committed regressions).

Shrinking finds minimal counterexamples the seeded fuzzers would
describe verbosely; deadline=None because the native codec builds
lazily on first use."""

import string

import numpy as np
from hypothesis import given, settings, strategies as st

from neumann_tpu.store import codec
from neumann_tpu.store.sparse import SparseVector
from neumann_tpu.store.tensor_store import TensorData, TensorValue

# -- strategies -------------------------------------------------------------

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-2**62, max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)

_field_names = st.text(
    alphabet=string.ascii_letters + string.digits + "_:./-",
    min_size=1, max_size=24)


@st.composite
def tensor_values(draw):
    kind = draw(st.sampled_from(["scalar", "vector", "sparse",
                                 "pointer", "pointers"]))
    if kind == "scalar":
        return TensorValue.scalar(draw(_scalars))
    if kind == "vector":
        n = draw(st.integers(0, 32))
        vals = draw(st.lists(
            st.floats(allow_nan=False, allow_infinity=False,
                      width=32), min_size=n, max_size=n))
        return TensorValue.vector(np.asarray(vals, np.float32))
    if kind == "sparse":
        dim = draw(st.integers(1, 48))
        nnz = draw(st.integers(0, dim))
        pos = sorted(draw(st.sets(st.integers(0, dim - 1),
                                  min_size=nnz, max_size=nnz)))
        vals = draw(st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                      width=32), min_size=len(pos),
            max_size=len(pos)))
        return TensorValue.sparse(SparseVector(
            np.asarray(pos, np.int32), np.asarray(vals, np.float32),
            dim))
    if kind == "pointer":
        return TensorValue.pointer(draw(_field_names))
    return TensorValue.pointers(draw(st.lists(_field_names,
                                              max_size=5)))


@st.composite
def tensor_datas(draw):
    td = TensorData()
    for name in draw(st.lists(_field_names, max_size=5,
                              unique=True)):
        td.set(name, draw(tensor_values()))
    return td


def _eq_value(a: TensorValue, b: TensorValue) -> bool:
    if a.kind != b.kind:
        return False
    if a.kind == "vector":
        return np.array_equal(np.asarray(a.value), np.asarray(b.value))
    if a.kind == "sparse":
        return (a.value.dim == b.value.dim
                and np.array_equal(a.value.positions, b.value.positions)
                and np.array_equal(a.value.values, b.value.values))
    return a.value == b.value


def _eq_data(a: TensorData, b: TensorData) -> bool:
    if set(a.fields) != set(b.fields):
        return False
    return all(_eq_value(a.fields[k], b.fields[k]) for k in a.fields)


# -- codec ------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(tensor_datas())
def test_codec_roundtrip(td):
    blob = codec.encode_data(td)
    back = codec.decode_data(blob)
    assert _eq_data(td, back)


@settings(max_examples=80, deadline=None)
@given(tensor_datas())
def test_native_and_python_codec_agree(td):
    """Both implementations produce the identical byte stream."""
    ext = codec._native()
    if ext is None:
        return
    py = bytearray()
    py += codec._U32.pack(len(td.fields))
    for name, value in td.fields.items():
        codec._pack_str(py, name)
        codec.encode_value(py, value)
    assert bytes(ext.encode_data(td)) == bytes(py)


# -- WAL --------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["put", "delete"]), _field_names, tensor_datas()),
    max_size=12))
def test_wal_roundtrip_property(tmp_path_factory, ops):
    from neumann_tpu.store.wal import TensorWal

    p = tmp_path_factory.mktemp("walprop") / "w.log"
    w = TensorWal(p, sync_mode="manual")
    for op, key, td in ops:
        if op == "put":
            w.log_put(key, td)
        else:
            w.log_delete(key)
    w.flush()
    w.close()
    got = list(TensorWal.replay(p))
    assert len(got) == len(ops)
    for (op, key, td), (gop, gkey, gtd) in zip(ops, got):
        assert gop == op and gkey == key
        if op == "put":
            assert _eq_data(td, gtd)


# -- parameterized parse ----------------------------------------------------

@settings(max_examples=120, deadline=None)
@given(st.integers(-10**9, 10**9), st.integers(-10**9, 10**9),
       st.text(alphabet=string.ascii_letters + " _", max_size=16),
       st.floats(min_value=-1e9, max_value=1e9, allow_nan=False,
                 allow_infinity=False))
def test_parse_param_matches_parse(a, b, s, f):
    from neumann_tpu.lang.parser import parse, parse_param

    stmts = [
        f"INSERT INTO t VALUES ({a}, '{s}', {f!r})",
        f"SELECT * FROM t WHERE x = {a} AND y != {b} LIMIT 5",
        f"UPDATE t SET v = {f!r} WHERE id = {a}",
    ]
    for src in stmts:
        try:
            want = repr(parse(src))
        except Exception:
            continue
        assert repr(parse_param(src)) == want, src
        assert repr(parse_param(src)) == want, src   # templated pass


# -- sparse vs dense oracle -------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.integers(1, 40), st.data())
def test_sparse_ops_match_dense(dim, data):
    dense_a = np.asarray(data.draw(st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  width=32), min_size=dim, max_size=dim)), np.float32)
    dense_b = np.asarray(data.draw(st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  width=32), min_size=dim, max_size=dim)), np.float32)
    sa = SparseVector.from_dense(dense_a)
    sb = SparseVector.from_dense(dense_b)
    assert np.allclose(sa.to_dense(), dense_a, atol=1e-5)
    want = float(dense_a.astype(np.float64)
                 @ dense_b.astype(np.float64))
    assert abs(sa.dot(sb) - want) <= 1e-3 + 1e-5 * abs(want)


# -- raft invariants under random vote/append storms ------------------------

@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_raft_storm_invariants(seed):
    import random as _random

    from neumann_tpu.chain.raft import RaftConfig, RaftNode
    from neumann_tpu.chain.transport import Message

    rng = _random.Random(seed)
    ids = ["n0", "n1", "n2"]
    nodes = {i: RaftNode(i, ids, RaftConfig(), seed=seed)
             for i in ids}
    pending = []
    for _ in range(120):
        act = rng.random()
        if act < 0.45 and pending:
            m = pending.pop(rng.randrange(len(pending)))
            if m.dst in nodes:
                pending += nodes[m.dst].handle(m)
        elif act < 0.6 and pending:
            pending.pop(rng.randrange(len(pending)))   # drop
        else:
            nid = rng.choice(ids)
            pending += nodes[nid].tick()
            if nodes[nid].state == "leader" and rng.random() < 0.4:
                nodes[nid].propose({"v": rng.randrange(100)})
        # I1: one leader per term
        leaders = {}
        for n in nodes.values():
            if n.state == "leader":
                assert leaders.setdefault(n.term, n.id) == n.id
        # I3: committed prefixes agree
        ns = list(nodes.values())
        for x in ns:
            for y in ns:
                upto = min(x.commit_index, y.commit_index)
                for idx in range(1, upto + 1):
                    tx, ty = x.term_at(idx), y.term_at(idx)
                    assert tx is None or ty is None or tx == ty
