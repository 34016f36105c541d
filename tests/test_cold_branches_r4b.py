"""Cold-branch coverage push, part 2: vector-engine config/validation
paths, condition-tree serialization, and quantized search branches."""

import numpy as np
import pytest

from neumann_tpu.engines.condition import Condition as C
from neumann_tpu.engines.vector import (
    VectorEngine,
    VectorEngineConfig,
    VectorError,
)


# ------------------------------------------------------------- condition

def test_condition_expr_serialization_roundtrip():
    from neumann_tpu.lang import expr as E

    cond = C("<", expr=(E.Col("a"), E.Bin("+", E.Col("b"), E.Lit(3))))
    d = cond.to_dict()
    back = C.from_dict(d)
    assert back.columns() == {"a", "b"}
    assert back.evaluate_row({"a": 1, "b": 5}) is True
    assert back.evaluate_row({"a": 9, "b": 5}) is False


def test_condition_expr_not_serializable():
    class Weird:
        pass

    cond = C("<", expr=(Weird(), Weird()))
    with pytest.raises(ValueError, match="not serializable"):
        cond.to_dict()


def test_condition_nested_and_or_roundtrip():
    cond = C.cmp("a", ">=", 1).and_(
        C.eq("b", 2).or_(C.eq("c", 3).not_()))
    back = C.from_dict(cond.to_dict())
    assert back.evaluate_row({"a": 1, "b": 9, "c": 4}) is True
    assert back.columns() == {"a", "b", "c"}


def test_condition_in_tuple_roundtrip():
    cond = C.in_("a", [1, 2, 3])
    back = C.from_dict(cond.to_dict())
    assert back.evaluate_row({"a": 2}) is True
    assert back.evaluate_row({"a": 9}) is False


def test_condition_bad_ops():
    with pytest.raises(ValueError, match="bad comparison op"):
        C.cmp("a", "~~", 1)
    cond = C.eq("a", 1)
    object.__setattr__(cond, "op", "banana") if hasattr(
        C, "__dataclass_fields__") else setattr(cond, "op", "banana")
    with pytest.raises(ValueError, match="bad condition op"):
        cond.evaluate_row({"a": 1})


def test_condition_eq_alias():
    # "==" normalizes to "="
    cond = C.cmp("a", "==", 5)
    assert cond.evaluate_row({"a": 5}) is True


def test_condition_type_error_is_false():
    cond = C.cmp("a", "<", 5)
    assert cond.evaluate_row({"a": "not-a-number"}) is False


def test_condition_unresolved_subquery_raises():
    cond = C("exists")
    with pytest.raises(ValueError, match="unresolved subquery"):
        cond.evaluate_row({"a": 1})
    n = 2
    with pytest.raises(ValueError, match="unresolved subquery"):
        cond.evaluate_columnar({"a": np.arange(n)},
                               {"a": np.zeros(n, bool)}, n)


def test_condition_vector_nullfill_and_ops():
    vals = np.array([1.0, 2.0, 0.0, 4.0])
    nulls = np.array([False, False, True, False])
    for op, expect in [("!=", [True, False, False, True]),
                       ("<=", [True, True, False, False]),
                       (">=", [False, True, False, True])]:
        cond = C.cmp("x", op, 2.0)
        out = cond.evaluate_columnar({"x": vals}, {"x": nulls}, 4)
        assert list(out) == expect, (op, list(out))


# ---------------------------------------------------------------- vector

def test_vector_config_presets_and_validation():
    fast = VectorEngineConfig.high_throughput()
    fast.validate()
    lomem = VectorEngineConfig.low_memory()
    assert lomem.max_dimension == 4096
    with pytest.raises(VectorError, match="bad metric"):
        VectorEngineConfig(default_metric="banana").validate()
    with pytest.raises(VectorError, match="sparse_threshold"):
        VectorEngineConfig(sparse_threshold=2.0).validate()
    with pytest.raises(VectorError, match="max_dimension"):
        VectorEngineConfig(max_dimension=0).validate()
    from neumann_tpu.engines.vector import VectorCollectionConfig

    with pytest.raises(VectorError, match="dimension must be positive"):
        VectorCollectionConfig(dimension=-1).validate()
    with pytest.raises(VectorError, match="bad quantization"):
        VectorCollectionConfig(quantization="q7").validate()


@pytest.fixture()
def eng():
    e = VectorEngine()
    e.config.mesh_auto = False
    return e


def test_vector_dimension_mismatch_errors(eng):
    from neumann_tpu.engines.vector import VectorCollectionConfig

    for i in range(4):
        eng.store_embedding(f"k{i}", np.eye(4, dtype=np.float32)[i])
    res = eng.search_similar(np.ones(4, np.float32), 2)
    assert len(res) == 2
    eng.create_collection("c4", VectorCollectionConfig(dimension=4))
    eng.store_in_collection("c4", "x", np.ones(4, np.float32))
    with pytest.raises(VectorError):
        eng.search_in_collection("c4", np.ones(9, np.float32), 1)


def test_vector_batch_search_shapes(eng):
    eng.store_embedding("a", np.array([1.0, 0.0], np.float32))
    with pytest.raises(VectorError, match="expects"):
        eng.batch_search(np.ones((2, 2, 2), np.float32), 1)
    out = eng.batch_search(np.ones((0, 2), np.float32), 1)
    assert out == []
    out = eng.batch_search(np.ones((2, 2), np.float32), 1)
    assert len(out) == 2 and out[0][0].key == "a"


def test_vector_hnsw_metric_rejected(eng):
    for i in range(8):
        eng.store_embedding(f"k{i}", np.random.rand(4).astype(np.float32))
    with pytest.raises(VectorError, match="HNSW supports"):
        eng.build_hnsw_index(metric="hamming")


def test_vector_hnsw_requires_embeddings():
    e = VectorEngine()
    e.config.mesh_auto = False
    with pytest.raises(VectorError, match="no embeddings"):
        e.build_hnsw_index()
    with pytest.raises(VectorError, match="no index built"):
        e.save_index("/tmp/never.idx")


def test_vector_index_save_load_corrupt(tmp_path, eng):
    rng = np.random.default_rng(0)
    for i in range(32):
        eng.store_embedding(f"k{i}", rng.standard_normal(8,).astype(
            np.float32))
    eng.build_hnsw_index()
    p = tmp_path / "x.idx.npz"
    eng.save_index(str(p))
    blob = p.read_bytes()
    p.write_bytes(blob[: len(blob) // 2])      # truncate = corrupt
    fresh = VectorEngine()
    fresh.config.mesh_auto = False
    for i in range(32):
        fresh.store_embedding(f"k{i}", rng.standard_normal(8,).astype(
            np.float32))
    with pytest.raises(VectorError, match="corrupt index file"):
        fresh.load_index(str(p))


def test_vector_load_index_dimension_mismatch(tmp_path, eng):
    rng = np.random.default_rng(0)
    for i in range(16):
        eng.store_embedding(f"k{i}", rng.standard_normal(8,).astype(
            np.float32))
    eng.build_hnsw_index()
    p = tmp_path / "x.idx.npz"
    eng.save_index(str(p))
    other = VectorEngine()
    other.config.mesh_auto = False
    other.store_embedding("z", np.ones(4, np.float32))
    with pytest.raises(VectorError, match="no dimension-8"):
        other.load_index(str(p))


def test_vector_binary_quantized_search_with_mask(eng):
    from neumann_tpu.engines.vector import VectorCollectionConfig

    rng = np.random.default_rng(1)
    v = rng.standard_normal((64, 128)).astype(np.float32)
    eng.create_collection("bcol", VectorCollectionConfig(
        quantization="binary"))
    for i in range(64):
        eng.store_in_collection("bcol", f"b{i}", v[i])
    hits = eng.search_in_collection("bcol", v[3], 5)
    assert hits and hits[0].key == "b3"


def test_vector_entity_embedding_missing(eng):
    assert eng.get_embedding("ghost") is None
