"""Unified engine tests: entities, hybrid similar+connected, FIND."""

import numpy as np
import pytest

from neumann_tpu.engines.condition import Condition as C
from neumann_tpu.engines.unified import UnifiedEngine
from neumann_tpu.utils.errors import NeumannError


@pytest.fixture
def u():
    return UnifiedEngine()


def vec(d, i, eps=0.0):
    v = np.zeros(d, np.float32)
    v[i % d] = 1.0
    if eps:
        v[(i + 1) % d] = eps
    return v


def test_entity_crud(u):
    nid = u.create_entity("user:alice", {"name": "alice", "age": 30},
                          embedding=[1.0, 0.0])
    ent = u.get_entity("user:alice")
    assert ent["fields"]["name"] == "alice"
    np.testing.assert_allclose(ent["embedding"], [1, 0])
    assert ent["node_id"] == nid
    assert u.entity_exists("user:alice")
    u.update_entity("user:alice", {"age": 31})
    assert u.get_entity("user:alice")["fields"]["age"] == 31
    assert u.delete_entity("user:alice")
    assert not u.entity_exists("user:alice")
    assert u.get_entity("user:alice") is None
    with pytest.raises(NeumannError):
        u.update_entity("ghost", {"a": 1})


def test_create_entity_idempotent_update(u):
    u.create_entity("e1", {"a": 1})
    n1 = u.node_id_of("e1")
    u.create_entity("e1", {"b": 2}, embedding=[0.0, 1.0])
    assert u.node_id_of("e1") == n1
    ent = u.get_entity("e1")
    assert ent["fields"]["a"] == 1 and ent["fields"]["b"] == 2


def test_connect_and_neighbors(u):
    u.create_entity("a")
    u.create_entity("b")
    u.create_entity("c")
    u.connect_entities("a", "b", "knows")
    u.connect_entities("a", "c", "knows")
    assert u.entity_neighbors("a") == ["b", "c"]
    assert u.entity_neighbors("b") == ["a"]
    with pytest.raises(NeumannError):
        u.connect_entities("a", "ghost")


def test_find_similar_connected_fused(u):
    d = 8
    u.create_entity("q", embedding=vec(d, 0))
    # 5 entities close to q, but only 2 connected
    for i in range(5):
        u.create_entity(f"n{i}", embedding=vec(d, 0, eps=0.1 * (i + 1)))
    u.connect_entities("q", "n3", "link")
    u.connect_entities("q", "n4", "link")
    res = u.find_similar_connected("q", 5, "q")
    assert {r.key for r in res} == {"n3", "n4"}
    # exact even for k=1 (reference's 2x oversampling could miss)
    res1 = u.find_similar_connected("q", 1, "q")
    assert res1[0].key == "n3"  # closest connected


def test_find_similar_connected_no_neighbors(u):
    u.create_entity("lonely", embedding=[1.0, 0.0])
    assert u.find_similar_connected("lonely", 5, "lonely") == []
    with pytest.raises(NeumannError):
        u.find_similar_connected([1.0, 0.0], 5, "ghost")


def test_find_neighbors_by_similarity(u):
    d = 4
    u.create_entity("center", embedding=vec(d, 0))
    u.create_entity("close", embedding=vec(d, 0, eps=0.05))
    u.create_entity("far", embedding=vec(d, 2))
    u.connect_entities("center", "close", "e")
    u.connect_entities("center", "far", "e")
    res = u.find_neighbors_by_similarity("center", 2)
    assert [r.key for r in res] == ["close", "far"]


def test_find_with_condition_and_similarity(u):
    d = 4
    for i in range(6):
        u.create_entity(f"p{i}", {"team": "red" if i < 3 else "blue"},
                        embedding=vec(d, 0, eps=0.1 * i))
    res = u.find(condition=C.eq("team", "blue"),
                 similar_to=vec(d, 0), top_k=10)
    assert {e["key"] for e in res} == {"p3", "p4", "p5"}
    assert all("score" in e for e in res)
    # plain field find
    res2 = u.find(condition=C.eq("team", "red"), top_k=0)
    assert {e["key"] for e in res2} == {"p0", "p1", "p2"}
    # find all
    assert len(u.find(top_k=0)) == 6


def test_find_connected_plus_condition(u):
    u.create_entity("hub", embedding=[1.0, 0.0])
    for i in range(4):
        u.create_entity(f"s{i}", {"ok": i % 2 == 0},
                        embedding=[1.0, 0.01 * i])
        u.connect_entities("hub", f"s{i}", "e")
    res = u.find(condition=C.eq("ok", True), similar_to="hub",
                 connected_to="hub", top_k=10)
    assert {e["key"] for e in res} == {"s0", "s2"}


def test_embed_batch_collect(u):
    n = u.embed_batch([(f"k{i}", vec(4, i)) for i in range(4)])
    assert n == 4
    embs = u.collect_embeddings(["k0", "k1", "missing"])
    np.testing.assert_allclose(embs[0], vec(4, 0))
    assert embs[2] is None
    res = u.find_similar_entities(vec(4, 1), 2)
    assert res[0].key == "k1"


def test_embed_batch_collect_mixed_results():
    """Error-collecting batch keeps going past bad items
    (tensor_unified/src/lib.rs:4084 test_embed_batch_collect_mixed)."""
    import numpy as np

    from neumann_tpu.engines.unified import UnifiedEngine

    e = UnifiedEngine()
    res = e.embed_batch_collect([
        ("good1", np.array([1.0, 0.0], np.float32)),
        ("", np.array([1.0, 0.0], np.float32)),        # empty key
        ("bad_vec", np.array([], np.float32)),          # empty vector
        ("good2", np.array([0.0, 1.0], np.float32)),
    ])
    assert res.succeeded == ["good1", "good2"]
    assert [(i, k) for i, k, _ in res.failed] == [(1, ""), (2, "bad_vec")]
    assert not res.all_succeeded and len(res) == 2
    assert e.vector.get_entity_embedding("good1") is not None
    assert e.vector.get_entity_embedding("good2") is not None
