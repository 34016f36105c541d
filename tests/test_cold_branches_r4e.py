"""Cold-branch coverage, part 5: non-cosine int8 scan metrics, masked
scans, quantize round-trips, IVF device-index constructors."""

import numpy as np
import pytest


@pytest.fixture
def small_corpus(rng):
    import jax.numpy as jnp

    from neumann_tpu.ops.quant import scalar_quantize

    v = rng.standard_normal((512, 32)).astype(np.float32)
    cq, sc = scalar_quantize(jnp.asarray(v))
    return v, cq, sc


def _oracle(v, q, metric, k):
    if metric == "cosine":
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        s = vn @ qn
    elif metric == "dot":
        s = v @ q
    else:  # euclidean: higher = closer (negated distance)
        s = -np.linalg.norm(v - q[None, :], axis=1)
    return np.argsort(-s)[:k]


@pytest.mark.parametrize("metric", ["dot", "euclidean"])
def test_int8_topk_scan_non_cosine_metrics(small_corpus, rng, metric):
    import jax.numpy as jnp

    from neumann_tpu.ops.quant import int8_topk_scan

    v, cq, sc = small_corpus
    q = v[7] + 0.01 * rng.standard_normal(32).astype(np.float32)
    s, ids = int8_topk_scan(cq, sc, jnp.asarray(q[None, :]), 5,
                            metric=metric, block_rows=128)
    got = np.asarray(ids)[0]
    want = _oracle(v, q, metric, 8)
    assert got[0] == want[0]
    assert len(set(got.tolist()) & set(want.tolist())) >= 4


def test_int8_topk_scan_masked_euclidean(small_corpus, rng):
    import jax.numpy as jnp

    from neumann_tpu.ops.quant import int8_topk_scan

    v, cq, sc = small_corpus
    q = v[7]
    mask = np.ones(512, bool)
    mask[7] = False                      # exclude the self-match
    s, ids = int8_topk_scan(cq, sc, jnp.asarray(q[None, :]), 3,
                            metric="euclidean",
                            mask=jnp.asarray(mask), block_rows=128)
    assert 7 not in np.asarray(ids)[0].tolist()
    # everything masked -> sentinels
    s2, ids2 = int8_topk_scan(cq, sc, jnp.asarray(q[None, :]), 3,
                              metric="euclidean",
                              mask=jnp.zeros(512, bool),
                              block_rows=128)
    assert (np.asarray(ids2)[0] == -1).all()


def test_scalar_dequantize_roundtrip(small_corpus):
    from neumann_tpu.ops.quant import scalar_dequantize

    v, cq, sc = small_corpus
    back = np.asarray(scalar_dequantize(cq, sc))
    err = np.abs(back - v).max() / (np.abs(v).max() + 1e-9)
    assert err < 0.01


def test_transport_wire_branches(monkeypatch):
    """JSON wire emission handles bytes payloads (tagged base64),
    rejects unwirable types, and NEUMANN_WIRE_BINARY=1 opts into the
    binary codec; bidirectional unblock clears both directions."""
    from neumann_tpu.chain.transport import (
        Message,
        TransportHub,
        _json_default,
    )

    assert "__b64__" in _json_default(b"\x00\xff")
    with pytest.raises(TypeError, match="wirable"):
        _json_default(object())

    m = Message(kind="k", src="a", dst="b",
                payload={"blob": b"\x01\x02"})
    j = m.encode()
    assert Message.decode(j).payload["blob"] == b"\x01\x02"
    monkeypatch.setenv("NEUMANN_WIRE_BINARY", "1")
    bwire = m.encode()
    assert bwire != j
    assert Message.decode(bwire).payload["blob"] == b"\x01\x02"
    monkeypatch.delenv("NEUMANN_WIRE_BINARY")

    net = TransportHub(seed=3)
    ta = net.register("a")
    net.register("b")
    net.block_link("a", "b", bidirectional=True)
    net.unblock_link("a", "b", bidirectional=True)
    assert not net.blocked_links
    # sends to unknown destinations are accepted (and dropped)
    assert ta.send("ghost", "k", {}) in (True, False)


def test_vault_secret_template_branches():
    """Every template kind generates + JSON round-trips; unknown
    kinds raise cleanly (scoped.py _generate/_template_*_json)."""
    from neumann_tpu.utils.errors import VaultError
    from neumann_tpu.vault.scoped import (
        SecretTemplate,
        _generate,
        _template_from_json,
        _template_to_json,
    )

    for tpl, prefix in ((SecretTemplate.password(), None),
                        (SecretTemplate.api_key("svc"), "svc-"),
                        (SecretTemplate.hex_token(8), None)):
        kind, value = _generate(tpl)
        assert value and (prefix is None or value.startswith(prefix))
        doc = _template_to_json(tpl)
        back = _template_from_json(doc)
        assert back[0] == tpl[0]
    kind, value = _generate(SecretTemplate.hex_token(8))
    assert len(value) == 16            # hex of 8 bytes
    with pytest.raises(VaultError, match="unknown"):
        _generate(("jwt", None))
    with pytest.raises(VaultError, match="unknown"):
        _template_to_json(("jwt", None))
    with pytest.raises(VaultError, match="unknown"):
        _template_from_json({"kind": "jwt"})


def test_graph_store_hooks_direct_puts():
    """Graph engine materializes nodes/edges written DIRECTLY to the
    store (replication replay path), ignores malformed keys, and
    reindexes on overwrite."""
    from neumann_tpu.engines.graph import GraphEngine
    from neumann_tpu.store.tensor_store import TensorData, TensorStore

    st = TensorStore()
    g = GraphEngine(st)
    st.put("node:abc", TensorData.with_values(x=1))   # malformed id
    st.put("edge:xyz", TensorData.with_values(x=1))
    assert g.node_count() == 0 and g.edge_count() == 0
    st.put("node:5", TensorData.with_values(_label="P", name="ann"))
    st.put("node:6", TensorData.with_values(_label="P", name="bo"))
    st.put("edge:2", TensorData.with_values(
        _src=5, _dst=6, _type="KNOWS", _directed=1))
    assert g.node_count() == 2 and g.edge_count() == 1
    assert g.get_node(5)["properties"]["name"] == "ann"
    # overwrite reindexes: old property value no longer matches
    st.put("node:5", TensorData.with_values(_label="P", name="zed"))
    assert g.find_nodes_by_property("name", "ann") == []
    assert g.find_nodes_by_property("name", "zed") == [5]
    # edge overwrite detaches then reattaches
    st.put("edge:2", TensorData.with_values(
        _src=6, _dst=5, _type="KNOWS", _directed=1))
    assert g.edge_count() == 1
    assert g.get_edge(2)["src"] == 6
    # deletes through the store, including malformed keys
    st.delete("node:abc")
    st.delete("edge:xyz")
    st.delete("edge:2")
    st.delete("node:5")
    assert g.node_count() == 1 and g.edge_count() == 0


def test_device_ivf_from_device_layout(rng):
    """from_device_layout (born-sorted corpora skip host staging)
    searches identically to the index that produced the layout."""
    import jax.numpy as jnp

    from neumann_tpu.ops.ivf import DeviceIVFInt8
    from neumann_tpu.ops.quant import scalar_quantize

    v = rng.standard_normal((2048, 32)).astype(np.float32)
    cq, sc = scalar_quantize(jnp.asarray(v))
    ix = DeviceIVFInt8(32, n_clusters=8, nprobe=8, iters=4)
    ix.build(np.asarray(cq), np.asarray(sc), sample_rows=1024,
             fixed_window=256)
    qs = v[rng.choice(2048, 8)]
    s1, i1 = ix.search(qs, 5)

    ix2 = DeviceIVFInt8.from_device_layout(
        32, ix.centroids, ix._buf, ix._rmult, ix._starts,
        ix._row_ids, ix._window, nprobe=8, scale=ix._scale,
        residual=(ix._rbuf, ix._rscale) if ix._rbuf is not None
        else None, fixed=True)
    s2, i2 = ix2.search(qs, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               atol=1e-5)
    # the restored index keeps serving mutations: add + delete
    ids = ix2.add(v[:4] + 0.5)
    assert len(ids) == 4
    assert ix2.delete(ids[:2]) == 2
    assert ix2.n_live == 2048 + 2
