"""OrderedKeyIndex (MetadataSlab equivalent) — native and fallback
implementations against a sorted-list oracle, plus TensorStore wiring."""

import random
import string

import pytest

from neumann_tpu import native
from neumann_tpu.store.ordered_index import OrderedKeyIndex

IMPLS = [False] + ([True] if native.available() else [])


@pytest.fixture(params=IMPLS, ids=["python", "native"][:len(IMPLS)])
def ix(request):
    return OrderedKeyIndex(use_native=request.param)


def test_insert_remove_len(ix):
    assert ix.insert("b:1")
    assert ix.insert("a:1")
    assert not ix.insert("a:1")      # duplicate
    assert len(ix) == 2
    assert ix.remove("a:1")
    assert not ix.remove("a:1")
    assert len(ix) == 1


def test_scan_prefix_ordered(ix):
    keys = ["table:users:3", "emb:x", "table:users:1", "node:a",
            "table:orders:2", "emb:a", "table:users:2"]
    for k in keys:
        ix.insert(k)
    assert ix.scan_prefix("table:users:") == [
        "table:users:1", "table:users:2", "table:users:3"]
    assert ix.scan_prefix("") == sorted(keys)
    assert ix.scan_prefix("zzz") == []
    assert ix.count_prefix("table:") == 4
    assert ix.count_prefix("") == len(keys)


def test_scan_range(ix):
    for k in ["a", "b", "c", "d", "e"]:
        ix.insert(k)
    assert ix.scan_range("b", "d") == ["b", "c"]
    assert ix.scan_range("b", None) == ["b", "c", "d", "e"]
    assert ix.scan_range("b", "b") == []
    assert ix.scan_range("0", "a") == []


def test_cross_shard_order(ix):
    # keys whose first bytes span multiple high-nibble shards
    keys = ["Apple", "zebra", "0num", "~tilde", "Middle", "apple"]
    for k in keys:
        ix.insert(k)
    assert ix.scan_prefix("") == sorted(keys)
    assert ix.scan_range("A", "z") == sorted(
        k for k in keys if "A" <= k < "z")


def test_unicode_and_edge_keys(ix):
    keys = ["κλειδί", "ключ", "键", "k\xffx", "\xff\xff"]
    for k in keys:
        ix.insert(k)
    got = ix.scan_prefix("")
    assert got == sorted(keys, key=lambda s: s.encode("utf-8"))
    assert ix.scan_prefix("к") == ["ключ"]


def test_clear(ix):
    ix.insert("x")
    ix.clear()
    assert len(ix) == 0
    assert ix.scan_prefix("") == []
    ix.insert("y")
    assert ix.scan_prefix("") == ["y"]


def test_randomized_against_oracle(ix):
    rng = random.Random(42)
    oracle = set()
    alphabet = string.ascii_letters + string.digits + ":_~"
    for _ in range(3000):
        k = "".join(rng.choices(alphabet, k=rng.randint(1, 12)))
        if rng.random() < 0.3 and oracle:
            victim = rng.choice(sorted(oracle))
            assert ix.remove(victim)
            oracle.discard(victim)
        else:
            assert ix.insert(k) == (k not in oracle)
            oracle.add(k)
    assert len(ix) == len(oracle)
    assert ix.scan_prefix("") == sorted(oracle,
                                        key=lambda s: s.encode())
    for p in ("a", "Z", "1", "~", "ab"):
        want = sorted((k for k in oracle if k.startswith(p)),
                      key=lambda s: s.encode())
        assert ix.scan_prefix(p) == want
        assert ix.count_prefix(p) == len(want)
    lo, hi = "A", "m"
    want = sorted((k for k in oracle if lo <= k < hi),
                  key=lambda s: s.encode())
    assert ix.scan_range(lo, hi) == want


def test_native_is_used_when_available():
    if native.available():
        assert OrderedKeyIndex().is_native


class TestStoreIntegration:
    def test_scan_uses_index(self):
        from neumann_tpu.store.tensor_store import (
            TensorData, TensorStore,
        )

        st = TensorStore()
        for i in (3, 1, 2):
            st.put(f"user:{i}", TensorData.with_values(v=i))
        st.put("emb:q", TensorData.with_values(v=0))
        assert st.scan("user:") == ["user:1", "user:2", "user:3"]
        assert st.scan_count("user:") == 3
        assert st.scan_range("user:2") == ["user:2", "user:3"]
        assert st.scan_range("emb:", "user:2") == ["emb:q", "user:1"]
        st.delete("user:2")
        assert st.scan("user:") == ["user:1", "user:3"]
        st.clear()
        assert st.scan("") == []

    def test_snapshot_rebuilds_index(self, tmp_path):
        from neumann_tpu.store.tensor_store import (
            TensorData, TensorStore,
        )

        st = TensorStore()
        for i in range(5):
            st.put(f"k:{i}", TensorData.with_values(v=i))
        st.save_snapshot(tmp_path / "s.ntpu")
        st2 = TensorStore()
        st2.put("old:x", TensorData.with_values(v=9))
        st2.load_snapshot(tmp_path / "s.ntpu")
        assert st2.scan("k:") == [f"k:{i}" for i in range(5)]


def test_remove_past_end_of_shard():
    """bisect at end-of-shard must not index out of range (mutation
    kill: i < len vs <=)."""
    ix = OrderedKeyIndex(use_native=False)
    ix.insert("p")               # shard 7 (0x70 >> 4)
    assert not ix.remove("z")    # same shard, sorts after everything
    assert ix.scan_prefix("") == ["p"]


def test_fallback_shard_count_and_top_shard():
    ix = OrderedKeyIndex(use_native=False)
    assert len(ix._shards) == 16
    ix.insert("\U0001F600")      # utf-8 first byte 0xF0 -> shard 15
    ix.insert("a")
    assert ix.scan_prefix("") == ["a", "\U0001F600"]
    assert ix.scan_range("a", None) == ["a", "\U0001F600"]
