"""Vault, LLM cache, blob store, checkpoint manager — focused tests."""

import time

import numpy as np
import pytest

from neumann_tpu.blob import BlobStore
from neumann_tpu.blob.blob_store import CHUNK_SIZE
from neumann_tpu.cache import LLMCache
from neumann_tpu.checkpoint import CheckpointManager
from neumann_tpu.store import TensorStore, TensorData, TensorValue
from neumann_tpu.utils.errors import BlobError, CheckpointError, VaultError
from neumann_tpu.vault import Permission, TensorVault


# ---------------------------------------------------------------- vault

def test_vault_roundtrip_and_wrong_password(tmp_path):
    store = TensorStore()
    v = TensorVault(store, "pw1")
    v.set("k", "secret")
    assert v.get("k") == "secret"
    # same store, wrong password -> decryption fails
    v2 = TensorVault(store, "pw2")
    with pytest.raises(VaultError):
        v2.get("k")
    # same password works (salt persisted in store)
    v3 = TensorVault(store, "pw1")
    assert v3.get("k") == "secret"


def test_vault_acl_levels_and_ttl():
    v = TensorVault(TensorStore(), "pw")
    v.set("s", "v1")
    with pytest.raises(VaultError):
        v.get("s", actor="eve")
    v.grant("reader", "s", Permission.READ)
    assert v.get("s", actor="reader") == "v1"
    with pytest.raises(VaultError):
        v.set("s", "v2", actor="reader")  # READ < WRITE
    v.grant("writer", "s", Permission.WRITE)
    v.set("s", "v2", actor="writer")
    # TTL grant expires
    v.grant("temp", "s", Permission.READ, ttl_seconds=0.05)
    assert v.get("s", actor="temp") == "v2"
    time.sleep(0.1)
    with pytest.raises(VaultError):
        v.get("s", actor="temp")
    assert ("reader", "READ") in v.grants_for("s")


def test_vault_versions_rollback_audit():
    v = TensorVault(TensorStore(), "pw")
    v.set("k", "v1")
    v.rotate("k", "v2")
    v.rotate("k", "v3")
    assert v.get("k") == "v3"
    assert v.versions("k") == 2
    assert v.rollback_version("k") == "v2"
    assert v.get("k") == "v2"
    log = v.audit_log()
    assert any(e["action"] == "rollback" for e in log)
    v.close()
    with pytest.raises(VaultError):
        v.get("k")


def test_vault_namespaces_and_list():
    store = TensorStore()
    a = TensorVault(store, "pw", namespace="a")
    b = TensorVault(store, "pw", namespace="b")
    a.set("api_key", "1")
    a.set("api_token", "2")
    b.set("other", "3")
    assert a.list() == ["api_key", "api_token"]
    assert a.list("api_k*") == ["api_key"]
    assert b.list() == ["other"]


def test_vault_rate_limit():
    v = TensorVault(TensorStore(), "pw", rate_limit_per_min=3)
    v.set("k", "v")
    v.get("k", actor="root")
    v.get("k", actor="root")
    with pytest.raises(VaultError):
        v.get("k", actor="root")


# ---------------------------------------------------------------- cache

def test_cache_exact_and_semantic():
    c = LLMCache(semantic_threshold=0.4)
    c.put("what is machine learning", "ML is ...")
    assert c.get("what is machine learning") == "ML is ..."
    assert c.stats.exact_hits == 1
    # near-duplicate question hits the semantic layer
    out = c.get("what is machine learning?")
    assert out == "ML is ..."
    assert c.stats.semantic_hits >= 1
    assert c.get("completely unrelated query about turtles") is None
    assert c.stats.misses >= 1
    assert 0 < c.stats.hit_rate() < 1
    assert c.stats.tokens_saved > 0


def test_cache_embedding_layer():
    """Layer 3 (tensor_cache/src/lib.rs:17,92,374-430): get() never
    recomputes an embedding it has seen; (source, content)-keyed
    embeddings are O(1) retrievable; LRU-bounded by its own capacity."""
    calls = []

    def embedder(text):
        calls.append(text)
        from neumann_tpu.cache.llm_cache import default_embedder

        return default_embedder(text)

    c = LLMCache(embedder=embedder)
    c.put("what is two plus two", "4")
    assert len(calls) == 1
    c.get("unrelated miss query")          # embeds once...
    n1 = len(calls)
    c.get("unrelated miss query")          # ...then layer-3 hits
    assert len(calls) == n1
    assert c.stats.embedding_hits >= 1

    # external (source, content) API
    import numpy as np

    c.put_embedding("openai", "doc body", [0.1, 0.2, 0.3])
    got = c.get_embedding("openai", "doc body")
    np.testing.assert_allclose(got, [0.1, 0.2, 0.3])
    assert c.get_embedding("openai", "other") is None

    # caller-supplied put() embedding seeds layer 3 for later get()
    emb = got
    c2 = LLMCache(embedder=embedder, semantic_threshold=2.0)
    before = len(calls)
    c2.put("seeded query", "r", embedding=np.ones(256, np.float32))
    assert c2.get("seeded query x") is None   # semantic miss path
    assert "seeded query" not in calls[before:]

    # bounded: own capacity, LRU
    c3 = LLMCache(embedding_capacity=2)
    c3.put_embedding("s", "a", emb)
    c3.put_embedding("s", "b", emb)
    assert c3.get_embedding("s", "a") is not None   # a now most-recent
    c3.put_embedding("s", "c", emb)                 # evicts b
    assert c3.get_embedding("s", "b") is None
    assert c3.get_embedding("s", "a") is not None


def test_cache_ttl_expiry():
    c = LLMCache()
    c.put("q", "r", ttl_s=0.05)
    assert c.get("q") == "r"
    time.sleep(0.1)
    assert c.get_exact("q") is None
    assert c.stats.expirations == 1


def test_cache_capacity_eviction_lru():
    c = LLMCache(capacity=3, eviction="lru")
    for i in range(3):
        c.put(f"q{i}", f"r{i}")
    c.get(f"q1")
    c.get(f"q2")
    c.put("q3", "r3")  # evicts q0 (least recently used)
    assert c.get_exact("q0") is None
    assert c.get_exact("q1") == "r1"
    assert c.stats.evictions == 1
    assert len(c) == 3


def test_cache_clear():
    c = LLMCache()
    c.put("a", "1")
    c.clear()
    assert len(c) == 0 and c.get("a") is None


# ---------------------------------------------------------------- blob

def test_blob_chunking_and_dedup():
    b = BlobStore()
    big = b"x" * (CHUNK_SIZE + 100)
    a1 = b.put("a.bin", big)
    assert b.get(a1) == big
    assert b.info(a1)["chunks"] == 2
    # identical content dedups chunks
    a2 = b.put("b.bin", big)
    assert b.stats()["chunks"] == 2  # shared
    b.delete(a1)
    assert b.get(a2) == big  # refcount protects shared chunks
    b.delete(a2)
    assert b.gc() == 2  # now unreferenced
    assert b.stats()["chunks"] == 0


def test_blob_streaming_writer():
    b = BlobStore()
    w = b.writer("s.bin", content_type="application/octet-stream")
    for i in range(5):
        w.write(bytes([i]) * 1000)
    aid = w.finish()
    with pytest.raises(BlobError):
        w.finish()
    data = b.get(aid)
    assert len(data) == 5000
    assert b.verify(aid)


def test_blob_verify_detects_corruption():
    store = TensorStore()
    b = BlobStore(store)
    aid = b.put("f", b"hello")
    # corrupt the chunk in the underlying store
    ck = [k for k in store.scan("_chunk:")][0]
    td = TensorData()
    td.set("data", TensorValue.scalar(b"hacked"))
    td.set("refs", TensorValue.scalar(1))
    store.put(ck, td)
    assert not b.verify(aid)
    assert b.repair() == [aid]


def test_blob_id_counter_recovery():
    store = TensorStore()
    b = BlobStore(store)
    a1 = b.put("f1", b"x")
    b2 = BlobStore(store)  # new instance over same store
    a2 = b2.put("f2", b"y")
    assert a1 != a2


# ---------------------------------------------------------------- checkpoint

def test_checkpoint_create_list_rollback(tmp_path):
    store = TensorStore()
    cm = CheckpointManager(store, tmp_path / "ck")
    store.put("k:1", TensorData.with_values(v=1))
    cid = cm.create(name="first")
    store.put("k:2", TensorData.with_values(v=2))
    assert len(store) == 2
    cm.rollback("first")
    assert len(store) == 1 and store.get("k:1") is not None
    # rollback is itself reversible via the auto checkpoint it takes
    pre = [c for c in cm.list() if c["reason"] and
           "rollback" in c["reason"]]
    assert pre
    cm.rollback(pre[0]["id"])
    assert len(store) == 2
    with pytest.raises(CheckpointError):
        cm.rollback("nope")


def test_checkpoint_retention(tmp_path):
    store = TensorStore()
    cm = CheckpointManager(store, tmp_path / "ck", retention=3)
    for i in range(6):
        cm.auto_checkpoint("delete", f"op{i}")
    autos = [c for c in cm.list() if c["auto"]]
    assert len(autos) == 3
    # named checkpoints are never dropped by retention
    cm.create(name="keep")
    for i in range(4):
        cm.auto_checkpoint("delete", f"more{i}")
    assert any(c["name"] == "keep" for c in cm.list())


def test_checkpoint_persistence(tmp_path):
    store = TensorStore()
    cm = CheckpointManager(store, tmp_path / "ck")
    store.put("a:1", TensorData.with_values(x=1))
    cm.create(name="n1")
    # new manager over the same dir sees the index
    cm2 = CheckpointManager(TensorStore(), tmp_path / "ck")
    assert any(c["name"] == "n1" for c in cm2.list())
    assert cm2.preview("n1")["entries"] == 1
    assert cm2.delete("n1")
    assert not cm2.delete("n1")


def test_auto_checkpoint_ignores_nondestructive(tmp_path):
    cm = CheckpointManager(TensorStore(), tmp_path / "ck")
    assert cm.auto_checkpoint("select") is None
    assert cm.auto_checkpoint("delete", "t") is not None


# ---------------------------------------------------------------- shamir

def test_shamir_split_combine():
    from neumann_tpu.vault import shamir

    secret = b"the launch codes are 0000"
    shares = shamir.split(secret, n=5, k=3)
    assert len(shares) == 5
    # any 3 shares reconstruct
    subset = {x: shares[x] for x in [1, 3, 5]}
    assert shamir.combine(subset) == secret
    subset2 = {x: shares[x] for x in [2, 4, 5]}
    assert shamir.combine(subset2) == secret
    # 2 shares do NOT reconstruct (overwhelmingly likely)
    partial = shamir.combine({x: shares[x] for x in [1, 2]})
    assert partial != secret
    # all 5 also work
    assert shamir.combine(shares) == secret


def test_shamir_errors():
    from neumann_tpu.vault import shamir
    from neumann_tpu.utils.errors import VaultError

    with pytest.raises(VaultError):
        shamir.split(b"x", n=2, k=3)
    with pytest.raises(VaultError):
        shamir.combine({})
    with pytest.raises(VaultError):
        shamir.combine({1: b"ab", 2: b"a"})


def test_vault_pitr_snapshots():
    v = TensorVault(TensorStore(), "pw")
    v.set("db/user", "alice")
    v.set("db/pass", "s3cret")
    snap = v.create_snapshot(label="before-rotate")
    assert v.list_snapshots()[0]["n_secrets"] == 2
    # mutate + add after the snapshot
    v.rotate("db/pass", "newpass")
    v.set("api/key", "k-123")
    restored = v.restore_snapshot(snap)
    assert restored == 2
    assert v.get("db/pass") == "s3cret"
    # restore overwrites but does NOT delete later additions
    assert v.get("api/key") == "k-123"
    # displaced value lands on the version history
    assert v.rollback_version("db/pass") == "newpass"
    assert v.delete_snapshot(snap)
    assert v.list_snapshots() == []
    with pytest.raises(VaultError):
        v.restore_snapshot(snap)


def test_vault_pitr_non_root_denied():
    v = TensorVault(TensorStore(), "pw")
    v.set("s", "x")
    for call in (lambda: v.create_snapshot(actor="eve"),
                 lambda: v.list_snapshots(actor="eve"),
                 lambda: v.restore_snapshot("any", actor="eve"),
                 lambda: v.delete_snapshot("any", actor="eve")):
        with pytest.raises(VaultError):
            call()


def test_vault_pitr_survives_reopen():
    store = TensorStore()
    v = TensorVault(store, "pw")
    v.set("k", "v1")
    snap = v.create_snapshot()
    v.set("k", "v2")
    # a new vault over the same store (e.g. after WAL replay) can restore
    v2 = TensorVault(store, "pw")
    assert v2.restore_snapshot(snap) == 1
    assert v2.get("k") == "v1"


def test_vault_anomaly_monitor():
    from neumann_tpu.vault.anomaly import AnomalyMonitor, AnomalyThresholds

    mon = AnomalyMonitor(AnomalyThresholds(
        frequency_spike_limit=5, frequency_window_ms=60_000,
        bulk_operation_threshold=3, inactive_threshold_ms=1000))
    t0 = 1_000_000
    # first access flagged
    evs = mon.check("agent", "db/pass", now_ms=t0)
    assert [e.kind for e in evs] == ["first_access"]
    # repeated access to same secret -> bulk at threshold exactly once
    kinds = []
    for i in range(1, 6):
        kinds += [e.kind for e in mon.check("agent", "db/pass",
                                            now_ms=t0 + i)]
    assert kinds.count("bulk_operation") == 1
    assert kinds.count("frequency_spike") == 1  # 5 ops in window
    # dormant resumption after inactivity
    evs = mon.check("agent", "db/pass", now_ms=t0 + 10_000)
    assert any(e.kind == "inactive_resumed" for e in evs)
    prof = mon.get_profile("agent")
    assert prof.total_ops == 7 and "db/pass" in prof.known_secrets


def test_vault_anomaly_wired_and_persisted():
    from neumann_tpu.vault.anomaly import AnomalyMonitor, AnomalyThresholds

    store = TensorStore()
    mon = AnomalyMonitor(AnomalyThresholds(bulk_operation_threshold=2),
                         store=store)
    v = TensorVault(store, "pw", anomaly_monitor=mon)
    v.set("s1", "x")
    v.get("s1")
    v.get("s1")
    kinds = [e.kind for e in v.drain_anomalies()]
    assert "first_access" in kinds and "bulk_operation" in kinds
    assert v.drain_anomalies() == []  # drained
    # profiles persist through the store and reload
    assert mon.persist() == 1
    mon2 = AnomalyMonitor(store=store)
    assert "root" in mon2.monitored_entities()
    assert mon2.get_profile("root").total_ops == 3


def test_pki_ca_issue_verify_revoke_crl():
    from neumann_tpu.vault.pki import PkiEngine

    store = TensorStore()
    ca_pem = PkiEngine.init_ca(store)
    assert b"BEGIN CERTIFICATE" in ca_pem
    # idempotent: second init returns the same CA
    assert PkiEngine.init_ca(store) == ca_pem

    cert, key, serial = PkiEngine.issue_certificate(
        store, "node-1.cluster", sans=["127.0.0.1", "node-1.local"])
    assert b"BEGIN CERTIFICATE" in cert and b"PRIVATE KEY" in key
    assert PkiEngine.verify_certificate(store, cert)
    infos = PkiEngine.list_certificates(store)
    assert len(infos) == 1 and infos[0].subject == "node-1.cluster"
    assert not infos[0].revoked

    # a cert signed by a DIFFERENT CA must fail verification
    other = TensorStore()
    PkiEngine.init_ca(other)
    rogue, _, _ = PkiEngine.issue_certificate(other, "evil")
    assert not PkiEngine.verify_certificate(store, rogue)

    # revocation flips verify and lands on the CRL
    PkiEngine.revoke_certificate(store, serial)
    assert PkiEngine.is_revoked(store, serial)
    assert not PkiEngine.verify_certificate(store, cert)
    crl = PkiEngine.generate_crl(store)
    from cryptography import x509

    parsed = x509.load_pem_x509_crl(crl)
    assert len(list(parsed)) == 1
    with pytest.raises(VaultError):
        PkiEngine.revoke_certificate(store, "nope")


def test_pki_issued_cert_works_for_tls_transport():
    """PKI-issued certs drive the actual TCP transport TLS path."""
    from neumann_tpu.chain.transport import TcpTransport, \
        make_tls_contexts
    from neumann_tpu.vault.pki import PkiEngine

    store = TensorStore()
    ca = PkiEngine.init_ca(store)
    cert, key, _ = PkiEngine.issue_certificate(store, "srv",
                                               sans=["127.0.0.1"])
    sctx, cctx = make_tls_contexts(cert, key, ca_pem=ca)
    srv = TcpTransport("srv", tls_server=sctx)
    cli = TcpTransport("cli", tls_client=cctx)
    try:
        cli.connect("srv", srv.address)
        assert cli.send("srv", "hello", {"pki": True})
        assert srv.recv(timeout=2.0).payload == {"pki": True}
    finally:
        srv.close()
        cli.close()


def test_vault_sync_targets(tmp_path):
    from neumann_tpu.vault.sync import (
        FileSyncTarget,
        MemorySyncTarget,
        VaultSync,
    )

    v = TensorVault(TensorStore(), "pw")
    sync = VaultSync(v)
    ft = FileSyncTarget("file-t", str(tmp_path / "repl"))
    mt = MemorySyncTarget("mem-t")
    sync.register_sync_target(ft)
    sync.register_sync_target(mt)
    assert sync.list_sync_targets() == ["file-t", "mem-t"]
    with pytest.raises(VaultError):
        sync.register_sync_target(MemorySyncTarget("mem-t"))  # dup

    v.set("db/pass", "s3cret")
    sync.subscribe_sync("db/pass", "file-t")
    sync.subscribe_sync("db/pass", "mem-t")
    assert sync.trigger_sync("db/pass") == 2
    # ciphertext only: the replicated bytes must NOT contain plaintext
    blob = (tmp_path / "repl" / "db__pass.bin").read_bytes()
    assert b"s3cret" not in blob and blob == mt.received["db/pass"]
    # and it decrypts back with the vault's key
    assert v._decrypt(blob, "db/pass") == "s3cret"

    sync.unsubscribe_sync("db/pass", "file-t")
    sync.unsubscribe_sync("db/pass", "mem-t")
    assert sync.trigger_sync("db/pass") == 0
    assert sync.sync_health() == [("file-t", True), ("mem-t", True)]
    with pytest.raises(VaultError):
        sync.trigger_sync("nope")


def test_geo_router_route_exclude_ema():
    from neumann_tpu.vault.sync import (
        GeoCoordinate,
        GeoRouter,
        RoutingConfig,
        TargetGeometry,
    )

    router = GeoRouter(RoutingConfig(sync_fanout=2, max_latency_ms=100))
    router.update_geometry(TargetGeometry(
        "us-east", GeoCoordinate(0, 0), avg_latency_ms=20,
        avg_throughput=100, failure_rate=0.01))
    router.update_geometry(TargetGeometry(
        "eu-west", GeoCoordinate(50, 50), avg_latency_ms=80,
        avg_throughput=90, failure_rate=0.02))
    router.update_geometry(TargetGeometry(
        "slow", GeoCoordinate(10, 10), avg_latency_ms=500,
        avg_throughput=50, failure_rate=0.0))

    d = router.route("k", None, ["us-east", "eu-west", "slow"])
    assert [g.target_name for g in d.selected_targets] == \
        ["us-east", "eu-west"]
    assert [g.target_name for g in d.excluded_targets] == ["slow"]

    # latency EMA converges toward observed results
    for _ in range(5):
        router.record_sync_result("us-east", 200.0, True)
    g = next(x for x in router.geometries()
             if x.target_name == "us-east")
    assert g.avg_latency_ms > 140.0 and g.failure_rate < 0.01


def test_vault_sync_geo_routed_fanout(tmp_path):
    from neumann_tpu.vault.sync import (
        GeoCoordinate,
        GeoRouter,
        MemorySyncTarget,
        RoutingConfig,
        TargetGeometry,
        VaultSync,
    )

    v = TensorVault(TensorStore(), "pw")
    sync = VaultSync(v)
    targets = {n: MemorySyncTarget(n) for n in ("a", "b", "c")}
    for t in targets.values():
        sync.register_sync_target(t)
    v.set("k", "val")
    for n in targets:
        sync.subscribe_sync("k", n)
    router = GeoRouter(RoutingConfig(sync_fanout=2))
    for n, lat in (("a", 10), ("b", 20), ("c", 900)):
        router.update_geometry(TargetGeometry(
            n, GeoCoordinate(0, 0), avg_latency_ms=lat))
    sync.router = router
    # fanout=2 and c excluded by latency: only a and b receive
    assert sync.trigger_sync("k") == 2
    assert "k" in targets["a"].received and "k" in targets["b"].received
    assert "k" not in targets["c"].received


def test_scoped_lifecycle_and_delegation():
    from neumann_tpu.vault import Permission

    v = TensorVault(TensorStore(), "pw")
    scoped = v.scope(v.ROOT)
    scoped.set("life/secret", "initial")
    assert scoped.get("life/secret") == "initial"
    scoped.rotate("life/secret", "rotated")
    assert scoped.get("life/secret") == "rotated"
    assert "life/secret" in scoped.list("life/*")
    assert scoped.delete("life/secret")
    with pytest.raises(VaultError):
        scoped.get("life/secret")

    # delegation: parent re-grants its READ access to a child
    v.set("del/api-key", "key-abc")
    v.set("del/db-pass", "pass-xyz")
    v.grant("user:parent", "del/api-key", Permission.READ)
    v.grant("user:parent", "del/db-pass", Permission.READ)
    parent = v.scope("user:parent")
    rec = parent.delegate("user:child", ["del/api-key", "del/db-pass"],
                          Permission.READ, ttl_seconds=3600)
    assert rec.child == "user:child"
    assert v.get("del/api-key", actor="user:child") == "key-abc"
    # attenuation: parent holds READ, cannot delegate WRITE
    with pytest.raises(VaultError):
        parent.delegate("user:child2", ["del/api-key"], Permission.WRITE)
    revoked = parent.revoke_delegation("user:child")
    assert set(revoked) == {"del/api-key", "del/db-pass"}
    with pytest.raises(VaultError):
        v.get("del/api-key", actor="user:child")


def test_scoped_wrapping_and_dependencies():
    v = TensorVault(TensorStore(), "pw")
    scoped = v.scope(v.ROOT)
    scoped.set("wrap/token", "wrapped-value")
    token = scoped.wrap_secret("wrap/token", 60_000)
    assert scoped.unwrap_secret(token) == "wrapped-value"
    with pytest.raises(VaultError):
        scoped.unwrap_secret(token)  # single use

    scoped.set("dep/parent", "p")
    scoped.set("dep/child", "c")
    scoped.set("dep/grandchild", "g")
    scoped.add_dependency("dep/parent", "dep/child")
    scoped.add_dependency("dep/child", "dep/grandchild")
    report = scoped.impact_analysis("dep/parent")
    assert report.affected_secrets == ["dep/child", "dep/grandchild"]
    with pytest.raises(VaultError):  # cycle rejected
        scoped.add_dependency("dep/grandchild", "dep/parent")


def test_scoped_dynamic_secrets():
    from neumann_tpu.vault import SecretTemplate

    v = TensorVault(TensorStore(), "pw")
    scoped = v.scope(v.ROOT)
    sid, value = scoped.generate_dynamic_secret(
        SecretTemplate.password(), ttl_ms=600_000)
    assert sid and len(value) == 24
    assert scoped.get_dynamic_secret(sid) == value
    assert any(m.secret_id == sid
               for m in scoped.list_dynamic_secrets())
    scoped.revoke_dynamic_secret(sid)
    assert not any(m.secret_id == sid
                   for m in scoped.list_dynamic_secrets())
    with pytest.raises(VaultError):
        scoped.get_dynamic_secret(sid)
    # api-key template + instant expiry
    sid2, val2 = scoped.generate_dynamic_secret(
        SecretTemplate.api_key("svc"), ttl_ms=0)
    assert val2.startswith("svc-")
    import time as _t

    _t.sleep(0.01)
    with pytest.raises(VaultError):
        scoped.get_dynamic_secret(sid2)


def test_cache_semantic_hnsw_rebuild():
    """Tombstoned semantic nodes trigger an index rebuild, and
    lookups never resurrect deleted entries."""
    from neumann_tpu.cache import LLMCache

    c = LLMCache(semantic_threshold=0.3)
    for i in range(100):
        c.put(f"question number {i} about topic", f"answer {i}")
    # delete most entries -> dead > half -> rebuild on next put
    for i in range(80):
        c._remove(c._norm(f"question number {i} about topic"))
    c.put("fresh question entirely", "fresh answer")
    assert len(c._hnsw_keys) == len(c._node_of) == 21
    # deleted entries never resurface (a semantic hit may legitimately
    # match a similar LIVE entry, but never a deleted one)
    hit = c.get("question number 3 about topic")
    assert hit is None or hit in {f"answer {i}" for i in range(80, 100)}
    assert c.get_exact("question number 3 about topic") is None
    assert c.get("question number 95 about topic") == "answer 95"
    # re-put with a new response: lookup must see the new value
    c.put("question number 95 about topic", "answer 95 v2")
    assert c.get("question number 95 about topics") == "answer 95 v2"


def test_cache_semantic_dim_mismatch():
    from neumann_tpu.cache import LLMCache

    c = LLMCache()
    c.put("a query", "resp", embedding=np.ones(8, np.float32))
    with pytest.raises(ValueError):
        c.put("another", "resp", embedding=np.ones(9, np.float32))
