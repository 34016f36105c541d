"""Vault depth: seal/unseal, policy engine, quotas, master-key
rotation, obfuscation (tensor_vault/src/{seal,policy,quota,rotation,
obfuscation}.rs capability)."""

import pytest

from neumann_tpu.store.tensor_store import TensorStore
from neumann_tpu.utils.errors import VaultError
from neumann_tpu.vault import Permission, TensorVault
from neumann_tpu.vault.obfuscation import ObfuscationLayer
from neumann_tpu.vault.policy import PolicyTemplate
from neumann_tpu.vault.quota import ResourceQuota


# ------------------------------------------------------------ seal/unseal

def test_seal_blocks_everything_and_unseal_restores():
    store = TensorStore()
    v = TensorVault(store, "pw")
    v.set("k", "s3cret")
    v.seal()
    assert v.is_sealed()
    with pytest.raises(VaultError, match="sealed"):
        v.get("k")
    with pytest.raises(VaultError, match="sealed"):
        v.set("k2", "x")
    # wrong password leaves it sealed
    with pytest.raises(VaultError, match="wrong password"):
        v.unseal("nope")
    assert v.is_sealed()
    v.unseal("pw")
    assert not v.is_sealed()
    assert v.get("k") == "s3cret"


def test_seal_state_survives_restart():
    store = TensorStore()
    v = TensorVault(store, "pw")
    v.set("k", "v")
    v.seal()
    # reopening the same store (even with the right password) starts
    # sealed until an explicit unseal
    v2 = TensorVault(store, "pw")
    assert v2.is_sealed()
    with pytest.raises(VaultError):
        v2.get("k")
    v2.unseal("pw")
    assert v2.get("k") == "v"


def test_seal_requires_root():
    v = TensorVault(TensorStore(), "pw")
    with pytest.raises(VaultError):
        v.seal(actor="mallory")


# ------------------------------------------------------------- policies

def test_policy_templates_grant_by_pattern():
    v = TensorVault(TensorStore(), "pw")
    v.set("staging/db", "dsn1")
    v.set("prod/db", "dsn2")
    v.policies.define(PolicyTemplate(
        name="eng-staging", match_pattern="team:eng/*",
        secret_pattern="staging/*",
        permission=int(Permission.READ)))
    assert v.get("staging/db", actor="team:eng/alice") == "dsn1"
    with pytest.raises(VaultError):        # prod not covered
        v.get("prod/db", actor="team:eng/alice")
    with pytest.raises(VaultError):        # other teams not covered
        v.get("staging/db", actor="team:sales/bob")
    with pytest.raises(VaultError):        # READ does not allow WRITE
        v.set("staging/db", "x", actor="team:eng/alice")
    # policies persist in the store and can be removed
    assert [t.name for t in v.policies.list()] == ["eng-staging"]
    assert v.policies.remove("eng-staging")
    with pytest.raises(VaultError):
        v.get("staging/db", actor="team:eng/alice")


def test_policy_highest_permission_wins():
    v = TensorVault(TensorStore(), "pw")
    v.set("app/key", "k")
    v.policies.define(PolicyTemplate("r", "svc/*", "app/*",
                                     int(Permission.READ)))
    v.policies.define(PolicyTemplate("w", "svc/writer", "app/*",
                                     int(Permission.WRITE)))
    v.set("app/key", "k2", actor="svc/writer")
    assert v.get("app/key", actor="svc/reader") == "k2"
    with pytest.raises(VaultError):
        v.set("app/key", "x", actor="svc/reader")


# --------------------------------------------------------------- quotas

def test_quota_max_secrets_and_storage():
    v = TensorVault(TensorStore(), "pw")
    v.quotas.set_quota(ResourceQuota(max_secrets=2))
    v.set("a", "1")
    v.set("b", "2")
    with pytest.raises(VaultError, match="max_secrets"):
        v.set("c", "3")
    v.set("a", "updated")          # overwrites are not new secrets
    v.quotas.set_quota(ResourceQuota(max_storage_bytes=200))
    with pytest.raises(VaultError, match="max_storage_bytes"):
        v.set("big", "x" * 500)


def test_quota_ops_per_hour():
    v = TensorVault(TensorStore(), "pw")
    v.set("k", "v")
    v.quotas.set_quota(ResourceQuota(max_ops_per_hour=3))
    v.get("k")
    v.get("k")
    with pytest.raises(VaultError, match="ops/hour"):
        v.get("k")
    usage = v.quotas.usage()
    assert usage.secret_count == 1 and usage.storage_bytes > 0


# ------------------------------------------------- master-key rotation

def test_master_key_rotation_reencrypts_everything():
    store = TensorStore()
    v = TensorVault(store, "old-pw")
    v.set("a", "va")
    v.set("a", "va2")              # version history too
    v.set("b", "vb")
    snap = v.create_snapshot(label="pre")
    n = v.rotate_master_key("new-pw")
    assert n >= 4                  # a + its version + b + snapshot
    # live handle keeps working
    assert v.get("a") == "va2" and v.get("b") == "vb"
    assert v.rollback_version("a") == "va"
    # old password is dead, new password opens everything
    v_old = TensorVault(store, "old-pw")
    with pytest.raises(VaultError):
        v_old.get("b")
    v_new = TensorVault(store, "new-pw")
    assert v_new.get("b") == "vb"
    # snapshots survived the rotation
    assert v_new.restore_snapshot(snap) == 2
    assert v_new.get("a") == "va2"


def test_rotation_blocked_when_sealed():
    v = TensorVault(TensorStore(), "pw")
    v.seal()
    with pytest.raises(VaultError):
        v.rotate_master_key("pw2")


# ----------------------------------------------------------- obfuscation

def test_obfuscation_layer_primitives():
    layer = ObfuscationLayer(b"\x07" * 32)
    # deterministic keyed name MAC, different per key
    assert layer.obfuscate_key("a") == layer.obfuscate_key("a")
    assert layer.obfuscate_key("a") != layer.obfuscate_key("b")
    # a different key gives different MACs (keyed, not plain hash)
    other = ObfuscationLayer(b"\x08" * 32)
    assert other.obfuscate_key("a") != layer.obfuscate_key("a")
    # padding buckets hide exact lengths
    assert len(ObfuscationLayer.pad(b"x" * 10)) == 256
    assert len(ObfuscationLayer.pad(b"x" * 300)) == 1024
    assert ObfuscationLayer.unpad(ObfuscationLayer.pad(b"hi")) == b"hi"
    with pytest.raises(VaultError):
        ObfuscationLayer.pad(b"x" * 70_000)
    # metadata AEAD roundtrip; sizes don't leak content length
    m = layer.encrypt_metadata({"k": "v", "n": 3})
    assert layer.decrypt_metadata(m) == {"k": "v", "n": 3}


def test_obfuscated_vault_hides_names_and_lengths():
    store = TensorStore()
    v = TensorVault(store, "pw", obfuscate=True)
    v.set("super/secret-name", "tiny")
    v.set("other", "x" * 300)
    # no storage key contains a secret name
    assert not any("secret-name" in k or "other" in k
                   for k in store.keys())
    # ciphertext lengths fall into the same coarse buckets
    assert v.get("super/secret-name") == "tiny"
    assert v.get("other") == "x" * 300
    # list() still works via the encrypted index
    assert v.list() == ["other", "super/secret-name"]
    v.delete("other")
    assert v.list() == ["super/secret-name"]


def test_obfuscated_vault_master_rotation_rekeys_names():
    store = TensorStore()
    v = TensorVault(store, "pw", obfuscate=True)
    v.set("name-a", "va")
    v.set("name-b", "vb")
    before = set(store.scan("_vault:"))
    v.rotate_master_key("pw2")
    after = set(store.scan("_vault:"))
    assert before.isdisjoint(after), "storage names must be re-MAC'd"
    assert v.get("name-a") == "va"
    v2 = TensorVault(store, "pw2", obfuscate=True)
    assert sorted(v2.list()) == ["name-a", "name-b"]
    assert v2.get("name-b") == "vb"


# ---------------------------------------------------- rotation policies

def test_rotation_policies_drive_auto_rotation():
    from neumann_tpu.vault.rotation import RotationManager, RotationPolicy

    v = TensorVault(TensorStore(), "pw")
    v.set("db/pass", "orig-pw")
    v.set("api/token", "orig-tk")
    v.set("ops/manual", "orig-manual")
    mgr = RotationManager(v)
    t0 = 1000.0
    mgr.define(RotationPolicy("db/pass", interval_s=60,
                              generator="password",
                              gen_config={"length": 20},
                              notify_before_s=10, last_rotated=t0))
    mgr.define(RotationPolicy("api/token", interval_s=120,
                              generator="token", last_rotated=t0))
    mgr.define(RotationPolicy("ops/manual", interval_s=60,
                              generator="none", last_rotated=t0))
    assert len(mgr.list()) == 3
    assert mgr.due(now=t0 + 30) == []
    assert mgr.pending_notifications(now=t0 + 55) == ["db/pass"]
    assert set(mgr.due(now=t0 + 61)) == {"db/pass", "ops/manual"}

    out = mgr.rotate_due(now=t0 + 61)
    assert out == {"db/pass": "rotated", "ops/manual": "manual"}
    assert v.get("db/pass") != "orig-pw"
    assert len(v.get("db/pass")) == 20
    assert v.get("ops/manual") == "orig-manual"    # manual untouched
    assert v.rollback_version("db/pass") == "orig-pw"   # history kept
    # token rotates at its own cadence
    out = mgr.rotate_due(now=t0 + 121)
    assert out["api/token"] == "rotated"
    assert v.get("api/token").startswith("ntk_")
    # rotated policies reschedule; manual ones stay due until rotated
    assert mgr.due(now=t0 + 121) == ["ops/manual"]
    assert mgr.remove("db/pass")


def test_rotation_policy_validation():
    from neumann_tpu.vault.rotation import RotationManager, RotationPolicy

    v = TensorVault(TensorStore(), "pw")
    mgr = RotationManager(v)
    with pytest.raises(VaultError):
        mgr.define(RotationPolicy("x", interval_s=0))
    with pytest.raises(VaultError):
        mgr.define(RotationPolicy("x", interval_s=5, generator="wat"))
    with pytest.raises(VaultError):
        mgr.define(RotationPolicy("x", interval_s=5), actor="mallory")


# -------------------------------------------- statement surface (router)

def test_vault_statements_seal_unseal_rotate_master():
    from neumann_tpu.router import QueryRouter

    r = QueryRouter()
    r.init_vault("pw")
    r.execute("VAULT SET 'a' 'v1'")
    assert r.execute("VAULT SEAL").message == "vault sealed"
    with pytest.raises(Exception):
        r.execute("VAULT GET 'a'")
    with pytest.raises(Exception):
        r.execute("VAULT UNSEAL 'wrong'")
    assert "unsealed" in r.execute("VAULT UNSEAL 'pw'").message
    assert r.execute("VAULT GET 'a'").value == "v1"
    msg = r.execute("VAULT ROTATE MASTER 'pw2'").message
    assert "rotated" in msg
    assert r.execute("VAULT GET 'a'").value == "v1"
    # plain per-secret rotate still parses (MASTER is the disambiguator)
    r.execute("VAULT ROTATE 'a' 'v2'")
    assert r.execute("VAULT GET 'a'").value == "v2"
