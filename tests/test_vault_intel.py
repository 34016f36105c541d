"""Vault access intelligence (vault/intel.py): access tensor, heat
kernel trust diffusion, graph introspection, secret similarity
(tensor_vault/src/{access_tensor,heat_kernel,graph_intel,similarity}.rs
capability)."""

import numpy as np
import pytest

from neumann_tpu.store.tensor_store import TensorStore
from neumann_tpu.vault import Permission, TensorVault
from neumann_tpu.vault.intel import (
    AccessTensor,
    AccessTensorConfig,
    GraphIntel,
    HeatKernelTrust,
    SecretSimilarity,
)


@pytest.fixture
def busy_vault():
    v = TensorVault(TensorStore(), "pw")
    for name in ("db/main", "db/replica", "api/key", "ops/cert"):
        v.set(name, f"value-{name}")
    v.grant("alice", "db/main", Permission.ADMIN)
    v.grant("alice", "db/replica", Permission.WRITE)
    v.grant("bob", "db/main", Permission.READ)
    v.grant("bob", "api/key", Permission.WRITE)
    v.grant("eve", "ops/cert", Permission.READ)
    for _ in range(10):
        v.get("db/main", actor="alice")
    for _ in range(4):
        v.get("db/main", actor="bob")
    v.get("ops/cert", actor="eve")
    v.set("db/replica", "new", actor="alice")
    return v


def test_access_tensor_marginals_and_hot_pairs(busy_vault):
    t = AccessTensor(busy_vault)
    act = t.entity_activity()
    assert act["alice"] > act["bob"] > act["eve"]
    hot = t.hot_pairs(2)
    assert hot[0][0] == "alice" and hot[0][1] == "db/main"
    prof = t.temporal_profile("alice")
    assert prof.sum() >= 10
    assert t.temporal_profile("nobody").sum() == 0
    # all recent activity -> second-half usage only -> drift present
    assert 0.0 <= t.drift_score("alice") <= 1.0


def test_access_tensor_operation_filter(busy_vault):
    t = AccessTensor(busy_vault, AccessTensorConfig(
        operations=["set"]))
    act = t.entity_activity()
    # only alice (and root's initial sets) wrote
    assert act.get("bob", 0) == 0 and act.get("eve", 0) == 0


def test_heat_kernel_trust_diffuses_through_shared_secrets(busy_vault):
    hk = HeatKernelTrust(busy_vault, t=1.0, terms=8)
    trust = hk.trust_from(["alice"])
    # bob shares db/main with alice -> gets diffused trust; eve is on
    # a disconnected island (ops/cert) -> none
    assert trust["alice"] > trust["bob"] > 0.0
    assert trust.get("eve", 0.0) == pytest.approx(0.0, abs=1e-6)
    t = AccessTensor(busy_vault)
    anoms = hk.low_trust_heavy_hitters(t, seeds=["alice"])
    assert "bob" not in anoms          # trusted via shared secret


def test_graph_intel_blast_radius_and_explain(busy_vault):
    gi = GraphIntel(busy_vault)
    assert gi.blast_radius("alice") == ["db/main", "db/replica"]
    assert gi.blast_radius("nobody") == []
    why = gi.explain_access("alice", "db/main")
    assert any("ADMIN" in r for r in why)
    assert gi.explain_access("eve", "db/main") == ["no access"]
    # policies count toward the radius
    from neumann_tpu.vault.policy import PolicyTemplate

    busy_vault.policies.define(PolicyTemplate(
        "ops", "eve", "ops/*", int(Permission.READ)))
    assert "ops/cert" in gi.blast_radius("eve")
    assert any("policy 'ops'" in r
               for r in gi.explain_access("eve", "ops/cert"))
    sim = gi.simulate_grant("eve", "db/main")
    assert sim["after"] == sim["before"] + 1
    assert sim["added"] == ["db/main"]


def test_graph_intel_audit(busy_vault):
    gi = GraphIntel(busy_vault)
    audit = gi.audit()
    # alice is the sole admin of db/main
    assert ("alice", "db/main") in audit.sole_admins
    # bob never used api/key though granted WRITE
    assert ("bob", "api/key") in audit.unused_grants
    # bob only ever read db/main... his grant there is READ (fine);
    # eve read ops/cert with READ (fine) -> not over-privileged
    assert ("eve", "ops/cert") not in audit.over_privileged
    # alice WROTE db/replica, so not flagged there
    assert ("alice", "db/replica") not in audit.over_privileged


def test_graph_intel_over_privilege(busy_vault):
    # grant carol WRITE but she only reads
    busy_vault.grant("carol", "api/key", Permission.WRITE)
    busy_vault.get("api/key", actor="carol")
    audit = GraphIntel(busy_vault).audit()
    assert ("carol", "api/key") in audit.over_privileged


def test_secret_similarity(busy_vault):
    sim = SecretSimilarity(busy_vault)
    out = sim.similar("db/main", k=3)
    assert len(out) == 3
    keys = [k for k, _ in out]
    assert "db/main" not in keys
    assert sim.similar("nope") == []
    # scores are cosines in [-1, 1]
    assert all(-1.001 <= s <= 1.001 for _, s in out)


def test_access_topology_matrix_and_diff(busy_vault):
    from neumann_tpu.vault.intel import AccessTopology

    topo = AccessTopology(busy_vault, enable_tt=False)
    c = topo.check("alice", "db/main")
    assert c["has_read"] and c["has_write"] and c["has_admin"]
    c = topo.check("bob", "db/main")
    assert c["has_read"] and not c["has_write"]
    assert not topo.check("nobody", "db/main")["has_read"]
    out = topo.batch_check([("alice", "db/main"), ("eve", "db/main")])
    assert out[0]["has_admin"] and not out[1]["has_read"]

    # drift: grant carol, rebuild, diff shows the addition
    busy_vault.grant("carol", "api/key")
    topo2 = AccessTopology(busy_vault, enable_tt=False)
    d = topo.diff(topo2)
    assert ("carol", "api/key", "read") in d["added"]
    assert d["removed"] == []


def test_access_topology_tt_compression(busy_vault):
    from neumann_tpu.vault.intel import AccessTopology

    topo = AccessTopology(busy_vault, enable_tt=True,
                          compression_threshold=1)
    stats = topo.compression_stats()
    assert stats["compressed"] and stats["ratio"] > 0
    # queries still exact on the uncompressed view
    assert topo.check("alice", "db/main")["has_admin"]
