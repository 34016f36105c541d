"""Graph-based access control (vault/access.py ~ access.rs tests):
path checks, no-escalation-via-MEMBER, signatures, attenuation,
capacity bottlenecks, BFS depth bounds.
"""
import pytest

from neumann_tpu.vault.access import (
    MAX_BFS_DEPTH,
    AccessController,
    EdgeSigner,
    edge_type_for,
    permission_from_edge_type,
)
from neumann_tpu.vault.attenuation import AttenuationPolicy
from neumann_tpu.vault.vault import Permission


def test_entity_node_create_and_find():
    ac = AccessController()
    nid = ac.get_or_create_entity_node("user:ada")
    assert ac.find_entity_node("user:ada") == nid
    assert ac.get_or_create_entity_node("user:ada") == nid  # idempotent
    assert ac.entity_key_of(nid) == "user:ada"


def test_edge_type_mapping():
    assert permission_from_edge_type("VAULT_ACCESS_READ") == Permission.READ
    assert permission_from_edge_type("VAULT_ACCESS_ADMIN") == Permission.ADMIN
    assert permission_from_edge_type("MEMBER") is None
    assert edge_type_for(Permission.WRITE) == "VAULT_ACCESS_WRITE"


def test_check_path_direct_and_via_group():
    ac = AccessController()
    ac.add_access_edge("user:ada", "secret:db", Permission.READ)
    ac.add_member_edge("user:bob", "group:eng")
    ac.add_access_edge("group:eng", "secret:api", Permission.WRITE)
    assert ac.check_path("user:ada", "secret:db")
    assert ac.check_path("user:bob", "secret:api")
    assert not ac.check_path("user:ada", "secret:api")
    assert ac.check_path("user:ada", "user:ada")  # self


def test_non_allowlisted_edges_not_traversed():
    ac = AccessController()
    a = ac.get_or_create_entity_node("user:eve")
    b = ac.get_or_create_entity_node("secret:db")
    ac.graph.create_edge(a, b, "FRIENDS_WITH")
    assert not ac.check_path("user:eve", "secret:db")
    assert ac.get_permission_level("user:eve", "secret:db") is None


def test_member_edges_do_not_grant():
    """SECURITY: group membership reaches the group, not its secrets'
    permissions — only VAULT_ACCESS edges grant (access.rs:244)."""
    ac = AccessController()
    ac.add_member_edge("user:bob", "group:eng")
    # bob can reach the group but has no permission ON the group node
    assert ac.check_path("user:bob", "group:eng")
    assert ac.get_permission_level("user:bob", "group:eng") is None


def test_permission_via_group_max_over_paths():
    ac = AccessController()
    ac.add_member_edge("user:bob", "group:eng")
    ac.add_access_edge("group:eng", "secret:db", Permission.READ)
    ac.add_access_edge("user:bob", "secret:db", Permission.WRITE)
    assert ac.get_permission_level("user:bob", "secret:db") \
        == Permission.WRITE  # max over both paths


def test_access_edges_are_not_traversed_past():
    """VAULT_ACCESS edges point at secrets; chains through them must
    not leak (secret -> other secret)."""
    ac = AccessController()
    ac.add_access_edge("user:ada", "mid", Permission.ADMIN)
    ac.add_access_edge("mid", "secret:deep", Permission.ADMIN)
    assert ac.get_permission_level("user:ada", "secret:deep") is None


def test_direct_accessors():
    ac = AccessController()
    ac.add_access_edge("user:ada", "secret:db", Permission.READ)
    ac.add_access_edge("group:eng", "secret:db", Permission.WRITE)
    ac.add_member_edge("user:bob", "secret:db")  # member edge ignored
    assert sorted(ac.get_direct_accessors("secret:db")) \
        == ["group:eng", "user:ada"]
    assert ac.get_direct_accessors("missing") == []


def test_check_path_with_permission():
    ac = AccessController()
    ac.add_access_edge("user:ada", "secret:db", Permission.WRITE)
    assert ac.check_path_with_permission("user:ada", "secret:db",
                                         Permission.READ)
    assert ac.check_path_with_permission("user:ada", "secret:db",
                                         Permission.WRITE)
    assert not ac.check_path_with_permission("user:ada", "secret:db",
                                             Permission.ADMIN)


def test_bfs_depth_bound():
    ac = AccessController()
    # membership chain longer than MAX_BFS_DEPTH
    for i in range(MAX_BFS_DEPTH + 3):
        ac.add_member_edge(f"g{i}", f"g{i + 1}")
    ac.add_access_edge(f"g{MAX_BFS_DEPTH + 3}", "secret:far",
                       Permission.READ)
    assert not ac.check_path("g0", "secret:far")
    # a short chain still works
    ac.add_access_edge("g3", "secret:near", Permission.READ)
    assert ac.check_path("g0", "secret:near")


# -- verified variants -----------------------------------------------------------

def test_signed_edge_verifies_and_tamper_skipped():
    ac = AccessController()
    signer = EdgeSigner(b"k1")
    policy = AttenuationPolicy()
    ac.add_access_edge("user:ada", "secret:db", Permission.ADMIN,
                       signer=signer, timestamp=1234)
    assert ac.get_permission_level_verified(
        "user:ada", "secret:db", signer, policy) == Permission.ADMIN
    # verifying under a DIFFERENT key = tampered -> edge skipped
    assert ac.get_permission_level_verified(
        "user:ada", "secret:db", EdgeSigner(b"other"), policy) is None


def test_unsigned_legacy_edges_accepted_by_verified_check():
    ac = AccessController()
    ac.add_access_edge("user:ada", "secret:db", Permission.WRITE)
    assert ac.get_permission_level_verified(
        "user:ada", "secret:db", EdgeSigner(b"k"),
        AttenuationPolicy()) == Permission.WRITE


def test_attenuation_degrades_with_member_hops():
    ac = AccessController()
    signer = EdgeSigner(b"k")
    policy = AttenuationPolicy(admin_limit=1, write_limit=2, horizon=10)
    # direct admin: 1 hop -> stays ADMIN
    ac.add_access_edge("user:ada", "secret:a", Permission.ADMIN,
                       signer=signer)
    assert ac.get_permission_level_verified(
        "user:ada", "secret:a", signer, policy) == Permission.ADMIN
    # one MEMBER hop + access hop = 2 -> ADMIN attenuates to WRITE
    ac.add_member_edge("user:bob", "group:eng")
    ac.add_access_edge("group:eng", "secret:b", Permission.ADMIN,
                       signer=signer)
    assert ac.get_permission_level_verified(
        "user:bob", "secret:b", signer, policy) == Permission.WRITE
    # two MEMBER hops = 3 total -> READ
    ac.add_member_edge("user:carol", "group:outer")
    ac.add_member_edge("group:outer", "group:eng2")
    ac.add_access_edge("group:eng2", "secret:c", Permission.ADMIN,
                       signer=signer)
    assert ac.get_permission_level_verified(
        "user:carol", "secret:c", signer, policy) == Permission.READ


def test_capacity_bottleneck():
    ac = AccessController()
    signer = EdgeSigner(b"k")
    policy = AttenuationPolicy()
    ac.add_access_edge("user:ada", "secret:db", Permission.ADMIN,
                       signer=signer, capacity=Permission.READ)
    assert ac.get_permission_level_verified(
        "user:ada", "secret:db", signer, policy) == Permission.READ


def test_policy_horizon_bounds_verified_bfs():
    ac = AccessController()
    signer = EdgeSigner(b"k")
    policy = AttenuationPolicy(admin_limit=99, write_limit=99, horizon=2)
    ac.add_member_edge("u", "g1")
    ac.add_member_edge("g1", "g2")
    ac.add_member_edge("g2", "g3")
    ac.add_access_edge("g3", "secret:far", Permission.ADMIN, signer=signer)
    assert ac.get_permission_level_verified(
        "u", "secret:far", signer, policy) is None


def test_check_path_with_permission_verified():
    ac = AccessController()
    signer = EdgeSigner(b"k")
    policy = AttenuationPolicy()
    ac.add_access_edge("user:ada", "secret:db", Permission.WRITE,
                       signer=signer)
    assert ac.check_path_with_permission_verified(
        "user:ada", "secret:db", Permission.READ, signer, policy)
    assert not ac.check_path_with_permission_verified(
        "user:ada", "secret:db", Permission.ADMIN, signer, policy)


def test_edge_signer_roundtrip():
    s = EdgeSigner(b"secret-key")
    sig = s.sign_edge("a", "b", "VAULT_ACCESS_READ", 42)
    assert s.verify_edge("a", "b", "VAULT_ACCESS_READ", 42, sig)
    assert not s.verify_edge("a", "b", "VAULT_ACCESS_READ", 43, sig)
    assert not s.verify_edge("a", "x", "VAULT_ACCESS_READ", 42, sig)
    assert not s.verify_edge("a", "b", "VAULT_ACCESS_ADMIN", 42, sig)


# -- TensorVault integration (vault.rs:1204-1285) --------------------------------

def _vault():
    from neumann_tpu.store.tensor_store import TensorStore
    from neumann_tpu.vault.vault import TensorVault

    v = TensorVault(TensorStore(), master_password="pw")
    v.set("db/pass", "s3cret")
    return v


def test_vault_graph_access_via_group():
    v = _vault()
    v.enable_graph_access()
    v.add_to_group("user:bob", "group:eng")
    v.grant_path("group:eng", "db/pass", Permission.READ)
    assert v.get("db/pass", actor="user:bob") == "s3cret"
    with pytest.raises(Exception, match="has access but not WRITE"):
        v.set("db/pass", "newval", actor="user:bob")


def test_vault_graph_access_distinct_denials():
    v = _vault()
    v.enable_graph_access()
    # no path at all -> "lacks"
    with pytest.raises(Exception, match="lacks READ"):
        v.get("db/pass", actor="user:eve")
    # read path exists but admin needed -> "has access but not"
    v.grant_path("user:bob", "db/pass", Permission.READ)
    with pytest.raises(Exception, match="has access but not ADMIN"):
        v.grant("user:carol", "db/pass", actor="user:bob")


def test_vault_get_permission_merges_sources():
    v = _vault()
    v.enable_graph_access()
    assert v.get_permission("root", "db/pass") == Permission.ADMIN
    assert v.get_permission("user:bob", "db/pass") is None
    v.grant("user:bob", "db/pass", Permission.READ)        # direct
    v.grant_path("user:bob", "db/pass", Permission.WRITE)  # graph
    assert v.get_permission("user:bob", "db/pass") == Permission.WRITE


def test_vault_graph_attenuation_demotes_admin():
    from neumann_tpu.vault.attenuation import AttenuationPolicy

    v = _vault()
    v.enable_graph_access(
        attenuation=AttenuationPolicy(admin_limit=1, write_limit=2,
                                      horizon=10))
    v.add_to_group("user:bob", "group:eng")
    v.grant_path("group:eng", "db/pass", Permission.ADMIN)
    # 2 hops: ADMIN attenuates to WRITE -> write ok, admin op denied
    v.set("db/pass", "v2", actor="user:bob")
    with pytest.raises(Exception, match="has access but not ADMIN"):
        v.grant("user:x", "db/pass", actor="user:bob")


def test_vault_group_membership_requires_root():
    v = _vault()
    v.enable_graph_access()
    with pytest.raises(Exception, match="root"):
        v.add_to_group("a", "b", actor="user:mallory")


def test_vault_graph_api_requires_enablement():
    v = _vault()
    with pytest.raises(Exception, match="enable_graph_access"):
        v.add_to_group("a", "b")
