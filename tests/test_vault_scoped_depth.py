"""Round-3 vault depth: delegation chains + attenuation, weighted
dependencies + rotation plans, persisted wrapping, template store,
durable dynamic secrets, manifold placement.

Mirrors tensor_vault/src/{attenuation,delegation,dependency,dynamic,
wrapping,template_store,manifold}.rs behavior.
"""

import time

import numpy as np
import pytest

from neumann_tpu.store.tensor_store import TensorStore
from neumann_tpu.utils.errors import VaultError
from neumann_tpu.vault import (
    AttenuationPolicy,
    ExponentialAttenuationPolicy,
    ManifoldPlacer,
    Permission,
    PlacementConfig,
    SecretTemplate,
    TensorVault,
    VaultRegion,
)
from neumann_tpu.vault.sync import GeoCoordinate


def _vault(store=None):
    # NB: `store or TensorStore()` would discard an *empty* store —
    # TensorStore defines __len__, so a fresh store is falsy.
    if store is None:
        store = TensorStore()
    return TensorVault(store=store, master_password="pw")


# -- attenuation --------------------------------------------------------------

def test_step_attenuation_thresholds():
    p = AttenuationPolicy()  # admin<=1, write<=2, horizon 10
    assert p.attenuate(Permission.ADMIN, 1) == Permission.ADMIN
    assert p.attenuate(Permission.ADMIN, 2) == Permission.WRITE
    assert p.attenuate(Permission.ADMIN, 3) == Permission.READ
    assert p.attenuate(Permission.WRITE, 2) == Permission.WRITE
    assert p.attenuate(Permission.WRITE, 3) == Permission.READ
    assert p.attenuate(Permission.READ, 9) == Permission.READ
    assert p.attenuate(Permission.ADMIN, 11) is None
    none = AttenuationPolicy.none()
    assert none.attenuate(Permission.ADMIN, 100) == Permission.ADMIN


def test_exponential_attenuation():
    p = ExponentialAttenuationPolicy()  # decay 0.5
    # exp(-0.5)=0.607 -> below admin 0.7, above write 0.3
    assert p.attenuate(Permission.ADMIN, 0) == Permission.ADMIN
    assert p.attenuate(Permission.ADMIN, 1) == Permission.WRITE
    # exp(-1.5)=0.223 -> read band
    assert p.attenuate(Permission.ADMIN, 3) == Permission.READ
    # exp(-3)=0.0498 < read threshold
    assert p.attenuate(Permission.ADMIN, 6) is None
    assert p.attenuate(Permission.READ, 21) is None  # past max_depth


def test_attenuation_batch_matches_scalar():
    for p in (AttenuationPolicy(), ExponentialAttenuationPolicy()):
        levels = np.array([3, 3, 3, 2, 2, 1, 3])
        hops = np.array([1, 2, 3, 2, 4, 5, 50])
        got = p.attenuate_batch(levels, hops)
        for lv, h, g in zip(levels, hops, got):
            want = p.attenuate(Permission(int(lv)), int(h))
            assert int(g) == (0 if want is None else int(want))


# -- delegation chains --------------------------------------------------------

def test_delegation_chain_attenuates_and_limits_depth():
    v = _vault()
    root = v.scope(v.ROOT)
    root.set("chain/secret", "s")
    v.grant("a", "chain/secret", Permission.ADMIN)
    # a (depth 0) -> b at depth 1: ADMIN preserved
    rec_b = v.scope("a").delegate("b", ["chain/secret"], Permission.ADMIN)
    assert rec_b.level == Permission.ADMIN and rec_b.depth == 1
    # b -> c at depth 2: ADMIN decays to WRITE
    rec_c = v.scope("b").delegate("c", ["chain/secret"], Permission.ADMIN)
    assert rec_c.level == Permission.WRITE and rec_c.depth == 2
    # c cannot delegate ADMIN (only holds WRITE)
    with pytest.raises(VaultError):
        v.scope("c").delegate("d", ["chain/secret"], Permission.ADMIN)
    # c -> d at depth 3: WRITE decays to READ
    rec_d = v.scope("c").delegate("d", ["chain/secret"], Permission.WRITE)
    assert rec_d.level == Permission.READ and rec_d.depth == 3
    assert v.get("chain/secret", actor="d") == "s"
    # depth limit
    sc = v.scope("d")
    for nxt in ("e", "f"):
        sc = sc if False else v.scope(sc.delegate(
            nxt, ["chain/secret"], Permission.READ).child)
    with pytest.raises(VaultError):
        v.scope("f").delegate("g", ["chain/secret"], Permission.READ)


def test_cascading_revocation():
    v = _vault()
    v.scope(v.ROOT).set("casc/s", "x")
    v.grant("p", "casc/s", Permission.ADMIN)
    v.scope("p").delegate("c1", ["casc/s"], Permission.WRITE)
    v.scope("c1").delegate("c2", ["casc/s"], Permission.WRITE)
    v.scope("c2").delegate("c3", ["casc/s"], Permission.READ)
    ps = v.scope("p")
    assert ps.descendants_of("p") == ["c1", "c2", "c3"]
    assert ps.children_of("p") == ["c1"]
    assert ps.delegation_depth("c3") == 3
    ps.revoke_delegation("c1")  # cascades
    for child in ("c1", "c2", "c3"):
        with pytest.raises(VaultError):
            v.get("casc/s", actor=child)
    assert ps.descendants_of("p") == []


def test_delegations_persist_across_reopen():
    store = TensorStore()
    v = _vault(store)
    v.scope(v.ROOT).set("per/s", "v1")
    v.grant("p", "per/s", Permission.ADMIN)
    v.scope("p").delegate("kid", ["per/s"], Permission.READ)
    # reopen over the same store: grants re-apply from persisted records
    v2 = _vault(store)
    sc = v2.scope(v2.ROOT)
    assert v2.get("per/s", actor="kid") == "v1"
    assert sc.delegation_depth("kid") == 1
    # expired delegations are dropped on reload
    v2.scope("p").delegate("ephem", ["per/s"], Permission.READ,
                           ttl_seconds=0.05)
    time.sleep(0.1)
    v3 = _vault(store)
    with pytest.raises(VaultError):
        v3.get("per/s", actor="ephem")


def test_cleanup_expired_delegations():
    v = _vault()
    v.scope(v.ROOT).set("cl/s", "x")
    v.grant("p", "cl/s", Permission.ADMIN)
    v.scope("p").delegate("tmp", ["cl/s"], Permission.READ,
                          ttl_seconds=0.05)
    time.sleep(0.1)
    assert v.scope(v.ROOT).cleanup_expired_delegations() == 1
    with pytest.raises(VaultError):
        v.get("cl/s", actor="tmp")


# -- weighted dependencies ----------------------------------------------------

def test_weighted_impact_and_rotation_plan():
    v = _vault()
    sc = v.scope(v.ROOT)
    for k in ("db", "api", "worker", "edge"):
        sc.set(f"w/{k}", k)
    sc.add_dependency("w/db", "w/api", weight="critical")
    sc.add_dependency("w/db", "w/worker", weight="low")
    sc.add_dependency("w/api", "w/edge", weight="high")
    v.grant("svc-api", "w/api", Permission.READ)
    v.grant("svc-edge", "w/edge", Permission.READ)

    rep = sc.weighted_impact_analysis("w/db")
    by_name = {a.secret: a for a in rep.affected_secrets}
    assert by_name["w/api"].impact_score == pytest.approx(1.0)     # 1.0/1
    assert by_name["w/worker"].impact_score == pytest.approx(0.1)  # 0.1/1
    assert by_name["w/edge"].impact_score == pytest.approx(0.35)   # 0.7/2
    assert rep.max_depth == 2
    assert rep.total_impact_score == pytest.approx(1.45)
    assert set(rep.affected_agents) == {"svc-api", "svc-edge"}

    plan = sc.rotation_plan("w/db")
    assert [s.secret for s in plan.rotation_order] == \
        ["w/api", "w/edge", "w/worker"]
    assert plan.total_secrets == 3

    # plain report gains agents + depth too
    basic = sc.impact_analysis("w/db")
    assert basic.depth == 2 and set(basic.affected_agents) == \
        {"svc-api", "svc-edge"}

    # dependency introspection + removal
    assert sc.get_dependents("w/db") == ["w/api", "w/worker"]
    assert sc.get_dependencies("w/edge") == ["w/api"]
    assert sc.remove_dependency("w/db", "w/worker")
    assert not sc.remove_dependency("w/db", "w/worker")
    assert sc.get_dependents("w/db") == ["w/api"]


def test_dependencies_persist_across_reopen():
    store = TensorStore()
    v = _vault(store)
    sc = v.scope(v.ROOT)
    sc.add_dependency("pd/a", "pd/b", weight="high")
    v2 = _vault(store)
    rep = v2.scope(v2.ROOT).weighted_impact_analysis("pd/a")
    assert [a.secret for a in rep.affected_secrets] == ["pd/b"]
    assert rep.affected_secrets[0].weight == "high"


def test_unknown_weight_rejected():
    v = _vault()
    with pytest.raises(VaultError):
        v.scope(v.ROOT).add_dependency("x", "y", weight="severe")


# -- wrapping -----------------------------------------------------------------

def test_wrap_captures_value_at_wrap_time():
    v = _vault()
    sc = v.scope(v.ROOT)
    sc.set("wr/s", "original")
    token = sc.wrap_secret("wr/s", 60_000)
    sc.rotate("wr/s", "rotated")
    assert sc.unwrap_secret(token) == "original"  # captured at wrap time
    with pytest.raises(VaultError):
        sc.unwrap_secret(token)  # single use


def test_wrap_tokens_persist_and_expire():
    store = TensorStore()
    v = _vault(store)
    sc = v.scope(v.ROOT)
    token = sc.wrap_value("free-floating", 60_000)
    info = sc.wrapping_token_info(token)
    assert info is not None and not info.consumed
    # reopen: token still redeemable (ciphertext persisted, AAD = token)
    v2 = _vault(store)
    assert v2.scope(v2.ROOT).unwrap_secret(token) == "free-floating"
    assert v2.scope(v2.ROOT).wrapping_token_info(token) is None
    # expiry consumes the token too
    t2 = sc.wrap_value("late", 1)
    time.sleep(0.05)
    with pytest.raises(VaultError, match="expired"):
        v.scope(v.ROOT).unwrap_secret(t2)
    with pytest.raises(VaultError, match="invalid"):
        v.scope(v.ROOT).unwrap_secret(t2)


# -- templates + dynamic secrets ----------------------------------------------

def test_template_store_roundtrip():
    store = TensorStore()
    v = _vault(store)
    sc = v.scope(v.ROOT)
    sc.save_template("db-pass", SecretTemplate.password())
    sc.save_template("svc-key", SecretTemplate.api_key(prefix="svc"))
    assert sc.list_templates() == ["db-pass", "svc-key"]
    # generate by stored name; persisted across reopen
    v2 = _vault(store)
    sid, value = v2.scope(v2.ROOT).generate_dynamic_secret(
        "svc-key", ttl_ms=60_000)
    assert value.startswith("svc-")
    assert v2.scope(v2.ROOT).get_dynamic_secret(sid) == value
    assert sc.delete_template("db-pass")
    assert sc.list_templates() == ["svc-key"]
    with pytest.raises(VaultError):
        sc.get_template("db-pass")


def test_dynamic_secret_survives_reopen():
    store = TensorStore()
    v = _vault(store)
    sid, value = v.scope(v.ROOT).generate_dynamic_secret(
        SecretTemplate.hex_token(16), ttl_ms=60_000, renewable=True)
    v2 = _vault(store)
    sc2 = v2.scope(v2.ROOT)
    assert sc2.get_dynamic_secret(sid) == value
    metas = sc2.list_dynamic_secrets()
    assert [m.secret_id for m in metas] == [sid]
    sc2.renew_dynamic_secret(sid, ttl_ms=120_000)
    sc2.revoke_dynamic_secret(sid)
    with pytest.raises(VaultError):
        sc2.get_dynamic_secret(sid)


# -- manifold placement ---------------------------------------------------------

def _regions():
    return [
        VaultRegion("us-east", GeoCoordinate(0.0, 0.0), capacity=100,
                    latencies={"eu-west": 80.0, "ap-south": 200.0}),
        VaultRegion("eu-west", GeoCoordinate(10.0, 0.0), capacity=100,
                    latencies={"us-east": 80.0, "ap-south": 150.0}),
        VaultRegion("ap-south", GeoCoordinate(20.0, 5.0), capacity=100,
                    latencies={"us-east": 200.0, "eu-west": 150.0}),
    ]


def test_placement_prefers_accessor_centroid():
    placer = ManifoldPlacer(PlacementConfig(replica_count=1))
    for r in _regions():
        placer.add_region(r)
    placer.set_entity_location("alice", GeoCoordinate(9.0, 1.0))
    placer.set_entity_location("bob", GeoCoordinate(11.0, -1.0))
    rec = placer.recommend_placement("sec/eu", ["alice", "bob"])
    assert rec.primary_region == "eu-west"
    assert len(rec.replica_regions) == 1
    assert rec.access_centroid.x == pytest.approx(10.0)


def test_placement_load_balance_steers_away_from_full_region():
    placer = ManifoldPlacer(PlacementConfig(
        locality_weight=0.1, load_balance_weight=0.9, replica_count=0))
    regions = _regions()
    regions[1].current_load = 100  # eu-west full
    for r in regions:
        placer.add_region(r)
    placer.set_entity_location("alice", GeoCoordinate(10.0, 0.0))
    rec = placer.recommend_placement("sec/x", ["alice"])
    assert rec.primary_region != "eu-west"


def test_batch_recommend_vectorizes_many_secrets():
    placer = ManifoldPlacer()
    for r in _regions():
        placer.add_region(r)
    placer.set_entity_location("us-user", GeoCoordinate(0.5, 0.0))
    placer.set_entity_location("ap-user", GeoCoordinate(19.5, 5.0))
    recs = placer.batch_recommend([
        ("s/us", ["us-user"]), ("s/ap", ["ap-user"]),
        ("s/unlocated", ["ghost"]),
    ])
    assert recs[0].primary_region == "us-east"
    assert recs[1].primary_region == "ap-south"
    assert len(recs) == 3
    placer.record_placement("us-east", 5)
    assert [r for r in placer.regions()
            if r.name == "us-east"][0].current_load == 5
