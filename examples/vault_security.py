"""Vault security tour: seal/unseal, policies, quotas, rotation,
obfuscation, and access intelligence (blast radius, trust diffusion,
audit). Run: python examples/vault_security.py
"""

from neumann_tpu.router import QueryRouter
from neumann_tpu.vault import (
    AccessTensor,
    AccessTopology,
    GraphIntel,
    HeatKernelTrust,
    Permission,
    PolicyTemplate,
    ResourceQuota,
    RotationManager,
    RotationPolicy,
)


def main():
    r = QueryRouter()
    r.init_vault("hunter2")
    vault = r.vault

    # secrets + grants through the query language
    r.execute("VAULT SET 'db/dsn' 'postgres://prod'")
    r.execute("VAULT SET 'api/stripe' 'sk_live_...'")
    r.execute("VAULT GRANT 'svc/billing' ON 'api/stripe'")
    vault.grant("svc/billing", "api/stripe", Permission.WRITE)
    vault.grant("team:eng/alice", "db/dsn", Permission.ADMIN)

    # attribute-based policy: every eng teammate can read db/*
    vault.policies.define(PolicyTemplate(
        "eng-read-db", "team:eng/*", "db/*", int(Permission.READ)))
    print("alice via policy:",
          vault.get("db/dsn", actor="team:eng/bob")[:12], "...")

    # quotas
    vault.quotas.set_quota(ResourceQuota(max_secrets=100,
                                         max_ops_per_hour=10_000))
    print("usage:", vault.quotas.usage())

    # declarative rotation: stripe key auto-rotates hourly
    mgr = RotationManager(vault)
    mgr.define(RotationPolicy("api/stripe", interval_s=3600,
                              generator="token",
                              gen_config={"prefix": "sk_live_"}))
    print("rotation due now:", mgr.due())

    # intelligence: who can reach what, and is it healthy?
    gi = GraphIntel(vault)
    print("blast radius of team:eng/alice:",
          gi.blast_radius("team:eng/alice"))
    print("why can billing touch stripe:",
          gi.explain_access("svc/billing", "api/stripe"))
    audit = gi.audit()
    print("sole admins:", audit.sole_admins)

    # trust diffusion + usage tensor
    for _ in range(3):
        vault.get("api/stripe", actor="svc/billing")
    trust = HeatKernelTrust(vault).trust_from(["team:eng/alice"])
    print("diffused trust:", {k: round(v, 3)
                              for k, v in trust.items()})
    tensor = AccessTensor(vault)
    print("hot pairs:", tensor.hot_pairs(2))

    # the whole permission structure as one tensor
    topo = AccessTopology(vault, enable_tt=False)
    print("billing on stripe:",
          topo.check("svc/billing", "api/stripe"))

    # seal for the night; unseal with the master password
    r.execute("VAULT SEAL")
    try:
        r.execute("VAULT GET 'db/dsn'")
    except Exception as e:
        print("while sealed:", type(e).__name__)
    r.execute("VAULT UNSEAL 'hunter2'")
    print("unsealed:", r.execute("VAULT GET 'db/dsn'").value[:12], "...")

    # rotate the master key: every ciphertext re-encrypts
    msg = r.execute("VAULT ROTATE MASTER 'correct-horse'").message
    print(msg)


if __name__ == "__main__":
    main()
