"""Scoped vault API: delegation, response wrapping, dependencies,
dynamic secrets.

Parity with the reference's scoped-secrets surface
(integration_tests/tests/vault_pitr_sync.rs scoped_* tests over
tensor_vault's delegation.rs / dependency.rs / dynamic.rs):

- ``vault.scope(actor)`` pins an actor so call sites stop threading it
- delegation: an actor re-grants a subset of its OWN access to a child
  (capability attenuation — never more than the parent holds), with TTL
  and bulk revocation
- response wrapping: single-use, TTL'd tokens that unwrap to a secret's
  value exactly once (Vault-style cubbyhole handoff)
- dependency graph: declare secret->secret edges; impact_analysis walks
  the closure so rotations know the blast radius
- dynamic secrets: template-generated credentials (password / api-key /
  hex token) with TTL, listable and revocable
"""

from __future__ import annotations

import secrets as pysecrets
import string
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from neumann_tpu.vault.vault import Permission, _Grant
from neumann_tpu.utils.errors import VaultError


@dataclass
class DelegationRecord:
    parent: str
    child: str
    keys: List[str]
    level: Permission
    expires_at: Optional[float]


@dataclass
class ImpactReport:
    root_secret: str
    affected_secrets: List[str]


@dataclass
class DynamicSecretMeta:
    secret_id: str
    template: str
    created_at: float
    expires_at: float
    renewable: bool


@dataclass
class PasswordConfig:
    length: int = 24
    symbols: bool = True


class SecretTemplate:
    """Factory namespace for dynamic-secret templates."""

    @staticmethod
    def password(config: Optional[PasswordConfig] = None):
        return ("password", config or PasswordConfig())

    @staticmethod
    def api_key(prefix: str = "nk"):
        return ("api_key", prefix)

    @staticmethod
    def hex_token(n_bytes: int = 32):
        return ("hex_token", n_bytes)


def _generate(template) -> Tuple[str, str]:
    kind, arg = template
    if kind == "password":
        alphabet = string.ascii_letters + string.digits
        if arg.symbols:
            alphabet += "!@#$%^&*-_=+"
        value = "".join(pysecrets.choice(alphabet)
                        for _ in range(arg.length))
    elif kind == "api_key":
        value = f"{arg}-{pysecrets.token_urlsafe(24)}"
    elif kind == "hex_token":
        value = pysecrets.token_hex(arg)
    else:
        raise VaultError(f"unknown secret template '{kind}'")
    return kind, value


class ScopedVault:
    """All operations act as the pinned actor; extra state (delegations,
    wrap tokens, dependencies, dynamic secrets) lives on the underlying
    vault so every scope over it sees the same records."""

    def __init__(self, vault, actor: str):
        self.vault = vault
        self.actor = actor
        # shared per-vault state, created lazily on first scope
        if not hasattr(vault, "_scoped_state"):
            vault._scoped_state = {
                "delegations": {},   # child -> DelegationRecord
                "wraps": {},         # token -> (key, actor, expires_at)
                "deps": {},          # key -> set of dependent keys
                "dynamic": {},       # id -> (DynamicSecretMeta, value)
                "lock": threading.Lock(),
            }
        self._state = vault._scoped_state

    # -- plain lifecycle, actor pinned -------------------------------------
    def set(self, key: str, value: str) -> None:
        self.vault.set(key, value, actor=self.actor)

    def get(self, key: str) -> str:
        return self.vault.get(key, actor=self.actor)

    def rotate(self, key: str, new_value: str) -> None:
        self.vault.rotate(key, new_value, actor=self.actor)

    def delete(self, key: str) -> bool:
        return self.vault.delete(key, actor=self.actor)

    def list(self, pattern: Optional[str] = None) -> List[str]:
        return self.vault.list(pattern, actor=self.actor)

    # -- delegation ---------------------------------------------------------
    def _level_on(self, key: str) -> Optional[Permission]:
        if self.actor == self.vault.ROOT:
            return Permission.ADMIN
        g = self.vault._grants.get((self.actor, key))
        return g.level if g is not None and g.live() else None

    def delegate(self, child: str, keys: List[str], level: Permission,
                 ttl_seconds: Optional[float] = None) -> DelegationRecord:
        """Re-grant a subset of the actor's own access to `child`.
        Attenuation is enforced: the actor must hold >= `level` on every
        key it delegates."""
        for key in keys:
            held = self._level_on(key)
            if held is None or held < level:
                raise VaultError(
                    f"'{self.actor}' cannot delegate {level.name} on "
                    f"'{key}' (holds {held.name if held else 'nothing'})")
        expires = time.time() + ttl_seconds if ttl_seconds else None
        with self.vault._lock:
            for key in keys:
                self.vault._grants[(child, key)] = _Grant(level, expires)
        record = DelegationRecord(self.actor, child, list(keys), level,
                                  expires)
        with self._state["lock"]:
            self._state["delegations"][child] = record
        self.vault._log(self.actor, "delegate", ",".join(keys), True)
        return record

    def revoke_delegation(self, child: str) -> List[str]:
        with self._state["lock"]:
            record = self._state["delegations"].pop(child, None)
        if record is None:
            raise VaultError(f"no delegation to '{child}'")
        if record.parent != self.actor and self.actor != self.vault.ROOT:
            with self._state["lock"]:
                self._state["delegations"][child] = record
            raise VaultError("only the delegating parent may revoke")
        with self.vault._lock:
            for key in record.keys:
                self.vault._grants.pop((child, key), None)
        self.vault._log(self.actor, "revoke_delegation", child, True)
        return list(record.keys)

    # -- response wrapping ----------------------------------------------------
    def wrap_secret(self, key: str, ttl_ms: int) -> str:
        """Single-use token redeemable for the secret's value until the
        TTL. Access is checked NOW (at wrap time) as the wrapping actor."""
        self.get(key)  # permission + existence check
        token = pysecrets.token_urlsafe(32)
        with self._state["lock"]:
            self._state["wraps"][token] = (
                key, self.actor, time.time() + ttl_ms / 1000.0)
        return token

    def unwrap_secret(self, token: str) -> str:
        with self._state["lock"]:
            entry = self._state["wraps"].pop(token, None)
        if entry is None:
            raise VaultError("invalid or already-used wrap token")
        key, wrapper, expires_at = entry
        if time.time() > expires_at:
            raise VaultError("wrap token expired")
        return self.vault.get(key, actor=wrapper)

    # -- dependency graph -----------------------------------------------------
    def add_dependency(self, parent_key: str, child_key: str) -> None:
        with self._state["lock"]:
            deps: Dict[str, Set[str]] = self._state["deps"]
            # reject cycles: child's closure must not reach parent
            frontier, seen = [child_key], set()
            while frontier:
                cur = frontier.pop()
                if cur == parent_key:
                    raise VaultError("dependency cycle rejected")
                if cur in seen:
                    continue
                seen.add(cur)
                frontier.extend(deps.get(cur, ()))
            deps.setdefault(parent_key, set()).add(child_key)

    def impact_analysis(self, root_key: str) -> ImpactReport:
        """Transitive closure of secrets affected by rotating root_key."""
        with self._state["lock"]:
            deps = {k: set(v) for k, v in self._state["deps"].items()}
        affected: List[str] = []
        seen: Set[str] = set()
        frontier = sorted(deps.get(root_key, ()))
        while frontier:
            cur = frontier.pop(0)
            if cur in seen:
                continue
            seen.add(cur)
            affected.append(cur)
            frontier.extend(sorted(deps.get(cur, ())))
        return ImpactReport(root_key, affected)

    # -- dynamic secrets --------------------------------------------------------
    def generate_dynamic_secret(self, template, ttl_ms: int,
                                renewable: bool = False
                                ) -> Tuple[str, str]:
        kind, value = _generate(template)
        secret_id = f"dyn-{pysecrets.token_hex(8)}"
        now = time.time()
        meta = DynamicSecretMeta(secret_id, kind, now,
                                 now + ttl_ms / 1000.0, renewable)
        with self._state["lock"]:
            self._state["dynamic"][secret_id] = (meta, value)
        self.vault._log(self.actor, "dynamic_generate", secret_id, True)
        return secret_id, value

    def get_dynamic_secret(self, secret_id: str) -> str:
        with self._state["lock"]:
            entry = self._state["dynamic"].get(secret_id)
        if entry is None:
            raise VaultError(f"no dynamic secret '{secret_id}'")
        meta, value = entry
        if time.time() > meta.expires_at:
            with self._state["lock"]:
                self._state["dynamic"].pop(secret_id, None)
            raise VaultError(f"dynamic secret '{secret_id}' expired")
        return value

    def renew_dynamic_secret(self, secret_id: str, ttl_ms: int) -> None:
        with self._state["lock"]:
            entry = self._state["dynamic"].get(secret_id)
            if entry is None:
                raise VaultError(f"no dynamic secret '{secret_id}'")
            meta, value = entry
            if not meta.renewable:
                raise VaultError(
                    f"dynamic secret '{secret_id}' is not renewable")
            meta.expires_at = time.time() + ttl_ms / 1000.0

    def list_dynamic_secrets(self) -> List[DynamicSecretMeta]:
        now = time.time()
        with self._state["lock"]:
            live = {i: e for i, e in self._state["dynamic"].items()
                    if e[0].expires_at >= now}
            self._state["dynamic"] = live
            return [meta for meta, _ in live.values()]

    def revoke_dynamic_secret(self, secret_id: str) -> None:
        with self._state["lock"]:
            if self._state["dynamic"].pop(secret_id, None) is None:
                raise VaultError(f"no dynamic secret '{secret_id}'")
        self.vault._log(self.actor, "dynamic_revoke", secret_id, True)
