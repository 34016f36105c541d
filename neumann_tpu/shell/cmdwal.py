"""Command-history WAL: statement-level crash recovery for the shell.

Parity with the reference shell's WAL (neumann_shell/src/wal.rs +
lib.rs:186-220,365-372,478-503): after ``LOAD '<snap>'`` the shell
replays ``<snap>.log`` (every write statement issued since the last
SAVE) and then appends each successful write statement to it;
``SAVE`` truncates it. This complements the byte-level TensorStore WAL
(--wal-dir): snapshot+command-replay durability works even when the
store WAL is off, and the log doubles as a human-readable session
history.

Recovery modes (wal.rs WalRecoveryMode): ``strict`` stops at the first
statement that fails to replay (consistency first); ``recover`` skips
failures and reports them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

__all__ = ["CommandWal", "ReplayResult", "is_write_command"]


@dataclass
class ReplayResult:
    replayed: int = 0
    skipped: List[str] = field(default_factory=list)   # "stmt: error"

    def summary(self) -> str:
        msg = f"replayed {self.replayed} command(s) from WAL"
        if self.skipped:
            msg += f"; skipped {len(self.skipped)} failed"
        return msg


class CommandWal:
    """Append-only statement log, one UTF-8 line per write statement,
    fsync'd per append (wal.rs append)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a", encoding="utf-8")

    def append(self, stmt: str) -> None:
        # newlines inside multi-line statements collapse to spaces so
        # one WAL line is always one statement
        self._f.write(stmt.replace("\n", " ").strip() + "\n")
        self._f.flush()
        os.fsync(self._f.fileno())

    def truncate(self) -> None:
        self._f.close()
        self._f = open(self.path, "w", encoding="utf-8")

    def size_bytes(self) -> int:
        try:
            return os.path.getsize(self.path)
        except OSError:
            return 0

    def close(self) -> None:
        try:
            self._f.close()
        except OSError:
            pass

    @staticmethod
    def read_commands(path: str) -> List[str]:
        with open(path, encoding="utf-8") as f:
            return [ln.strip() for ln in f if ln.strip()]

    @staticmethod
    def replay(path: str, execute, mode: str = "strict"
               ) -> ReplayResult:
        """Replay each command through ``execute`` (a callable raising
        on failure). strict: re-raise on the first failure; recover:
        collect and continue."""
        out = ReplayResult()
        for stmt in CommandWal.read_commands(path):
            try:
                execute(stmt)
                out.replayed += 1
            except Exception as e:
                if mode == "strict":
                    raise RuntimeError(
                        f"WAL replay failed at {stmt!r}: {e}\n"
                        f"(replayed {out.replayed}; rerun with "
                        f"--wal-recovery recover to skip)") from e
                out.skipped.append(f"{stmt}: {e}")
        return out


_WRITE_FIRST = frozenset((
    "INSERT", "UPDATE", "DELETE", "CREATE", "DROP", "ALTER",
    "CHECKPOINT", "ROLLBACK", "BEGIN", "COMMIT", "ENTITY", "CONNECT",
    "MERGE", "UNWIND",
))


def is_write_command(stmt: str) -> bool:
    """Statement-level write classification (lib.rs:186-220). Only
    write statements enter the command WAL — reads replay to nothing."""
    upper = " ".join(stmt.upper().split())
    first = upper.split(" ", 1)[0] if upper else ""
    if first in _WRITE_FIRST:
        return True
    if first == "NODE" or first == "EDGE":
        return not upper.startswith((f"{first} GET", f"{first} COUNT"))
    if first == "EMBED":
        return not upper.startswith(("EMBED GET", "EMBED SEARCH"))
    if first == "VAULT":
        return upper.startswith((
            "VAULT SET", "VAULT DELETE", "VAULT ROTATE", "VAULT GRANT",
            "VAULT REVOKE", "VAULT SEAL", "VAULT UNSEAL"))
    if first == "CACHE":
        return upper.startswith(("CACHE PUT", "CACHE CLEAR",
                                 "CACHE EVICT"))
    if first == "BLOB":
        return upper.startswith((
            "BLOB PUT", "BLOB DELETE", "BLOB LINK", "BLOB UNLINK",
            "BLOB TAG", "BLOB UNTAG", "BLOB GC", "BLOB REPAIR"))
    return False
