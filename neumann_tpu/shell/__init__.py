"""Interactive shell (REPL) — the `neumann` CLI equivalent."""

from neumann_tpu.shell.shell import Shell, format_result  # noqa: F401
