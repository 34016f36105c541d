"""tensor_checkpoint parity: named + auto checkpoints with rollback."""

from neumann_tpu.checkpoint.manager import (  # noqa: F401
    CheckpointManager,
    DESTRUCTIVE_OPS,
)
