"""Shared utilities: shape padding, rounding, error types, timers."""

from neumann_tpu.utils.errors import (  # noqa: F401
    NeumannError,
    ParseError,
    RelationalError,
    GraphError,
    VectorError,
    StoreError,
    VaultError,
)
from neumann_tpu.utils.shapes import (  # noqa: F401
    round_up,
    cdiv,
    pad_rows,
    pad_cols,
)
