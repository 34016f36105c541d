"""neumann_tpu — a TPU-native unified data engine.

One store where an entity's relational fields, graph edges, and vector
embedding live together and are queried in a single statement (SQL-ish +
graph + SIMILAR + hybrid similar-and-connected).

Built from scratch for TPU: the embedding corpus is an HBM-resident device
array; SIMILAR is an MXU matmul distance scan with fused top-k; WHERE
predicates and CONNECTED-TO constraints compile to bitmasks applied inside
the scan (the Rust reference post-filters on the host,
tensor_unified/src/lib.rs:918-927 — we fuse); corpora beyond one chip shard
across a jax.sharding.Mesh with shard-local top-k and an all-gather merge.

Capability surface modeled on Shadylukin/Neumann (see SURVEY.md).
"""

__version__ = "0.1.0"

from neumann_tpu.store.tensor_store import (  # noqa: F401
    ScalarValue,
    TensorData,
    TensorStore,
    TensorValue,
)


def _lazy(name):
    import importlib

    return importlib.import_module(name)


def open_shell(**kwargs):
    """Launch the interactive REPL (equivalent of the `neumann` shell)."""
    from neumann_tpu.shell import Shell

    Shell(**kwargs).run()
