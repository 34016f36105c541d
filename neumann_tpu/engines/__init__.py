"""Query engines: relational, graph, vector, unified (cross-engine)."""

from neumann_tpu.engines.vector import (  # noqa: F401
    FilterCondition,
    SearchResult,
    VectorCollectionConfig,
    VectorEngine,
    VectorEngineConfig,
)
