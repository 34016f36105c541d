"""Query engines: relational, graph, vector, unified (cross-engine)."""

from neumann_tpu.engines.graph_distributed import (  # noqa: F401
    CrossShardQuery,
    DistributedConfig,
    DistributedGraphEngine,
    GraphPartitioner,
    PartitionConfig,
    PartitionStrategy,
)
from neumann_tpu.engines.vector import (  # noqa: F401
    FilterCondition,
    SearchResult,
    VectorCollectionConfig,
    VectorEngine,
    VectorEngineConfig,
)
