"""Mesh scaling: sharded corpora, scatter-gather top-k, partitioners.

The reference scales with consistent-hash/semantic/Voronoi partitioners
plus scatter-gather TopK merge over TCP (query_router/src/distributed.rs).
Here the corpus shards across a jax.sharding.Mesh; each device scans its
rows and the merge is a single ICI all-gather + top-k — no host hops.
"""

from neumann_tpu.parallel.mesh import make_mesh  # noqa: F401
from neumann_tpu.parallel.sharded_search import (  # noqa: F401
    ShardedCorpus,
    ShardedIVFCorpus,
    make_sharded_topk,
)
from neumann_tpu.parallel.partitioner import (  # noqa: F401
    ConsistentHashPartitioner,
    SemanticPartitioner,
    VoronoiPartitioner,
)
