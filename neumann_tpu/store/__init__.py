"""Storage core: host-side KV/value model + device-resident slabs.

The reference's tensor_store routes keys by prefix to specialized slabs
(tensor_store/src/slab_router.rs:9-15): emb:* -> EmbeddingSlab,
node:*/edge:* -> GraphTensor, table:* -> RelationalSlab. Here the same
routing exists, but the embedding slab's backing store is a padded device
array in HBM (the corpus IS the tensor), and relational/graph slabs keep
columnar/CSR mirrors that can materialize to device arrays for masked
scans.
"""

from neumann_tpu.store.sparse import SparseVector  # noqa: F401
from neumann_tpu.store.tensor_store import (  # noqa: F401
    ScalarValue,
    TensorData,
    TensorStore,
    TensorValue,
)
from neumann_tpu.store.entity_index import EntityIndex  # noqa: F401
from neumann_tpu.store.embedding_slab import EmbeddingSlab  # noqa: F401
