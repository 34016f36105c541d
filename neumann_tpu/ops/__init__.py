"""Device-side compute kernels: the metric path of the engine.

The reference's hot loop is a rayon+SIMD brute-force scan over per-key
embeddings (vector_engine/src/lib.rs:2144-2168, tensor_store/src/hnsw.rs:160-245).
Here the corpus is one HBM-resident [N, d] device array and the scan is a
single MXU matmul with a fused top-k — plus bitmask fusion for predicate /
graph-constrained search and in-register dequantization for quantized
corpora.
"""

from neumann_tpu.ops.scan import (  # noqa: F401
    METRICS,
    host_pull,
    topk_scan,
    score_all,
)
from neumann_tpu.ops.quant import (  # noqa: F401
    scalar_quantize,
    scalar_dequantize,
    binary_quantize,
    hamming_topk,
    int8_topk_scan,
    int8_pooled_topk,
    int8_cosine_row_mult,
)
