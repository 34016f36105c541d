"""tensor_cache parity: 3-layer LLM response cache."""

from neumann_tpu.cache.llm_cache import LLMCache, CacheStats  # noqa: F401
