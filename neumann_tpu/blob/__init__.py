"""tensor_blob parity: content-addressed chunked object storage."""

from neumann_tpu.blob.blob_store import BlobStore, BlobWriter  # noqa: F401
