

def test_read_detects_chunk_corruption():
    """Chunks are content-addressed; a flipped bit in a stored chunk
    must surface as BlobError on read, never as silent wrong data."""
    import pytest

    from neumann_tpu.store import TensorStore, TensorValue
    from neumann_tpu.blob.blob_store import BlobStore
    from neumann_tpu.utils.errors import BlobError

    store = TensorStore()
    b = BlobStore(store)
    bid = b.put("x.bin", b"payload " * 5000)
    for k in store.scan(""):
        d = store.get(k)
        for fname, tv in list(d.fields.items()):
            if tv.kind == "scalar" and isinstance(tv.value, bytes) \
                    and len(tv.value) > 100:
                v = bytearray(tv.value)
                v[50] ^= 0xFF
                d.fields[fname] = TensorValue.scalar(bytes(v))
                break
    with pytest.raises(BlobError):
        b.get(bid)
    assert b.verify(bid) is False
