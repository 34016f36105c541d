"""Fuzz wave 9 — metric × quantization matrix and REST body storms.

Targets the seams opened by the full ten-metric surface: every
(metric, quantization) pair must produce well-formed results on
hostile data (zero rows, duplicate rows, sparse supports, tiny and
padded dims), and the REST collection API must never 500 on arbitrary
config bodies. Mirrors the generative style of the reference's
vector_engine_ops / parser_parse_all fuzz targets.
"""

import json

import numpy as np
import pytest

from neumann_tpu.engines.vector import (
    VectorCollectionConfig,
    VectorEngine,
)
from neumann_tpu.ops.scan import METRICS
from neumann_tpu.utils.errors import VectorError

QUANTS = ("none", "int8", "binary", "pq", "tt")


def _hostile_corpus(rng, n, d):
    """Rows with zero vectors, duplicates, sparse supports, huge and
    tiny magnitudes."""
    v = rng.standard_normal((n, d)).astype(np.float32)
    v[rng.random((n, d)) < 0.4] = 0.0          # sparse supports
    v[0] = 0.0                                  # fully-zero row
    if n > 3:
        v[2] = v[1]                             # exact duplicate
    v[3] = v[3] * 1e6                           # huge magnitude
    if n > 5:
        v[5] = v[5] * 1e-6                      # tiny magnitude
    return v


@pytest.mark.parametrize("metric", METRICS)
def test_fuzz_metric_quantization_matrix(metric):
    """Every metric against every quantization mode: results reference
    only stored keys, scores are finite (or the row is omitted), result
    lists are sorted, and self-query ranks the queried row first on
    exact storage modes."""
    rng = np.random.default_rng(hash(metric) % 2**32)
    n, d = 40, 32
    vecs = _hostile_corpus(rng, n, d)
    for quant in QUANTS:
        eng = VectorEngine()
        eng.create_collection("c", VectorCollectionConfig(
            dimension=d, metric=metric, quantization=quant))
        for i in range(n):
            eng.store_in_collection("c", f"v{i}", vecs[i])
        for qi in (1, 3, 7):
            hits = eng.search_in_collection("c", vecs[qi], 5,
                                            metric=metric)
            assert len(hits) <= 5
            keys = [h.key for h in hits]
            assert len(set(keys)) == len(keys)          # no duplicates
            assert all(k.startswith("v") and int(k[1:]) < n
                       for k in keys)
            assert all(np.isfinite(h.score) for h in hits)
            scores = [h.score for h in hits]
            assert scores == sorted(scores, reverse=True), (
                metric, quant, scores)
        # exact modes must find the queried row itself (dup v1/v2 tie
        # allowed); quantized modes only need to include it in top-5
        if quant == "none":
            top = eng.search_in_collection("c", vecs[7], 3,
                                           metric=metric)
            assert any(h.key == "v7" for h in top), (metric, quant)


def test_fuzz_metric_zero_query_never_crashes():
    rng = np.random.default_rng(0)
    eng = VectorEngine()
    for i in range(10):
        eng.store_embedding(f"k{i}",
                            rng.standard_normal(8).astype(np.float32))
    zero = np.zeros(8, np.float32)
    for metric in METRICS:
        hits = eng.search_similar_with_metric(zero, 3, metric)
        # cosine-family returns [], others return well-formed results
        assert all(np.isfinite(h.score) for h in hits)


def test_fuzz_metric_dimension_mismatch_raises_cleanly():
    """Collections enforce their dimension for every metric; the bare
    namespace is multi-dim by design (a novel dim just finds no
    corpus and returns empty)."""
    eng = VectorEngine()
    eng.create_collection("c", VectorCollectionConfig(dimension=16))
    eng.store_in_collection("c", "a", np.ones(16, np.float32))
    eng.store_embedding("a", np.ones(16, np.float32))
    for metric in METRICS:
        with pytest.raises(VectorError):
            eng.search_in_collection("c", np.ones(8, np.float32), 3,
                                     metric=metric)
        assert eng.search_similar_with_metric(
            np.ones(8, np.float32), 3, metric) == []


def test_fuzz_rest_collection_config_bodies_never_500():
    """Arbitrary config-shaped JSON against PUT /collections/<name>:
    every reply is 2xx/4xx, never 500, and a valid create (including
    the new metric names) still works after the storm."""
    import random
    import urllib.error
    import urllib.request

    from neumann_tpu.server.rest import RestServer

    rng = random.Random(909)

    def rand_val(depth=0):
        roll = rng.random()
        if depth > 2 or roll < 0.4:
            return rng.choice([0, -1, 3.5, "cosine", "angular", "nope",
                               True, None, 10**18, "", [], {}])
        if roll < 0.6:
            return [rand_val(depth + 1) for _ in range(rng.randint(0, 3))]
        keys = ["dimension", "metric", "quantization", "vectors",
                "size", "distance", "garbage"]
        return {rng.choice(keys): rand_val(depth + 1)
                for _ in range(rng.randint(1, 4))}

    rest = RestServer()
    rest.serve()
    base = f"http://127.0.0.1:{rest.port}"
    try:
        for i in range(120):
            body = json.dumps(rand_val()).encode()
            req = urllib.request.Request(
                f"{base}/collections/f{i}", data=body, method="PUT",
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=5).read()
            except urllib.error.HTTPError as e:
                assert e.code < 500, (body, e.code, e.read())
        req = urllib.request.Request(
            f"{base}/collections/good",
            data=json.dumps({"dimension": 8, "metric": "angular",
                             "quantization": "int8"}).encode(),
            method="PUT",
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=5).read()
    finally:
        rest.stop()


def test_fuzz_collection_config_rejects_unknown_cleanly():
    """create_collection (which calls validate()) rejects unknown
    metric/quantization names with VectorError (-> REST 400)."""
    eng = VectorEngine()
    for i, bad in enumerate(("cosin", "", "l2", "COSINE ")):
        with pytest.raises(VectorError):
            eng.create_collection(
                f"m{i}", VectorCollectionConfig(dimension=4, metric=bad))
    for i, badq in enumerate(("int4", "fp8", "")):
        with pytest.raises(VectorError):
            eng.create_collection(
                f"q{i}", VectorCollectionConfig(dimension=4,
                                                quantization=badq))
