"""Contract tests for the model-backed embedder path (functions/embed.py:
``model_embedder``) using an injected deterministic fake model — pins the
Arrow batch plumbing (fillna, encode call shape, per-row list[float]
output, L2 normalization passthrough) without any model library/network.

The fake is built inside a closure so cloudpickle ships it to the Python
workers by value (a module-level class in a test file is pickled by
reference, which workers cannot import).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import model_embedder

DIM = 8


def _make_factory(dim):
    def factory():
        class FakeModel:
            """Mimics sentence-transformers encode(): list[str] in,
            (n, dim) ndarray out, normalized when asked."""

            def encode(self, texts, normalize_embeddings=False):
                assert isinstance(texts, list)  # UDF must hand a plain list
                assert all(isinstance(t, str) for t in texts)  # fillna('')
                out = []
                for t in texts:
                    v = np.array(
                        [((len(t) + 1) * (i + 3)) % 7 + 1 for i in range(dim)],
                        dtype="float64",
                    )
                    if normalize_embeddings:
                        v = v / np.linalg.norm(v)
                    out.append(v)
                return np.stack(out)

        return FakeModel()

    return factory


def expected_vec(t: str) -> list[float]:
    v = np.array(
        [((len(t) + 1) * (i + 3)) % 7 + 1 for i in range(DIM)], dtype="float64"
    )
    v = v / np.linalg.norm(v)
    return [float(np.float32(x)) for x in v]


def test_model_embedder_contract_with_stub(spark):
    embed = model_embedder(dim=DIM, model_factory=_make_factory(DIM))
    rows = [(i, "x" * (i % 5)) for i in range(50)] + [(50, None)]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r["id"]: r["e"]
        for r in df.repartition(4).select("id", embed(F.col("t")).alias("e")).collect()
    }
    assert len(got) == 51
    for i, t in rows:
        want = expected_vec(t if t is not None else "")  # null -> ''
        assert got[i] == pytest.approx(want, abs=1e-6)
    # array<float> schema with unit L2 norm on every row
    for v in got.values():
        assert len(v) == DIM
        assert math.isclose(sum(x * x for x in v), 1.0, abs_tol=1e-5)


def test_model_embedder_batch_column_type(spark):
    embed = model_embedder(dim=DIM, model_factory=_make_factory(DIM))
    df = spark.createDataFrame([(1, "hello")], "id int, t string")
    out = df.select(embed(F.col("t")).alias("e"))
    assert out.schema["e"].dataType.simpleString() == "array<float>"


def test_model_embedder_raises_without_library():
    with pytest.raises(ImportError, match="sentence-transformers"):
        model_embedder()
