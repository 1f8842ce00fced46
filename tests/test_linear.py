"""Closed-form linear probe: coefficients match numpy's lstsq on the same
design matrix, separable data trains to perfect accuracy, and the moment
aggregation is partitioning-invariant."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from strava_vector_search_spark.operators import linear as L


def _feats(spark, rows):
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    return L.feature_frame(df, F.col("x1"), F.col("x2"), F.col("y"))


def test_coefficients_match_numpy(spark):
    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(-1, 1, size=(200, 2)), 6)
    # noisy linear score pushed through a threshold -> 0/1 target
    y = (0.3 + 1.5 * x[:, 0] - 0.8 * x[:, 1] + rng.normal(0, 0.2, 200) > 0.5)
    rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
    out = L.fit_and_score(_feats(spark, rows)).collect()[0]

    X = np.column_stack([np.ones(len(x)), x])
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    assert abs(out["b0"] - beta[0]) < 1e-5
    assert abs(out["b1"] - beta[1]) < 1e-5
    assert abs(out["b2"] - beta[2]) < 1e-5
    assert out["n_train"] == 200
    assert 0.0 <= out["r2"] <= 1.0
    # the LS probe on near-separable data should classify most points
    assert out["train_acc"] > 0.8


def test_separable_data_perfect_accuracy(spark):
    # y = 1 iff x1 > 0, with a wide margin -> LS threshold classifies all.
    # x2 is uncorrelated jitter (a CONSTANT x2 would make the Gram matrix
    # singular — the solve intentionally errors rather than fabricating
    # coefficients; callers drop degenerate features).
    rows = [
        (float(v), round((i % 7) / 10.0 - 0.3, 1), 1.0 if v > 0 else 0.0)
        for i, v in enumerate(np.linspace(-1, 1, 101))
        if abs(v) > 0.3
    ]
    out = L.fit_and_score(_feats(spark, rows)).collect()[0]
    assert out["train_acc"] == 1.0


def test_partitioning_invariant(spark):
    rng = np.random.RandomState(11)
    rows = [
        (round(float(a), 6), round(float(b), 6), float(c))
        for a, b, c in zip(
            rng.uniform(-1, 1, 300),
            rng.uniform(-1, 1, 300),
            rng.randint(0, 2, 300).astype(float),
        )
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    f1 = L.feature_frame(df, F.col("x1"), F.col("x2"), F.col("y"))
    f2 = L.feature_frame(
        df.repartition(13), F.col("x1"), F.col("x2"), F.col("y")
    )
    r1 = L.fit_and_score(f1).collect()[0]
    r2 = L.fit_and_score(f2).collect()[0]
    assert r1.asDict() == r2.asDict()
