"""Streaming model maintenance (streaming/model_stream.py): per-batch
moment monoid state, replay idempotence, stream == from-scratch retrain
bit-for-bit, and a live two-wave stream."""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import functions as F

from strava_vector_search_spark.operators import linear as L
from strava_vector_search_spark.streaming.model_stream import (
    current_model,
    process_model_batch,
    start_model_stream,
)

SCHEMA = "x1 double, x2 double, y double"


def _wave(spark, seed, n):
    rng = np.random.RandomState(seed)
    x = np.round(rng.uniform(-1, 1, size=(n, 2)), 6)
    y = (0.8 * x[:, 0] - 0.5 * x[:, 1] + rng.normal(0, 0.3, n) > 0).astype(
        float
    )
    return spark.createDataFrame(
        [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)], SCHEMA
    )


def _retrain(df):
    feats = L.feature_frame(df, F.col("x1"), F.col("x2"), F.col("y"))
    return L.solve_coefficients(L.moment_sums(feats)).collect()[0].asDict()


def test_stream_equals_full_retrain(spark, tmp_path):
    state = str(tmp_path / "state")
    w1, w2 = _wave(spark, 1, 120), _wave(spark, 2, 80)
    process_model_batch(w1.repartition(3), 0, state, "x1", "x2", "y")
    process_model_batch(w2.repartition(5), 1, state, "x1", "x2", "y")
    live = current_model(spark, state).collect()[0].asDict()
    assert live == _retrain(w1.unionByName(w2))


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    w1 = _wave(spark, 3, 100)
    process_model_batch(w1, 0, state, "x1", "x2", "y")
    once = current_model(spark, state).collect()[0].asDict()
    # at-least-once replay of the same batch id: state must not double-count
    process_model_batch(w1, 0, state, "x1", "x2", "y")
    again = current_model(spark, state).collect()[0].asDict()
    assert once == again
    assert once["n"] == 100


def test_model_updates_as_batches_arrive(spark, tmp_path):
    state = str(tmp_path / "state")
    w1 = _wave(spark, 4, 150)
    process_model_batch(w1, 0, state, "x1", "x2", "y")
    m1 = current_model(spark, state).collect()[0].asDict()
    assert m1 == _retrain(w1)
    w2 = _wave(spark, 5, 150)
    process_model_batch(w2, 1, state, "x1", "x2", "y")
    m2 = current_model(spark, state).collect()[0].asDict()
    assert m2 == _retrain(w1.unionByName(w2))
    assert m2["n"] == 300 and m1["n"] == 150


def test_live_stream_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    w1, w2 = _wave(spark, 6, 90), _wave(spark, 7, 60)
    w1.write.mode("append").parquet(incoming)
    q = start_model_stream(
        spark, incoming, state, ckpt, SCHEMA, "x1", "x2", "y",
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if current_model(spark, state).collect()[0]["n"] == 90:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert current_model(spark, state).collect()[0].asDict() == _retrain(w1)
        w2.write.mode("append").parquet(incoming)
        expected = _retrain(w1.unionByName(w2))
        deadline = time.time() + 60  # fresh budget for the second wave
        while time.time() < deadline:
            if current_model(spark, state).collect()[0]["n"] == 150:
                break
            time.sleep(1)
        assert current_model(spark, state).collect()[0].asDict() == expected
    finally:
        q.stop()
