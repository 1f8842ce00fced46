"""Streaming histogram/quantile maintenance (streaming/hist_stream.py):
replay idempotence, merge == from-scratch EXACT cell equality, quantile
error bounded by bin width, and a live two-wave stream."""

from __future__ import annotations

import math
import time

from strava_vector_search_spark.streaming.hist_stream import (
    merged_histogram,
    process_hist_batch,
    quantiles_from_histogram,
    start_hist_stream,
    value_histogram,
)


def _vals(spark, rows):
    return spark.createDataFrame([(float(r),) for r in rows], "v double")


def _cells(df):
    return sorted((r["bin"], r["cnt"]) for r in df.collect())


def test_process_batch_idempotent_rewrite(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = _vals(spark, [i % 50 + 0.25 for i in range(400)]).repartition(4)
    process_hist_batch(batch, 0, state, "v")
    first = _cells(spark.read.parquet(state).drop("_batch_id"))
    process_hist_batch(batch, 0, state, "v")
    again = _cells(spark.read.parquet(state).drop("_batch_id"))
    assert first == again


def test_merged_equals_from_scratch(spark, tmp_path):
    state = str(tmp_path / "state")
    w1 = _vals(spark, [i % 97 for i in range(500)])
    w2 = _vals(spark, [i % 53 + 100 for i in range(400)])
    process_hist_batch(w1, 0, state, "v")
    process_hist_batch(w2, 1, state, "v")
    merged = _cells(merged_histogram(spark, state))
    scratch = _cells(value_histogram(w1.unionByName(w2), "v"))
    assert merged == scratch


def test_quantiles_within_bin_width(spark, tmp_path):
    state = str(tmp_path / "state")
    rows = [(i * 7) % 300 + 0.5 for i in range(900)]
    process_hist_batch(_vals(spark, rows), 0, state, "v")
    got = quantiles_from_histogram(
        merged_histogram(spark, state), [0.5, 0.9, 0.99]
    ).collect()
    srt = sorted(rows)
    for r in got:
        exact = srt[min(len(srt) - 1, math.ceil(r["q"] * len(srt)) - 1)]
        assert abs(r["est_value"] - exact) <= 1.0 + 1e-9, (r, exact)


def test_live_stream_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _vals(spark, [i % 40 for i in range(300)]).write.parquet(incoming)
    q = start_hist_stream(
        spark, incoming, state, ckpt, schema="v double",
        value_col="v", trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        total = 0
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                total = (
                    merged_histogram(spark, state)
                    .agg({"cnt": "sum"})
                    .head()[0]
                )
                if total == 300:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert total == 300
        _vals(spark, [i % 40 for i in range(200)]).write.mode(
            "append"
        ).parquet(incoming)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            total = (
                merged_histogram(spark, state).agg({"cnt": "sum"}).head()[0]
            )
            if total == 500:
                break
            time.sleep(1)
        assert total == 500
    finally:
        q.stop()
