from __future__ import annotations

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from strava_vector_search_spark.streaming.windowed import windowed_counts

T0 = datetime(2024, 3, 1, 9, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp, value double")


def test_batch_windowed_counts(spark):
    ev = _ev(
        spark,
        [
            ("click", T0, 1.0),
            ("click", T0 + timedelta(minutes=30), 2.0),
            ("click", T0 + timedelta(minutes=61), 4.0),
            ("view", T0 + timedelta(minutes=5), 8.0),
        ],
    )
    out = {
        (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
        for r in windowed_counts(ev, window_minutes=60).collect()
    }
    assert out[("click", T0)] == (2, 3.0)
    assert out[("click", T0 + timedelta(hours=1))] == (1, 4.0)
    assert out[("view", T0)] == (1, 8.0)


def test_streaming_emits_on_watermark_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "ev")
    _ev(spark, [("click", T0, 1.0), ("click", T0 + timedelta(minutes=10), 2.0)]).write.parquet(src)

    stream = spark.readStream.schema("event_type string, ts timestamp, value double").parquet(src)
    out = windowed_counts(stream, window_minutes=60, late_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .start()
    )
    try:
        # watermark far past the first window's end -> it must emit
        _ev(spark, [("view", T0 + timedelta(hours=3), 0.0)]).write.mode("append").parquet(src)
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM winagg").collect()
            if rows:
                break
            time.sleep(1)
        emitted = {(r["event_type"], r["window_start"]): (r["n"], r["sum_value"]) for r in rows}
        assert emitted[("click", T0)] == (2, 3.0)

        # a late event for the long-closed first window must be dropped
        _ev(spark, [("click", T0 + timedelta(minutes=20), 99.0)]).write.mode("append").parquet(src)
        # advance watermark again so anything pending flushes
        _ev(spark, [("view", T0 + timedelta(hours=6), 0.0)]).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows2 = spark.sql("SELECT * FROM winagg").collect()
        final = {}
        for r in rows2:
            final[(r["event_type"], r["window_start"])] = (r["n"], r["sum_value"])
        assert final[("click", T0)] == (2, 3.0)  # unchanged: late row dropped
    finally:
        q.stop()
