"""Stream-stream interval join + watermarked dedup (streaming/stream_join.py).

Batch-twin tests pin the join/dedup semantics; live-stream tests pin the
Structured Streaming mechanics (both-side buffering, watermark-driven
emission, bounded dedup state) with file sources and a memory sink, the
same harness as test_windowed_stream.
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from strava_vector_search_spark.streaming.stream_join import (
    dedup_within_watermark,
    interval_join,
)

T0 = datetime(2024, 3, 1, 9, 0, 0)


def _df(spark, rows, schema="user_id long, ts timestamp, name string"):
    return spark.createDataFrame(rows, schema)


def test_batch_interval_join_bounds(spark):
    purchases = _df(spark, [(1, T0 + timedelta(minutes=60), "p1"), (2, T0, "p2")])
    views = _df(
        spark,
        [
            (1, T0, "v_in"),                            # 60 min before p1 (edge, kept)
            (1, T0 + timedelta(minutes=59), "v_in2"),   # 1 min before p1
            (1, T0 - timedelta(minutes=1), "v_out"),    # 61 min before p1
            (1, T0 + timedelta(minutes=61), "v_after"), # after p1 (before=0)
            (2, T0 + timedelta(minutes=30), "v_other"), # after p2, not before
        ],
    )
    out = interval_join(
        purchases, views, key="user_id", before_seconds=3600, after_seconds=0
    )
    got = sorted((r["name"], r["name_r"]) for r in out.collect())
    assert got == [("p1", "v_in"), ("p1", "v_in2")]


def test_batch_interval_join_outer_keeps_unmatched(spark):
    purchases = _df(spark, [(1, T0, "p1"), (9, T0, "p_lonely")])
    views = _df(spark, [(1, T0 - timedelta(minutes=5), "v1")])
    out = interval_join(
        purchases, views, key="user_id", before_seconds=600, after_seconds=0,
        how="left_outer",
    )
    got = {r["name"]: r["name_r"] for r in out.collect()}
    assert got == {"p1": "v1", "p_lonely": None}


def test_streaming_interval_join_emits_matches(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    schema = "user_id long, ts timestamp, name string"
    _df(spark, [(1, T0 + timedelta(minutes=30), "p1")]).write.parquet(lsrc)
    _df(spark, [(1, T0, "v1"), (1, T0 + timedelta(minutes=29), "v2")]).write.parquet(rsrc)

    l = spark.readStream.schema(schema).parquet(lsrc)
    r = spark.readStream.schema(schema).parquet(rsrc)
    out = interval_join(
        l, r, key="user_id", before_seconds=3600, after_seconds=0,
        watermark_seconds=600,
    )
    q = (
        out.select("name", "name_r")
        .writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        want = {("p1", "v1"), ("p1", "v2")}
        got = set()
        while time.time() < deadline and got != want:
            q.processAllAvailable()
            got = {
                (r["name"], r["name_r"])
                for r in spark.sql("SELECT * FROM sjoin").collect()
            }
            if got != want:
                time.sleep(1)
        assert got == want
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dd")
    schema = "user_id long, ts timestamp, name string"
    # duplicate user_id 1 within the horizon: second occurrence dropped
    _df(
        spark,
        [
            (1, T0, "first"),
            (1, T0 + timedelta(minutes=1), "dup"),
            (2, T0 + timedelta(minutes=2), "other"),
        ],
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = dedup_within_watermark(stream, ["user_id"], watermark_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("ddwm")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        got: dict[int, int] = {}
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT user_id, count(*) AS n FROM ddwm GROUP BY user_id").collect()
            got = {r["user_id"]: r["n"] for r in rows}
            if set(got) == {1, 2}:
                break
            time.sleep(1)
        assert got == {1: 1, 2: 1}
    finally:
        q.stop()


def test_batch_dedup_twin(spark):
    df = _df(spark, [(1, T0, "a"), (1, T0, "b"), (2, T0, "c")])
    assert dedup_within_watermark(df, ["user_id"]).count() == 2
