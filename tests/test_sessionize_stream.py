from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.streaming.sessionize import sessionize_stream

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp")


def _await(spark, query, table, min_rows, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        query.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {table}").collect()
        if len(got) >= min_rows:
            return got
        time.sleep(1)
    return spark.sql(f"SELECT * FROM {table}").collect()


def test_streaming_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "events")
    # batch 1: user 1 has two sessions separated by a >30min gap inside the
    # batch; user 2 has one session that stays open
    batch1 = [
        (1, T0),
        (1, T0 + timedelta(minutes=5)),
        (1, T0 + timedelta(minutes=50)),  # gap > 30min -> closes session A
        (2, T0 + timedelta(minutes=10)),
    ]
    _mk_events(spark, batch1).write.parquet(src)

    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        got = _await(spark, q, "sessions", 1)
        sessions = {(r["user_id"], r["session_start"], r["n_events"]) for r in got}
        # in-batch gap closure: user 1's first session (2 events)
        assert (1, T0, 2) in sessions

        # batch 2: events far in the future advance the watermark past every
        # open session's gap deadline -> timeout closures for users 1 and 2
        batch2 = [(3, T0 + timedelta(hours=6))]
        _mk_events(spark, batch2).write.mode("append").parquet(src)
        got = _await(spark, q, "sessions", 3)
        by_user = {}
        for r in got:
            by_user.setdefault(r["user_id"], []).append(r)
        assert len(by_user[1]) == 2  # both of user 1's sessions closed
        assert by_user[2][0]["n_events"] == 1
        # session bounds are faithful
        s2 = by_user[2][0]
        assert s2["session_start"] == s2["session_end"] == T0 + timedelta(minutes=10)
    finally:
        q.stop()


def test_streaming_matches_batch_semantics(spark, tmp_path):
    """The streaming sessionizer's closed sessions must agree with the batch
    sessionization (lag + running sum) for fully-closed histories."""
    rows = []
    for u in range(3):
        base = T0 + timedelta(minutes=7 * u)
        rows += [
            (u, base),
            (u, base + timedelta(minutes=10)),
            (u, base + timedelta(minutes=70)),  # second session
            (u, base + timedelta(minutes=75)),
        ]
    src = str(tmp_path / "ev2")
    _mk_events(spark, rows).write.parquet(src)

    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions2")
        .outputMode("append")
        .start()
    )
    try:
        # push watermark far ahead so every session closes
        _mk_events(spark, [(99, T0 + timedelta(days=1))]).write.mode("append").parquet(src)
        got = _await(spark, q, "sessions2", 6)
        streaming = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in got
            if r["user_id"] != 99
        }
    finally:
        q.stop()

    # batch twin (same logic as queries.ev_sessionize)
    from pyspark.sql import Window

    ev = _mk_events(spark, rows)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0),
    ).withColumn(
        "seq", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in flagged.groupBy("user_id", "seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert streaming == batch
