"""Streaming Pareto-frontier maintenance (streaming/skyline_stream.py):
replay idempotence, merge == from-scratch skyline (mergeability makes
streaming maintenance EXACT), state stays frontier-sized, and a live
two-wave stream where the frontier improves as better points arrive."""

from __future__ import annotations

import time

from strava_vector_search_spark.operators.skyline import skyline_2d
from strava_vector_search_spark.streaming.skyline_stream import (
    merged_frontier,
    process_skyline_batch,
    start_skyline_stream,
)

SCHEMA = "id bigint, price double, size int"


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, float(p), int(s)) for i, p, s in rows], SCHEMA
    )


def _front_set(df):
    return sorted((r["id"], r["price"], r["size"]) for r in df.collect())


def _brute(rows):
    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )

    return sorted(p for p in rows if not dominated(p))


WAVE1 = [
    (1, 10.0, 5),
    (2, 12.0, 7),
    (3, 12.0, 7),  # both-dimension tie with 2: both survive
    (4, 15.0, 6),  # dominated by 2
    (5, 9.0, 2),
    (6, 20.0, 9),
]
WAVE2 = [
    (7, 8.0, 6),  # dominates 1 and 5's frontier role
    (8, 30.0, 9),  # dominated by 6
    (9, 11.0, 8),  # dominates 2/3
]


def test_process_batch_idempotent_rewrite(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = _pts(spark, WAVE1).repartition(3)
    process_skyline_batch(batch, 0, state, "price", "size")
    first = _front_set(spark.read.parquet(state).drop("_batch_id"))
    process_skyline_batch(batch, 0, state, "price", "size")
    again = _front_set(spark.read.parquet(state).drop("_batch_id"))
    assert first == again
    assert first == _brute(WAVE1)


def test_merged_equals_from_scratch_skyline(spark, tmp_path):
    state = str(tmp_path / "state")
    process_skyline_batch(
        _pts(spark, WAVE1).repartition(3), 0, state, "price", "size"
    )
    process_skyline_batch(
        _pts(spark, WAVE2).repartition(2), 1, state, "price", "size"
    )
    merged = _front_set(merged_frontier(spark, state, "price", "size"))
    scratch = _front_set(
        skyline_2d(_pts(spark, WAVE1 + WAVE2), "price", "size")
    )
    assert merged == scratch == _brute(WAVE1 + WAVE2)
    # state is frontier-sized: every stored row is a wave-local frontier
    # member, strictly fewer rows than the feed
    stored = spark.read.parquet(state).count()
    assert stored < len(WAVE1 + WAVE2)
    assert stored == len(_brute(WAVE1)) + len(_brute(WAVE2))


def test_live_stream_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _pts(spark, WAVE1).write.parquet(incoming)
    q = start_skyline_stream(
        spark, incoming, state, ckpt, schema=SCHEMA,
        min_col="price", max_col="size", trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        got = None
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                got = _front_set(
                    merged_frontier(spark, state, "price", "size")
                )
                if got == _brute(WAVE1):
                    break
            except Exception:
                pass
            time.sleep(1)
        assert got == _brute(WAVE1)
        _pts(spark, WAVE2).write.mode("append").parquet(incoming)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = _front_set(merged_frontier(spark, state, "price", "size"))
            if got == _brute(WAVE1 + WAVE2):
                break
            time.sleep(1)
        # point 9 (11.0, 8) must have displaced 2/3; ties 2,3 are gone
        assert got == _brute(WAVE1 + WAVE2)
        assert (9, 11.0, 8) in got and (2, 12.0, 7) not in got
    finally:
        q.stop()


def test_skyline_null_coordinates_excluded(spark):
    """NULL contract: rows with a NULL coordinate are excluded up front —
    previously a NULL price level poisoned _prevmax (NULLS FIRST) and the
    operator returned an EMPTY frontier for this input."""
    df = spark.createDataFrame(
        [(1, None, 10), (2, 1.0, 5), (3, 2.0, None), (4, 3.0, 7)],
        "id bigint, price double, size int",
    )
    got = _front_set(skyline_2d(df, "price", "size"))
    # among non-NULL rows {(1.0,5), (3.0,7)} neither dominates the other
    assert got == [(2, 1.0, 5), (4, 3.0, 7)]
