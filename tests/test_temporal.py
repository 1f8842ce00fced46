"""Unit tests for operators/temporal.py: as-of join (backward-inclusive,
tolerance, null-valued right columns, left-join semantics) and the binned
range join (boundary inclusivity, multi-bin intervals, overlap, parity with
the naive range predicate on real data)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def ts(minutes: float):
    return T0 + timedelta(minutes=minutes)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive_and_left_semantics(spark):
    left = _df(
        spark,
        [(1, 10, ts(0)), (2, 10, ts(5)), (3, 10, ts(10)), (4, 20, ts(5))],
        "lid int, user_id int, ts timestamp",
    )
    right = _df(
        spark,
        [(100, 10, ts(0)), (101, 10, ts(7)), (102, 30, ts(1))],
        "rid int, user_id int, ts timestamp",
    )
    out = {
        r["lid"]: (r["rid_right"], r["ts_right"])
        for r in asof_join(left, right, on=["user_id"], value_cols=["rid"]).collect()
    }
    assert out[1] == (100, ts(0))  # equal ts -> inclusive
    assert out[2] == (100, ts(0))  # latest at-or-before
    assert out[3] == (101, ts(7))
    assert out[4] == (None, None)  # user 20 has no right rows: left join


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _df(spark, [(1, 1, ts(0)), (2, 1, ts(90))], "lid int, user_id int, ts timestamp")
    right = _df(spark, [(9, 1, ts(-5))], "rid int, user_id int, ts timestamp")
    out = {
        r["lid"]: r["rid_right"]
        for r in asof_join(
            left, right, on=["user_id"], value_cols=["rid"],
            tolerance_seconds=3600,
        ).collect()
    }
    assert out[1] == 9        # 5 min old: within tolerance
    assert out[2] is None     # 95 min old: stale -> nulled


def test_asof_null_valued_right_column_still_matches_itself(spark):
    """A right row whose value column is NULL must match as itself — not be
    skipped over to an older row (the struct-payload carry)."""
    left = _df(spark, [(1, 1, ts(10))], "lid int, user_id int, ts timestamp")
    right = _df(
        spark,
        [(7, 1, ts(0)), (None, 1, ts(5))],
        "rid int, user_id int, ts timestamp",
    )
    row = asof_join(left, right, on=["user_id"], value_cols=["rid"]).head()
    assert row["rid_right"] is None       # the ts(5) row, whose rid IS null
    assert row["ts_right"] == ts(5)       # ...but it matched, at its own ts


def test_range_join_inclusive_bounds_and_multi_bin(spark):
    pts = _df(
        spark,
        [(1, ts(0)), (2, ts(30)), (3, ts(60)), (4, ts(61)), (5, ts(-1))],
        "pid int, ts timestamp",
    )
    ivs = _df(
        spark,
        [(100, ts(0), ts(60))],  # 1-hour interval spans many 5-min bins
        "iid int, t0 timestamp, t1 timestamp",
    )
    got = sorted(
        r["pid"]
        for r in range_join_binned(pts, ivs, bin_seconds=300).collect()
    )
    assert got == [1, 2, 3]  # both ends inclusive; 4 and 5 outside


def test_range_join_overlapping_intervals_no_dedup_artifacts(spark):
    pts = _df(spark, [(1, ts(10))], "pid int, ts timestamp")
    ivs = _df(
        spark,
        [(100, ts(0), ts(20)), (101, ts(5), ts(15))],
        "iid int, t0 timestamp, t1 timestamp",
    )
    rows = range_join_binned(pts, ivs, bin_seconds=600).collect()
    assert sorted(r["iid"] for r in rows) == [100, 101]  # one row per pair


def test_range_join_binned_matches_naive_on_events(spark, sf_dir):
    from strava_vector_search_spark.io.tables import load_events

    ev = load_events(spark, sf_dir)
    ivs = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 40 == 0)
    ).select(
        F.col("event_id").alias("iid"),
        (F.col("ts") - F.expr("INTERVAL 45 MINUTE")).alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTE")).alias("t1"),
    )
    pts = ev.select(F.col("event_id").alias("pid"), "ts")
    binned = {
        (r["pid"], r["iid"])
        for r in range_join_binned(pts, ivs, bin_seconds=1800).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter(F.col("ts").between(F.col("t0"), F.col("t1")))
        .collect()
    }
    assert binned == naive and len(binned) > 0


def test_asof_plan_has_no_range_join(spark):
    """The as-of plan must be window-over-union — no broadcast-nested-loop
    or cartesian product anywhere."""
    left = _df(spark, [(1, 1, ts(0))], "lid int, user_id int, ts timestamp")
    right = _df(spark, [(2, 1, ts(0))], "rid int, user_id int, ts timestamp")
    plan = asof_join(left, right, on=["user_id"], value_cols=["rid"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_asof_directions_match_pandas_merge_asof(spark):
    """forward/nearest/backward all pinned against pandas merge_asof,
    the reference implementation of the direction semantics."""
    import pandas as pd

    left = [
        (1, "a", 100), (2, "a", 250), (3, "a", 400),
        (4, "b", 50), (5, "b", 500), (6, "c", 10),
    ]
    right = [
        ("a", 100, 1.0), ("a", 300, 2.0),
        ("b", 49, 3.0), ("b", 700, 4.0),
        # c has no right rows at all -> NULLs in every direction
    ]
    ldf = spark.createDataFrame(left, "id bigint, k string, ts bigint")
    rdf = spark.createDataFrame(right, "k string, ts bigint, v double")
    # operator expects timestamp-castable ts columns
    lts = ldf.select("id", "k", F.timestamp_micros(F.col("ts")).alias("ts"))
    rts = rdf.select("k", F.timestamp_micros(F.col("ts")).alias("ts"), "v")

    lp = pd.DataFrame(left, columns=["id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values("ts")
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["id"]: r["v_right"]
            for r in asof_join(
                lts, rts, ["k"], value_cols=["v"], direction=direction
            ).collect()
        }
        exp_df = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction
        )
        exp = dict(zip(exp_df["id"], exp_df["v"]))
        for i in exp:
            if pd.isna(exp[i]):
                assert got[i] is None, (direction, i, got[i])
            else:
                assert got[i] == exp[i], (direction, i, got[i], exp[i])


def test_asof_forward_null_value_tie_matches_sql_nulls_last(spark):
    """Duplicate (key, ts) on the right with one NULL-valued row: forward
    must pick the min non-NULL value (SQL ASC NULLS LAST), never the
    NULL-valued row (Spark's NULLS-FIRST default would — round-6
    self-review finding #4)."""
    from strava_vector_search_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100)], "k int, lts long"
    ).select("k", F.timestamp_micros(F.col("lts")).alias("lts"))
    right = spark.createDataFrame(
        [(1, 200, None), (1, 200, 7.0), (1, 200, 3.0)],
        "k int, rts long, v double",
    ).select(
        "k", F.timestamp_micros(F.col("rts")).alias("rts"), "v"
    )
    out = asof_join(
        left, right, ["k"], left_ts="lts", right_ts="rts",
        value_cols=["v"], direction="forward",
    ).collect()
    assert len(out) == 1
    assert out[0]["v_right"] == 3.0
