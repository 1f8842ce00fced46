"""Unit tests for operators/cdc.py (changelog application)."""

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.cdc import (
    apply_changelog,
    latest_changes,
)


@pytest.fixture()
def snapshot(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id int, name string, v int",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id int, name string, v int, seq int, op string"
    )


def _as_dict(df):
    return {r["id"]: (r["name"], r["v"]) for r in df.collect()}


def test_upsert_delete_insert(spark, snapshot):
    ch = _changes(
        spark,
        [
            (1, "a2", 11, 1, "U"),   # update
            (2, None, None, 1, "D"),  # delete
            (4, "d", 40, 1, "I"),    # insert
        ],
    )
    out = _as_dict(apply_changelog(snapshot, ch, ["id"]))
    assert out == {1: ("a2", 11), 3: ("c", 30), 4: ("d", 40)}


def test_latest_seq_wins_and_delete_beats_older_updates(spark, snapshot):
    ch = _changes(
        spark,
        [
            (1, "a2", 11, 1, "U"),
            (1, "a3", 12, 2, "U"),   # later seq wins
            (3, "c2", 31, 1, "U"),
            (3, None, None, 5, "D"),  # later delete wins
        ],
    )
    out = _as_dict(apply_changelog(snapshot, ch, ["id"]))
    assert out == {1: ("a3", 12), 2: ("b", 20)}


def test_equal_seq_tie_breaks_update_over_delete(spark, snapshot):
    ch = _changes(spark, [(1, None, None, 1, "D"), (1, "a9", 99, 1, "U")])
    latest = latest_changes(ch, ["id"]).collect()
    assert len(latest) == 1 and latest[0]["op"] == "U"  # 'U' > 'D'


def test_idempotent_reapply(spark, snapshot):
    ch = _changes(spark, [(1, "a2", 11, 1, "U"), (2, None, None, 2, "D")])
    once = apply_changelog(snapshot, ch, ["id"])
    twice = apply_changelog(once, ch, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_snapshot_side_not_shuffled(spark, snapshot):
    """The anti-join must broadcast the (small) change side — the snapshot
    scan carries no Exchange in the final adaptive plan."""
    ch = _changes(spark, [(1, "a2", 11, 1, "U")])
    out = apply_changelog(snapshot, ch, ["id"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scd2_intervals(spark):
    from strava_vector_search_spark.operators.cdc import scd2_history

    ch = spark.createDataFrame(
        [
            (1, 100, 1, "I"),
            (1, 110, 5, "U"),
            (2, 200, 1, "I"),
            (2, None, 3, "D"),
            (3, 300, 2, "I"),
        ],
        "id int, v int, seq int, op string",
    )
    rows = {
        (r["id"], r["valid_from_seq"]): (r["valid_to_seq"], r["v"], r["is_current"])
        for r in scd2_history(ch, ["id"]).collect()
    }
    assert rows[(1, 1)] == (5, 100, False)
    assert rows[(1, 5)] == (None, 110, True)
    assert rows[(2, 1)] == (3, 200, False)  # closed by the delete
    assert (2, 3) not in rows               # delete opens nothing
    assert rows[(3, 2)] == (None, 300, True)
    assert len(rows) == 4


def test_diff_snapshots_roundtrip_with_apply_changelog(spark):
    """apply_changelog(old, diff_snapshots(old, new)) must equal new —
    the diff and the merge are exact inverses."""
    from strava_vector_search_spark.operators.cdc import (
        apply_changelog,
        diff_snapshots,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 41), (5, "e", 50)],
        "k long, s string, v long",
    )
    diff = diff_snapshots(old, new, keys=["k"], compare_cols=["s", "v"])
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "D", 4: "U", 5: "I"}
    feed = diff.withColumn("seq", F.lit(1))
    merged = apply_changelog(old, feed, keys=["k"])
    assert sorted(map(tuple, merged.select("k", "s", "v").collect())) == sorted(
        map(tuple, new.collect())
    )


def test_diff_snapshots_null_safe_compare(spark):
    from strava_vector_search_spark.operators.cdc import diff_snapshots

    old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    diff = diff_snapshots(old, new, keys=["k"], compare_cols=["s"])
    rows = {r["k"]: r["op"] for r in diff.collect()}
    assert rows == {2: "U"}  # NULL == NULL is unchanged; x -> NULL is U
