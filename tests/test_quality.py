"""Unit tests for operators/quality.py (expectation suite)."""

import pytest

from strava_vector_search_spark.operators import quality as Q


@pytest.fixture()
def tables(spark):
    child = spark.createDataFrame(
        [(1, 10, "A", 5.0), (2, 10, "B", -3.0), (3, 99, None, 20.0), (3, None, "C", 1.0)],
        "id int, parent_id int, status string, score double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid int")
    return {"child": child, "parent": parent}


def _report(tables, checks):
    rows = Q.expectation_report(tables, {"child": checks}).collect()
    return {(r["check"], r["column"]): (r["violations"], r["total"], r["pass"]) for r in rows}


def test_row_level_checks(tables):
    rep = _report(
        tables,
        [
            Q.not_null("status"),
            Q.accepted_values("status", ["A", "B"]),
            Q.in_range("score", 0.0, 10.0),
            Q.matches("status", "^[AB]$"),
        ],
    )
    assert rep[("not_null", "status")] == (1, 4, False)
    assert rep[("accepted_values", "status")] == (1, 4, False)  # C; NULL exempt
    assert rep[("in_range", "score")] == (2, 4, False)  # -3 and 20
    assert rep[("matches", "status")] == (1, 4, False)  # C; NULL exempt


def test_unique_counts_all_members_of_dup_groups(tables):
    rep = _report(tables, [Q.unique("id")])
    assert rep[("unique", "id")] == (2, 4, False)  # both id=3 rows


def test_foreign_key_orphans_null_exempt(tables):
    rep = _report(tables, [Q.foreign_key("parent_id", "parent", "pid")])
    # parent_id=99 is an orphan; the NULL parent_id is exempt
    assert rep[("foreign_key", "parent_id")] == (1, 4, False)


def test_all_green_suite(spark):
    t = {"t": spark.createDataFrame([(1, "x")], "id int, v string")}
    rows = Q.expectation_report(
        t, {"t": [Q.unique("id"), Q.not_null("v")]}
    ).collect()
    assert all(r["pass"] for r in rows)


def test_fk_plan_broadcasts_small_parent(tables):
    df = Q.expectation_report(
        tables, {"child": [Q.foreign_key("parent_id", "parent", "pid")]}
    )
    df.collect()  # in-memory frames carry no stats; AQE decides at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
