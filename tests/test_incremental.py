"""Unit tests for operators/incremental.py (aggregate-state maintenance)."""

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.incremental import (
    agg_state,
    finalize,
    merge_agg_state,
)


def test_merge_equals_full_recompute(spark):
    full = spark.createDataFrame(
        [("a", 1.25), ("a", 2.50), ("b", 0.10), ("c", 9.99), ("a", 0.01)],
        "g string, x double",
    )
    base, delta = full.limit(2), full.subtract(full.limit(2))
    merged = merge_agg_state(
        agg_state(base, ["g"], ["x"]),
        agg_state(delta, ["g"], ["x"]),
        ["g"],
    )
    got = {
        r["g"]: (r["cnt"], r["sum_x"], r["avg_x"])
        for r in finalize(merged).collect()
    }
    exp = {
        r["g"]: (r["cnt"], r["sum_x"], r["avg_x"])
        for r in finalize(agg_state(full, ["g"], ["x"])).collect()
    }
    assert got == exp


def test_delta_only_group_appears(spark):
    base = spark.createDataFrame([("a", 1.0)], "g string, x double")
    delta = spark.createDataFrame([("z", 5.0), ("z", 7.0)], "g string, x double")
    merged = merge_agg_state(
        agg_state(base, ["g"], ["x"]), agg_state(delta, ["g"], ["x"]), ["g"]
    )
    got = {r["g"]: (r["cnt"], r["avg_x"]) for r in finalize(merged).collect()}
    assert got == {"a": (1, 1.0), "z": (2, 6.0)}


def test_state_is_group_sized_and_decimal(spark):
    df = spark.createDataFrame(
        [("a", 0.1)] * 100 + [("b", 0.2)] * 50, "g string, x double"
    )
    st = agg_state(df, ["g"], ["x"])
    assert st.count() == 2
    # Spark widens the sum's precision (decimal(28,6)); exactness is what
    # matters, not the width
    assert dict(st.dtypes)["sum_x"].startswith("decimal(")
    # exact decimal accumulation: 100 * 0.1 is exactly 10.000000
    row = {r["g"]: r["sum_x"] for r in st.collect()}
    assert float(row["a"]) == 10.0 and float(row["b"]) == 10.0
