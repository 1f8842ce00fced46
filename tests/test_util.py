"""Unit tests for operators/util.py (kernel rebalancing)."""

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.util import rebalance_for_kernel


def test_narrow_large_frame_spreads_to_cluster_width(spark):
    df = spark.range(10_000).coalesce(1).select(F.col("id"))
    assert df.rdd.getNumPartitions() == 1
    out = rebalance_for_kernel(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_tiny_frame_left_alone(spark):
    df = spark.range(10).coalesce(1)
    out = rebalance_for_kernel(df)
    assert out.rdd.getNumPartitions() == 1  # shuffle would cost more than it buys


def test_already_wide_frame_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).repartition(target + 4)
    out = rebalance_for_kernel(df)
    assert out is df  # no-op, not even a new plan node
