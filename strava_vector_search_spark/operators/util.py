"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_kernel(df: DataFrame, min_rows: int = 2048) -> DataFrame:
    """Ensure a Python-kernel (``mapInPandas``) stage runs at cluster width.

    A narrow scan of a small parquet table can arrive as a single partition
    (one row group = one task no matter what ``maxPartitionBytes`` says), so
    an Arrow kernel downstream would run on ONE core while the rest idle.
    Round-robin repartition to ``defaultParallelism`` when the scan is
    narrower than the cluster; on a real multi-file 100 TB input the scan
    already carries >= cluster-width partitions and this is a no-op — the
    condition is exactly "is the source parallelism below the cluster's",
    the same size-based switch AQE applies to coalescing.

    ``min_rows``: don't bother spreading trivially small frames (the
    shuffle would cost more than the single-core kernel run).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    # cheap guard: only count when we might repartition (small scans only)
    if df.limit(min_rows).count() < min_rows:
        return df
    return df.repartition(target)
