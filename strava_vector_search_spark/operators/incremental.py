"""Incremental aggregate maintenance — the materialized-view pattern for
100 TB pipelines: keep a small per-group STATE table (count + exact
decimal sums), fold each new batch into it with one map-side-combined
aggregate + one state-sized merge, and derive the presentation measures
(avg, totals) only at read time.

Algebra: count and sum are commutative monoids, so
``state(base ∪ delta) == merge(state(base), state(delta))`` exactly —
the oracle twin recomputes from scratch and must hash-match. Sums are
carried as DECIMAL(18,6) so partial-aggregation order can never change a
bit (the repo-wide float determinism contract).

Cost model: each refresh scans ONLY the delta (map-side combine → one
shuffle on the group key, sized by distinct groups, not rows), then
merges two state tables each sized by |groups|. The base table is never
re-read — that is the entire point.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame, keys: Sequence[str], measures: Sequence[str]
) -> DataFrame:
    """Per-group state: ``cnt`` + ``sum_<m>`` (DECIMAL(18,6)) per measure."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[
            F.sum(F.col(m).cast("decimal(18,6)")).alias(f"sum_{m}")
            for m in measures
        ],
    )


def merge_agg_state(
    base: DataFrame, delta: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold a delta state into a base state: union + re-sum. Both inputs
    are |groups|-sized, so this shuffle is tiny regardless of how much raw
    data the states summarize."""
    sums = [c for c in base.columns if c.startswith("sum_")]
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            *[
                F.sum(c).cast("decimal(18,6)").alias(c) for c in sums
            ],
        )
    )


def finalize(state: DataFrame, scale: int = 4) -> DataFrame:
    """Presentation view: doubles for sums, derived averages."""
    sums = [c for c in state.columns if c.startswith("sum_")]
    out = state
    for c in sums:
        m = c[len("sum_"):]
        out = out.withColumn(c, F.col(c).cast("double")).withColumn(
            f"avg_{m}",
            F.round(F.col(c) / F.col("cnt"), scale),
        )
    for c in sums:
        out = out.withColumn(c, F.round(F.col(c), scale))
    return out
