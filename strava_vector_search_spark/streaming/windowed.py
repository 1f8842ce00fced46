"""Watermarked event-time windowed aggregation — the standard Structured
Streaming shape (readStream → window agg → append sink) for the events
stream. Completes the streaming triad next to refresh.py (incremental
maintenance) and sessionize.py (custom stateful).

Semantics: tumbling ``window_minutes`` windows per ``key_col``; a window's
row is emitted once the watermark (max event time − ``late_minutes``) passes
its end, after which later-arriving events for it are DROPPED — the
documented late-data contract. State per open window is one count+sum pair,
evicted at emission, so state size is bounded by (keys × open windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window_minutes: int = 60,
    late_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """events stream → (window_start, window_end, key, n[, sum_value]).

    Works on batch DataFrames too (same code path, no watermark semantics) —
    which is how tests pin the aggregation itself, with a streaming run
    covering emission/lateness.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, f"{late_minutes} minutes")
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_value")
        )
    win = F.window(F.col(ts_col), f"{window_minutes} minutes")
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *(["n", "sum_value"] if value_col is not None else ["n"]),
        )
    )
