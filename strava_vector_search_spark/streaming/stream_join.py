"""Stream-stream interval join + watermarked stream dedup — the two
remaining Structured Streaming primitives next to refresh.py (incremental
maintenance), windowed.py (event-time agg), sessionize.py (custom
stateful), and dedup_stream.py (admission gate).

Stream-stream joins buffer BOTH sides in state; the interval condition plus
both watermarks is what lets Spark evict: a buffered left row can be
dropped once the right watermark passes ``left.ts + upper_bound`` (and
vice versa), so state stays proportional to rate x window, not to history.
An equi-key (e.g. user_id) keeps the state shuffle-partitioned — without
it every row would compare against every buffered row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_seconds: int = 0,
    after_seconds: int = 3600,
    watermark_seconds: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where right.ts ∈ [left.ts - before,
    left.ts + after] — the attribution/enrichment shape (e.g. purchase ⋈
    views within the preceding hour).

    Right-side columns are suffixed ``_r``. Works identically on batch
    frames (no watermark) — the batch twin is how the oracle gate pins the
    join semantics, with the live-stream test covering state/eviction.
    For outer flavors Spark requires the watermark + interval bounds; the
    unmatched side emits once the watermark passes its eviction bound.
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, f"{watermark_seconds} seconds")
    if r.isStreaming:
        r = r.withWatermark(right_ts, f"{watermark_seconds} seconds")
    r = r.select(
        F.col(key).alias(f"{key}_r"),
        F.col(right_ts).alias(f"{right_ts}_r"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in r.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (l[key] == r[f"{key}_r"])
        & (
            r[f"{right_ts}_r"]
            >= F.col(left_ts) - F.expr(f"INTERVAL {before_seconds} SECONDS")
        )
        & (
            r[f"{right_ts}_r"]
            <= F.col(left_ts) + F.expr(f"INTERVAL {after_seconds} SECONDS")
        )
    )
    return l.join(r, cond, how)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_seconds: int = 1800,
) -> DataFrame:
    """Exactly-once-per-key admission within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps state only until the watermark
    passes a key's last-seen time, so the dedup table is bounded by
    rate x horizon (a plain streaming dropDuplicates would grow forever).
    Batch frames fall back to plain dropDuplicates on the same keys."""
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(
        ts_col, f"{watermark_seconds} seconds"
    ).dropDuplicatesWithinWatermark(keys)
