"""Exact distributed heavy hitters — two-pass Misra–Gries.

The problem: find every item with frequency > N/k over a corpus whose
DISTINCT-item cardinality is itself huge (token vocabularies at corpus
scale run into billions).  A plain ``groupBy(item).count()`` shuffles one
row per distinct item per partition — at 100 TB that shuffle IS the job.

The classic fix (Misra–Gries 1982; mergeable-summaries form of Agarwal
et al., PODS 2012) is a bounded-memory candidate pass plus an exact
recount of only the candidates:

* **Pass 1 (map-only)**: each input partition maintains a Misra–Gries
  summary of ``capacity`` counters.  Batched merge step: accumulate a
  batch's value_counts, and when the table exceeds capacity subtract the
  (capacity+1)-th largest counter from everything and drop the non-
  positive rows.  Total decrement applied within a partition is at most
  n_p/(capacity+1), so any item with partition count > n_p/(capacity+1)
  survives that partition's summary.  Summing over partitions: an item
  with GLOBAL count > N/(capacity+1) must survive in at least one
  partition — the union of the per-partition summaries is a guaranteed
  superset of every item above the N/k threshold whenever
  ``capacity >= k``.  Output: ≤ partitions × capacity candidate rows —
  constant per partition, no shuffle of the full key space.
* **Pass 2 (exact)**: re-scan, keep only candidate items (broadcast hash
  join against the tiny candidate set — Catalyst pushes the build side to
  every executor, the probe is map-side), exact ``groupBy`` over the
  bounded candidate key space, filter ``cnt > N/k``.

The result is EXACT (identical to the naive full groupBy + HAVING), which
is what makes it oracle-checkable; the sketch only bounds the shuffle.

No reference-repo counterpart (the reference exercises plain GROUP BY
aggregates only, e.g. 02_method2_manual_vector_embedding.sql:300-330);
this is an engine-completion operator for the 100 TB curation pipeline
(frequent-token tables, hot-key discovery before salting, boilerplate
candidates).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_merge(counts: dict, batch: pd.Series, capacity: int) -> dict:
    """Merge one batch's value_counts into a Misra–Gries table, enforcing
    the capacity bound by the standard subtract-(k+1)-th-largest step."""
    for v, c in batch.items():
        counts[v] = counts.get(v, 0) + int(c)
    if len(counts) > capacity:
        # (capacity+1)-th largest counter value; subtracting it zeroes out
        # everything at or below, leaving <= capacity survivors
        cut = sorted(counts.values(), reverse=True)[capacity]
        counts = {v: c - cut for v, c in counts.items() if c - cut > 0}
    return counts


def mg_summaries(items: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries as (item, cnt) rows — the
    MERGEABLE form (Agarwal et al.): summaries from different partitions,
    batches, or days combine by summing counts and re-applying the
    capacity cut, and the union remains a candidate superset.  ≤
    partitions × capacity rows leave each partition; counts are deficient
    (lower bounds), never used as final answers.
    """
    src = items.select(F.col(item_col).cast("string").alias(item_col)).filter(
        F.col(item_col).isNotNull()
    )

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in it:
            counts = _mg_merge(counts, pdf[item_col].value_counts(), capacity)
        yield pd.DataFrame(
            {item_col: list(counts.keys()), "cnt": list(counts.values())}
        )

    return src.mapInPandas(summarize, f"{item_col} string, cnt long")


def merge_mg_summaries(
    summaries: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Combine any set of MG summary rows into one capacity-bounded
    summary: sum per item, subtract the (capacity+1)-th largest total,
    keep the positive rows.  Input is sketch-sized (≤ sources × capacity
    rows), so the one driver action here (reading the cut value) is on
    bounded data by construction."""
    tot = summaries.groupBy(item_col).agg(F.sum("cnt").alias("cnt"))
    tail = (
        tot.orderBy(F.desc("cnt"), F.asc(item_col))
        .limit(capacity + 1)
        .collect()
    )
    cut = tail[capacity]["cnt"] if len(tail) > capacity else 0
    return tot.select(
        item_col, (F.col("cnt") - cut).alias("cnt")
    ).filter(F.col("cnt") > 0)


def heavy_hitter_candidates(
    items: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries, unioned.

    Returns a DISTINCT ``(item_col)`` DataFrame of ≤ partitions × capacity
    rows guaranteed to contain every item with global count >
    N/(capacity+1).  Arrow-batched; the Python work per batch is one
    ``value_counts`` plus dict arithmetic on ≤ batch-distinct keys.
    """
    return mg_summaries(items, item_col, capacity).select(item_col).distinct()


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str,
    k: int,
    capacity: int | None = None,
) -> DataFrame:
    """Every item with count > N/k, with its EXACT count.

    ``capacity`` (default ``2 * k``) must be >= k for the candidate
    superset guarantee; larger capacities only shrink pass-1 decrements.
    Output: (item_col, cnt) — identical rows to the naive
    ``GROUP BY item HAVING COUNT(*) > N/k``.
    """
    if capacity is None:
        capacity = 2 * k
    if capacity < k:
        raise ValueError(f"capacity {capacity} < k {k} voids the MG guarantee")
    src = items.select(F.col(item_col).cast("string").alias(item_col)).filter(
        F.col(item_col).isNotNull()
    )
    n_total = src.count()
    cands = heavy_hitter_candidates(items, item_col, capacity)
    return (
        src.join(F.broadcast(cands), on=item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n_total))
    )
