"""File-level zone maps: min/max data skipping without a table format.

The reference scopes its scale plan by corpus regime (brute force ≤10K,
partition ~100K, index at 1M+ — `02_method2_manual_vector_embedding.sql:438-442`);
this module is the storage-side analogue for the 100 TB regime: a tiny
statistics table (one row per parquet file) that lets a reader skip files
whose [min, max] envelope cannot intersect a predicate — the same
data-skipping design Delta Lake / Iceberg keep in their transaction logs,
re-expressed over plain parquet directories.

Why this matters at 100 TB: parquet row-group stats prune *within* a file
only after the footer is opened; with ~800K × 128 MB files, opening every
footer is itself a planning storm. A zone-map table is one narrow row per
file (~tens of MB for the whole lake), broadcastable, incrementally
maintainable on append, and turns a selective range predicate into a file
list BEFORE any data I/O.

Scale shapes:
* ``build_zonemap`` — ONE scan reading only the stat columns (column
  pruning applies), partial-aggregated per input split; the shuffle that
  follows has one row per file.
* ``prune_files`` — filter on the stats table; only the surviving file
  NAMES are collected (the file list is what the reader needs — the same
  driver-side step every table format performs at plan time).
* ``update_zonemap`` — anti-join on file name: only files not yet in the
  map are scanned, O(appended batch) not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zonemap(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max/count stats for ``cols`` over a parquet directory.

    One scan, projected to ``cols`` only; grouped on
    :func:`~pyspark.sql.functions.input_file_name` (row-count per group ==
    rows per file, so the shuffled volume is #files, not #rows).
    """
    df = spark.read.parquet(path).select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def prune_files(
    zonemap: DataFrame, col: str, lo: float | None, hi: float | None
) -> list[str]:
    """File names whose [min, max] envelope may intersect ``[lo, hi]``.

    Conservative by construction: a file is kept unless its envelope
    *proves* no row can match, so the reader must still apply the exact
    predicate (zone maps are a pruning aid, never a filter). NULL bounds
    (all-NULL files) are kept for the same reason. Only the surviving
    file names cross to the driver — one string per file, the list every
    scan planner materializes anyway.
    """
    cond = F.lit(True)
    if lo is not None:
        # max < lo proves disjoint; a NULL max (all-NULL file) must be
        # KEPT — under three-valued logic ~(NULL < lo) is NULL and
        # filter() would drop it, so the NULL case is admitted explicitly
        cond = cond & (
            F.col(f"max_{col}").isNull() | ~(F.col(f"max_{col}") < F.lit(lo))
        )
    if hi is not None:
        cond = cond & (
            F.col(f"min_{col}").isNull() | ~(F.col(f"min_{col}") > F.lit(hi))
        )
    return [r["file"] for r in zonemap.filter(cond).select("file").collect()]


def read_pruned(
    spark: SparkSession,
    zonemap: DataFrame,
    col: str,
    lo: float | None,
    hi: float | None,
) -> DataFrame:
    """Scan only the files the zone map cannot rule out, then re-apply the
    exact predicate (conservativeness contract). Returns an empty, correctly
    typed DataFrame when every file is pruned. Raises ValueError on an
    EMPTY zone map (no files known → no schema to type an empty result)."""
    return read_pruned_multi(spark, zonemap, [(col, lo, hi)])


def read_pruned_multi(
    spark: SparkSession,
    zonemap: DataFrame,
    preds: list[tuple[str, float | None, float | None]],
) -> DataFrame:
    """Conjunctive multi-column pruned read: intersect the per-column file
    survivors (each column's envelope can veto a file independently — the
    property a Morton/z-order layout makes useful), then re-apply EVERY
    exact predicate on the pruned scan. One definition of the
    prune-then-exact-refilter contract for all callers. An EMPTY preds
    list is rejected: "no predicates" means a full scan, which silently
    returning zero files would invert — callers wanting the whole table
    should read the path directly."""
    if not preds:
        raise ValueError(
            "read_pruned_multi with no predicates: zone-map pruning is "
            "predicate-driven; scan the table directly for a full read"
        )
    survivor_sets = [
        set(prune_files(zonemap, col, lo, hi)) for col, lo, hi in preds
    ]
    files = sorted(set.intersection(*survivor_sets))
    if not files:
        any_file = [
            r["file"] for r in zonemap.select("file").limit(1).collect()
        ]
        if not any_file:
            raise ValueError(
                "read_pruned on an EMPTY zone map: no files known, so no "
                "schema exists to type an empty result — build the zone map "
                "after at least one file lands"
            )
        # schema-only: one file opened, zero rows read past the footer
        df = spark.read.parquet(*any_file).limit(0)
    else:
        df = spark.read.parquet(*files)
    for col, lo, hi in preds:
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    return df


def update_zonemap(
    spark: SparkSession, path: str, existing: DataFrame, cols: list[str]
) -> DataFrame:
    """Incrementally extend a zone map after files were appended: the
    current file LIST comes from the scan's file index (``inputFiles()`` —
    metadata only, no rows read), the already-mapped names are subtracted
    driver-side (both lists are one string per file — the same driver-size
    object every scan planner holds), and ONLY the new files are opened
    and statted. Scan cost is O(appended bytes), never O(table).
    Compaction/rewrite should rebuild instead (file names change)."""
    known = {r["file"] for r in existing.select("file").collect()}
    new_files = sorted(
        f for f in spark.read.parquet(path).inputFiles() if f not in known
    )
    if not new_files:
        return existing
    fresh = spark.read.parquet(*new_files).select(
        F.input_file_name().alias("file"), *cols
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return existing.unionByName(fresh.groupBy("file").agg(*aggs))
