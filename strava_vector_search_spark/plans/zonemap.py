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
        # max < lo proves disjoint; NULL max (all-null file) stays
        cond = cond & ~(F.col(f"max_{col}") < F.lit(lo))
    if hi is not None:
        cond = cond & ~(F.col(f"min_{col}") > F.lit(hi))
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
    typed DataFrame when every file is pruned."""
    files = prune_files(zonemap, col, lo, hi)
    if not files:
        # derive the schema from one (any) file without reading rows
        any_file = [r["file"] for r in zonemap.select("file").limit(1).collect()]
        empty = spark.read.parquet(*any_file).limit(0)
        return empty
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df


def update_zonemap(
    spark: SparkSession, path: str, existing: DataFrame, cols: list[str]
) -> DataFrame:
    """Incrementally extend a zone map after files were appended: stat ONLY
    the files absent from ``existing`` (left_anti on file name), union with
    the existing rows. The scan cost is O(appended bytes); the existing map
    is never recomputed. Compaction/rewrite should rebuild instead (file
    names change)."""
    current_files = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .distinct()
    )
    new_files = current_files.join(
        F.broadcast(existing.select("file")), "file", "left_anti"
    )
    fresh = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), *cols)
        .join(F.broadcast(new_files), "file", "left_semi")
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return existing.unionByName(fresh.groupBy("file").agg(*aggs))
