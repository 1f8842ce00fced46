"""Count-Min sketch: the bounded-memory mergeable frequency summary.

The sketch is a d x w counter grid; building it is ONE map-side-combined
aggregate over (hash row j, bucket h_j(key)) — per-partition partial
sketches merge by cell-wise addition (the CMS merge property), so the
distinct-key space never shuffles and the summary is d*w cells whatever
the cardinality. Point estimates take min over a key's d counters and
can only OVER-count (collisions add, never subtract).

Hashing is the repo's portable md5 → 15-hex → bigint idiom
(operators/als.spark_md5i / duck_md5i), so the whole construction is
deterministic and the DuckDB oracle replays it bit-for-bit. The same
cell table is the unit of STREAMING maintenance (streaming/cms_stream):
per-batch cell tables under batch-id-keyed partitions merge to exactly
the sketch of the accumulated feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from strava_vector_search_spark.operators.als import spark_md5i

D = 4
W = 128


def _bucket_expr(w: int) -> str:
    """Bucket of the current row's (j, k) pair — text shared in spirit
    with the oracle's duck_md5i twin (engine-specific md5/concat idioms,
    identical md5 input string ``j:k``)."""
    return (
        spark_md5i("CONCAT(CAST(j AS STRING), ':', CAST(k AS STRING))")
        + f" % {w}"
    )


def _with_cells(keys: DataFrame, d: int, w: int) -> DataFrame:
    return keys.select(
        "k", F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j")
    ).select("k", "j", F.expr(_bucket_expr(w)).alias("bucket"))


def cms_cells(
    df: DataFrame, key_col: str, d: int = D, w: int = W
) -> DataFrame:
    """The sketch as a (j, bucket, cnt) cell table — at most d*w rows."""
    keys = df.select(F.col(key_col).alias("k")).filter(
        F.col("k").isNotNull()
    )
    return (
        _with_cells(keys, d, w)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(cells: DataFrame) -> DataFrame:
    """Cell-wise addition of any number of sketches (rows from several
    cell tables unioned): the CMS merge. Merging per-batch sketches is
    BIT-identical to sketching the concatenated feed."""
    return cells.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimates(
    cells: DataFrame, probes: DataFrame, key_col: str, d: int = D, w: int = W
) -> DataFrame:
    """Point estimates for the probe keys: min over each key's d
    counters (broadcast sketch join — the sketch is d*w rows)."""
    pk = probes.select(F.col(key_col).alias("k")).distinct()
    return (
        _with_cells(pk, d, w)
        .join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("k")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(F.col("k").alias(key_col), "cms_estimate")
    )
