"""Physical-layout utilities — the write-time decisions that buy query-time
performance at 100 TB. The reference's equivalents are Snowflake advice the
scripts leave to the platform ("consider clustering the table by SPORT_TYPE"
``02:407``, "partition by sport type at 100K" ``02:441``); here they are
explicit, testable operations:

* :func:`write_partitioned` — directory partitioning → partition pruning for
  equality/IN filters on the partition column (the reference's clustering).
* :func:`write_bucketed` — hash bucketing + sorting → co-located,
  shuffle-free joins on the bucket key (embeddings ⋈ documents on id is THE
  hot join; bucketed on id both sides, it runs with zero Exchange).
* :func:`salted_join` — runtime skew mitigation: explode the small side's
  rows ``salt`` ways, scatter the big side's hot keys across salt values.
  AQE's skew-join split handles most cases; salting covers extreme keys and
  non-AQE engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partition-pruning layout: one directory per partition value. Right
    for low-cardinality hot filters (sport_type, lang, date)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed + sorted table: joins/aggregations on the bucket key need no
    shuffle (both sides hash-distributed identically at write time).

    Spark bucketing requires the table catalog (saveAsTable); at 100 TB,
    bucket count is chosen so a bucket of the big table fits an executor
    core's working set.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> tuple[DataFrame, bool]:
    """Join two bucketed tables and report whether the plan contains no
    shuffle exchange (used by tests and the PLANS.md audit).

    Broadcast is disabled for the probe — at real scale neither side of the
    hot join is broadcastable, which is exactly when bucketing pays; a
    BroadcastExchange in a toy-sized test would mask a missing bucket join.
    """
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.table(left_table)
        right = spark.table(right_table)
        joined = left.join(right, on)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return joined, "Exchange hashpartitioning" not in plan


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate the
    small side across all salt values, join on (key, salt).

    Use when one key dominates (power-law ids): the hot key's rows spread
    over ``salt`` reducers instead of one straggler task.
    """
    big_salted = big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"))
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = big_salted.join(small_salted, [on, "_salt"], how)
    return out.drop("_salt")


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files near the
    target size. The operational chore every streaming-append table needs
    (each refresh micro-batch appends a file; thousands of tiny files
    throttle scan planning at 100 TB). Returns the new file count.

    Rewrites via a temp dir + atomic-ish swap (write new, move old out,
    move new in) so a concurrent reader never sees a half-deleted dataset.
    """
    import math
    import shutil
    import uuid

    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size
        for f in __import__("pathlib").Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return n_files


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of up to 4 numeric columns.

    Each column is min-max-free rank-quantized by the CALLER (pass already
    normalized ints in [0, 2^bits)); this function just interleaves bits.
    Sorting by the result clusters rows so parquet row-group min/max
    statistics become selective on EVERY participating column at once —
    multi-dimensional data skipping without an index.
    """
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(
                F.lit(1)
            )
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i).cast("long")
            )
    return key


def quantize_minmax(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) for z-ordering (caller supplies
    the min/max — one tiny agg, or known domain bounds)."""
    span = hi - lo
    q = ((c.cast("double") - F.lit(float(lo))) / F.lit(float(span))) * F.lit(
        float((1 << bits) - 1)
    )
    return F.least(
        F.greatest(F.round(q, 0).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered by the Morton key of ``cols``.

    ``repartitionByRange`` on the key splits the curve into contiguous
    chunks (one shuffle), ``sortWithinPartitions`` orders inside each file,
    so every row group covers a small hyper-rectangle of the key space and
    min/max pruning works on all ``cols`` simultaneously.
    """
    quant = [
        quantize_minmax(F.col(c), *bounds[c], bits=bits) for c in cols
    ]
    keyed = df.withColumn("_zkey", zorder_key(quant, bits=bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_sorted_compressed(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    codec: str = "zstd",
) -> None:
    """Write parquet with the two storage levers that matter at 100 TB:

    * **Sort before write** (``sortWithinPartitions`` — no extra shuffle):
      clustering rows by the sort key makes dictionary/RLE encodings and
      the column codec dramatically more effective (like values become
      adjacent), and gives every row group tight min/max stats on the
      sort columns, so later range predicates prune at the reader.
    * **Codec choice**: ``zstd`` trades a little CPU for a materially
      smaller footprint than the snappy default — at petabyte scale the
      scan is usually I/O-bound, so smaller is also faster.

    The size effect is MEASURED, not asserted by folklore: see the
    `parquet sorted+zstd vs unsorted snappy` row in SCALE.md and
    test_layout's ratio assertion.
    """
    (
        df.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(path)
    )
