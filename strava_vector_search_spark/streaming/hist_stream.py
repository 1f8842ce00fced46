"""Streaming histogram / quantile maintenance — percentile dashboards
kept fresh under an appending feed with zero approximation drift from
streaming (the a21_histogram_quantile_union state made live).

Each micro-batch writes its fixed-width (bin, cnt) histogram under a
batch-id-keyed overwrite partition (the cms_stream/heavy_stream
idempotent-commit pattern); histograms merge by cell ADDITION, so the
merged store is bit-identical to histogramming the accumulated feed,
and any quantile reads off the merged cumulative walk at query time.
Streaming changes WHEN cells are produced, never their values
(asserted in tests/test_hist_stream.py).

Error contract (ADVICE r05): values are clamped into the configured
[0, n_bins) range, so the bin-width error bound holds only INSIDE that
range — the two edge bins absorb all out-of-range mass and have
unbounded width. Size n_bins to the data's domain (or pre-scale the
value expression) when quantiles near the extremes matter; quantile
estimates between the clamp points are still bin-width-exact.

State size: batches x |bins| cells, independent of row count;
compaction = rewrite the merged cells as one generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window


def value_histogram(
    df: DataFrame, value_col: str, n_bins: int = 800
) -> DataFrame:
    """Fixed-width (bin, cnt) histogram — the mergeable summary.
    NULL values are excluded (a NULL bin would inflate quantile targets
    and sort differently across engines)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.expr(
                f"LEAST({n_bins - 1}, GREATEST(0,"
                f" CAST(FLOOR({value_col}) AS INT)))"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def process_hist_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    value_col: str,
    n_bins: int = 800,
) -> None:
    """One idempotent histogram micro-batch (overwrite own partition)."""
    value_histogram(batch_df, value_col, n_bins).write.mode(
        "overwrite"
    ).parquet(f"{state_path}/_batch_id={batch_id}")


def merged_histogram(spark: SparkSession, state_path: str) -> DataFrame:
    """Cell-wise merge of every batch histogram — equals the histogram
    of the whole accumulated feed."""
    return (
        spark.read.parquet(state_path)
        .drop("_batch_id")
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def quantiles_from_histogram(
    hist: DataFrame, qs: list[float]
) -> DataFrame:
    """Read quantile estimates off a (bin, cnt) histogram: smallest bin
    whose cumulative count reaches ceil(q*N); estimate = bin midpoint.
    Bounded work — the walk is |bins| rows."""
    spark = hist.sparkSession
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = hist.withColumn("cum", F.sum("cnt").over(wcum)).crossJoin(
        F.broadcast(hist.agg(F.sum("cnt").alias("n_total")))
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    return (
        qdf.crossJoin(F.broadcast(walk))
        .filter(
            F.expr("cum >= CAST(CEIL(q * CAST(n_total AS DOUBLE)) AS BIGINT)")
        )
        .groupBy("q", "n_total")
        .agg(F.min("bin").alias("est_bin"))
        .select(
            "q",
            "n_total",
            "est_bin",
            F.expr("CAST(est_bin AS DOUBLE) + 0.5").alias("est_value"),
        )
        .orderBy("q")
    )


def start_hist_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    value_col: str,
    n_bins: int = 800,
    trigger_seconds: int = 60,
):
    """Wire the histogram pass as a Structured Stream; the live
    percentile read stays available via merged_histogram +
    quantiles_from_histogram without stopping anything."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_hist_batch(batch_df, batch_id, state_path, value_col, n_bins)

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
