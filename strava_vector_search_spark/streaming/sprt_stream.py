"""Streaming sequential-test (SPRT) maintenance — the ab_sequential_sprt
decision monitor kept live under an appending event feed.

The running log-likelihood ratio is a MONOID: each micro-batch
contributes (sum of scaled-integer LLR terms, observation count), and
the global state is the exact integer sum of batch partials — so the
live decision equals the batch gate's decision over the accumulated
feed bit-for-bit (streaming changes WHEN partials are produced, never
their values). Batch partials land under a batch-id-keyed overwrite
partition (the hist_stream / cms_stream idempotent-commit pattern):
a replayed micro-batch rewrites its own partition and the merge is
unchanged.

What streaming CANNOT reproduce from partials alone is the *first
crossing observation index* inside an earlier batch — the monitor
reports the decision state at batch boundaries (the standard
group-sequential reading: you look when a batch lands). The exact
first-crossing n stays the batch gate's job.

Scale: per batch one map-only projection + one partial-combined
aggregate; state is |batches| rows of two BIGINTs; the decision read
folds the state table. |term| < 3.4e9 so BIGINT holds ~2.7e9
observations per experiment — partition by experiment key beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.queries import (
    _SPRT_LA,
    _SPRT_LB,
    _SPRT_LOWER,
    _SPRT_UPPER,
)


def batch_sprt_partial(df: DataFrame, value_col: str = "value") -> DataFrame:
    """One micro-batch's (llr_sum_scaled, n_obs) partial — exact integers."""
    term = F.expr(
        f"CASE WHEN {value_col} > 50 THEN CAST({_SPRT_LA} AS BIGINT)"
        f" ELSE CAST({_SPRT_LB} AS BIGINT) END"
    )
    return df.agg(
        F.sum(term).alias("llr_s"),
        F.count(F.lit(1)).alias("n_obs"),
    ).select(
        F.coalesce(F.col("llr_s"), F.lit(0).cast("bigint")).alias("llr_s"),
        "n_obs",
    )


def process_sprt_batch(
    batch_df: DataFrame, batch_id: int, state_path: str,
    value_col: str = "value",
) -> None:
    """One idempotent SPRT micro-batch (overwrite own partition)."""
    batch_sprt_partial(batch_df, value_col).write.mode("overwrite").parquet(
        f"{state_path}/_batch_id={batch_id}"
    )


def sprt_decision(spark: SparkSession, state_path: str) -> DataFrame:
    """Current decision state from the merged partials — equals the batch
    computation over the accumulated feed exactly."""
    merged = spark.read.parquet(state_path).agg(
        F.sum("llr_s").alias("cum"), F.sum("n_obs").alias("n")
    )
    return merged.select(
        "n",
        F.expr(
            "ROUND(CAST(cum AS DOUBLE) / CAST(10000000000 AS DOUBLE), 6)"
        ).alias("llr"),
        F.expr(
            f"CASE WHEN cum >= {_SPRT_UPPER} THEN 'accept_h1'"
            f" WHEN cum <= {_SPRT_LOWER} THEN 'accept_h0'"
            " ELSE 'continue' END"
        ).alias("decision"),
    )


def start_sprt_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    value_col: str = "value",
    trigger_seconds: int = 60,
):
    """Wire the SPRT monitor as a Structured Stream; `sprt_decision`
    reads the live state without stopping anything."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_sprt_batch(batch_df, batch_id, state_path, value_col)

    return (
        spark.readStream.schema(schema)
        .parquet(incoming_path)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
