"""Streaming model maintenance — the linear probe kept fresh under an
appending feature feed.

The normal-equation moments (operators/linear.py) are a MONOID: exact
DECIMAL sums merge associatively, so "retrain on everything" decomposes
into "aggregate each micro-batch once, fold the tiny state rows at read
time". Per batch the work is one map-side-combined aggregate over the
batch only; the model state is batches × 1 rows of 9 numbers — constant
memory forever, and ``current_model`` (fold + 3×3 Cramer solve) is
bit-identical to retraining from scratch on the accumulated feed, which
is exactly what the tests assert.

Commit protocol: each batch OVERWRITES its own ``_batch_id=<id>``
partition (the ``dedup_stream``/``heavy_stream`` pattern) — the batch
aggregate is deterministic, so foreachBatch's at-least-once replay
rewrites identical bytes and the state never double-counts.

Reference scope: none — engine completion; the reference's TARGET_LAG
freshness idea (``01_method1_cortex_search.sql:173``) applied to a model
instead of an index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.linear import (
    feature_frame,
    merge_moment_states,
    moment_sums_decimal,
    moments_to_double,
    solve_coefficients,
)


def process_model_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    x1_col: str,
    x2_col: str,
    y_col: str,
) -> None:
    """One idempotent moment micro-batch: aggregate this batch's features
    and overwrite its own state partition."""
    feats = feature_frame(
        batch_df, F.col(x1_col), F.col(x2_col), F.col(y_col)
    )
    m = moment_sums_decimal(feats)
    m.write.mode("overwrite").parquet(f"{state_path}/_batch_id={batch_id}")


def accumulated_moments(spark: SparkSession, state_path: str) -> DataFrame:
    """Fold every batch's moment row into the global Gram matrix (exact)."""
    store = spark.read.parquet(state_path).drop("_batch_id")
    return merge_moment_states(store)


def current_model(spark: SparkSession, state_path: str) -> DataFrame:
    """The live model: (n, sy, b0, b1, b2) solved from the accumulated
    moments — bit-identical to a from-scratch retrain on the full feed."""
    return solve_coefficients(
        moments_to_double(accumulated_moments(spark, state_path))
    )


def start_model_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    x1_col: str,
    x2_col: str,
    y_col: str,
    trigger_seconds: int = 60,
):
    """Wire moment maintenance as a Structured Stream over an incoming
    directory; the model stays queryable mid-stream via ``current_model``
    without stopping anything."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_model_batch(
            batch_df, batch_id, state_path, x1_col, x2_col, y_col
        )

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
