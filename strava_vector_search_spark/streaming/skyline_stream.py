"""Streaming Pareto-frontier maintenance — the live best-tradeoff view
kept fresh under an appending feed with ZERO drift from streaming.

Each micro-batch writes its own LOCAL skyline under a batch-id-keyed
overwrite partition (the dedup_stream/cms_stream idempotent-commit
pattern: the local skyline of a batch is deterministic, so an
at-least-once replay rewrites identical rows).  Because the skyline is
MERGEABLE — skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)),
property-tested in tests/test_round5b.py — the frontier of the stored
batch frontiers is bit-identical to a from-scratch skyline of the whole
accumulated feed (asserted in tests/test_skyline_stream.py).

State size: batches x |batch frontier| rows — a frontier is tiny
relative to its input (bounded by the number of distinct values of the
minimized column), so state stays negligible; compaction = rewrite the
merged frontier as one generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from strava_vector_search_spark.operators.skyline import skyline_2d


def process_skyline_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    min_col: str,
    max_col: str,
) -> None:
    """One idempotent local-skyline micro-batch (overwrite own partition)."""
    local = skyline_2d(batch_df, min_col, max_col)
    local.write.mode("overwrite").parquet(
        f"{state_path}/_batch_id={batch_id}"
    )


def merged_frontier(
    spark: SparkSession, state_path: str, min_col: str, max_col: str
) -> DataFrame:
    """Skyline of every stored batch skyline — equals the batch skyline
    of the whole accumulated feed (mergeability)."""
    stored = spark.read.parquet(state_path).drop("_batch_id")
    return skyline_2d(stored, min_col, max_col)


def start_skyline_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    min_col: str,
    max_col: str,
    trigger_seconds: int = 60,
):
    """Wire the local-skyline pass as a Structured Stream over an
    incoming directory; the live frontier stays queryable via
    ``merged_frontier`` without stopping anything."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_skyline_batch(
            batch_df, batch_id, state_path, min_col, max_col
        )

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
