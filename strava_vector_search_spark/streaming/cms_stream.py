"""Streaming Count-Min maintenance — the frequency summary kept fresh
under an appending feed with ZERO approximation drift from streaming.

Each micro-batch writes its own (j, bucket, cnt) cell table under a
batch-id-keyed overwrite partition (the dedup_stream/heavy_stream
idempotent-commit pattern: sketching a batch is deterministic, so an
at-least-once replay rewrites identical rows). Because CMS merges by
cell-wise ADDITION, the merged store is bit-identical to a from-scratch
sketch of the accumulated feed — streaming maintenance is exact with
respect to the batch operator, not merely approximate (asserted in
tests/test_cms_stream.py).

State size: batches x (d*w) cells, independent of key cardinality;
compaction = rewrite the merged cells as one generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from strava_vector_search_spark.operators.cms import (
    D,
    W,
    cms_cells,
    merge_cms,
)


def process_cms_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    key_col: str,
    d: int = D,
    w: int = W,
) -> None:
    """One idempotent sketch micro-batch (overwrite own partition)."""
    cells = cms_cells(batch_df, key_col, d, w)
    cells.write.mode("overwrite").parquet(
        f"{state_path}/_batch_id={batch_id}"
    )


def merged_sketch(spark: SparkSession, state_path: str) -> DataFrame:
    """Cell-wise merge of every batch sketch written so far — equals the
    batch sketch of the whole accumulated feed."""
    return merge_cms(spark.read.parquet(state_path).drop("_batch_id"))


def start_cms_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    key_col: str,
    d: int = D,
    w: int = W,
    trigger_seconds: int = 60,
):
    """Wire the sketch pass as a Structured Stream over an incoming
    directory; the live sketch stays queryable via ``merged_sketch``
    without stopping anything."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_cms_batch(batch_df, batch_id, state_path, key_col, d, w)

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
