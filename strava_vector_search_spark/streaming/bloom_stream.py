"""Streaming Bloom-filter maintenance — the membership summary kept
fresh under an appending key feed with ZERO drift from streaming.

Each micro-batch writes its own (word_idx, word) filter-word table under
a batch-id-keyed overwrite partition (the cms_stream/dedup_stream
idempotent-commit pattern: hashing a batch is deterministic, so an
at-least-once replay rewrites identical rows). Because Bloom filters
merge by word-wise bitwise OR — a commutative, idempotent monoid — the
merged store is bit-identical to a from-scratch filter over the
accumulated feed: streaming maintenance is EXACT with respect to the
batch operator (asserted in tests/test_bloom_stream.py), and replayed
batches cannot even double-count (OR is idempotent, unlike CMS's ADD).

State size: batches x (m/32) words, independent of key cardinality;
compaction = rewrite the OR-merged words as one generation. The live
filter is queryable any time via ``merged_filter`` ->
``operators.bloom.probe_membership`` without stopping the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.bloom import M_BITS, build_filter


def process_bloom_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    key_col: str,
    m_bits: int = M_BITS,
) -> None:
    """One idempotent filter micro-batch (overwrite own partition)."""
    words = build_filter(batch_df, key_col, m_bits)
    words.write.mode("overwrite").parquet(
        f"{state_path}/_batch_id={batch_id}"
    )


def merged_filter(spark: SparkSession, state_path: str) -> DataFrame:
    """Word-wise OR of every batch filter written so far — equals the
    batch filter of the whole accumulated feed."""
    return (
        spark.read.parquet(state_path)
        .drop("_batch_id")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def start_bloom_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    key_col: str,
    m_bits: int = M_BITS,
    trigger_seconds: int = 60,
):
    """Wire the filter pass as a Structured Stream over an incoming
    directory."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_bloom_batch(batch_df, batch_id, state_path, key_col, m_bits)

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
