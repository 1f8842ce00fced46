"""Streaming heavy-hitter maintenance — mergeable Misra–Gries summaries
per micro-batch, merged at read time, with an on-demand exact recount.

The batch operator (``operators/heavy.py``) is two passes over one
corpus; the streaming form keeps the FIRST pass incremental: each
micro-batch writes its own capacity-bounded MG summary under a
batch-id-keyed partition (overwrite — idempotent under foreachBatch's
at-least-once replay, the ``dedup_stream`` commit pattern), and the
candidate set at any moment is the capacity-cut merge of all batch
summaries (MG summaries are mergeable: sum counts, subtract the
(capacity+1)-th largest — Agarwal et al., PODS 2012).  The cumulative
decrement stays ≤ N/(capacity+1), so the merged summary remains a
guaranteed superset of every item with total count > N/k for
capacity ≥ k.  The exact recount (pass 2) runs on demand against the
accumulated raw feed, restricted to the merged candidates — the same
bounded-key aggregate as the batch operator.

State size: batches × capacity rows of (item, cnt) — sketch-sized
forever, independent of the stream's distinct-item cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from strava_vector_search_spark.operators.heavy import (
    merge_mg_summaries,
    mg_summaries,
)


def process_heavy_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    item_col: str,
    capacity: int,
) -> None:
    """One idempotent sketch micro-batch: overwrite this batch's own
    ``_batch_id=<id>`` summary partition.  Summarization is deterministic
    for a given batch, so a replayed batch rewrites identical rows."""
    sm = mg_summaries(batch_df, item_col, capacity)
    sm.write.mode("overwrite").parquet(f"{state_path}/_batch_id={batch_id}")


def merged_candidates(
    spark: SparkSession, state_path: str, item_col: str, capacity: int
) -> DataFrame:
    """Capacity-cut merge of every batch summary written so far:
    (item, cnt) with deficient counts — the live candidate superset."""
    store = spark.read.parquet(state_path).drop("_batch_id")
    return merge_mg_summaries(store, item_col, capacity)


def exact_heavy_hitters(
    spark: SparkSession,
    state_path: str,
    corpus: DataFrame,
    item_col: str,
    k: int,
    capacity: int,
) -> DataFrame:
    """On-demand pass 2: exact counts of the merged candidates over the
    accumulated feed, strict threshold cnt*k > N — identical rows to the
    batch operator run on the same corpus."""
    src = corpus.select(
        F.col(item_col).cast("string").alias(item_col)
    ).filter(F.col(item_col).isNotNull())
    n_total = src.count()
    cands = merged_candidates(spark, state_path, item_col, capacity).select(
        item_col
    )
    return (
        src.join(F.broadcast(cands), on=item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n_total))
    )


def start_heavy_stream(
    spark: SparkSession,
    incoming_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    item_col: str,
    capacity: int = 64,
    trigger_seconds: int = 60,
):
    """Wire the sketch pass as a Structured Stream over an incoming
    directory; candidates stay queryable mid-stream via
    ``merged_candidates`` without stopping anything."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_heavy_batch(batch_df, batch_id, state_path, item_col, capacity)

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
