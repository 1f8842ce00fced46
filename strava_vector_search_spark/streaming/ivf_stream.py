"""Streaming IVF index maintenance — the ANN layout kept fresh under an
appending vector feed, the TARGET_LAG freshness pattern
(streaming/refresh.py) applied to the partition-pruned search path.

Each micro-batch runs ``operators.ann.append_to_ivf_index``: the batch's
vectors are assigned to the CURRENT centroids (a pure per-row function —
broadcast |k|-row cross join, map-side) and their files land under the
matching cluster partitions, so a query between any two batches sees
old + new rows with partition pruning intact and no rebuild. Assignment
purity is what keeps the stream exact with respect to the batch
operator: appending batches one at a time produces the identical table
to assigning the whole accumulated feed at once
(tests/test_index_maintenance.py pins it, including through a live
foreachBatch stream).

Centroid drift is the one thing appends cannot fix: as the corpus
grows, cluster means move away from the centroids assignments were made
with and recall decays. ``drift_report`` reads it live
(``operators.ann.ivf_centroid_drift``); re-clustering is deliberately
NOT done inside a micro-batch — it rewrites the whole layout, so it
belongs to a maintenance window (``operators.ann.maintain_ivf_index``),
exactly like compact_index for the SRP layout. The split mirrors
production practice: cheap freshness on the hot path, heavyweight
re-organization on a schedule.

At-least-once caveat (vs bloom_stream's idempotent OR): parquet append
is NOT idempotent — a replayed batch would duplicate its rows. The
checkpoint makes replays a crash-recovery-only event; exactly-once
would key each batch's files by batch_id (the cdc_stream pattern) at
the cost of a manifest read per query. Documented trade, not silently
ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from strava_vector_search_spark.operators.ann import (
    append_to_ivf_index,
    ivf_centroid_drift,
)


def process_ivf_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    centroids: DataFrame,
    cluster_col: str = "label",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """One append micro-batch: assign against the fixed centroids and
    append under the matching cluster partitions. O(batch * k) map-side
    work; empty batches are skipped without touching the layout."""
    if batch_df.isEmpty():
        return
    append_to_ivf_index(
        batch_df.drop(cluster_col) if cluster_col in batch_df.columns
        else batch_df,
        index_path,
        centroids,
        cluster_col,
        vector_col,
        id_col,
    )


def drift_report(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    cluster_col: str = "label",
    vector_col: str = "embedding",
) -> DataFrame:
    """Live per-cluster drift of the growing index vs the centroids the
    stream is assigning with — the signal that schedules the next
    maintain_ivf_index re-cluster window."""
    return ivf_centroid_drift(
        spark, index_path, centroids, cluster_col, vector_col
    )


def start_ivf_stream(
    spark: SparkSession,
    incoming_path: str,
    index_path: str,
    checkpoint_path: str,
    schema,
    centroids: DataFrame,
    cluster_col: str = "label",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    trigger_seconds: int = 60,
):
    """Wire the append pass as a Structured Stream over an incoming
    directory of vector files. ``centroids`` must be a stable (small)
    table — collect/checkpoint it before starting the stream so every
    batch assigns against the same clustering."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_ivf_batch(
            batch_df,
            batch_id,
            index_path,
            centroids,
            cluster_col,
            vector_col,
            id_col,
        )

    stream = spark.readStream.schema(schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
