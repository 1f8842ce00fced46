"""Streaming IVF+PQ index maintenance — the PERSISTED compressed index
(operators/pq.write_pq_index) kept fresh under an appending vector feed:
the TARGET_LAG freshness semantic (reference 01:173, 01:230 "update
embeddings when new workouts are added") applied to the CODE table.

The one rule that makes this sound: the stream ENCODES ONLY. Appended
vectors are assigned to the FROZEN coarse centroids
(operators/ann.assign_to_centroids — a pure per-row expression, zero
shuffle) and quantized with the FROZEN codebooks (operators/pq.encode_pq
— one Arrow-batched map pass); NOTHING retrains inside a micro-batch.
Retraining in-stream would silently re-key every previously stored code
(an ADC lookup table built from new codebooks misreads old codes), the
compressed-index analogue of the centroid-drift hazard ivf_stream
documents — codebook refresh is a maintenance-window rebuild
(write_pq_index from scratch), never an append.

Layout: the code table is partitioned ``_sb=<batch>/<cluster>=…``
(write_pq_index's ``stream_batch_col`` variant), so each micro-batch
dynamic-partition-overwrites exactly its own ``_sb`` partitions — an
at-least-once replay rewrites identical files instead of duplicating
codes (the ivf_stream/cdc_stream exactly-once recipe). Queries between
any two batches load old + new codes with cluster partition pruning
intact (cluster stays a physical partition level under every ``_sb``),
and ADC scoring is unchanged because the codebooks never moved.

Accuracy drift is the price of frozen quantizers: as the corpus grows
away from the training sample, PQ reconstruction error rises and the
coarse assignment decays exactly as ivf_stream's module docstring
describes. The maintenance window (STOP stream → retrain + write_pq_index
→ restart) mirrors ivf_stream's stop/maintain/restart contract.

Reference scope: composition of the reference's freshness clause
(01:173) with its scale prose ("1M+ documents: consider approximate
search", 02:438-442) — the stream that keeps the approximate index as
fresh as the exact one.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.operators import pq as PQ
from strava_vector_search_spark.operators.ann import assign_to_centroids

_BATCH_COL = "_sb"


def init_pq_stream_index(
    emb: DataFrame,
    books: np.ndarray,
    centroids: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    vector_col: str = "embedding",
) -> None:
    """Write the stream-managed IVF+PQ artifact from the base corpus:
    assign + encode the base with the (already trained) codebooks and
    persist codes as batch −1, plus codebooks/centroids/meta via
    write_pq_index. ``emb`` may already carry ``cluster_col``; rows
    without it are assigned against ``centroids`` first — either way the
    stored assignment is the same pure per-row function every later
    batch applies."""
    if cluster_col not in emb.columns:
        emb = assign_to_centroids(
            emb, centroids, vector_col, cluster_col, id_col
        )
    codes = PQ.encode_pq(
        emb, books, vector_col=vector_col, id_col=id_col,
        keep_cols=(cluster_col,),
    ).withColumn(_BATCH_COL, F.lit(-1))
    PQ.write_pq_index(
        codes,
        books,
        index_path,
        id_col=id_col,
        cluster_col=cluster_col,
        centroids=centroids,
        stream_batch_col=_BATCH_COL,
    )


def process_pq_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    books: np.ndarray,
    centroids: DataFrame,
    cluster_col: str = "cluster",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """One idempotent ENCODE-ONLY micro-batch: assign the batch's vectors
    to the frozen centroids, quantize with the frozen codebooks, and
    dynamic-partition-overwrite ONLY this batch's ``_sb`` partitions of
    the code table. A replayed batch rewrites identical files; an empty
    batch touches nothing. Codebooks/centroids/meta files are never
    written here — the stream maintains codes, nothing else."""
    assigned = assign_to_centroids(
        batch_df, centroids, vector_col, cluster_col, id_col
    )
    codes = PQ.encode_pq(
        assigned, books, vector_col=vector_col, id_col=id_col,
        keep_cols=(cluster_col,),
    )
    (
        codes.withColumn(_BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BATCH_COL, cluster_col)
        .parquet(os.path.join(index_path, "codes"))
    )


def start_pq_stream(
    spark: SparkSession,
    incoming_path: str,
    index_path: str,
    checkpoint_path: str,
    schema,
    cluster_col: str = "cluster",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    trigger_seconds: int = 60,
):
    """Wire the encode-only append pass as a Structured Stream over an
    incoming directory of vector files. The codebooks and centroids are
    loaded ONCE from the artifact and frozen in the closure for the
    stream's lifetime — after a maintenance-window retrain, stop and
    restart so the stream picks up the new artifact (the ivf_stream
    stop/maintain/restart contract; a stream left running would encode
    against codebooks the queries no longer use)."""
    books, _codes, cents, meta = PQ.load_pq_index(spark, index_path)
    if meta.get("stream_batch_col") != _BATCH_COL:
        raise ValueError(
            f"start_pq_stream: artifact at {index_path!r} is not "
            "stream-managed (meta stream_batch_col="
            f"{meta.get('stream_batch_col')!r}) — initialize it with "
            "init_pq_stream_index; appending _sb partitions into a plain "
            "code layout breaks partition discovery"
        )
    if cents is None:
        raise ValueError(
            f"start_pq_stream: artifact at {index_path!r} has no "
            "centroid table — the stream cannot assign clusters"
        )
    cents = cents.localCheckpoint()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_pq_batch(
            batch_df,
            batch_id,
            index_path,
            books,
            cents,
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
