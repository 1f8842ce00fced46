"""Streaming IVF index maintenance — the ANN layout kept fresh under an
appending vector feed, the TARGET_LAG freshness pattern
(streaming/refresh.py) applied to the partition-pruned search path.

Each micro-batch assigns its vectors to the CURRENT centroids
(``operators.ann.assign_to_centroids`` — a pure per-row literal
expression, zero shuffle) and commits them under a BATCH-ID-KEYED
partition: the stream-managed layout is ``_sb=<batch>/<cluster>=<id>``,
written with dynamic partition overwrite, so an at-least-once replay of
a batch rewrites exactly its own ``_sb`` partitions with identical rows
— IDEMPOTENT, the same exactly-once recipe as cdc_stream/bloom_stream.
Queries between any two batches see old + new rows with cluster
partition pruning intact (cluster stays a physical partition level
under every ``_sb``) and no rebuild. Assignment purity keeps the stream
exact with respect to the batch operator: appending batches one at a
time produces the same (id, cluster) table as assigning the whole
accumulated feed at once (tests/test_index_maintenance.py pins it,
including through a live foreachBatch stream and a deliberate replay).

Centroid drift is the one thing appends cannot fix: as the corpus
grows, cluster means move away from the centroids assignments were made
with and recall decays. ``drift_report`` reads it live
(``operators.ann.ivf_centroid_drift``); re-clustering is deliberately
NOT done inside a micro-batch — it rewrites the whole layout, so it
belongs to a maintenance window, and it REQUIRES coordination:

    STOP the stream -> run ``maintain_stream_index`` (the
    _sb-layout-aware twin of ``operators.ann.maintain_ivf_index``, which
    itself targets only the plain ``write_ivf_index`` layout — mixing
    the two layouts under one path breaks partition discovery) ->
    RESTART the stream passing the RETURNED centroid table.

A stream left running (or restarted from its checkpoint with the old
centroid variable) after a re-cluster would keep assigning against the
old clustering while queries probe the new one — appended vectors would
land in partitions the probe never selects. The stop/restart contract
is the module's price for keeping the hot path cheap; it mirrors
compact_index's maintenance-window semantics on the SRP layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.ann import (
    IVF_LAYOUT_STREAM,
    assert_ivf_layout,
    assign_to_centroids,
    ivf_centroid_drift,
    write_ivf_layout_marker,
)

_BATCH_COL = "_sb"


def init_stream_index(
    base_df: DataFrame,
    index_path: str,
    cluster_col: str = "label",
) -> None:
    """Write the initial corpus as the stream-managed layout's batch −1:
    ``_sb=-1/<cluster>=...``. The base keeps whatever cluster assignment
    it arrives with (original labels, or assign_to_centroids output).
    Stamps the STREAM layout marker (operators.ann.assert_ivf_layout) so
    the plain-layout maintainer fails loudly if pointed here."""
    (
        base_df.withColumn(_BATCH_COL, F.lit(-1))
        .write.mode("overwrite")
        .partitionBy(_BATCH_COL, cluster_col)
        .parquet(index_path)
    )
    write_ivf_layout_marker(index_path, IVF_LAYOUT_STREAM)


def process_ivf_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    centroids: DataFrame,
    cluster_col: str = "label",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """One idempotent append micro-batch: assign against the fixed
    centroids (map-side literal expression) and dynamic-partition-
    overwrite ONLY this batch's ``_sb`` partitions — a replayed batch
    rewrites identical files instead of duplicating rows. An empty batch
    touches no partitions."""
    assert_ivf_layout(index_path, IVF_LAYOUT_STREAM, "process_ivf_batch")
    assigned = assign_to_centroids(
        batch_df, centroids, vector_col, cluster_col, id_col
    )
    (
        assigned.withColumn(_BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BATCH_COL, cluster_col)
        .parquet(index_path)
    )


def maintain_stream_index(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    drift_threshold: float = 0.05,
    cluster_col: str = "label",
    vector_col: str = "embedding",
) -> tuple[str, DataFrame]:
    """Maintenance-window re-cluster for the STREAM-MANAGED (_sb-keyed)
    layout — call with the stream STOPPED. Measures drift vs the
    centroids the stream has been assigning with; past the threshold,
    recomputes centroids from the full current membership, re-assigns
    every row, and re-initializes the layout (all rows fold back to
    batch −1, so the restarted stream's batch ids can never collide with
    history). Returns ("fresh", centroids) or ("reclustered",
    new_centroids) — restart the stream with whichever comes back.

    The plain-layout twin, ``operators.ann.maintain_ivf_index``, must
    NOT be pointed at this layout (ASSERTED via the layout marker, both
    ways): its delta append writes ``<cluster>=…`` dirs next to the
    ``_sb=…`` levels and Spark partition discovery rejects the mix.
    Drift trigger and re-cluster core are shared with the plain
    maintainer (operators.ann.max_drift / recluster_assignments); only
    the layout rewrite differs — init_stream_index here, the atomic
    rename swap there."""
    from strava_vector_search_spark.operators.ann import (
        max_drift,
        recluster_assignments,
    )

    assert_ivf_layout(
        index_path, IVF_LAYOUT_STREAM, "maintain_stream_index"
    )
    if max_drift(
        spark, index_path, centroids, cluster_col, vector_col
    ) <= drift_threshold:
        return "fresh", centroids
    rows = spark.read.parquet(index_path).drop(_BATCH_COL).localCheckpoint()
    new_centroids, reassigned = recluster_assignments(
        rows, cluster_col, vector_col
    )
    init_stream_index(reassigned, index_path, cluster_col)
    return "reclustered", new_centroids


def drift_report(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    cluster_col: str = "label",
    vector_col: str = "embedding",
) -> DataFrame:
    """Live per-cluster drift of the growing index vs the centroids the
    stream is assigning with — the signal that schedules the next
    re-cluster maintenance window (see module docstring for the
    stop/maintain/re-init/restart contract)."""
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
    directory of vector files. ``index_path`` must hold the
    ``init_stream_index`` layout. ``centroids`` must be a stable (small)
    table — collect/checkpoint it before starting the stream so every
    batch assigns against the same clustering; after any re-cluster,
    stop and restart with the NEW centroid table (module docstring)."""
    assert_ivf_layout(index_path, IVF_LAYOUT_STREAM, "start_ivf_stream")

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
