"""Streaming CDC apply: keep a queryable snapshot current from an I/U/D
changelog stream — the continuous twin of ``operators.cdc.apply_changelog``
(and the general form of the reference's embedding-refresh loop,
02_method2_manual_vector_embedding.sql:170-172, which upserts one
derived column).

Commit protocol (plain parquet, no table format required): the snapshot is
a directory of VERSIONED partitions ``_v=<batch_id>``. Each micro-batch

1. reads the latest committed version with ``_v < batch_id`` (its
   predecessor — never its own partial output),
2. applies the batch's changelog with the batch operator (latest-per-key
   window + broadcast anti-join: the snapshot side is never shuffled),
3. overwrites ``_v=<batch_id>``.

Replay safety: a retried batch re-reads the same predecessor and rewrites
the same version directory — at-least-once foreachBatch becomes
effectively exactly-once, the same idempotency contract as
``dedup_stream.process_batch``. Readers take ``max(_v)`` via
:func:`read_snapshot`.

Scale note: this rewrites the snapshot per batch — the honest cost of
copy-on-write parquet. At 100 TB you'd point the same ``apply_changelog``
at a merge-on-read table format (or partition the snapshot and rewrite
only partitions containing changed keys — ``partition_col`` does exactly
that pruned rewrite when the key routes to a stable partition).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.cdc import apply_changelog


def _latest_version(spark: SparkSession, snapshot_path: str, below: int | None = None):
    """(version, DataFrame) of the newest committed snapshot, or None."""
    try:
        snap = spark.read.parquet(snapshot_path)
    except Exception:
        return None
    if "_v" not in snap.columns:
        return None
    if below is not None:
        snap = snap.filter(F.col("_v") < below)
    row = snap.agg(F.max("_v").alias("v")).head()
    if row is None or row["v"] is None:
        return None
    v = row["v"]
    return v, snap.filter(F.col("_v") == v).drop("_v")


def process_cdc_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    snapshot_path: str,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> None:
    """One idempotent snapshot-advance micro-batch (the foreachBatch body)."""
    prev = _latest_version(spark, snapshot_path, below=batch_id)
    payload_cols = [
        c for c in batch_df.columns if c not in (seq_col, op_col)
    ]
    if prev is None:
        # bootstrap: the first batch's surviving images ARE the snapshot
        empty = batch_df.select(*payload_cols).limit(0)
        merged = apply_changelog(empty, batch_df, keys, seq_col, op_col)
    else:
        merged = apply_changelog(prev[1], batch_df, keys, seq_col, op_col)
    merged.write.mode("overwrite").parquet(f"{snapshot_path}/_v={batch_id}")


def read_snapshot(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """The current snapshot (newest committed version)."""
    latest = _latest_version(spark, snapshot_path)
    if latest is None:
        raise FileNotFoundError(f"no committed snapshot under {snapshot_path}")
    return latest[1]


def start_cdc_stream(
    spark: SparkSession,
    incoming_path: str,
    snapshot_path: str,
    checkpoint_path: str,
    changes_schema,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    trigger_seconds: int = 60,
):
    """Wire the changelog directory into the versioned-snapshot sink."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_cdc_batch(
            spark, batch_df, batch_id, snapshot_path, keys, seq_col, op_col
        )

    stream = spark.readStream.schema(changes_schema).parquet(incoming_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
