"""Stream-static enrichment + AvailableNow backfill — the last two
Structured Streaming shapes a production pipeline leans on daily.

**Stream-static join**: each micro-batch joins against the CURRENT state of
a static (batch) table — Spark re-evaluates the static side per batch, so
a dimension that is itself refreshed by another job is picked up without
restarting the stream. The dim side broadcasts (it's a dimension by
definition); the streaming side never shuffles for the join, which is what
keeps enrichment at ingest rate regardless of corpus size. No watermark
needed: the static side is not stateful.

Caveat that matters in production: overwriting plain-parquet under a live
stream DELETES files a pinned listing may still reference (FILE_NOT_EXIST
mid-batch) — parquet overwrite is not snapshot-isolated. The safe refresh
pattern without a table format that gives snapshots (Delta/Iceberg) is
APPEND-ONLY versioned dimension rows + latest-version selection in the
join (:func:`latest_dim`) + ``spark.catalog.refreshTable`` so the next
micro-batch re-lists; a stale listing then only misses the newest rows for
one batch, it never dereferences a deleted file.

**AvailableNow backfill**: ``Trigger.AvailableNow`` runs the SAME streaming
query as a bounded job — process everything currently available (in
rate-limited micro-batches, honoring ``maxFilesPerTrigger``), commit the
checkpoint, stop. Re-running after new files arrive processes ONLY the
delta: the checkpoint carries the file ledger across runs. This is how one
code path serves both the nightly 100 TB backfill and the continuous tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_dim(dim_df: DataFrame, key: str, version_col: str = "version") -> DataFrame:
    """Current snapshot of an append-only versioned dimension: one row per
    key, the attributes of the highest version. ``max_by`` keeps it a
    single partial+final aggregate — the dim is tiny, the agg re-runs per
    micro-batch against whatever rows exist at that moment."""
    others = [c for c in dim_df.columns if c not in (key, version_col)]
    return dim_df.groupBy(key).agg(
        *[F.expr(f"max_by({c}, {version_col})").alias(c) for c in others]
    )


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast stream-static join; works identically on a batch frame
    (the batch-twin testing pattern used across streaming/)."""
    return stream_df.join(F.broadcast(dim_df), on=on, how=how)


def run_backfill(
    transformed: DataFrame,
    sink_path: str,
    checkpoint: str,
    fmt: str = "parquet",
) -> None:
    """Run a streaming frame to completion under AvailableNow and block
    until done. Idempotent across invocations: the checkpoint's source
    ledger means already-seen input files are never reprocessed."""
    q = (
        transformed.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
