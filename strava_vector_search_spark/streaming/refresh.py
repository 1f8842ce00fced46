"""Incremental index refresh — the TARGET_LAG='1 minute' semantic of the
reference's search service (``01_method1_cortex_search.sql:173``, "Update
embeddings when new workouts are added" ``01:230``) plus the cache-growth
append stream ("Store generated workouts back to table" ``02:418``).

Design (SURVEY §2.9): a Structured Streaming file source over the documents
directory → ``foreachBatch`` → embed ONLY rows whose ids are not yet in the
embeddings table (left-anti join) → append to the embeddings parquet. A
60-second processing-time trigger reproduces the 1-minute lag.

The batch step is a pure function (:func:`refresh_batch`) so correctness is
testable without a streaming runtime (SURVEY §7 risk 6); the streaming
wiring (:func:`start_refresh_stream`) gets a smoke test.

Scale notes: the anti-join's build side is the embeddings *ids only* (8-byte
column scan, not vectors); new-batch sizes are bounded by the trigger
interval, so each micro-batch is a small broadcast anti-join + an append of
freshly embedded rows. No state store needed — idempotence comes from the
anti-join, so replayed files cannot double-embed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import DEFAULT_DIM, hash_embedding_table

EmbedFn = Callable[[DataFrame], DataFrame]


def default_embedder(id_col: str, text_col: str, dim: int = DEFAULT_DIM) -> EmbedFn:
    return lambda df: hash_embedding_table(df, id_col, text_col, dim)


def refresh_batch(
    new_docs: DataFrame,
    existing_embeddings: DataFrame | None,
    embed: EmbedFn,
    id_col: str = "doc_id",
) -> DataFrame:
    """One refresh step: embed only genuinely-new documents.

    Returns the embedding rows to APPEND (never rewrites existing ones —
    the reference's UPDATE ... WHERE EMBEDDING IS NULL shape, 02:170-172).
    """
    fresh = new_docs
    if existing_embeddings is not None:
        have = existing_embeddings.select(F.col(id_col))
        fresh = new_docs.join(have, id_col, "left_anti")
    return embed(fresh)


def start_refresh_stream(
    spark: SparkSession,
    docs_path: str,
    index_path: str,
    checkpoint_path: str,
    embed: EmbedFn,
    id_col: str = "doc_id",
    docs_schema=None,
    trigger_seconds: int = 60,
    fmt: str = "parquet",
):
    """Wire the refresh as a Structured Stream (TARGET_LAG equivalent).

    File source over ``docs_path``; every micro-batch anti-joins against the
    current index and appends the new embeddings. Exactly-once per file via
    the checkpoint; idempotent via the anti-join.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        try:
            existing = spark.read.parquet(index_path)
        except Exception:
            existing = None
        out = refresh_batch(batch_df, existing, embed, id_col)
        out.write.mode("append").parquet(index_path)

    reader = spark.readStream.format(fmt)
    if docs_schema is not None:
        reader = reader.schema(docs_schema)
    stream = reader.load(docs_path)
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def embed_missing(
    docs: DataFrame,
    embeddings: DataFrame | None,
    embed: EmbedFn,
    id_col: str = "doc_id",
) -> DataFrame:
    """The batch write-back: embed every document that has no embedding yet —
    the reference's ``UPDATE t SET EMBEDDING = EMBED_TEXT_768(...) WHERE
    EMBED_STR IS NOT NULL`` (02:170-172). Spark has no in-place update; the
    equivalent is computing the missing rows (this function) and appending
    them to the embeddings table — same semantics, append-only layout."""
    return refresh_batch(docs, embeddings, embed, id_col)
