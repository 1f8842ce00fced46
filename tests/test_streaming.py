from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import hash_embedding_table
from strava_vector_search_spark.streaming.refresh import (
    default_embedder,
    refresh_batch,
    start_refresh_stream,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "alpha run"), (2, "beta ride"), (3, "gamma swim")],
        "doc_id long, text string",
    )


def test_refresh_batch_embeds_only_new(spark, docs):
    embed = default_embedder("doc_id", "text", dim=8)
    existing = embed(docs.filter(F.col("doc_id") <= 2))
    out = refresh_batch(docs, existing, embed, "doc_id")
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [3]
    assert len(rows[0]["embedding"]) == 8


def test_refresh_batch_idempotent(spark, docs):
    embed = default_embedder("doc_id", "text", dim=8)
    existing = embed(docs)  # everything already embedded
    assert refresh_batch(docs, existing, embed, "doc_id").count() == 0


def test_refresh_batch_bootstrap(spark, docs):
    embed = default_embedder("doc_id", "text", dim=8)
    assert refresh_batch(docs, None, embed, "doc_id").count() == 3


def test_streaming_refresh_smoke(spark, docs, tmp_path):
    """End-to-end: stream new docs in, index tracks within the trigger lag."""
    docs_path = str(tmp_path / "docs")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    first = docs.filter(F.col("doc_id") <= 2)
    first.write.parquet(docs_path)
    # bootstrap the index with the first batch
    hash_embedding_table(first, "doc_id", "text", 8).write.parquet(index_path)

    q = start_refresh_stream(
        spark,
        docs_path,
        index_path,
        ckpt,
        default_embedder("doc_id", "text", dim=8),
        id_col="doc_id",
        docs_schema="doc_id long, text string",
        trigger_seconds=1,
    )
    try:
        docs.filter(F.col("doc_id") == 3).write.mode("append").parquet(docs_path)
        deadline = time.time() + 60
        while time.time() < deadline:
            ids = {r["doc_id"] for r in spark.read.parquet(index_path).collect()}
            if ids == {1, 2, 3}:
                break
            time.sleep(1)
        assert ids == {1, 2, 3}
        # no duplicate embeddings despite the first batch being replayed
        # through the stream (anti-join idempotence)
        cnt = spark.read.parquet(index_path).groupBy("doc_id").count()
        assert cnt.filter(F.col("count") > 1).count() == 0
    finally:
        q.stop()
