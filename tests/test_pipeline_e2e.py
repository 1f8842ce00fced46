"""Capstone: the full streaming ingest pipeline in one live test —
incoming docs → near-dup ADMISSION gate → TARGET_LAG embedding refresh →
searchable via the SearchService — composing streaming/dedup_stream,
streaming/refresh, and service exactly as a production deployment wires
them (SERVING.md data-plane diagram)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from strava_vector_search_spark.service import SearchService
from strava_vector_search_spark.streaming.dedup_stream import start_dedup_stream
from strava_vector_search_spark.streaming.refresh import (
    default_embedder,
    start_refresh_stream,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def _wait(cond, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(1)
    return False


def test_ingest_dedup_embed_search_end_to_end(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    corpus = str(tmp_path / "corpus")
    sigs = str(tmp_path / "sigs")
    index = str(tmp_path / "index")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "a completely different document about mountain cycling routes"),
            (3, "the quick brown fox jumps over the lazy dog again and again!"),  # near-dup of 1
        ],
        SCHEMA,
    )
    docs.limit(0).write.parquet(incoming)
    # bootstrap the corpus store so the downstream refresh stream can bind
    # to it before the gate lands its first batch (empty sentinel partition
    # in the same _batch_id layout the gate writes)
    docs.limit(0).write.parquet(f"{corpus}/_batch_id=-1")

    gate = start_dedup_stream(
        spark, incoming, corpus, sigs, ck1, SCHEMA, trigger_seconds=1
    )
    refresh = start_refresh_stream(
        spark,
        corpus,
        index,
        ck2,
        default_embedder("doc_id", "text", dim=16),
        docs_schema=SCHEMA,
        trigger_seconds=1,
    )
    try:
        docs.write.mode("append").parquet(incoming)

        # the admission gate must drop doc 3 (near-dup of 1) and the
        # refresh must embed the two admitted docs
        def index_caught_up():
            try:
                ids = {
                    r["doc_id"]
                    for r in spark.read.parquet(index).select("doc_id").collect()
                }
            except Exception:
                return False  # index not created yet
            return len(ids & {1, 2}) == 2

        assert _wait(index_caught_up), "index never caught up with admitted docs"
        admitted = {
            r["doc_id"] for r in spark.read.parquet(corpus).select("doc_id").collect()
        }
        assert admitted == {1, 2}
        embedded = {
            r["doc_id"] for r in spark.read.parquet(index).select("doc_id").collect()
        }
        assert embedded == {1, 2}
    finally:
        gate.stop()
        refresh.stop()

    # now the landed corpus serves search end-to-end
    svc = SearchService(
        spark,
        spark.read.parquet(corpus),
        id_col="doc_id",
        search_col="text",
        columns=("doc_id", "text"),
        dim=16,
    ).build()
    hits = svc.search(
        {"query": "quick brown fox lazy dog", "columns": ["doc_id"], "limit": 1}
    ).collect()
    assert hits and hits[0]["doc_id"] == 1
