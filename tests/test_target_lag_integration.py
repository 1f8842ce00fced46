"""TARGET_LAG end-to-end: a document appended to the corpus becomes
SEARCHABLE through the service within the refresh trigger interval —
the full reference semantic (01:173 'TARGET_LAG = 1 minute', 01:230
'update embeddings when new workouts are added', 02:418 cache growth),
not just the index-append mechanics."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.service import SearchService
from strava_vector_search_spark.streaming.refresh import (
    default_embedder,
    start_refresh_stream,
)

DIM = 16


def test_new_document_becomes_searchable_within_lag(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    initial = spark.createDataFrame(
        [
            (1, "easy recovery run gentle pace"),
            (2, "endurance ride moderate cycling"),
        ],
        "doc_id long, text string",
    )
    initial.write.parquet(docs_path)
    embed = default_embedder("doc_id", "text", dim=DIM)
    embed(initial).write.parquet(index_path)

    q = start_refresh_stream(
        spark,
        docs_path,
        index_path,
        ckpt,
        embed,
        id_col="doc_id",
        docs_schema="doc_id long, text string",
        trigger_seconds=1,  # compressed target lag for the test
    )
    try:
        def search_hit(query: str):
            # the service reads the CURRENT corpus + index from storage —
            # exactly how a serving job would see the refreshed state
            corpus = spark.read.parquet(docs_path)
            svc = SearchService(
                spark, corpus, id_col="doc_id", search_col="text", dim=DIM
            ).attach_embeddings(spark.read.parquet(index_path), vec_id_col="doc_id")
            rows = svc.search({"query": query, "limit": 1}).collect()
            return rows[0] if rows else None

        # before the append: the new workout is a cache miss
        pre = search_hit("swimming technique drills flutter kick")
        assert pre is None or pre["similarity"] < 0.99

        # the cache-growth append (02:418)
        spark.createDataFrame(
            [(3, "swimming technique drills flutter kick")],
            "doc_id long, text string",
        ).write.mode("append").parquet(docs_path)

        deadline = time.time() + 60  # generous bound; trigger is 1 s
        hit = None
        while time.time() < deadline:
            got = search_hit("swimming technique drills flutter kick")
            if got is not None and got["doc_id"] == 3 and got["similarity"] > 0.999:
                hit = got
                break
            time.sleep(1)
        assert hit is not None, "new document never became searchable"
    finally:
        q.stop()
