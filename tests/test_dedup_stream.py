from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.streaming.dedup_stream import (
    admit_batch,
    start_dedup_stream,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today again"
NEAR = BASE.replace("today", "tomorrow")
OTHER = "completely different material about spark shuffles joins and window functions everywhere"
THIRD = "yet another unrelated document describing parquet files and columnar storage layouts"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_admit_batch_rejects_near_dup_of_store(spark):
    store_docs = _docs(spark, [(1, BASE)])
    from strava_vector_search_spark.operators.dedup import minhash_signatures

    store_sigs = minhash_signatures(store_docs, "doc_id", "text")
    admitted, sigs = admit_batch(
        _docs(spark, [(10, NEAR), (11, OTHER)]), store_sigs
    )
    ids = sorted(r["doc_id"] for r in admitted.collect())
    assert ids == [11]  # NEAR rejected against the store, OTHER admitted
    assert sorted(r["doc_id"] for r in sigs.collect()) == [11]


def test_admit_batch_intra_batch_dedup_lower_id_wins(spark):
    admitted, _ = admit_batch(
        _docs(spark, [(5, BASE), (6, BASE), (7, OTHER)]), None
    )
    ids = sorted(r["doc_id"] for r in admitted.collect())
    assert ids == [5, 7]  # 6 is an intra-batch dup of 5


def test_streaming_dedup_end_to_end(spark, tmp_path):
    incoming = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    sigs = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")

    _docs(spark, [(1, BASE), (2, OTHER)]).write.parquet(incoming)
    q = start_dedup_stream(
        spark, incoming, corpus, sigs, ckpt,
        docs_schema="doc_id long, text string", trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                have = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
            except Exception:
                have = set()
            if have == {1, 2}:
                break
            time.sleep(1)
        assert have == {1, 2}

        # second wave: a near-dup of doc 1 plus a genuinely new doc
        _docs(spark, [(3, NEAR), (4, THIRD)]).write.mode("append").parquet(incoming)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            have = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
            if 4 in have:
                break
            time.sleep(1)
        assert have == {1, 2, 4}  # 3 rejected as near-dup of 1
        sig_ids = {r["doc_id"] for r in spark.read.parquet(sigs).collect()}
        assert sig_ids == {1, 2, 4}
    finally:
        q.stop()


def test_admit_batch_empty_and_degenerate_inputs(spark):
    from strava_vector_search_spark.operators.dedup import minhash_signatures

    # empty incoming batch: no-op, no crash
    empty = _docs(spark, []).filter("doc_id > 0")
    admitted, sigs = admit_batch(empty, None)
    assert admitted.count() == 0 and sigs.count() == 0

    # empty-text and single-token docs survive (degenerate shingles)
    weird = _docs(spark, [(1, ""), (2, "word"), (3, OTHER)])
    admitted, sigs = admit_batch(weird, None)
    assert admitted.count() == 3
    # but two empty-text docs ARE mutual dups -> lower id wins
    two_empty = _docs(spark, [(7, ""), (8, "")])
    admitted2, _ = admit_batch(two_empty, None)
    assert sorted(r["doc_id"] for r in admitted2.collect()) == [7]
