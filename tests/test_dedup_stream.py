from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.streaming.dedup_stream import (
    admit_batch,
    process_batch,
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


def test_admit_batch_rejected_ref_does_not_chain_reject(spark):
    """A doc whose ONLY match is a rejected doc must be admitted: doc 10 is
    rejected against the store, doc 11 matches doc 10 in-batch but not the
    store — 11's match never entered the corpus, so 11 is admitted."""
    from strava_vector_search_spark.operators.dedup import minhash_signatures
    from strava_vector_search_spark.streaming.dedup_stream import _band_rows

    # Construct texts where est_jaccard(A, B) >= thr, est(B, C) >= thr but
    # est(A, C) < thr (minhash is md5-deterministic, so once the construction
    # holds it holds forever). A=Q, B=Q+R, C=R: A and C share ZERO shingles
    # (est(A, C) = 0), while A~B and B~C share half their shingles each.
    # 64 hashes tighten the estimate; 32 bands of 2 rows make the LSH
    # candidate surfacing near-certain at J~0.5.
    Q = " ".join(f"q{i} common{i}" for i in range(14))
    R = " ".join(f"r{i} linked{i}" for i in range(14))
    A, B, C = Q, f"{Q} {R}", R
    NH, NB, thr = 64, 32, 0.35

    store_docs = _docs(spark, [(1, A)])
    store_sigs = minhash_signatures(store_docs, "doc_id", "text", NH)

    # sanity-pin the construction via the same estimator admit_batch uses
    sigs3 = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(
            _docs(spark, [(1, A), (10, B), (11, C)]), "doc_id", "text", NH
        ).collect()
    }

    def est(x, y):
        return sum(a == b for a, b in zip(sigs3[x], sigs3[y])) / NH

    assert est(1, 10) >= thr and est(10, 11) >= thr and est(1, 11) < thr

    # ...and the LSH bands must actually surface both candidate pairs
    def bset(did, text):
        return {(r["band"], r["bkey"]) for r in _band_rows(
            minhash_signatures(_docs(spark, [(did, text)]), "doc_id", "text", NH),
            "doc_id", NH, NB).collect()}

    assert bset(1, A) & bset(10, B) and bset(10, B) & bset(11, C)

    admitted, _ = admit_batch(
        _docs(spark, [(10, B), (11, C)]), store_sigs,
        threshold=thr, num_hashes=NH, bands=NB,
    )
    ids = sorted(r["doc_id"] for r in admitted.collect())
    assert ids == [11]  # 10 rejected vs store; 11 admitted despite ~10


def test_process_batch_replay_is_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    sigs = str(tmp_path / "sigs")

    batch0 = _docs(spark, [(1, BASE), (2, OTHER)])
    process_batch(spark, batch0, 0, corpus, sigs)
    # replay the same batch (at-least-once delivery after a crash)
    process_batch(spark, batch0, 0, corpus, sigs)
    rows = spark.read.parquet(corpus).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]  # no duplicates
    sig_rows = spark.read.parquet(sigs).collect()
    assert sorted(r["doc_id"] for r in sig_rows) == [1, 2]

    # a later batch still dedups against batch 0's store
    batch1 = _docs(spark, [(3, NEAR), (4, THIRD)])
    process_batch(spark, batch1, 1, corpus, sigs)
    process_batch(spark, batch1, 1, corpus, sigs)  # replay batch 1 too
    have = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert have == [1, 2, 4]  # 3 rejected as near-dup of 1, no dup rows


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
