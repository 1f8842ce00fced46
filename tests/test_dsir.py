"""DSIR importance reweighting (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.dsir import (
    dsir_select,
    importance_log_ratios,
    score_log_weights,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_target_equal_proposal_gives_zero_weights(spark):
    docs = _docs(spark, ["alpha beta", "gamma delta", "alpha gamma"])
    ratios = importance_log_ratios(docs, docs, buckets=64)
    assert all(r == 0.0 for r in ratios)
    scored = score_log_weights(docs, ratios, buckets=64).collect()
    assert all(r["log_w"] == 0.0 for r in scored)


def test_target_like_docs_outrank_off_target(spark):
    # target vocabulary {aa..} vs off-target {zz..}: every target-vocab doc
    # must carry a strictly higher log weight
    target = _docs(spark, ["aquila aurora astra", "aurora astra"])
    corpus = _docs(
        spark,
        [
            "aquila aurora astra aurora",
            "zephyr zorro zodiac zulu",
            "aurora astra aquila",
            "zodiac zulu zephyr",
        ],
    )
    ratios = importance_log_ratios(target, corpus, buckets=256)
    w = {
        r["doc_id"]: r["log_w"]
        for r in score_log_weights(corpus, ratios, buckets=256).collect()
    }
    assert min(w[0], w[2]) > max(w[1], w[3])
    top2 = {
        r["doc_id"]
        for r in dsir_select(corpus, ratios, k=2, buckets=256).collect()
    }
    assert top2 == {0, 2}


def test_selection_deterministic_under_repartition(spark):
    texts = [f"tok{i % 7} tok{i % 11} tok{i % 13}" for i in range(200)]
    docs = _docs(spark, texts)
    target = docs.filter(F.col("doc_id") % 5 == 0)
    ratios = importance_log_ratios(target, docs, buckets=128)
    a = [
        (r["doc_id"], r["score"])
        for r in dsir_select(docs, ratios, k=20, buckets=128).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in dsir_select(
            docs.repartition(13), ratios, k=20, buckets=128
        ).collect()
    ]
    assert a == b and len(a) == 20


def test_score_log_weights_refuses_nonfinite_ratio(spark):
    # a non-finite ratio would render as CAST(inf AS DECIMAL(28,12)) and
    # die at F.expr parse time with an opaque ParseException; the guard
    # names the offending bucket instead (ADVICE r12)
    import math

    import pytest

    from strava_vector_search_spark.operators.dsir import score_log_weights

    docs = _docs(spark, ["tok1 tok2 tok3"])
    bad = [0.0] * 8
    bad[5] = math.inf
    with pytest.raises(ValueError, match=r"ratios\[5\]"):
        score_log_weights(docs, bad, buckets=8)
