"""Unit tests for operators/fulltext.py (BM25)."""

import math

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.fulltext import (
    bm25_corpus_stats,
    bm25_idf,
    bm25_topk,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog dog dog dog"),
            (3, "bird"),
            (4, "cat bird fish fish"),
        ],
        "doc_id int, text string",
    )


def test_corpus_stats(docs):
    s = bm25_corpus_stats(docs, "text", ["cat", "dog", "fish", "absent"])
    assert s["n_docs"] == 4
    assert s["avgdl"] == (3 + 4 + 1 + 4) / 4
    assert s["df"] == {"cat": 2, "dog": 2, "fish": 1, "absent": 0}


def _ref_bm25(tf, dl, n, df, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_scores_match_reference_formula(docs):
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, ["cat", "fish"], k=10).collect()
    }
    avgdl = 3.0
    exp1 = _ref_bm25(2, 3, 4, 2, avgdl)  # doc1: cat x2, no fish
    exp4 = _ref_bm25(1, 4, 4, 2, avgdl) + _ref_bm25(2, 4, 4, 1, avgdl)
    assert out[1] == pytest.approx(round(exp1, 6), abs=1e-9)
    assert out[4] == pytest.approx(round(exp4, 6), abs=1e-9)
    assert set(out) == {1, 4}  # zero-score docs dropped


def test_topk_ordering_and_k(docs):
    rows = bm25_topk(docs, ["dog"], k=1).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 2  # highest tf wins


def test_absent_term_scores_zero_everywhere(docs):
    assert bm25_topk(docs, ["absent"], k=10).count() == 0


def test_stats_reuse_skips_second_pass(docs):
    stats = bm25_corpus_stats(docs, "text", ["cat"])
    out = bm25_topk(docs, ["cat"], k=5, stats=stats)
    assert out.count() == 2


def test_plan_is_topk_not_full_sort(docs):
    plan = (
        bm25_topk(docs, ["cat"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort shuffle


def test_tfidf_top_terms_ranks_rare_terms(spark):
    from strava_vector_search_spark.operators.fulltext import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common common rare1"),
            (2, "common common rare2"),
            (3, "common common common"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # the doc-unique term beats the corpus-wide one despite lower tf
    assert by_doc[1][0]["term"] == "rare1"
    assert by_doc[2][0]["term"] == "rare2"
    # 'common' appears in every doc -> idf = ln(1) = 0
    assert all(r["tfidf"] == 0.0 for r in by_doc[3])
    # ranks are 1..k, deterministic
    assert [r["rank"] for r in by_doc[1]] == [1, 2]
