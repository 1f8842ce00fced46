"""Stupid Backoff trigram LM (operators/lm.py) — the backoff chain on
held-out text, checked against hand-computed scores."""

from __future__ import annotations

import math

from strava_vector_search_spark.operators.lm import stupid_backoff_scores


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_backoff_chain_hand_computed(spark):
    # training "a b c a b c d": trigrams abc:2 bca:1 cab:1 bcd:1;
    # bigrams ab:2 bc:2 ca:1 cd:1; unigrams a:2 b:2 c:2 d:1, N=7
    train = _docs(spark, ["a b c a b c d"])
    # held-out trigrams: (a b c) top branch 2/2; (b c a) top branch 1/2;
    # (c a x) -> x unseen at every level -> NULL term (OOV)
    score = _docs(spark, ["a b c a x"], start_id=100)
    out = stupid_backoff_scores(train, score).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_trigrams"] == 3
    assert r["n_oov"] == 1  # (c a x): x unseen -> NULL term, dropped
    exp = (math.log(2 / 2) + math.log(1 / 2)) / 2
    assert abs(r["avg_log_score"] - round(exp, 6)) < 1e-9


def test_bigram_backoff_branch(spark):
    # training "a b c d": trigram (b c a) unseen, bigram (c a) unseen,
    # but (c d)... choose (d a b): trigram unseen, bigram (a b) SEEN ->
    # 0.4 * c(ab)/c(a) = 0.4 * 1/1
    train = _docs(spark, ["a b c d"])
    score = _docs(spark, ["d a b"], start_id=100)
    r = stupid_backoff_scores(train, score).collect()[0]
    assert r["n_trigrams"] == 1 and r["n_oov"] == 0
    assert abs(r["avg_log_score"] - round(math.log(0.4), 6)) < 1e-9


def test_unigram_backoff_floor(spark):
    train = _docs(spark, ["p q r s"])
    # trigram (z z q): trigram + bigram (z q)... w2=z unseen -> falls to
    # 0.4^2 * c(q)/N = 0.16 * 1/4
    score = _docs(spark, ["z z q"], start_id=100)
    r = stupid_backoff_scores(train, score).collect()[0]
    assert r["n_trigrams"] == 1 and r["n_oov"] == 0
    assert abs(r["avg_log_score"] - round(math.log(0.16 * 0.25), 6)) < 1e-9


def test_self_scoring_has_no_oov_and_top_branch(spark):
    docs = _docs(spark, ["m n o m n o", "n o m n"])
    out = stupid_backoff_scores(docs, docs).collect()
    assert all(r["n_oov"] == 0 for r in out)
    # every scored trigram exists in training -> all scores are
    # c123/c12 <= 1, so mean log score <= 0
    assert all(r["avg_log_score"] <= 0 for r in out)
