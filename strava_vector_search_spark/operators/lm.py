"""Distributed n-gram language-model scoring — Stupid Backoff form
(Brants et al., "Large Language Models in Machine Translation", EMNLP
2007 — public method). Stupid Backoff deliberately replaces normalized
smoothing with a fixed backoff factor because at corpus scale the count
tables are the whole model: training is three map-side-combined count
aggregates, scoring is broadcast-join lookups, and nothing needs a
normalization pass over the vocabulary.

    S(w3 | w1 w2) = c123/c12           if the trigram was seen
                  = 0.4 * c23/c2       else if the bigram was seen
                  = 0.4^2 * c3/N       otherwise

Train and score corpora are independent inputs, so held-out scoring
exercises the backoff chain (a trigram absent from training falls
through; an unseen unigram contributes NULL, dropped from the mean and
reported in ``n_oov``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from strava_vector_search_spark.operators.dedup import tokens

BACKOFF = 0.4


def _ngram_rows(tok: DataFrame, n: int, names: list[str]) -> DataFrame:
    """Map-only n-gram extraction via index transforms over the token
    array — no positional self-join."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_ts") - (n - 1)),
        lambda i: F.struct(
            *[F.element_at("_ts", i + j).alias(names[j]) for j in range(n)]
        ),
    )
    return (
        tok.filter(F.size("_ts") >= n)
        .select("doc_id", F.explode(grams).alias("p"))
        .select("doc_id", *[f"p.{c}" for c in names])
    )


def stupid_backoff_scores(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pretokenized: bool = False,
) -> DataFrame:
    """(id_col, n_trigrams, n_oov, avg_log_score): per-document mean
    log Stupid Backoff score of ``score`` under counts from ``train``.
    DECIMAL(28,12)-routed sum so aggregation order cannot move the mean.
    ``pretokenized=True``: train/score already carry (id_col, _ts token
    array) — lets callers reuse a shared tokenized-corpus kernel."""
    if pretokenized:
        ttok = train.select(F.col(id_col).alias("doc_id"), "_ts")
        stok = score.select(F.col(id_col).alias("doc_id"), "_ts")
    else:
        ttok = train.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_ts")
        )
        stok = score.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_ts")
        )
    uni = (
        ttok.select(F.explode("_ts").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = int(uni.agg(F.coalesce(F.sum("cnt"), F.lit(0))).head()[0])
    bi = _ngram_rows(ttok, 2, ["a", "b"]).groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cab")
    )
    c123 = _ngram_rows(ttok, 3, ["w1", "w2", "w3"]).groupBy(
        "w1", "w2", "w3"
    ).agg(F.count(F.lit(1)).alias("c123"))
    tri = _ngram_rows(stok, 3, ["w1", "w2", "w3"])
    c12 = bi.select(
        F.col("a").alias("w1"), F.col("b").alias("w2"), F.col("cab").alias("c12")
    )
    c23 = bi.select(
        F.col("a").alias("w2"), F.col("b").alias("w3"), F.col("cab").alias("c23")
    )
    c2 = uni.select(F.col("t").alias("w2"), F.col("cnt").alias("c2"))
    c3 = uni.select(F.col("t").alias("w3"), F.col("cnt").alias("c3"))
    s = F.when(
        F.col("c123").isNotNull() & (F.col("c12") > 0),
        F.col("c123") / F.col("c12"),
    ).otherwise(
        F.lit(BACKOFF)
        * F.when(
            F.col("c23").isNotNull() & (F.col("c2") > 0),
            F.col("c23") / F.col("c2"),
        ).otherwise(F.lit(BACKOFF) * F.col("c3") / F.lit(float(max(total, 1))))
    )
    terms = (
        tri.join(c123, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(c23, ["w2", "w3"], "left")
        .join(c2, "w2", "left")
        .join(c3, "w3", "left")
        .select("doc_id", F.log(s).alias("ls"))
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.col("ls").isNull().cast("bigint")).alias("n_oov"),
            F.round(
                F.sum(F.col("ls").cast("decimal(28,12)")).cast("double")
                / F.count("ls"),
                6,
            ).alias("avg_log_score"),
        )
        .withColumnRenamed("doc_id", id_col)
        .orderBy(id_col)
    )
