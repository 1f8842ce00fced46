"""Retrieval evaluation: recall@k / MRR@k / NDCG@k of a ranked result set
against a relevance truth set — the measurement loop every retrieval
stack (including the reference's cache-hit rubric, README.md:86-90) needs
before turning an approximation dial (binary candidates, IVF nprobe, LSH
bands).

Everything is DataFrame expressions: one equi-join of results to truth on
(query, doc), one per-query aggregate. Per-query work is O(k); the join
shuffles only the k·|queries| result rows — evaluation cost never scales
with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_metrics(
    results: DataFrame,
    truth: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Per-query binary-relevance metrics at cutoff ``k``.

    ``results``: (query, doc, rank) with rank 1-based; ``truth``: (query,
    doc) — the relevant set (e.g. exact brute-force top-k when grading an
    ANN approximation). Returns per query: ``n_rel``, ``hits`` (relevant
    retrieved ≤ k), ``recall``, ``mrr`` (1/rank of the first relevant, 0
    if none), ``ndcg`` (binary-gain DCG over the ideal DCG for
    min(n_rel, k) relevant). Log discounts use ln(rank+1)/ln(2) in both
    engines, so the doubles agree bit-for-bit with the SQL oracle after
    rounding.
    """
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(query_id_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    )
    tru = truth.select(
        F.col(query_id_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.lit(1).alias("_rel"),
    )
    n_rel = tru.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    joined = res.join(tru, ["_q", "_d"], "left").withColumn(
        "_rel", F.coalesce(F.col("_rel"), F.lit(0))
    )
    per_q = joined.groupBy("_q").agg(
        F.sum("_rel").alias("hits"),
        F.max(
            F.when(F.col("_rel") == 1, 1.0 / F.col("_r")).otherwise(0.0)
        ).alias("mrr"),
        F.sum(
            F.when(
                F.col("_rel") == 1,
                F.lit(1.0) / (F.log(F.col("_r") + 1.0) / F.log(F.lit(2.0))),
            ).otherwise(0.0)
        ).alias("dcg"),
    )
    # ideal DCG: the first min(n_rel, k) positions all relevant
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc
        + F.lit(1.0) / (F.log(i.cast("double") + 1.0) / F.log(F.lit(2.0))),
    )
    return (
        per_q.join(n_rel, "_q")
        .select(
            F.col("_q").alias(query_id_col),
            "n_rel",
            "hits",
            F.round(F.col("hits") / F.least(F.col("n_rel"), F.lit(k)), 6).alias(
                "recall"
            ),
            F.round(F.col("mrr"), 6).alias("mrr"),
            F.round(F.col("dcg") / idcg, 6).alias("ndcg"),
        )
    )
