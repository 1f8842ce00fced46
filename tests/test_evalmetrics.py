"""rank_metrics: hand-computed recall/MRR/NDCG on a tiny fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.evalmetrics import rank_metrics


def test_rank_metrics_hand_computed(spark):
    # query 1: relevant docs {10, 20, 30}; results rank 1->10 (rel),
    # 2->99 (not), 3->20 (rel). recall@3-cutoff... k=5 here.
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 20, 3), (1, 98, 4), (1, 97, 5),
         (2, 50, 1), (2, 51, 2)],
        "query_id long, doc_id long, rank long",
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 77)],
        "query_id long, doc_id long",
    )
    out = {r["query_id"]: r for r in rank_metrics(results, truth, k=5).collect()}

    q1 = out[1]
    assert (q1["n_rel"], q1["hits"]) == (3, 2)
    assert q1["recall"] == round(2 / 3, 6)
    assert q1["mrr"] == 1.0  # first result relevant
    dcg = 1 / math.log2(2) + 1 / math.log2(4)          # ranks 1 and 3
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))  # 3 relevant, k=5
    assert q1["ndcg"] == round(dcg / idcg, 6)

    q2 = out[2]
    assert (q2["hits"], q2["mrr"], q2["ndcg"]) == (0, 0.0, 0.0)
    assert q2["recall"] == 0.0
