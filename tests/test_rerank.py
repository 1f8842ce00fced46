"""MMR rerank: lambda=1 degenerates to plain relevance order, lambda<1
diversifies, multi-query groups rerank independently."""

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.io.tables import load_table
from strava_vector_search_spark.operators.rerank import mmr_rerank
from strava_vector_search_spark.operators.search import brute_force_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _qv(emb, qid):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == qid).head()["embedding"]
    ]


def test_lambda_one_equals_relevance_order(spark, emb):
    qv = _qv(emb, 0)
    cand = brute_force_topk(
        emb, qv, k=20, id_col="vec_id", assume_normalized=True
    ).withColumn("query_id", F.lit(0))
    plain = [r["vec_id"] for r in cand.orderBy(
        F.desc("similarity"), F.asc("vec_id")).limit(10).collect()]
    mmr = [
        r["vec_id"]
        for r in mmr_rerank(cand, k=10, lam=1.0).orderBy("step").collect()
    ]
    assert mmr == plain


def test_diversification_changes_picks(spark, emb):
    qv = _qv(emb, 0)
    cand = brute_force_topk(
        emb, qv, k=20, id_col="vec_id", assume_normalized=True
    ).withColumn("query_id", F.lit(0))
    plain = [r["vec_id"] for r in cand.limit(10).collect()]
    div = [
        r["vec_id"]
        for r in mmr_rerank(cand, k=10, lam=0.5).orderBy("step").collect()
    ]
    assert div[0] == plain[0]  # first pick is always the top-1
    assert set(div) != set(plain)  # near-dups of the query get displaced


def test_multi_query_groups_independent(spark, emb):
    frames = []
    for qid in (0, 5):
        c = brute_force_topk(
            emb, _qv(emb, qid), k=15, id_col="vec_id", assume_normalized=True
        ).withColumn("query_id", F.lit(qid))
        frames.append(c)
    both = frames[0].unionByName(frames[1])
    out = mmr_rerank(both, k=5, lam=0.5)
    rows = out.collect()
    assert len(rows) == 10
    per_q = {qid: [r for r in rows if r["query_id"] == qid] for qid in (0, 5)}
    for qid in (0, 5):
        single = mmr_rerank(
            frames[qid // 5 if qid else 0], k=5, lam=0.5
        )
        exp = {
            (r["step"], r["vec_id"])
            for r in single.collect()
        }
        got = {(r["step"], r["vec_id"]) for r in per_q[qid]}
        assert got == exp
