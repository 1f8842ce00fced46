"""End-to-end parity with the reference's own workflow: every inline
verification query and demo query from the reference scripts, run on a
synthetic workout corpus through this engine's pipeline.

Reference trace:
* CSV ingest               01_method1_cortex_search.sql:111-142
* distribution report      01:145-153
* row count                01:155
* batch embed (UPDATE)     02_method2_manual_vector_embedding.sql:170-172
* embed presence/pct       02:175-190, 02:354-359
* Q1 filtered top-k        02:206-227
* IN-list variant          02:296-299
* threshold + cache CASE   02:301-317
* top-3 CTE join-back      02:324-348
* similarity histogram     02:373-389
* service + filter DSL     01:200-219, notebook Q1-Q3
* RAG modify/recommend     notebook Q4 (nb:338-445), Q5 (nb:453-640)
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import hash_embed_text, hash_embedding_table
from strava_vector_search_spark.io.csv_ingest import read_csv_typed, valid_rows
from strava_vector_search_spark.operators import search as S
from strava_vector_search_spark.rag import recommend_harder, search_and_modify
from strava_vector_search_spark.schema import WORKOUTS_SCHEMA
from strava_vector_search_spark.service import SearchService

DIM = 32
SPORTS = ["run"] * 10 + ["ride"] * 5 + ["swim"] * 2 + ["hike", "yoga", "workout"]
DIFFS = ["easy", "moderate", "hard", "very hard", "very_hard"]


def _corpus_csv() -> str:
    """Deterministic synthetic corpus in the reference CSV shape
    (FIXTURES.md): multiline quoted embed_str, '' for null ints, the
    very hard/very_hard spelling wrinkle, one malformed numeric cell."""
    rng = random.Random(42)
    verbs = "intervals tempo recovery endurance sprints drills hills fartlek".split()
    zones = "<PACE_ZONE_2_LOW> <PACE_ZONE_4_HIGH> <POWER_ZONE_3_MID>".split()
    rows = [
        "id,embed_str,sport_type,difficulty,moving_time_seconds,distance_meters,"
        "generation_model,workout_source,store_version,raw_json_str,created_at"
    ]
    for i in range(60):
        sport = SPORTS[i % len(SPORTS)]
        diff = DIFFS[i % len(DIFFS)]
        body = (
            f"{sport} {verbs[i % len(verbs)]} workout {i}\n"
            f"## Warm-up\n10 min easy, {zones[i % 3]}\n"
            f"## Main Set\n{verbs[(i + 3) % len(verbs)]} x {2 + i % 5}\n"
            f"**Tips:** stay smooth"
        )
        body = body.replace('"', '""')
        dist = "" if i % 9 == 0 else str(1000 + 500 * (i % 12))
        secs = "not_a_number" if i == 7 else str(900 + 60 * (i % 40))
        js = f'{{""workout_title"": ""W{i}"", ""workout_difficulty"": ""{diff}""}}'
        rows.append(
            f'SLAM_{i:04x},"{body}",{sport},{diff},{secs},{dist},'
            f'bedrock-sonnet4.0,slam,v1,"{js}",2025-10-{1 + i % 28:02d} 05:00:00.000'
        )
    return "\n".join(rows) + "\n"


@pytest.fixture(scope="module")
def workouts(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "workouts.csv"
    p.write_text(_corpus_csv())
    return valid_rows(read_csv_typed(spark, str(p), WORKOUTS_SCHEMA)).cache()


@pytest.fixture(scope="module")
def with_vectors(spark, workouts):
    emb = hash_embedding_table(workouts, "id", "embed_str", DIM)
    return workouts.join(emb, "id").cache()


@pytest.fixture(scope="module")
def svc(spark, workouts):
    return SearchService(
        spark,
        workouts,
        id_col="id",
        search_col="embed_str",
        attributes=("sport_type", "difficulty", "distance_meters"),
        columns=("sport_type", "difficulty", "embed_str"),
        dim=DIM,
    ).build()


def test_load_completeness(workouts):
    # 01:155 row count; the malformed numeric cell nulls, the row survives
    assert workouts.count() == 60
    bad = workouts.filter(F.col("id") == "SLAM_0007").head()
    assert bad["moving_time_seconds"] is None


def test_distribution_report(workouts):
    # 01:145-153: GROUP BY sport, difficulty with COUNT/AVG/ROUND
    rep = (
        workouts.groupBy("sport_type", "difficulty")
        .agg(
            F.count(F.lit(1)).alias("workout_count"),
            F.round(F.avg("distance_meters"), 0).alias("avg_distance_m"),
            F.round(F.avg(F.col("moving_time_seconds") / 60.0), 0).alias("avg_duration_min"),
        )
        .orderBy("sport_type", "difficulty")
        .collect()
    )
    assert sum(r["workout_count"] for r in rep) == 60
    assert {r["sport_type"] for r in rep} == set(SPORTS)


def test_pct_embedded_is_100(with_vectors):
    # 02:186-190 / 02:354-359: every non-null embed_str got an embedding
    r = with_vectors.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("embedding").alias("embedded"),
        F.round(100.0 * F.count("embedding") / F.count(F.lit(1)), 1).alias("pct"),
    ).head()
    assert r["pct"] == 100.0


def test_q1_filtered_topk_with_crossjoin_cte(spark, with_vectors):
    # 02:206-227 verbatim shape: 1-row query_embedding CTE CROSS JOIN corpus,
    # metadata filters BEFORE similarity, top-5 by score
    qv = hash_embed_text(spark, "run intervals workout speed", DIM)
    query_embedding = spark.createDataFrame(
        [(qv,)], "query_vec array<float>"
    )
    out = (
        with_vectors.crossJoin(F.broadcast(query_embedding))
        .filter(
            (F.col("sport_type") == "run")
            & F.col("distance_meters").between(1000, 6000)
            & F.col("embedding").isNotNull()
        )
        .withColumn(
            "similarity_score",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        F.col("query_vec").cast("array<double>"),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ),
        )
        .orderBy(F.desc("similarity_score"), F.asc("id"))
        .limit(5)
        .collect()
    )
    assert len(out) == 5
    assert all(r["sport_type"] == "run" for r in out)
    sims = [r["similarity_score"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_q_in_list_predicate(spark, with_vectors):
    # 02:296-299: SPORT_TYPE IN ('run','trail_run')
    qv = hash_embed_text(spark, "trail running hills", DIM)
    out = S.brute_force_topk(
        with_vectors,
        qv,
        k=5,
        id_col="id",
        predicate=F.col("sport_type").isin("run", "trail_run"),
        assume_normalized=True,
    ).collect()
    assert 0 < len(out) <= 5
    assert all(r["sport_type"] == "run" for r in out)


def test_threshold_and_cache_decision(spark, with_vectors):
    # 02:301-317: WHERE similarity > 0.70 + CASE labels at 0.80/0.70
    qv = hash_embed_text(spark, "swim drills technique", DIM)
    scored = S.brute_force_topk(
        with_vectors, qv, k=10, id_col="id", assume_normalized=True
    )
    labeled = S.with_cache_decision(scored).filter(F.col("similarity") > 0.70)
    for r in labeled.collect():
        assert r["cache_decision"].startswith("CACHE HIT")


def test_top3_cte_join_back_for_raw_json(spark, workouts, with_vectors):
    # 02:324-348: top-3 in a CTE, join back on id to fetch RAW_JSON_STR
    qv = hash_embed_text(spark, "ride endurance tempo", DIM)
    top3 = S.brute_force_topk(
        with_vectors.select("id", "embedding"), qv, k=3, id_col="id",
        assume_normalized=True,
    )
    joined = S.topk_join_back(workouts, top3, id_col="id", payload_cols=["raw_json_str"])
    rows = joined.collect()
    assert len(rows) == 3
    assert all(r["raw_json_str"].startswith('{"workout_title"') for r in rows)


def test_similarity_histogram_covers_corpus(spark, with_vectors):
    # 02:373-389
    qv = hash_embed_text(spark, "hard hill intervals", DIM)
    hist = S.similarity_histogram(with_vectors, qv, assume_normalized=True).collect()
    assert sum(r["n_docs"] for r in hist) == 60


def test_service_q2_range_filter(svc):
    # notebook Q2 (nb:219-224): @and of @eq + @gte + @lte
    out = svc.search(
        {
            "query": "run intervals",
            "filter": {
                "@and": [
                    {"@eq": {"sport_type": "run"}},
                    {"@gte": {"distance_meters": 1000}},
                    {"@lte": {"distance_meters": 6000}},
                ]
            },
            "limit": 5,
        }
    ).collect()
    assert 0 < len(out) <= 5
    assert all(r["sport_type"] == "run" for r in out)


def test_service_q3_or_spelling_wrinkle(svc):
    # notebook Q3 (nb:285-299, nb:513-515): OR over both 'very hard' spellings
    out = svc.search(
        {
            "query": "hard ride",
            "filter": {
                "@or": [
                    {"@eq": {"difficulty": "very hard"}},
                    {"@eq": {"difficulty": "very_hard"}},
                ]
            },
            "limit": 10,
        }
    ).collect()
    assert len(out) > 0
    assert {r["difficulty"] for r in out} <= {"very hard", "very_hard"}


def test_rag_q4_q5(svc):
    # notebook Q4/Q5 flows with the deterministic LLM stub
    out4 = search_and_modify(svc, "run intervals workout", "make it easier",
                             text_col="embed_str")
    assert "completion" in out4
    out5 = recommend_harder(svc, "run intervals workout", k=2, text_col="embed_str")
    assert "completion" in out5 and len(out5["candidate_ids"]) == 2
