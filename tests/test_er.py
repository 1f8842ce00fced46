"""Entity resolution: blocking wall, star-edge correctness (same-name
records merge without a clique), fuzzy transitivity, survivorship."""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.er import er_resolve, golden_records


def _resolve(spark, rows, max_dist=2):
    df = spark.createDataFrame(
        rows, "rec_id long, block string, name string, quality double"
    )
    return er_resolve(df, "rec_id", "block", "name", max_dist=max_dist)


def test_er_same_name_records_merge_via_star_edges(spark):
    out = _resolve(
        spark,
        [
            (1, "b1", "acme corp", 1.0),
            (2, "b1", "acme corp", 2.0),
            (3, "b1", "acme corp", 3.0),
        ],
    )
    comps = {r["rec_id"]: r["comp"] for r in out.collect()}
    assert comps == {1: 1, 2: 1, 3: 1}


def test_er_blocking_is_a_hard_wall(spark):
    # identical names in different blocks never merge
    out = _resolve(
        spark, [(1, "b1", "acme corp", 1.0), (2, "b2", "acme corp", 1.0)]
    )
    comps = {r["rec_id"]: r["comp"] for r in out.collect()}
    assert comps == {1: 1, 2: 2}


def test_er_fuzzy_chain_transitivity_and_threshold(spark):
    # acme corp ~ acme korp (1) ~ acmee korp (1); zzz is unrelated
    out = _resolve(
        spark,
        [
            (1, "b1", "acme corp", 1.0),
            (2, "b1", "acme korp", 1.0),
            (3, "b1", "acmee korp", 1.0),
            (4, "b1", "zzz totally different", 1.0),
        ],
        max_dist=1,
    )
    comps = {r["rec_id"]: r["comp"] for r in out.collect()}
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[4] == 4


def test_er_golden_record_survivorship(spark):
    resolved = _resolve(
        spark,
        [
            (1, "b1", "acme corp", 5.0),
            (2, "b1", "acme corp", 9.0),
            (3, "b1", "other name", 1.0),
        ],
    )
    qkey = F.round(F.col("quality") * 100).cast("bigint") * 1000 - F.col("rec_id")
    g = {
        r["comp"]: (r["keep_id"], r["n_members"])
        for r in golden_records(resolved, "rec_id", qkey).collect()
    }
    assert g[1] == (2, 2)   # highest quality wins, not lowest id
    assert g[3] == (3, 1)
