from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.embed import hash_embedding_table
from strava_vector_search_spark.service import (
    SearchService,
    build_request,
    describe_service,
    drop_service,
    register_service,
    show_services,
)
from strava_vector_search_spark.streaming.refresh import default_embedder, embed_missing


@pytest.fixture()
def svc(spark):
    docs = spark.createDataFrame(
        [(1, "alpha run"), (2, "beta ride")], "doc_id int, text string"
    )
    return SearchService(spark, docs, id_col="doc_id", search_col="text", dim=8)


def test_show_and_describe_services(svc):
    register_service("workouts", svc.build())
    try:
        names = [s["name"] for s in show_services()]
        assert "workouts" in names
        d = describe_service("workouts")
        assert d["built"] is True
        assert d["indexed_rows"] == 2
        assert d["search_col"] == "text"
    finally:
        assert drop_service("workouts") is True
    assert drop_service("workouts") is False
    assert "workouts" not in [s["name"] for s in show_services()]


def test_build_request_roundtrips_through_service(svc):
    req = build_request(
        "alpha run", columns=["text"], filter_dsl={"@eq": {"doc_id": 1}}, limit=1
    )
    parsed = json.loads(req)  # valid JSON, no manual escaping needed
    assert parsed["filter"] == {"@eq": {"doc_id": 1}}
    out = svc.build().search(req).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_embed_missing_is_update_equivalent(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "e f")], "doc_id long, text string"
    )
    embed = default_embedder("doc_id", "text", dim=8)
    existing = embed(docs.filter(F.col("doc_id") == 1))
    missing = embed_missing(docs, existing, embed, "doc_id")
    assert sorted(r["doc_id"] for r in missing.collect()) == [2, 3]
    # union = the fully-embedded table (the post-UPDATE state)
    full = existing.unionByName(missing)
    assert full.count() == 3


def test_result_cache_ttl_lru(spark, svc):
    from strava_vector_search_spark.service import ResultCache, cached_search, warm

    warm(svc.build())
    now = [0.0]
    cache = ResultCache(max_entries=2, ttl_seconds=10.0, clock=lambda: now[0])
    req = {"query": "alpha run", "limit": 1}

    first = cached_search(svc, req, cache)
    again = cached_search(svc, req, cache)
    assert cache.misses == 1 and cache.hits == 1
    assert first == again

    # key canonicalization: dict order / json string form hit the same entry
    assert cached_search(svc, '{"limit": 1, "query": "alpha run"}', cache) == first
    assert cache.hits == 2

    # TTL expiry forces recompute
    now[0] = 11.0
    cached_search(svc, req, cache)
    assert cache.misses == 2

    # LRU eviction at capacity
    cached_search(svc, {"query": "beta ride", "limit": 1}, cache)
    cached_search(svc, {"query": "alpha", "limit": 2}, cache)
    assert len(cache._data) == 2
