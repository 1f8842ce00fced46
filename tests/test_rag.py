from __future__ import annotations

import pytest

from strava_vector_search_spark.rag import recommend_harder, search_and_modify
from strava_vector_search_spark.service import SearchService


@pytest.fixture(scope="module")
def svc(spark):
    docs = spark.createDataFrame(
        [
            (1, "easy recovery run gentle pace", "easy"),
            (2, "interval run hard speed repeats", "hard"),
            (3, "tempo run sustained threshold effort", "moderate"),
            (4, "hill sprints maximal power climbing", "very hard"),
        ],
        "doc_id int, text string, difficulty string",
    )
    return SearchService(
        spark, docs, id_col="doc_id", search_col="text",
        attributes=("difficulty",), dim=32,
    ).build()


def _recording_complete(calls):
    def fn(model, prompt):
        calls.append((model, prompt))
        return f"done:{model}"
    return fn


def test_search_and_modify(svc):
    calls = []
    out = search_and_modify(
        svc,
        "easy recovery run gentle pace",
        "make it 10 minutes longer",
        complete=_recording_complete(calls),
        model="m1",
    )
    assert out["base_id"] == 1
    assert out["completion"] == "done:m1"
    assert "make it 10 minutes longer" in calls[0][1]
    assert "easy recovery run" in calls[0][1]


def test_recommend_harder_excludes_base(svc):
    out = recommend_harder(svc, "interval run hard speed repeats", k=2)
    assert out["base_id"] == 2
    assert 2 not in out["candidate_ids"]
    assert len(out["candidate_ids"]) == 2


def test_empty_result_guard(spark):
    # empty corpus: the nb:491-493 guard must fire and the LLM must NOT be called
    docs = spark.createDataFrame([(1, "x y z")], "doc_id int, text string").filter(
        "doc_id < 0"
    )
    svc = SearchService(spark, docs, id_col="doc_id", search_col="text", dim=8).build()

    def must_not_call(model, prompt):
        raise AssertionError("LLM called despite empty search result")

    out = search_and_modify(svc, "q", "mod", complete=must_not_call)
    assert "error" in out
    out2 = recommend_harder(svc, "anything", complete=must_not_call)
    assert "error" in out2
