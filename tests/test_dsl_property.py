"""Property-based test: the filter-DSL compiler agrees with a direct Python
evaluator on randomly generated nested filters over a fixed corpus."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from strava_vector_search_spark.service import compile_filter

ROWS = [
    {"doc_id": i, "lang": lang, "n_chars": n}
    for i, (lang, n) in enumerate(
        (lang, n)
        for lang in ("en", "de", "fr", "es")
        for n in (50, 150, 300, 450)
    )
]

LANGS = ["en", "de", "fr", "es", "zz"]
NUMS = [0, 50, 150, 300, 450, 500]


def leaf() -> st.SearchStrategy:
    str_leaf = st.sampled_from(["@eq", "@ne"]).flatmap(
        lambda op: st.sampled_from(LANGS).map(lambda v: {op: {"lang": v}})
    )
    num_leaf = st.sampled_from(["@eq", "@gte", "@lte", "@gt", "@lt"]).flatmap(
        lambda op: st.sampled_from(NUMS).map(lambda v: {op: {"n_chars": v}})
    )
    in_leaf = st.lists(st.sampled_from(LANGS), min_size=1, max_size=3).map(
        lambda vs: {"@in": {"lang": vs}}
    )
    return st.one_of(str_leaf, num_leaf, in_leaf)


def node() -> st.SearchStrategy:
    return st.recursive(
        leaf(),
        lambda inner: st.one_of(
            st.lists(inner, min_size=1, max_size=3).map(lambda ns: {"@and": ns}),
            st.lists(inner, min_size=1, max_size=3).map(lambda ns: {"@or": ns}),
            inner.map(lambda n: {"@not": n}),
        ),
        max_leaves=6,
    )


def py_eval(n: dict, row: dict) -> bool:
    op, body = next(iter(n.items()))
    if op == "@and":
        return all(py_eval(c, row) for c in body)
    if op == "@or":
        return any(py_eval(c, row) for c in body)
    if op == "@not":
        return not py_eval(body, row)
    attr, v = next(iter(body.items()))
    x = row[attr]
    return {
        "@eq": lambda: x == v,
        "@ne": lambda: x != v,
        "@gte": lambda: x >= v,
        "@lte": lambda: x <= v,
        "@gt": lambda: x > v,
        "@lt": lambda: x < v,
        "@in": lambda: x in v,
    }[op]()


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS).cache()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filt=node())
def test_dsl_compiler_matches_python_semantics(corpus, filt):
    spark_ids = {r["doc_id"] for r in corpus.filter(compile_filter(filt)).collect()}
    py_ids = {row["doc_id"] for row in ROWS if py_eval(filt, row)}
    assert spark_ids == py_ids
