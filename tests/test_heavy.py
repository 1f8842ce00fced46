"""Two-pass Misra–Gries heavy hitters (operators/heavy.py).

Pins (a) exact equality with the naive groupBy + HAVING on adversarially
skewed data, (b) the pass-1 candidate superset guarantee at the minimum
legal capacity, (c) strict-threshold boundary semantics, and (d) the
input hygiene rules (nulls dropped, non-string items cast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.heavy import (
    _mg_merge,
    heavy_hitter_candidates,
    heavy_hitters_exact,
)


def _skewed(spark, n_heavy=3, heavy_cnt=400, n_tail=2000):
    """3 heavy items at 400 occurrences + a 2000-item singleton tail
    (N = 3200): heavy iff cnt*k > N."""
    heavy = [(f"hot{i}",) for i in range(n_heavy) for _ in range(heavy_cnt)]
    tail = [(f"tail{i}",) for i in range(n_tail)]
    return spark.createDataFrame(heavy + tail, "item string").repartition(8)


def _naive(df, k):
    n = df.count()
    return {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
        .collect()
    }


def test_exact_match_vs_naive_on_skewed_data(spark):
    df = _skewed(spark)
    k = 10  # threshold N/k = 320 < 400: the 3 hot items qualify
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters_exact(df, "item", k=k).collect()
    }
    assert got == _naive(df, k)
    assert len(got) == 3
    assert all(c == 400 for _, c in got)


def test_candidate_superset_at_minimum_capacity(spark):
    # capacity == k exactly (the weakest legal sketch) must still surface
    # every above-threshold item from pass 1
    df = _skewed(spark)
    k = 10
    cands = {
        r["item"] for r in heavy_hitter_candidates(df, "item", capacity=k).collect()
    }
    assert {"hot0", "hot1", "hot2"} <= cands
    got = {r["item"] for r in heavy_hitters_exact(df, "item", k=k, capacity=k).collect()}
    assert got == {"hot0", "hot1", "hot2"}


def test_strict_threshold_boundary(spark):
    # 4 items x 25 occurrences: N=100, k=4 -> threshold cnt*4 > 100 means
    # cnt > 25, so an item AT exactly N/k must NOT qualify
    rows = [(f"x{i}",) for i in range(4) for _ in range(25)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    assert heavy_hitters_exact(df, "item", k=4).count() == 0
    # one extra occurrence tips x0 over
    df2 = df.unionByName(spark.createDataFrame([("x0",)], "item string"))
    got = heavy_hitters_exact(df2, "item", k=4).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("x0", 26)]


def test_nulls_dropped_and_ints_cast(spark):
    rows = [(7,)] * 30 + [(None,)] * 30 + [(i + 100,) for i in range(30)]
    df = spark.createDataFrame(rows, "item int")
    # N counts only non-null rows (60); k=3 -> cnt > 20: only item "7"
    got = heavy_hitters_exact(df, "item", k=3).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("7", 30)]


def test_capacity_below_k_rejected(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "item", k=10, capacity=5)


def test_mg_merge_capacity_bound_and_decrement():
    import pandas as pd

    counts: dict = {}
    counts = _mg_merge(counts, pd.Series({"a": 10, "b": 6, "c": 1, "d": 1}), 2)
    # cut = 3rd largest (1): a->9, b->5, c/d dropped
    assert counts == {"a": 9, "b": 5}
    # table within capacity: merge is plain addition, no decrement
    counts = _mg_merge(counts, pd.Series({"a": 1}), 2)
    assert counts == {"a": 10, "b": 5}


# -- property test: the pure-Python MG merge kernel ---------------------------
# (driver-side hypothesis over _mg_merge — no Spark in the loop, so the
# property can run hundreds of random streams cheaply; the distributed
# plumbing over the same kernel is pinned by the tests above)

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    capacity=st.integers(min_value=2, max_value=12),
    batch=st.integers(min_value=1, max_value=50),
)
def test_mg_merge_superset_and_deficiency_properties(stream, capacity, batch):
    counts: dict = {}
    for i in range(0, len(stream), batch):
        chunk = pd.Series(Counter(stream[i : i + batch]))
        counts = _mg_merge(counts, chunk, capacity)
    true = Counter(stream)
    n = len(stream)
    # capacity bound always holds
    assert len(counts) <= capacity
    for item, c in counts.items():
        # counts are deficient: never overcount, total decrement bounded
        assert c <= true[item]
        assert true[item] - c <= n // (capacity + 1)
    # the core guarantee: anything above n/(capacity+1) survives
    for item, tc in true.items():
        if tc > n / (capacity + 1):
            assert item in counts
