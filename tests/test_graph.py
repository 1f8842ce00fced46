"""Fixed-point PageRank: exact parity with a pure-Python replay, plus the
structural properties (damping floor, mass ordering, determinism)."""

from __future__ import annotations

from strava_vector_search_spark.operators.graph import (
    SCALE,
    pagerank_fixedpoint,
    top_ranked,
)

EDGES = [
    # a tiny web: hub "a" pointed at by everyone, chain b->c->a, d isolated-ish
    ("b", "a"),
    ("c", "a"),
    ("d", "a"),
    ("a", "b"),
    ("b", "c"),
    ("c", "d"),
]


def _python_pagerank(edges, iterations=5, damping_pct=85, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    base = (100 - damping_pct) * scale // 100
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        r = {n: base + (damping_pct * inflow[n]) // 100 for n in nodes}
    return r


def test_matches_python_replay_exactly(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        row["node"]: row["rank_fp"]
        for row in pagerank_fixedpoint(df, iterations=5).collect()
    }
    assert got == _python_pagerank(EDGES)


def test_hub_ranks_highest_and_floor_holds(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = top_ranked(pagerank_fixedpoint(df, iterations=5), k=10).collect()
    assert rows[0]["node"] == "a"  # three in-links -> the authority
    # every node keeps at least the undamped base mass
    assert all(r["rank"] >= 0.15 for r in rows)
    # ranks are the exact fixed-point value / scale
    got = {
        row["node"]: row["rank_fp"]
        for row in pagerank_fixedpoint(df, iterations=5).collect()
    }
    for r in rows:
        assert r["rank"] == round(got[r["node"]] / SCALE, 6)


def test_multi_edges_weight_inflow(spark):
    # two parallel b->a edges double b's contribution to a vs a single one
    single = spark.createDataFrame(
        [("b", "a"), ("a", "b")], "src string, dst string"
    )
    double = spark.createDataFrame(
        [("b", "a"), ("b", "a"), ("a", "b")], "src string, dst string"
    )
    one = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixedpoint(single, iterations=1).collect()
    }
    # with the duplicated edge, b's outdeg is 2 and a receives both halves:
    # identical total inflow — the python replay pins the exact semantics
    two = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixedpoint(double, iterations=1).collect()
    }
    assert two == _python_pagerank(
        [("b", "a"), ("b", "a"), ("a", "b")], iterations=1
    )
    assert one == _python_pagerank([("b", "a"), ("a", "b")], iterations=1)


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(
        map(tuple, pagerank_fixedpoint(df, iterations=3).collect())
    )
    b = sorted(
        map(
            tuple,
            pagerank_fixedpoint(df.repartition(7), iterations=3).collect(),
        )
    )
    assert a == b


def test_property_random_graphs_match_replay(spark):
    """Hypothesis: on random multigraphs the distributed fixed-point
    iteration equals the pure-Python replay exactly (the bit-equality the
    integer arithmetic promises)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    nodes = list("abcdefgh")
    edge = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes))

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(st.lists(edge, min_size=1, max_size=12))
    def check(edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixedpoint(df, iterations=2).collect()
        }
        assert got == _python_pagerank(edges, iterations=2)

    check()


def test_neighborhood_jaccard_exact_small(spark):
    from strava_vector_search_spark.operators.graph import (
        neighborhood_jaccard_pairs,
    )

    # customers c1..c3; items A,B share 2 of 3 customers; C disjoint-ish
    edges = [
        ("c1", "A"), ("c1", "B"),
        ("c2", "A"), ("c2", "B"),
        ("c3", "A"), ("c3", "C"),
        ("c1", "A"),  # duplicate edge must not inflate counts
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["i1"], r["i2"]): r
        for r in neighborhood_jaccard_pairs(df, max_src_degree=None).collect()
    }
    ab = got[("A", "B")]
    assert (ab["inter"], ab["n1"], ab["n2"]) == (2, 3, 2)
    assert ab["jaccard"] == round(2 / 3, 6)
    ac = got[("A", "C")]
    assert (ac["inter"], ac["jaccard"]) == (1, round(1 / 3, 6))
    assert ("B", "C") not in got  # no shared customer -> no candidate


def test_max_degree_guard_drops_pairs_keeps_denominators(spark):
    from strava_vector_search_spark.operators.graph import (
        neighborhood_jaccard_pairs,
    )

    edges = [("hub", d) for d in ("A", "B", "C")] + [
        ("c1", "A"), ("c1", "B"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    guarded = {
        (r["i1"], r["i2"]): r
        for r in neighborhood_jaccard_pairs(df, max_src_degree=2).collect()
    }
    # hub (degree 3) is excluded from pairing: only c1's A-B pair remains
    assert set(guarded) == {("A", "B")}
    # but hub still counts toward the neighbor-set sizes
    assert (guarded[("A", "B")]["n1"], guarded[("A", "B")]["n2"]) == (2, 2)
    assert guarded[("A", "B")]["inter"] == 1


def test_pagerank_refuses_no_edges_and_no_prepared():
    # edges=None is only legal with prepared= (ADVICE r12): without the
    # guard this crashed inside prepare_pagerank_graph with an
    # AttributeError on None.select
    import pytest

    with pytest.raises(ValueError, match="prepared"):
        pagerank_fixedpoint(None, iterations=1)
