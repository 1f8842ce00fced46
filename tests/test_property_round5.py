"""Property-based tests for the round-5 mergeable/direction operators:
skyline_2d vs brute-force dominance (plus the merge property) and
asof_join's three directions vs pandas merge_asof, on randomly generated
inputs. Example counts are kept small — every example runs a real Spark
job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from strava_vector_search_spark.operators.skyline import skyline_2d
from strava_vector_search_spark.operators.temporal import asof_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

points = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=20,
)


def _brute_skyline(pts):
    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )

    return sorted(p for p in pts if not dominated(p))


@settings(**_SETTINGS)
@given(pts=points)
def test_skyline_matches_dominance_definition(spark, pts):
    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id bigint, price double, size int")
    got = sorted(
        (r["price"], r["size"])
        for r in skyline_2d(df, "price", "size").collect()
    )
    exp = _brute_skyline([(float(p), s) for p, s in pts])
    # ties on both dims survive together: compare as multisets
    assert got == sorted(
        p for p in [(float(a), b) for a, b in pts] if p in set(exp)
    )


@settings(**_SETTINGS)
@given(pts=points, cut=st.integers(0, 19))
def test_skyline_merge_property(spark, pts, cut):
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) for ANY split —
    the algebra streaming/skyline_stream.py relies on."""
    cut = min(cut, len(pts))
    a, b = pts[:cut], pts[cut:]
    fa = _brute_skyline([(float(p), s) for p, s in a]) if a else []
    fb = _brute_skyline([(float(p), s) for p, s in b]) if b else []
    rows = [(i, p, s) for i, (p, s) in enumerate(fa + fb)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "id bigint, price double, size int")
    merged = sorted(
        (r["price"], r["size"])
        for r in skyline_2d(df, "price", "size").collect()
    )
    full = _brute_skyline([(float(p), s) for p, s in pts])
    assert sorted(set(merged)) == sorted(set(full))


left_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 60)),
    min_size=1,
    max_size=12,
)
# unique (key, ts) on the right so pandas' among-equal-ts tie rule (last
# input row wins) cannot diverge from our value-ordered determinism
right_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 60)),
    min_size=0,
    max_size=12,
    unique=True,
)


@settings(**_SETTINGS)
@given(
    lrows=left_rows,
    rrows=right_rows,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_directions_property(spark, lrows, rrows, direction):
    import pandas as pd
    from pyspark.sql import functions as F

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "id bigint, k string, ts bigint",
    ).select("id", "k", F.timestamp_micros(F.col("ts")).alias("ts"))
    rdf = spark.createDataFrame(
        [(k, t, float(t * 10)) for k, t in rrows] or [("_", -1, 0.0)],
        "k string, ts bigint, v double",
    ).select("k", F.timestamp_micros(F.col("ts")).alias("ts"), "v")
    got = {
        r["id"]: r["v_right"]
        for r in asof_join(
            ldf, rdf, ["k"], value_cols=["v"], direction=direction
        ).collect()
    }
    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        columns=["id", "k", "ts"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(k, t, float(t * 10)) for k, t in rrows] or [("_", -1, 0.0)],
        columns=["k", "ts", "v"],
    ).sort_values("ts", kind="stable")
    exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
    for i, v in zip(exp_df["id"], exp_df["v"]):
        import math

        if isinstance(v, float) and math.isnan(v):
            assert got[i] is None, (direction, i, got[i])
        else:
            assert got[i] == v, (direction, i, got[i], v)
