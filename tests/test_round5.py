"""Round-5 operator invariants: PAV isotonic fit, incremental join-view
maintenance, the distributed sweep line, KM survival sanity, phrase index,
and the KN probability axioms — each pinned against an independent
formulation (pure-Python replay or a naive single-level plan), not just
the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from strava_vector_search_spark.queries import QUERIES


def _pav(values: list[float], weights: list[float]) -> list[float]:
    """Textbook pool-adjacent-violators: merge adjacent level sets while
    any decrease remains; the independent replay for the minimax form."""
    blocks = [[v * w, w] for v, w in zip(values, weights)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1] + 1e-15:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand block means back onto the original points
    fitted = []
    bi, consumed = 0, 0.0
    for w in weights:
        s, bw = blocks[bi]
        fitted.append(s / bw)
        consumed += w
        if consumed >= bw - 1e-9:
            bi += 1
            consumed = 0.0
    return fitted


def test_isotonic_matches_pool_adjacent_violators(spark, sf_dir):
    rows = (
        QUERIES["ml_isotonic_calibration"](spark, sf_dir)
        .orderBy("bin")
        .collect()
    )
    assert len(rows) >= 3
    rates = [r["pos_rate"] for r in rows]
    weights = [float(r["n"]) for r in rows]
    expected = _pav(rates, weights)
    for r, e in zip(rows, expected):
        assert abs(r["iso_rate"] - e) < 5e-6, (r, e)
    # monotone non-decreasing by construction
    iso = [r["iso_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))


def test_ivm_delta_equals_recompute_any_split(spark, sf_dir):
    """The gate splits on %10==7; the monoid merge must agree with the
    from-scratch view under a DIFFERENT split too (order-insensitivity
    of the state algebra, not an artifact of one partition)."""
    from strava_vector_search_spark.io.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def state(o):
        return (
            o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
            .join(
                F.broadcast(nation),
                cust["c_nationkey"] == nation["n_nationkey"],
            )
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias(
                    "rev"
                ),
            )
        )

    full = {
        r["n_name"]: (r["cnt"], r["rev"]) for r in state(orders).collect()
    }
    a = state(orders.filter(F.expr("o_orderkey % 3 = 0"))).collect()
    b = state(orders.filter(F.expr("o_orderkey % 3 <> 0"))).collect()
    merged: dict = {}
    for part in (a, b):
        for r in part:
            c0, s0 = merged.get(r["n_name"], (0, 0))
            merged[r["n_name"]] = (c0 + r["cnt"], s0 + r["rev"])
    assert merged == full


def test_max_concurrency_matches_single_level_sweep(spark, sf_dir):
    """Two-level (day-partitioned + carry) == the naive single global
    window — the lift must be value-invisible."""
    from strava_vector_search_spark.io.tables import load_events

    got = {
        r["day"]: r["max_concurrency"]
        for r in QUERIES["ev_max_concurrency"](spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    b = (
        ev.select(us.alias("t"), F.lit(1).alias("delta"))
        .unionAll(
            ev.select((us + 1800000000).alias("t"), F.lit(-1).alias("delta"))
        )
        .coalesce(1)
    )
    w = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        b.withColumn("run", F.sum("delta").over(w))
        .withColumn("day", F.expr("t DIV 86400000000"))
        .groupBy("day")
        .agg(F.max("run").alias("mx"))
    )
    expect = {r["day"]: r["mx"] for r in naive.collect()}
    assert got == expect


def test_kaplan_meier_axioms(spark, sf_dir):
    rows = QUERIES["ev_kaplan_meier"](spark, sf_dir).orderBy("t").collect()
    assert rows, "no survival rows"
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-12 for a, b in zip(surv, surv[1:])), (
        "survival must be non-increasing"
    )
    # at-risk counts strictly decrease as durations pass
    risks = [r["n_risk"] for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    # leavers account for everyone: sum(d + c) == initial risk set
    assert sum(r["d"] + r["c"] for r in rows) == risks[0]


def test_phrase_search_matches_python_scan(spark, sf_dir):
    from strava_vector_search_spark.io.tables import load_table
    import re

    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in QUERIES["idx_phrase_search"](spark, sf_dir).collect()
    }
    expect = {}
    for r in load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect():
        toks = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        hits = [
            i
            for i in range(len(toks) - 1)
            if toks[i] == "fast" and toks[i + 1] == "hash"
        ]
        if hits:
            expect[r["doc_id"]] = (len(hits), hits[0])
    assert got == expect


def test_kneser_ney_probability_axioms(spark, sf_dir):
    rows = QUERIES["tx_kneser_ney"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["pkn"] <= 1.0
        # discounted MLE part alone is a lower bound
        assert r["pkn"] >= max(r["c12"] - 0.75, 0) / r["c1"] - 1e-9
        assert r["c1"] >= r["c12"]
        assert r["n_follow"] >= 1 and r["n_precede"] >= 1


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = QUERIES["dq_benford"](spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4
    assert len({r["chi2_total"] for r in rows}) == 1


def test_pareto_abc_partitions_everything(spark, sf_dir):
    from strava_vector_search_spark.io.tables import load_table

    rows = QUERIES["w_pareto_abc"](spark, sf_dir).collect()
    classes = {r["abc"]: r for r in rows}
    assert set(classes) == {"A", "B", "C"}
    n_parts = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey"
    ).distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    # A-class revenue concentration dominates its part share
    share_parts_a = classes["A"]["n_parts"] / n_parts
    assert classes["A"]["revenue_share"] > share_parts_a


def test_triangle_count_matches_python_enumeration(spark, sf_dir):
    from strava_vector_search_spark.io.tables import load_table
    from collections import defaultdict
    import itertools

    row = QUERIES["g_triangle_count"](spark, sf_dir).head()
    # replay: per-order part pairs, weight >= 2, then brute triangles
    pairs = defaultdict(int)
    orders = defaultdict(set)
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        orders[r["l_orderkey"]].add(r["l_partkey"])
    for parts in orders.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            pairs[(u, v)] += 1
    edges = {e for e, w in pairs.items() if w >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj[u] & adj[v]
        if v < w
    )
    nodes = {x for e in edges for x in e}
    wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    assert row["n_triangles"] == tri
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == wedges


def test_countmin_never_undercounts(spark, sf_dir):
    rows = QUERIES["a20_countmin_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["exact_cnt"]
        assert r["overcount"] == r["cms_estimate"] - r["exact_cnt"]


def test_psi_terms_nonnegative_and_sum(spark, sf_dir):
    rows = QUERIES["ev_psi_drift"](spark, sf_dir).collect()
    assert len(rows) == 20
    # (q-p)*ln(q/p) >= 0 term by term (same sign); total = sum of terms
    for r in rows:
        assert r["psi_contrib"] >= -1e-9
    assert len({r["psi_total"] for r in rows}) == 1
    total = rows[0]["psi_total"]
    assert abs(total - sum(r["psi_contrib"] for r in rows)) < 1e-4


def test_ridge_path_shrinks_and_degrades(spark, sf_dir):
    rows = QUERIES["ml_ridge_path"](spark, sf_dir).orderBy("lam").collect()
    assert [r["lam"] for r in rows] == [0.01, 0.1, 1.0]
    norms = [r["b1"] ** 2 + r["b2"] ** 2 for r in rows]
    assert norms[0] >= norms[1] >= norms[2], "penalty must shrink slopes"
    mses = [r["train_mse"] for r in rows]
    assert mses[0] <= mses[1] + 1e-9 <= mses[2] + 2e-9, (
        "train MSE is monotone in the penalty"
    )


def test_exp_smoothing_matches_recursion(spark, sf_dir):
    """The closed-form power-of-two weighted fold must equal the SES
    recursion L_t = a*y_t + (1-a)*L_{t-1} replayed in Python."""
    from strava_vector_search_spark.io.tables import load_events

    got = {
        r["event_type"]: (r["n_hours"], r["last_obs"], r["ses_level"])
        for r in QUERIES["ev_exp_smoothing"](spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    hourly = (
        ev.select("event_type", us.alias("t_us"), "value")
        .withColumn("hour", F.expr("t_us DIV 3600000000"))
        .groupBy("event_type", "hour")
        .agg(
            F.expr(
                "ROUND(CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)"
                " / COUNT(*), 6)"
            ).alias("y")
        )
    )
    rows = hourly.collect()
    max_hour = max(r["hour"] for r in rows)
    series: dict = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["hour"])):
        if r["hour"] > max_hour - 48:
            series.setdefault(r["event_type"], []).append(r["y"])
    for et, ys in series.items():
        level = ys[0]
        for y in ys[1:]:
            level = 0.5 * y + 0.5 * level
        n_hours, last_obs, ses = got[et]
        assert n_hours == len(ys)
        assert last_obs == ys[-1]
        assert abs(ses - level) < 5e-6, (et, ses, level)


def test_confusion_metrics_match_matrix(spark, sf_dir):
    cm = QUERIES["ml_naive_bayes"](spark, sf_dir).collect()
    per = QUERIES["ml_confusion_metrics"](spark, sf_dir).collect()
    n_true: dict = {}
    n_pred: dict = {}
    tp: dict = {}
    for r in cm:
        n_true[r["lang_true"]] = n_true.get(r["lang_true"], 0) + r["n_docs"]
        n_pred[r["lang_pred"]] = n_pred.get(r["lang_pred"], 0) + r["n_docs"]
        if r["lang_true"] == r["lang_pred"]:
            tp[r["lang_true"]] = r["n_docs"]
    for r in per:
        c = r["cls"]
        assert r["n_true"] == n_true.get(c, 0)
        assert r["n_pred"] == n_pred.get(c, 0)
        assert r["tp"] == tp.get(c, 0)
        p = tp.get(c, 0) / n_pred[c] if n_pred.get(c) else 0.0
        rr = tp.get(c, 0) / n_true[c] if n_true.get(c) else 0.0
        assert abs(r["precision"] - round(p, 6)) < 1e-9
        assert abs(r["recall"] - round(rr, 6)) < 1e-9
        f1 = 0.0 if r["precision"] + r["recall"] == 0 else (
            2 * r["precision"] * r["recall"] / (r["precision"] + r["recall"])
        )
        assert abs(r["f1"] - round(f1, 6)) < 2e-6


def test_decision_stump_matches_brute_force(spark, sf_dir):
    """The cumulative-moment split finder must equal a brute-force scan
    over every candidate threshold in Python."""
    from strava_vector_search_spark.io.tables import load_table
    from strava_vector_search_spark.operators import linear as L

    row = QUERIES["ml_decision_stump"](spark, sf_dir).head()
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    feats = L.feature_frame(
        emb,
        F.col("embedding")[0],
        F.col("embedding")[1],
        F.coalesce((F.col("label") == 0).cast("int"), F.lit(0)),
    ).collect()
    pts = sorted((r["x1"], r["y"]) for r in feats)
    xs = sorted({x for x, _ in pts})
    best = None
    for v in xs[:-1]:
        left = [y for x, y in pts if x <= v]
        right = [y for x, y in pts if x > v]
        ml, mr = sum(left) / len(left), sum(right) / len(right)
        # replicate the engine's 10-dp SSE rounding so tie-breaks agree
        sse = round(
            sum((y - ml) ** 2 for y in left)
            + sum((y - mr) ** 2 for y in right),
            10,
        )
        if best is None or sse < best[0]:
            best = (sse, v, len(left), len(right), ml, mr)
    sse, v, nl, nr, ml, mr = best
    assert row["threshold"] == v
    assert (row["n_left"], row["n_right"]) == (nl, nr)
    assert abs(row["mean_left"] - ml) < 1e-6
    assert abs(row["mean_right"] - mr) < 1e-6
    assert abs(row["sse"] - sse) < 1e-4
    assert row["gain"] >= -1e-9


def test_cusum_changepoint_matches_python(spark, sf_dir):
    from strava_vector_search_spark.io.tables import load_events

    row = QUERIES["ev_cusum_changepoint"](spark, sf_dir).head()
    ev = load_events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    daily = sorted(
        (r["day"], r["x"])
        for r in ev.select(us.alias("t"))
        .withColumn("day", F.expr("t DIV 86400000000"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    mean = sum(x for _, x in daily) / len(daily)
    cum, best = 0.0, None
    for i, (d, x) in enumerate(daily, 1):
        cum += x
        # replicate the engine's 6-dp rounding before the argmax so the
        # (|cusum| DESC, day ASC) tie-break agrees on near-ties
        cusum = round(cum - i * mean, 6)
        if best is None or abs(cusum) > abs(best[1]):
            best = (d, cusum)
    assert row["cp_day"] == best[0]
    assert abs(row["cp_cusum"] - best[1]) < 1e-4
    assert row["n_days"] == len(daily)


def test_join_explosion_prediction_is_exact(spark, sf_dir):
    """The histogram identity must predict the ACTUAL join cardinality."""
    from strava_vector_search_spark.io.tables import load_table

    row = QUERIES["diag_join_explosion"](spark, sf_dir).head()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    actual = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).count()
    assert row["predicted_rows"] == actual
    assert row["heaviest_key_rows"] >= 1
    assert row["fanout_vs_probe"] > 0


def test_power_analysis_consistent_with_ztest(spark, sf_dir):
    """MDE and required-n must be mutually consistent: running the
    experiment at n_per_arm_for_observed makes the observed effect
    detectable (|observed delta| >= the MDE at that n)."""
    import math

    row = QUERIES["ev_power_analysis"](spark, sf_dir).head()
    z = QUERIES["ab_proportion_ztest"](spark, sf_dir).head()
    p = row["pooled_rate"]
    delta = abs(z["rate_a"] - z["rate_b"])
    assert 0.0 < p < 1.0
    assert row["mde_80pct"] > 0
    if row["n_per_arm_for_observed"] is not None and delta > 0:
        n_req = row["n_per_arm_for_observed"]
        mde_at_req = (1.96 + 0.8416) * math.sqrt(2 * p * (1 - p) / n_req)
        assert delta >= mde_at_req - 1e-6


def test_histogram_quantile_within_bin_width(spark, sf_dir):
    """The binned estimate must sit within one bin width of the exact
    percentile, and per-day histograms must merge to the direct one."""
    from strava_vector_search_spark.io.tables import load_events

    rows = QUERIES["a21_histogram_quantile_union"](spark, sf_dir).collect()
    assert [r["q"] for r in rows] == [0.5, 0.9, 0.99]
    ev = load_events(spark, sf_dir)
    vals = sorted(r["value"] for r in ev.select("value").collect())
    import math

    for r in rows:
        exact = vals[min(len(vals) - 1, math.ceil(r["q"] * len(vals)) - 1)]
        assert abs(r["est_value"] - exact) <= 1.0 + 1e-9, (r, exact)
    # merge property: per-day cells summed == direct global histogram
    us = F.unix_micros(F.col("ts"))
    b = ev.select(us.alias("t"), "value").select(
        F.expr("t DIV 86400000000").alias("day"),
        F.expr("LEAST(799, GREATEST(0, CAST(FLOOR(value) AS INT)))").alias(
            "bin"
        ),
    )
    direct = {
        r["bin"]: r["cnt"]
        for r in b.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    via_days = {}
    for r in (
        b.groupBy("day", "bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    ):
        via_days[r["bin"]] = via_days.get(r["bin"], 0) + r["cnt"]
    assert via_days == direct


def test_kmeans_step_matches_numpy(spark, sf_dir):
    """Assignment + centroid update replayed with numpy."""
    from strava_vector_search_spark.io.tables import load_table
    import numpy as np

    rows = QUERIES["ml_kmeans_step"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    data = [(r["vec_id"], np.array(r["embedding"], dtype="float64"))
            for r in emb.collect()]
    cents = {vid: v for vid, v in data if vid < 8}
    agg = {}
    for vid, v in data:
        sims = sorted(
            ((round(float(v @ c), 6), -cid) for cid, c in cents.items()),
            reverse=True,
        )
        best_cid = -sims[0][1]
        n, s = agg.get(best_cid, (0, np.zeros(4)))
        agg[best_cid] = (n + 1, s + np.round(v[:4], 6))
    for r in rows:
        n, s = agg[r["cluster"]]
        assert r["n_members"] == n
        for i in range(4):
            assert abs(r[f"m{i}"] - round(s[i] / n, 6)) < 2e-6


def test_kcore_matches_python_peeling(spark, sf_dir):
    """4 bounded peeling rounds replayed in Python must agree exactly."""
    from strava_vector_search_spark.io.tables import load_table
    from collections import defaultdict
    import itertools

    row = QUERIES["g_kcore"](spark, sf_dir).head()
    pairs = defaultdict(int)
    orders = defaultdict(set)
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        orders[r["l_orderkey"]].add(r["l_partkey"])
    for parts in orders.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            pairs[(u, v)] += 1
    edges = {e for e, w in pairs.items() if w >= 2}
    expect = []
    for _ in range(4):
        deg = defaultdict(int)
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        expect.append(len(keep))
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    assert (
        row["r1_nodes"],
        row["r2_nodes"],
        row["r3_nodes"],
        row["r4_nodes"],
    ) == tuple(expect)
    nodes = {x for e in edges for x in e}
    assert row["core_nodes"] == len(nodes)
    assert row["core_edges"] == len(edges)


def test_did_and_cuped_sanity(spark, sf_dir):
    did = QUERIES["ev_did_estimator"](spark, sf_dir).head()
    assert did["n_events"] > 0
    for c in ("ctrl_pre", "ctrl_post", "treat_pre", "treat_post"):
        assert did[c] is not None
    expected = round(
        (did["treat_post"] - did["treat_pre"])
        - (did["ctrl_post"] - did["ctrl_pre"]),
        6,
    )
    assert abs(did["did_estimate"] - expected) < 2e-6
    cuped = QUERIES["ml_cuped_adjustment"](spark, sf_dir).head()
    assert cuped["n_users"] > 0
    assert 0.0 <= cuped["variance_reduction"] <= 1.0
    assert cuped["var_adjusted"] <= cuped["var_y"] + 1e-9
    # var_adjusted = var_y * (1 - R^2)
    assert abs(
        cuped["var_adjusted"]
        - cuped["var_y"] * (1 - cuped["variance_reduction"])
    ) < 1e-4
