"""Round-5 (continued) operator invariants: ACF, Mann-Kendall/Theil-Sen,
Welch t, Mann-Whitney U, chi-square independence, and Gini concentration
— each pinned against an independent pure-Python replay of the statistic
(brute force where the operator is kernel/window based), not just the
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from strava_vector_search_spark.io.tables import load_events, load_table
from strava_vector_search_spark.queries import QUERIES


def _daily_counts(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    rows = (
        ev.select(F.expr("unix_micros(ts) DIV 86400000000").alias("day"))
        .groupBy("day")
        .count()
        .orderBy("day")
        .collect()
    )
    return [(r["day"], r["count"]) for r in rows]


def _purchase_values(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    rows = ev.filter(F.col("event_type") == "purchase").select(
        F.expr("user_id % 2").alias("arm"), "value"
    ).collect()
    return [(r["arm"], r["value"]) for r in rows]


def test_acf_matches_python(spark, sf_dir):
    series = [x for _, x in _daily_counts(spark, sf_dir)]
    n = len(series)
    mean = sum(series) / n
    d = [x - mean for x in series]
    den = sum(v * v for v in d)
    got = {
        r["lag"]: r["acf"]
        for r in QUERIES["ev_acf_lags"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 8))
    for k in range(1, 8):
        exp = sum(d[i] * d[i - k] for i in range(k, n)) / den
        assert abs(got[k] - exp) < 1e-4, (k, got[k], exp)
    # a correlation is bounded
    assert all(-1.001 <= v <= 1.001 for v in got.values())


def test_trend_robust_matches_python(spark, sf_dir):
    pts = _daily_counts(spark, sf_dir)
    pairs = [
        (pts[j][1] - pts[i][1], pts[j][0] - pts[i][0])
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
    ]
    s = sum((dx > 0) - (dx < 0) for dx, _ in pairs)
    slopes = sorted(round(dx / dd, 10) for dx, dd in pairs)
    sen = slopes[(len(slopes) + 1) // 2 - 1]  # lower median, same rule
    row = QUERIES["ev_trend_robust"](spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(pairs)
    assert row["s_stat"] == s
    assert abs(row["tau_a"] - s / len(pairs)) < 1e-6
    assert abs(row["sen_slope"] - sen) < 1e-9


def test_welch_matches_python(spark, sf_dir):
    vals = _purchase_values(spark, sf_dir)
    a = [v for arm, v in vals if arm == 0]
    b = [v for arm, v in vals if arm == 1]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / se2**0.5
    df = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    row = QUERIES["ab_welch_ttest"](spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["t_stat"] - t) < 1e-3
    assert abs(row["df_welch"] - df) < 0.5
    # df bounded by the two-sample extremes
    assert min(len(a), len(b)) - 1 <= row["df_welch"] <= len(a) + len(b) - 2


def test_mann_whitney_matches_brute_force(spark, sf_dir):
    vals = _purchase_values(spark, sf_dir)
    a = [round(v, 2) for arm, v in vals if arm == 0]
    b = [round(v, 2) for arm, v in vals if arm == 1]
    u1 = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    row = QUERIES["ab_mann_whitney_u"](spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["u1"] - u1) < 1e-9
    # z sign must agree with the mean-rank direction
    mu = len(a) * len(b) / 2.0
    assert (row["z_stat"] > 0) == (u1 > mu) or abs(u1 - mu) < 1e-9


def test_chi_square_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cells = {
        (r["lang"], r["source"]): r["count"]
        for r in docs.groupBy("lang", "source").count().collect()
    }
    langs = sorted({k[0] for k in cells})
    sources = sorted({k[1] for k in cells})
    n = sum(cells.values())
    rowt = {l: sum(v for k, v in cells.items() if k[0] == l) for l in langs}
    colt = {s: sum(v for k, v in cells.items() if k[1] == s) for s in sources}
    chi2 = 0.0
    for l in langs:
        for s in sources:
            e = rowt[l] * colt[s] / n
            o = cells.get((l, s), 0)
            chi2 += (o - e) ** 2 / e
    row = QUERIES["a23_chi_square"](spark, sf_dir).collect()[0]
    assert row["n_tot"] == n
    assert row["r_levels"] == len(langs)
    assert row["c_levels"] == len(sources)
    assert row["dof"] == (len(langs) - 1) * (len(sources) - 1)
    assert abs(row["chi2"] - chi2) < 1e-3
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_gini_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    rev = sorted(
        (r["rev"], r["o_custkey"])
        for r in orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    )
    xs = [x for x, _ in rev]
    n = len(xs)
    sx = sum(xs)
    swx = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (2 * swx - (n + 1) * sx) / (n * sx)
    row = QUERIES["a24_gini_revenue"](spark, sf_dir).collect()[0]
    assert row["n_customers"] == n
    assert abs(row["gini"] - gini) < 1e-5
    assert 0.0 <= row["gini"] < 1.0
    # Lorenz checkpoints: bottom half holds less than its population share,
    # top decile more than its own
    assert row["bot50_share"] < 0.5
    assert row["top10_share"] > 0.1
    bot = sum(xs[: n // 2]) / sx
    top = sum(xs[n - n // 10 :]) / sx
    assert abs(row["bot50_share"] - bot) < 1e-5
    assert abs(row["top10_share"] - top) < 1e-5


def test_skyline_matches_brute_force_and_merges(spark, sf_dir):
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p, pts):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )

    def skyline(pts):
        return sorted(p for p in pts if not dominated(p, pts))

    expected = skyline(parts)
    got = sorted(
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in QUERIES["w_skyline_2d"](spark, sf_dir).collect()
    )
    assert got == expected
    # mergeability: skyline of partition skylines == global skyline
    half = len(parts) // 2
    merged = skyline(skyline(parts[:half]) + skyline(parts[half:]))
    assert merged == expected


def test_interval_union_matches_python_merge(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    lease = 1_800_000_000
    rows = ev.select(
        "user_id", F.expr("unix_micros(ts)").alias("t")
    ).collect()
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["t"])
    got = {
        r["user_id"]: (r["n_events"], r["n_intervals"], r["covered_us"])
        for r in QUERIES["ev_interval_union_time"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_user)
    for uid, ts in by_user.items():
        ts.sort()
        covered, n_int = 0, 0
        cur_end = None
        for t in ts:
            if cur_end is None or t >= cur_end:
                n_int += 1
                covered += lease
                cur_end = t + lease
            else:
                covered += t + lease - cur_end
                cur_end = t + lease
        assert got[uid] == (len(ts), n_int, covered), uid


def test_chao1_sample_and_estimator(spark, sf_dir):
    import hashlib

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select("l_orderkey", "l_linenumber", "l_partkey").collect()

    def md5i(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sample = [
        r["l_partkey"]
        for r in rows
        if md5i(f"{r['l_orderkey']}:{r['l_linenumber']}") % 20 == 0
    ]
    from collections import Counter

    c = Counter(sample)
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    est = len(c) + f1 * (f1 - 1) / (2.0 * (f2 + 1))
    row = QUERIES["diag_distinct_estimate"](spark, sf_dir).collect()[0]
    assert row["sample_rows"] == len(sample)
    assert row["d_sample"] == len(c)
    assert (row["f1"], row["f2"]) == (f1, f2)
    assert abs(row["chao1_est"] - est) < 1e-6
    assert row["exact_ndv"] == len({r["l_partkey"] for r in rows})


def test_compaction_plan_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    per_src = sorted(
        (r["source"], r["count"], r["bytes"])
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("count"), F.sum("n_chars").alias("bytes"))
        .collect()
    )
    target, open_cost = 32768, 1024
    bins: dict[int, list[int]] = {}
    cum = 0
    for _, n, b in per_src:
        cost = b + open_cost
        bin_id = cum // target
        cum += cost
        agg = bins.setdefault(bin_id, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += n
        agg[2] += b
        agg[3] += cost
    got = {
        r["bin"]: [r["n_sources"], r["n_docs"], r["est_bytes"], r["total_cost"]]
        for r in QUERIES["lay_compaction_plan"](spark, sf_dir).collect()
    }
    assert got == bins
    # every input lands in exactly one bin
    assert sum(v[1] for v in got.values()) == docs.count()


def test_kl_divergence_properties(spark, sf_dir):
    row = QUERIES["tx_kl_divergence"](spark, sf_dir).collect()[0]
    import math

    # KL is non-negative; JSD bounded by ln 2 and symmetric-positive
    assert row["kl_ab"] >= 0.0
    assert row["kl_ba"] >= 0.0
    assert 0.0 <= row["jsd"] <= math.log(2) + 1e-9
    # JSD <= half the sum of the two KLs (mixture convexity)
    assert row["jsd"] <= 0.5 * (row["kl_ab"] + row["kl_ba"]) + 1e-9
    assert row["tokens_a"] > 0 and row["tokens_b"] > 0


def test_seasonal_decompose_replay(spark, sf_dir):
    pts = _daily_counts(spark, sf_dir)
    days = [d for d, _ in pts]
    xs = [x for _, x in pts]
    detr: dict[int, list[float]] = {}
    for i in range(len(xs)):
        if i - 3 < 0 or i + 3 >= len(xs):
            continue
        trend = sum(xs[i - 3 : i + 4]) / 7.0
        detr.setdefault(days[i] % 7, []).append(xs[i] - trend)
    raw = {k: sum(v) / len(v) for k, v in detr.items()}
    mean_raw = sum(raw.values()) / len(raw)
    rows = QUERIES["ev_seasonal_decompose"](spark, sf_dir).collect()
    got = {r["dow"]: r for r in rows}
    assert set(got) == set(raw)
    for k in raw:
        assert got[k]["n_obs"] == len(detr[k])
        assert abs(got[k]["seasonal_raw"] - raw[k]) < 1e-4
        assert abs(
            got[k]["seasonal_centered"] - (raw[k] - mean_raw)
        ) < 1e-4
    # centered indices sum to ~0
    assert abs(sum(r["seasonal_centered"] for r in rows)) < 1e-3


def test_keyset_page_equals_offset_page(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    offset_page = (
        cust.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .offset(40)
        .limit(20)
        .collect()
    )
    keyset_page = QUERIES["t_keyset_page"](spark, sf_dir).collect()
    assert [tuple(r) for r in keyset_page] == [tuple(r) for r in offset_page]
    assert len(keyset_page) == 20


def test_seasonal_anomaly_matches_python(spark, sf_dir):
    pts = _daily_counts(spark, sf_dir)
    days = [d for d, _ in pts]
    xs = [x for _, x in pts]
    rows_detr = []
    for i in range(3, len(xs) - 3):
        trend = sum(xs[i - 3 : i + 4]) / 7.0
        rows_detr.append((days[i], xs[i], days[i] % 7, xs[i] - trend))
    seas = {}
    for _, _, dow, dt in rows_detr:
        seas.setdefault(dow, []).append(dt)
    seas = {k: sum(v) / len(v) for k, v in seas.items()}
    resid = [(d, x, dt - seas[dow]) for d, x, dow, dt in rows_detr]
    rs = sorted(r for _, _, r in resid)
    med = rs[(len(rs) + 1) // 2 - 1]
    ads = sorted(abs(r - med) for _, _, r in resid)
    mad = ads[(len(ads) + 1) // 2 - 1]
    scored = sorted(
        ((d, x, r, (r - med) / (1.4826 * mad)) for d, x, r in resid),
        key=lambda t: (-abs(t[3]), t[0]),
    )[:5]
    got = QUERIES["ev_seasonal_anomaly"](spark, sf_dir).collect()
    assert len(got) == 5
    exp = {d: s for d, _, _, s in scored}
    for r in got:
        assert r["day"] in exp
        assert abs(r["score"] - exp[r["day"]]) < 1e-3, (r, exp[r["day"]])
        assert r["is_anomaly"] == (1 if abs(r["score"]) > 3.0 else 0)


def test_gbt_rounds_matches_python_and_improves(spark, sf_dir):
    """Two-round boosting replay: greedy exact stump on residuals, with
    the same 6 dp residual-handoff rounding; SSE must not increase."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    rows = emb.select(
        F.expr("ROUND(CAST(embedding[0] AS DOUBLE), 6)").alias("v"),
        F.expr(
            "CAST(CASE WHEN label = 0 THEN 1 ELSE 0 END AS DOUBLE)"
        ).alias("y"),
    ).collect()
    pts = [(r["v"], r["y"]) for r in rows]

    def best_stump(data):
        from collections import defaultdict

        mom = defaultdict(lambda: [0, 0.0, 0.0])
        for v, r in data:
            m = mom[v]
            m[0] += 1
            m[1] += r
            m[2] += r * r
        vs = sorted(mom)
        nt = sum(mom[v][0] for v in vs)
        st = sum(mom[v][1] for v in vs)
        srrt = sum(mom[v][2] for v in vs)
        nl = sl = srrl = 0.0
        best = None
        for v in vs[:-1]:
            nl += mom[v][0]
            sl += mom[v][1]
            srrl += mom[v][2]
            nr, sr, srrr = nt - nl, st - sl, srrt - srrl
            sse = round(
                (srrl - sl * sl / nl) + (srrr - sr * sr / nr), 10
            )
            if best is None or (sse, v) < best[:2]:
                best = (sse, v, sl / nl, sr / nr)
        return best[1], best[2], best[3], best[0]

    f0 = round(sum(y for _, y in pts) / len(pts), 6)
    d1 = [(v, round(y - f0, 6)) for v, y in pts]
    t1, wl1, wr1, sse1 = best_stump(d1)
    d2 = [
        (v, round(r - (wl1 if v <= t1 else wr1), 6)) for v, r in d1
    ]
    t2, wl2, wr2, sse2 = best_stump(d2)
    row = QUERIES["ml_gbt_rounds"](spark, sf_dir).collect()[0]
    assert abs(row["f0"] - f0) < 1e-9
    assert row["thr_1"] == t1 and row["thr_2"] == t2
    assert abs(row["wl_1"] - wl1) < 1e-4 and abs(row["wr_1"] - wr1) < 1e-4
    assert abs(row["wl_2"] - wl2) < 1e-4 and abs(row["wr_2"] - wr2) < 1e-4
    assert abs(row["sse_1"] - sse1) < 1e-2
    assert abs(row["sse_2"] - sse2) < 1e-2
    # boosting never increases training SSE
    assert row["sse_2"] <= row["sse_1"] + 1e-9


def test_fs_weights_axioms(spark, sf_dir):
    """Fellegi-Sunter score axioms: planted dirty duplicates (name one
    edit away, price 1 cent off, same size) must score as links; weight
    is monotone in agreements; decisions partition by threshold."""
    import math

    rows = QUERIES["er_fs_match_weights"](spark, sf_dir).collect()
    assert rows
    w_name = math.log(0.95 / 0.05)
    w_price = math.log(0.9 / 0.1)
    w_size = math.log(0.85 / 0.15)
    for r in rows:
        exp = (
            (w_name if r["agree_name"] else -w_name)
            + (w_price if r["agree_price"] else -w_price)
            + (w_size if r["agree_size"] else -w_size)
        )
        assert abs(r["weight"] - exp) < 1e-4
        if r["weight"] >= 4.0:
            assert r["decision"] == "link"
        elif r["weight"] >= 0.0:
            assert r["decision"] == "possible"
        else:
            assert r["decision"] == "nonlink"
    # every planted dirty pair (rec, rec+10M) agrees on all three fields
    planted = [r for r in rows if r["r2"] - r["r1"] == 10_000_000]
    assert planted
    assert all(
        r["agree_name"] and r["agree_price"] and r["agree_size"]
        and r["decision"] == "link"
        for r in planted
    )


def test_bfs_hops_matches_python(spark, sf_dir):
    from collections import defaultdict

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().collect()
    by_order = defaultdict(list)
    for r in op:
        by_order[r["l_orderkey"]].append(r["l_partkey"])
    pair_counts = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_counts[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (u, v), c in pair_counts.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    nodes = set(adj)
    if not nodes:
        return
    src = min(nodes)
    dist = {src: 0}
    frontier = [src]
    for h in (1, 2, 3):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = h
        frontier = sorted(nxt)
    exp = defaultdict(int)
    for d in dist.values():
        exp[d] += 1
    exp[-1] = len(nodes) - len(dist)
    got = {
        r["dist"]: r["n_nodes"]
        for r in QUERIES["g_bfs_hops"](spark, sf_dir).collect()
    }
    expected_keys = {d for d, n in exp.items() if n > 0 or d == -1}
    assert set(got) == expected_keys  # no spurious extra levels either
    for d in expected_keys:
        assert got[d] == exp[d], (d, got[d], exp[d])


def test_sequence_pattern_matches_python(spark, sf_dir):
    import re

    ev = load_events(spark, sf_dir)
    rows = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
        "event_id",
        F.expr("SUBSTRING(event_type, 1, 1)").alias("c"),
    ).collect()
    seqs: dict[int, list] = {}
    for r in rows:
        seqs.setdefault(r["user_id"], []).append(
            (r["t"], r["event_id"], r["c"])
        )
    got = {
        r["user_id"]: r
        for r in QUERIES["ev_sequence_pattern"](spark, sf_dir).collect()
    }
    assert set(got) == set(seqs)
    for uid, evs in seqs.items():
        s = "".join(c for _, _, c in sorted(evs))
        g = got[uid]
        assert g["n_events"] == len(evs) and g["seq_len"] == len(s)
        assert g["converted_clean"] == int(
            re.search("v[^e]*c[^e]*p", s) is not None
        )
        assert g["converted_any"] == int(
            re.search("v.*c.*p", s) is not None
        )
        assert g["double_error"] == int("ee" in s)
    # exclusion must bite somewhere: clean conversions are a strict
    # subset of any-order conversions on this data
    n_clean = sum(r["converted_clean"] for r in got.values())
    n_any = sum(r["converted_any"] for r in got.values())
    assert 0 < n_clean < n_any


def test_tree_depth2_matches_python(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    rows = emb.select(
        F.expr("ROUND(CAST(embedding[0] AS DOUBLE), 6)").alias("v"),
        F.expr(
            "CAST(CASE WHEN label = 0 THEN 1 ELSE 0 END AS DOUBLE)"
        ).alias("r"),
    ).collect()
    pts = [(r["v"], r["r"]) for r in rows]

    def best_stump(data):
        from collections import defaultdict

        mom = defaultdict(lambda: [0, 0.0, 0.0])
        for v, r in data:
            m = mom[v]
            m[0] += 1
            m[1] += r
            m[2] += r * r
        vs = sorted(mom)
        if len(vs) < 2:
            return None
        nt = sum(mom[v][0] for v in vs)
        st = sum(mom[v][1] for v in vs)
        srrt = sum(mom[v][2] for v in vs)
        nl = sl = srrl = 0.0
        best = None
        for v in vs[:-1]:
            nl += mom[v][0]
            sl += mom[v][1]
            srrl += mom[v][2]
            nr, sr, srrr = nt - nl, st - sl, srrt - srrl
            sse = round(
                (srrl - sl * sl / nl) + (srrr - sr * sr / nr), 10
            )
            if best is None or (sse, v) < best[:2]:
                best = (sse, v, sl / nl, sr / nr)
        return best[1], best[2], best[3], best[0]

    t0, _, _, sse0 = best_stump(pts)
    left = [p for p in pts if p[0] <= t0]
    right = [p for p in pts if p[0] > t0]
    bl, br = best_stump(left), best_stump(right)
    row = QUERIES["ml_tree_depth2"](spark, sf_dir).collect()[0]
    assert row["root_thr"] == t0
    if bl:
        assert row["left_thr"] == bl[0]
        assert abs(row["left_wl"] - bl[1]) < 1e-4
    else:
        assert row["left_thr"] is None
    if br:
        assert row["right_thr"] == br[0]
        assert abs(row["right_wl"] - br[1]) < 1e-4
    else:
        assert row["right_thr"] is None
    exp_sse2 = round((bl[3] if bl else 0.0) + (br[3] if br else 0.0), 6)
    assert abs(row["sse_depth2"] - exp_sse2) < 1e-2
    # a deeper tree never fits worse on train
    assert row["sse_depth2"] <= row["root_sse"] + 1e-9


def test_fd_violations_expected_structure(spark, sf_dir):
    rows = {r["fd"]: r for r in QUERIES["dq_fd_violations"](spark, sf_dir).collect()}
    assert len(rows) == 5
    # key -> attribute FDs hold by construction
    assert rows["c_custkey->c_nationkey"]["holds"] == 1
    assert rows["n_nationkey->n_regionkey"]["holds"] == 1
    assert rows["c_custkey->c_nationkey"]["n_violating"] == 0
    # the synthetic non-FDs must actually violate
    assert rows["o_custkey->o_orderpriority"]["holds"] == 0
    assert rows["o_custkey->o_orderpriority"]["max_fanout"] > 1
    # replay one FD by brute force
    docs = load_table(spark, sf_dir, "documents")
    pairs = {
        (r["lang"], r["source"])
        for r in docs.select("lang", "source").distinct().collect()
    }
    langs = {}
    for l, s in pairs:
        langs.setdefault(l, set()).add(s)
    assert rows["lang->source"]["n_lhs"] == len(langs)
    assert rows["lang->source"]["n_violating"] == sum(
        1 for v in langs.values() if len(v) > 1
    )
    assert rows["lang->source"]["max_fanout"] == max(
        len(v) for v in langs.values()
    )


def test_hdr_histogram_bounds_and_replay(spark, sf_dir):
    row = QUERIES["a25_hdr_histogram"](spark, sf_dir).collect()[0]
    ev = load_events(spark, sf_dir)
    cents = sorted(
        r["vc"]
        for r in ev.select(
            F.expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").alias("vc")
        )
        .filter(F.col("vc") >= 1)
        .collect()
    )
    n = len(cents)
    assert row["n_values"] == n
    import math

    for q, tag in ((0.5, "50"), (0.9, "90"), (0.99, "99")):
        k = max(1, math.ceil(q * n))
        exact = cents[k - 1]
        assert row[f"exact{tag}_cents"] == exact
        b = exact.bit_length() - 1
        assert row[f"b{tag}"] == b
        est = 3 * (1 << b) / 2.0
        assert row[f"est{tag}_cents"] == est
        # log2 buckets with midpoint estimate: relative error <= 50%
        assert row[f"relerr{tag}"] <= 0.5 + 1e-9


def test_rfm_segments_axioms(spark, sf_dir):
    rows = QUERIES["ev_rfm_segments"](spark, sf_dir).collect()
    assert rows
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    import math

    assert math.isclose(
        sum(r["money_share"] for r in rows), 1.0, abs_tol=1e-3
    )
    # every segment digit is a quintile score 1..5
    for r in rows:
        assert len(r["segment"]) == 3
        assert all(c in "12345" for c in r["segment"])
    # top-monetary segments (m=5) must hold outsized money share:
    # 5 of 125 possible cells cover ~20% of customers but more revenue
    m5 = sum(r["money_share"] for r in rows if r["segment"][2] == "5")
    assert m5 > 0.2


def test_neyman_allocation_axioms(spark, sf_dir):
    rows = QUERIES["smp_neyman_allocation"](spark, sf_dir).collect()
    assert rows
    # the budget is spent exactly (unless capped by a stratum population)
    total_alloc = sum(r["n_alloc"] for r in rows)
    capped = any(r["n_alloc"] > r["n_pop"] for r in rows)
    if not capped:
        assert total_alloc == 200
    for r in rows:
        assert r["n_sampled"] == min(r["n_alloc"], r["n_pop"])
        assert r["s_h"] >= 0
    # Neyman beats proportional: the allocation must order by N_h * S_h
    weights = sorted(rows, key=lambda r: r["n_pop"] * r["s_h"])
    allocs = [r["n_alloc"] for r in weights]
    assert all(a <= b + 1 for a, b in zip(allocs, allocs[1:]))
    # deterministic admission: rerunning yields the identical sample
    again = QUERIES["smp_neyman_allocation"](spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_ks_test_matches_brute_force(spark, sf_dir):
    vals = _purchase_values(spark, sf_dir)
    a = sorted(round(v, 2) for arm, v in vals if arm == 0)
    b = sorted(round(v, 2) for arm, v in vals if arm == 1)
    grid = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in grid
    )
    row = QUERIES["ab_ks_test"](spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["d_stat"] - d) < 1e-6
    assert 0.0 <= row["d_stat"] <= 1.0
    scale = (len(a) * len(b) / (len(a) + len(b))) ** 0.5
    assert abs(row["d_scaled"] - d * scale) < 1e-4
