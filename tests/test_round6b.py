"""Round-6 gate invariants: personalized PageRank, exact Spearman,
T-learner uplift, Bloom decontamination, association rules, and
perceptual-hash near-dup — each pinned against an independent pure-Python
replay (hashlib/numpy where apt), not just the DuckDB oracle."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from strava_vector_search_spark.io.tables import load_table
from strava_vector_search_spark.queries import QUERIES


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _shingles(text: str, n: int = 3) -> list[str]:
    ts = _tokens(text)
    if len(ts) >= n:
        out, seen = [], set()
        for i in range(len(ts) - n + 1):
            s = " ".join(ts[i : i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [" ".join(ts)]


# -- personalized PageRank ----------------------------------------------------


def test_ppr_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = {
        (f"c{r['o_custkey']}", f"s{r['l_suppkey']}")
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    seeds = {c for c, _ in pairs if int(c[1:]) % 100 == 0}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    deg = Counter(u for u, _ in edges)
    r = {n: (1_000_000 if n in seeds else 0) for n in nodes}
    for _ in range(4):
        inflow = defaultdict(int)
        for u, v in edges:
            inflow[v] += r[u] // deg[u]
        r = {
            n: (150_000 if n in seeds else 0) + (85 * inflow[n]) // 100
            for n in nodes
        }
    exp = sorted(
        ((round(r[n] / 1e6, 6), n) for n in nodes if n not in seeds),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = QUERIES["g_ppr"](spark, sf_dir).collect()
    assert [(row["rank"], row["node"]) for row in got] == exp
    assert seeds, "seed cohort must be non-empty at this sf"


# -- exact Spearman -----------------------------------------------------------


def test_spearman_matches_python(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("double").alias("x"),
            F.col("l_extendedprice").cast("double").alias("y"),
        )
        .collect()
    )
    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    n = len(xs)

    def avg_ranks(vals):
        order = sorted(range(n), key=lambda i: vals[i])
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j + 1 < n and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j + 2) / 2.0  # 1-based average rank
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    exp = num / den
    row = QUERIES["ab_spearman_corr"](spark, sf_dir).collect()[0]
    assert row["n_rows"] == n
    assert abs(row["spearman_rho"] - exp) < 1e-6
    assert -1.0 <= row["spearman_rho"] <= 1.0


# -- T-learner uplift ---------------------------------------------------------


def test_uplift_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding", "label")
        .collect()
    )
    feats = [
        (
            round(float(r["embedding"][0]), 6),
            round(float(r["embedding"][1]), 6),
            1.0 if r["label"] == 0 else 0.0,
            _md5i(str(r["vec_id"])) % 2,
            r["label"] if r["label"] is not None else -1,
        )
        for r in emb
    ]
    coef = {}
    for arm in (0, 1):
        sub = [(x1, x2, y) for x1, x2, y, t, _ in feats if t == arm]
        X = np.array([[1.0, x1, x2] for x1, x2, _ in sub])
        Y = np.array([y for *_, y in sub])
        b = np.linalg.lstsq(X, Y, rcond=None)[0]
        coef[arm] = [round(float(v), 6) for v in b]
    exp = defaultdict(list)
    for x1, x2, y, t, seg in feats:
        up = (
            coef[1][0] + coef[1][1] * x1 + coef[1][2] * x2
        ) - (coef[0][0] + coef[0][1] * x1 + coef[0][2] * x2)
        exp[seg].append((round(up, 10), t))
    got = {
        r["label_segment"]: r
        for r in QUERIES["ml_uplift_tlearner"](spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for seg, items in exp.items():
        r = got[seg]
        assert r["n"] == len(items)
        assert abs(
            r["avg_uplift"] - sum(u for u, _ in items) / len(items)
        ) < 1e-5
        assert abs(
            r["treated_frac"] - sum(t for _, t in items) / len(items)
        ) < 1e-6
    # both arms must be populated for the fit to be a genuine T-learner
    assert any(r["treated_frac"] > 0 for r in got.values())
    assert any(r["treated_frac"] < 1 for r in got.values())


# -- Bloom decontamination ----------------------------------------------------


def test_bloom_matches_python_and_never_misses(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    ev_sh = set()
    for r in docs:
        if r["doc_id"] % 41 == 0:
            ev_sh.update(_shingles(r["text"]))
    M, K, W = 16384, 4, 32
    words = defaultdict(int)
    for s in ev_sh:
        for i in range(K):
            p = _md5i(f"{s}#{i}") % M
            words[p // W] |= 1 << (p % W)

    def maybe(s: str) -> bool:
        for i in range(K):
            p = _md5i(f"{s}#{i}") % M
            if not (words[p // W] >> (p % W)) & 1:
                return False
        return True

    exp = {}
    for r in docs:
        if r["doc_id"] % 41 == 0:
            continue
        sh = _shingles(r["text"])
        hits = sum(1 for s in sh if maybe(s))
        frac = round(hits / len(sh), 6)
        exp[r["doc_id"]] = (len(sh), hits, frac, frac >= 0.1)
    got = QUERIES["dd_bloom_decontaminate"](spark, sf_dir).collect()
    assert len(got) == len(exp)
    for row in got:
        e = exp[row["doc_id"]]
        assert (
            row["n_sh"],
            row["n_bloom_hits"],
            row["bloom_frac"],
            row["contaminated"],
        ) == e, row["doc_id"]
    # no false negatives vs the exact semi-join decontamination
    exact = {
        r["doc_id"]: r["n_hit"]
        for r in QUERIES["dd_decontaminate"](spark, sf_dir).collect()
    }
    for doc_id, (_, bloom_hits, _, _) in exp.items():
        assert bloom_hits >= exact[doc_id], doc_id


# -- association rules --------------------------------------------------------


def test_assoc_rules_matches_python(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    nb = len(baskets)
    supp = Counter(p for items in baskets.values() for p in items)
    minsup = max(5, nb // 500)
    freq = {p for p, c in supp.items() if c >= minsup}
    pair = Counter()
    for items in baskets.values():
        fitems = sorted(i for i in items if i in freq)
        for i in range(len(fitems)):
            for j in range(i + 1, len(fitems)):
                pair[(fitems[i], fitems[j])] += 1
    rules = []
    for (a, b), s_ab in pair.items():
        for ante, cons in ((a, b), (b, a)):
            conf = round(s_ab / supp[ante], 6)
            lift = round(s_ab * nb / (supp[ante] * supp[cons]), 6)
            rules.append((-lift, -conf, ante, cons, s_ab))
    rules.sort()
    exp = rules[:20]
    got = QUERIES["ml_assoc_rules"](spark, sf_dir).collect()
    assert len(got) == min(20, len(rules))
    for row, (nl, nc, ante, cons, s_ab) in zip(got, exp):
        assert (
            row["antecedent"],
            row["consequent"],
            row["support_pair"],
            row["support_ante"],
            row["support_cons"],
        ) == (ante, cons, s_ab, supp[ante], supp[cons])
        assert abs(row["lift"] + nl) < 1e-9
        assert abs(row["confidence"] + nc) < 1e-9
    # every rule's antecedent and consequent must be frequent (Apriori)
    for row in got:
        assert row["support_ante"] >= minsup
        assert row["support_cons"] >= minsup


# -- perceptual-hash near-dup -------------------------------------------------


def _phash_bits(text: str) -> list[int]:
    n = len(text)
    vals = [ord(text[(i * n) // 64]) for i in range(64)]
    total = sum(vals)
    return [1 if 64 * v > total else 0 for v in vals]


def test_phash_matches_python(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
        if len(r["text"]) > 0
    ]
    bits = {d: _phash_bits(t) for d, t in docs}
    buckets = defaultdict(list)
    for d, bv in bits.items():
        for b in range(4):
            val = sum(bv[16 * b + j] << j for j in range(16))
            buckets[(b, val)].append(d)
    cand = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    exp = []
    for a, b in cand:
        h = sum(x != y for x, y in zip(bits[a], bits[b]))
        if h <= 16:
            exp.append((h, a, b))
    exp.sort()
    exp = exp[:50]
    got = QUERIES["mm_phash_near_dup"](spark, sf_dir).collect()
    assert [(r["hamming"], r["doc_a"], r["doc_b"]) for r in got] == exp
    # banding must never produce a pair differing in EVERY band
    for r in got:
        shared = sum(
            all(
                bits[r["doc_a"]][16 * b + j] == bits[r["doc_b"]][16 * b + j]
                for j in range(16)
            )
            for b in range(4)
        )
        assert shared >= 1


# -- exact Bayesian A/B -------------------------------------------------------


def test_bayesian_beta_matches_lgamma_series_and_quadrature(spark, sf_dir):
    import math

    from strava_vector_search_spark.io.tables import load_events

    ev = load_events(spark, sf_dir)
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 180.0),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .collect()
    )
    n_a = sum(1 for r in pu if r["user_id"] % 2 == 0)
    conv_a = sum(r["conv"] for r in pu if r["user_id"] % 2 == 0)
    n_b = len(pu) - n_a
    conv_b = sum(r["conv"] for r in pu) - conv_a
    aa, ba = conv_a + 1, n_a - conv_a + 1
    ab, bb = conv_b + 1, n_b - conv_b + 1

    def lnB(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    # independent replay of the closed-form series with C lgamma
    p_series = sum(
        math.exp(
            lnB(aa + i, ba + bb)
            - math.log(bb + i)
            - lnB(1 + i, bb)
            - lnB(aa, ba)
        )
        for i in range(ab)
    )
    # second independent method: quadrature of pdf_B(x) * CDF_A(x)
    m = 20000
    h = 1.0 / m

    def beta_pdf(x, a, b):
        if x <= 0.0 or x >= 1.0:
            return 0.0
        return math.exp(
            (a - 1) * math.log(x) + (b - 1) * math.log1p(-x) - lnB(a, b)
        )

    cdf_a, p_quad, acc = 0.0, 0.0, 0.0
    for j in range(1, m):
        x = j * h
        acc += beta_pdf(x, aa, ba) * h
        p_quad += beta_pdf(x, ab, bb) * acc * h
    row = QUERIES["ab_bayesian_beta"](spark, sf_dir).collect()[0]
    assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == (
        n_a,
        conv_a,
        n_b,
        conv_b,
    )
    assert abs(row["prob_b_beats_a"] - p_series) < 1e-6
    assert abs(row["prob_b_beats_a"] - p_quad) < 2e-3  # O(h) quadrature
    assert 0.0 <= row["prob_b_beats_a"] <= 1.0


# -- HITS ----------------------------------------------------------------------


def test_hits_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    e = {
        (f"c{r['o_custkey']}", f"s{r['l_suppkey']}")
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    hubs = {h for h, _ in e}
    scale = 1_000_000
    h = {x: scale for x in hubs}
    a = {}
    for _ in range(2):
        araw = defaultdict(int)
        for hu, au in e:
            araw[au] += h[hu]
        d = max(sum(araw.values()) // scale, 1)
        a = {k: v // d for k, v in araw.items()}
        hraw = defaultdict(int)
        for hu, au in e:
            hraw[hu] += a[au]
        d = max(sum(hraw.values()) // scale, 1)
        h = {k: v // d for k, v in hraw.items()}
    top_a = sorted(
        ((round(v / scale, 6), k) for k, v in a.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    top_h = sorted(
        ((round(v / scale, 6), k) for k, v in h.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    exp = [("authority", n, s) for s, n in top_a] + [
        ("hub", n, s) for s, n in top_h
    ]
    got = [
        (r["role"], r["node"], r["score"])
        for r in QUERIES["g_hits"](spark, sf_dir).collect()
    ]
    assert got == exp


# -- IVF partition-pruned layout ----------------------------------------------


def test_ivf_partition_pruned_same_answer_and_prunes(spark, sf_dir):
    base = QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    pruned_df = QUERIES["ann_ivf_partition_pruned"](spark, sf_dir)
    pruned = pruned_df.collect()
    # query vectors differ (11 in both) -> identical ranking contract
    assert [tuple(r) for r in pruned] == [tuple(r) for r in base]
    pruned_df.collect()
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [label" in plan and " IN " in plan


# -- n-gram novelty -----------------------------------------------------------


def test_ngram_novelty_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    first = {}
    per_doc = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        sh = _shingles(r["text"])
        per_doc[r["doc_id"]] = sh
        for s in sh:
            first.setdefault(s, r["doc_id"])
    got = QUERIES["tx_ngram_novelty"](spark, sf_dir).collect()
    assert len(got) == len(per_doc)
    total_novel = 0
    for row in got:
        sh = per_doc[row["doc_id"]]
        novel = sum(1 for s in sh if first[s] == row["doc_id"])
        assert (row["n_sh"], row["n_novel"]) == (len(sh), novel)
        assert abs(row["novelty_frac"] - round(novel / len(sh), 6)) < 1e-9
        total_novel += novel
    assert total_novel == len(first)  # every shingle has exactly one owner


# -- cohort LTV ----------------------------------------------------------------


def test_cohort_ltv_matches_python(spark, sf_dir):
    from strava_vector_search_spark.io.tables import load_events

    rows = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "value",
        F.expr("unix_micros(ts) DIV 604800000000").alias("w"),
    ).collect()
    first = {}
    for r in rows:
        first[r["user_id"]] = min(first.get(r["user_id"], r["w"]), r["w"])
    cohort_users = Counter(first.values())
    rev = defaultdict(float)
    for r in rows:
        if r["event_type"] == "purchase" and r["value"] is not None:
            rev[(first[r["user_id"]], r["w"] - first[r["user_id"]])] += round(
                r["value"], 2
            )
    got = QUERIES["ev_cohort_ltv"](spark, sf_dir).collect()
    seen = set()
    cum = defaultdict(float)
    for row in sorted(got, key=lambda r: (r["cohort_week"], r["age_weeks"])):
        key = (row["cohort_week"], row["age_weeks"])
        assert key in rev and key not in seen
        seen.add(key)
        cum[row["cohort_week"]] += rev[key]
        assert row["n_users"] == cohort_users[row["cohort_week"]]
        exp = cum[row["cohort_week"]] / cohort_users[row["cohort_week"]]
        assert abs(row["avg_cum_ltv"] - exp) < 1e-4
    assert seen == set(rev)


# -- composition gates: prefilter and incremental must equal their exact twins


def test_bloom_prefilter_equals_exact(spark, sf_dir):
    exact = QUERIES["dd_decontaminate"](spark, sf_dir).collect()
    two_stage = QUERIES["dd_bloom_prefilter_exact"](spark, sf_dir).collect()
    assert [tuple(r) for r in two_stage] == [tuple(r) for r in exact]


def test_novelty_incremental_equals_batch(spark, sf_dir):
    batch = QUERIES["tx_ngram_novelty"](spark, sf_dir).collect()
    inc = QUERIES["tx_novelty_incremental"](spark, sf_dir).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in batch]


# -- IVF recall curve ----------------------------------------------------------


def test_ivf_recall_curve_monotone_and_exact_consistent(spark, sf_dir):
    import math

    rows = {
        r["nprobe"]: r
        for r in QUERIES["vs_ivf_recall_curve"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4}
    for r in rows.values():
        assert 0.0 <= r["recall_at_10"] <= 1.0
        assert math.isclose(r["recall_at_10"], r["n_hit"] / 10.0)
    # more probes can only add candidates -> recall is monotone in nprobe
    assert rows[1]["n_hit"] <= rows[2]["n_hit"] <= rows[4]["n_hit"]


# -- greedy k-center -----------------------------------------------------------


def test_kcenter_matches_python(spark, sf_dir):
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb)

    def dist(a, b):
        return round(1.0 - round(cos(a, b), 6), 6)

    centers = [0]
    mind = {v: dist(vec, vecs[0]) for v, vec in vecs.items()}
    exp = []
    for rnd in range(1, 6):
        pick = max(
            (v for v in vecs if v not in centers),
            key=lambda v: (mind[v], -v),
        )
        exp.append((rnd, pick, mind[pick]))
        centers.append(pick)
        for v, vec in vecs.items():
            mind[v] = min(mind[v], dist(vec, vecs[pick]))
    got = [
        (r["round"], r["center_id"], r["radius"])
        for r in QUERIES["smp_kcenter_coreset"](spark, sf_dir).collect()
    ]
    assert got == exp
    # greedy k-center radii are non-increasing
    radii = [r for _, _, r in got]
    assert all(radii[i] >= radii[i + 1] for i in range(len(radii) - 1))


# -- Markov stationary ----------------------------------------------------------


def test_markov_stationary_matches_python(spark, sf_dir):
    counts = [
        (r["from_type"], r["to_type"], r["n"])
        for r in QUERIES["ev_markov_transition_matrix"](
            spark, sf_dir
        ).collect()
    ]
    states = sorted({f for f, _, _ in counts} | {t for _, t, _ in counts})
    have_out = {f for f, _, _ in counts}
    kern = counts + [(s, s, 1) for s in states if s not in have_out]
    rowsum = defaultdict(int)
    for f, _, n in kern:
        rowsum[f] += n
    pi = {s: 1_000_000 for s in states}
    for _ in range(4):
        nxt = defaultdict(int)
        for f, t, n in kern:
            nxt[t] += (pi[f] * n) // rowsum[f]
        pi = {s: nxt.get(s, 0) for s in states}
    tot = sum(pi.values())
    exp = sorted(
        ((round(pi[s] / tot, 6), s) for s in states),
        key=lambda x: (-x[0], x[1]),
    )
    got = QUERIES["ev_markov_stationary"](spark, sf_dir).collect()
    assert [(r["stationary_share"], r["state"]) for r in got] == exp
    assert [r["pi_fp"] for r in got] == [pi[s] for _, s in exp]
    # total scaled mass is conserved up to integer-floor leakage
    assert 0 < tot <= len(states) * 1_000_000
