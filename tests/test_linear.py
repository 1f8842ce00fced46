"""Closed-form linear probe: coefficients match numpy's lstsq on the same
design matrix, separable data trains to perfect accuracy, and the moment
aggregation is partitioning-invariant."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from strava_vector_search_spark.operators import linear as L


def _feats(spark, rows):
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    return L.feature_frame(df, F.col("x1"), F.col("x2"), F.col("y"))


def test_coefficients_match_numpy(spark):
    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(-1, 1, size=(200, 2)), 6)
    # noisy linear score pushed through a threshold -> 0/1 target
    y = (0.3 + 1.5 * x[:, 0] - 0.8 * x[:, 1] + rng.normal(0, 0.2, 200) > 0.5)
    rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
    out = L.fit_and_score(_feats(spark, rows)).collect()[0]

    X = np.column_stack([np.ones(len(x)), x])
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    assert abs(out["b0"] - beta[0]) < 1e-5
    assert abs(out["b1"] - beta[1]) < 1e-5
    assert abs(out["b2"] - beta[2]) < 1e-5
    assert out["n_train"] == 200
    assert 0.0 <= out["r2"] <= 1.0
    # the LS probe on near-separable data should classify most points
    assert out["train_acc"] > 0.8


def test_separable_data_perfect_accuracy(spark):
    # y = 1 iff x1 > 0, with a wide margin -> LS threshold classifies all.
    # x2 is uncorrelated jitter (a CONSTANT x2 would make the Gram matrix
    # singular — the solve intentionally errors rather than fabricating
    # coefficients; callers drop degenerate features).
    rows = [
        (float(v), round((i % 7) / 10.0 - 0.3, 1), 1.0 if v > 0 else 0.0)
        for i, v in enumerate(np.linspace(-1, 1, 101))
        if abs(v) > 0.3
    ]
    out = L.fit_and_score(_feats(spark, rows)).collect()[0]
    assert out["train_acc"] == 1.0


def test_partitioning_invariant(spark):
    rng = np.random.RandomState(11)
    rows = [
        (round(float(a), 6), round(float(b), 6), float(c))
        for a, b, c in zip(
            rng.uniform(-1, 1, 300),
            rng.uniform(-1, 1, 300),
            rng.randint(0, 2, 300).astype(float),
        )
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    f1 = L.feature_frame(df, F.col("x1"), F.col("x2"), F.col("y"))
    f2 = L.feature_frame(
        df.repartition(13), F.col("x1"), F.col("x2"), F.col("y")
    )
    r1 = L.fit_and_score(f1).collect()[0]
    r2 = L.fit_and_score(f2).collect()[0]
    assert r1.asDict() == r2.asDict()


def _numpy_irls(rows, iterations=2):
    """Pure-numpy replay of logreg_irls' exact semantics (10-dp term
    rounding, decimal-exact sums are plain sums here, 6-dp beta rounds)."""
    import numpy as np

    X = np.array([[1.0, a, b] for a, b, _ in rows])
    y = np.array([c for _, _, c in rows])
    beta = np.zeros(3)
    for _ in range(iterations):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-eta))
        w = np.round(p * (1.0 - p), 10)
        r = np.round(y - p, 10)
        g = np.array(
            [
                r.sum(),
                np.round(X[:, 1] * (y - p), 10).sum(),
                np.round(X[:, 2] * (y - p), 10).sum(),
            ]
        )
        H = np.zeros((3, 3))
        H[0, 0] = w.sum()
        H[0, 1] = H[1, 0] = np.round(X[:, 1] * (p * (1 - p)), 10).sum()
        H[0, 2] = H[2, 0] = np.round(X[:, 2] * (p * (1 - p)), 10).sum()
        H[1, 1] = np.round((X[:, 1] * X[:, 1]) * (p * (1 - p)), 10).sum()
        H[1, 2] = H[2, 1] = np.round((X[:, 1] * X[:, 2]) * (p * (1 - p)), 10).sum()
        H[2, 2] = np.round((X[:, 2] * X[:, 2]) * (p * (1 - p)), 10).sum()
        beta = np.round(beta + np.linalg.solve(H, g), 6)
    return beta


def test_logreg_matches_numpy_replay(spark):
    rng = np.random.RandomState(3)
    x = np.round(rng.uniform(-1, 1, size=(150, 2)), 6)
    y = (0.5 * x[:, 0] - x[:, 1] + rng.normal(0, 0.3, 150) > 0).astype(float)
    rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
    out = L.logreg_irls(_feats(spark, rows), iterations=2).collect()[0]
    beta = _numpy_irls(rows, iterations=2)
    # numpy solve vs Cramer differ only in last-ulp double noise, absorbed
    # by the 6-dp beta rounding in all but boundary cases
    assert abs(out["b0"] - beta[0]) < 2e-6
    assert abs(out["b1"] - beta[1]) < 2e-6
    assert abs(out["b2"] - beta[2]) < 2e-6
    assert out["n_train"] == 150
    assert out["train_acc"] > 0.75
    assert out["log_loss"] > 0.0


def test_logreg_improves_over_iterations(spark):
    rng = np.random.RandomState(5)
    x = np.round(rng.uniform(-1, 1, size=(200, 2)), 6)
    y = (1.2 * x[:, 0] + 0.7 * x[:, 1] > 0).astype(float)
    rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
    f = _feats(spark, rows)
    l1 = L.logreg_irls(f, iterations=1).collect()[0]
    l3 = L.logreg_irls(f, iterations=3).collect()[0]
    assert l3["log_loss"] <= l1["log_loss"]
    assert l3["train_acc"] >= 0.9


def _auc_frame(spark, scores, ys):
    import pandas as pd

    from strava_vector_search_spark.queries import ml_roc_auc  # noqa: F401
    # exercise the same pair-counting pipeline on a prepared (s, yl) frame
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in zip(scores, ys)], "s double, yl long"
    )
    by_score = df.groupBy("s").agg(
        F.sum("yl").alias("np_s"),
        (F.count(F.lit(1)) - F.sum("yl")).alias("nn_s"),
    )
    w = Window.orderBy(F.asc("s")).rowsBetween(Window.unboundedPreceding, -1)
    terms = by_score.select(
        "np_s", "nn_s",
        F.coalesce(F.sum("nn_s").over(w), F.lit(0)).alias("nn_below"),
    )
    row = terms.agg(
        F.sum("np_s").alias("p"), F.sum("nn_s").alias("q"),
        F.sum(F.col("np_s") * (F.lit(2) * F.col("nn_below") + F.col("nn_s"))).alias("num2"),
    ).collect()[0]
    return row["num2"] / (2.0 * row["p"] * row["q"])


def test_auc_pair_counting_identity(spark):
    # perfectly separated
    assert _auc_frame(spark, [0.1, 0.2, 0.8, 0.9], [0, 0, 1, 1]) == 1.0
    # perfectly inverted
    assert _auc_frame(spark, [0.9, 0.8, 0.2, 0.1], [0, 0, 1, 1]) == 0.0
    # all tied -> 0.5 exactly (tie-aware half credit)
    assert _auc_frame(spark, [0.5] * 6, [0, 1, 0, 1, 0, 1]) == 0.5
    # cross-check a mixed case against the O(n^2) definition
    import numpy as np

    rng = np.random.RandomState(2)
    s = np.round(rng.uniform(0, 1, 60), 3)
    y = rng.randint(0, 2, 60)
    pos, neg = s[y == 1], s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).sum()
    expected = wins / (len(pos) * len(neg))
    got = _auc_frame(spark, s, y)
    assert abs(got - expected) < 1e-12


def test_kfold_subtraction_equals_complement_retrain(spark):
    """Each fold's model (trained via total − fold moment subtraction)
    must be bit-identical to solving on the complement rows directly."""
    rng = np.random.RandomState(9)
    rows = [
        (
            int(i % 4),
            round(float(a), 6),
            round(float(b), 6),
            float(c),
        )
        for i, (a, b, c) in enumerate(
            zip(
                rng.uniform(-1, 1, 240),
                rng.uniform(-1, 1, 240),
                (rng.uniform(-1, 1, 240) > 0).astype(float),
            )
        )
    ]
    df = spark.createDataFrame(
        rows, "fold int, x1 double, x2 double, y double"
    )
    cv = {r["fold"]: r for r in L.kfold_cv(df).collect()}
    assert set(cv) == {0, 1, 2, 3}
    for f in range(4):
        comp = df.filter(F.col("fold") != f).select("x1", "x2", "y")
        direct = L.solve_coefficients(L.moment_sums(comp)).collect()[0]
        # subtraction path must reproduce the direct retrain's counts AND
        # coefficients exactly (bit-equality of the monoid algebra): score
        # the fold with the direct model and compare accuracies
        assert (cv[f]["n_train"], cv[f]["n_val"]) == (direct["n"], 60)
        fold_rows = df.filter(F.col("fold") == f)
        n_ok = fold_rows.filter(
            (
                F.lit(direct["b0"])
                + F.lit(direct["b1"]) * F.col("x1")
                + F.lit(direct["b2"]) * F.col("x2")
                >= 0.5
            )
            == (F.col("y") >= 0.5)
        ).count()
        assert cv[f]["val_acc"] == round(n_ok / 60, 6)
    # and the reported models come from those exact coefficients: recompute
    # val accuracy for fold 0 by hand
    f0 = df.filter(F.col("fold") == 0)
    direct = L.solve_coefficients(
        L.moment_sums(df.filter(F.col("fold") != 0).select("x1", "x2", "y"))
    ).collect()[0]
    preds = f0.withColumn(
        "pred",
        F.lit(direct["b0"])
        + F.lit(direct["b1"]) * F.col("x1")
        + F.lit(direct["b2"]) * F.col("x2"),
    )
    n_ok = preds.filter(
        (F.col("pred") >= 0.5) == (F.col("y") >= 0.5)
    ).count()
    assert cv[0]["val_acc"] == round(n_ok / 60, 6)


def test_multiclass_probe_ovr_equals_binary_probes(spark):
    """Each OVR model from the shared-Gram formulation must equal the
    binary probe trained on the same (label==c) target directly."""
    from strava_vector_search_spark.io.tables import load_table
    from strava_vector_search_spark.queries import ml_multiclass_probe

    sf = "/root/testdata/sf0.001"
    rows = {r["label"]: r for r in ml_multiclass_probe(spark, sf).collect()}
    emb = load_table(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    for c in (0, 4, 9):
        feats = L.feature_frame(
            emb,
            F.col("embedding")[0],
            F.col("embedding")[1],
            (F.col("label") == c).cast("int"),
        )
        direct = L.solve_coefficients(L.moment_sums(feats)).collect()[0]
        assert (rows[c]["b0"], rows[c]["b1"], rows[c]["b2"]) == (
            direct["b0"],
            direct["b1"],
            direct["b2"],
        )
    accs = {r["argmax_acc"] for r in rows.values()}
    assert len(accs) == 1
    (acc,) = accs
    assert 0.0 <= acc <= 1.0


def test_loo_target_encoding_semantics(spark):
    """LOO excludes the row's own target; singleton categories give NULL."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 0.0), (3, "a", 1.0), (4, "b", 1.0)],
        "event_id long, event_type string, y double",
    )
    stats = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum(F.col("y").cast("decimal(38,12)")).alias("sum_y"),
    )
    out = {
        r["event_id"]: r["loo"]
        for r in df.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            F.when(
                F.col("n_cat") > 1,
                F.round(
                    (F.col("sum_y").cast("double") - F.col("y"))
                    / (F.col("n_cat") - 1).cast("double"),
                    6,
                ),
            ).alias("loo"),
        )
        .collect()
    }
    assert out[1] == 0.5   # (2 - 1) / 2
    assert out[2] == 1.0   # (2 - 0) / 2
    assert out[3] == 0.5
    assert out[4] is None  # singleton category


def test_als_user_step_matches_numpy_ridge(spark):
    """The closed-form 2x2 ALS solve must equal numpy's ridge solution
    (Y'Y + lambda I) x = Y'r computed from the same ratings and the same
    hash-initialized item factors, per user."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from strava_vector_search_spark.io.tables import load_table
    from strava_vector_search_spark.operators import als as A
    from strava_vector_search_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["custkey"]: r
        for r in QUERIES["ml_als_user_factors"](spark, sf).collect()
    }

    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    ratings = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("r")
        )
        .collect()
    )
    itemf = {}
    for row in ratings:
        i = row["l_partkey"]
        if i not in itemf:
            fr = spark.sql(
                "SELECT ROUND(CAST({h0} % 2000 AS DOUBLE) / 1000.0 - 1.0, 6) AS y0,"
                "       ROUND(CAST({h1} % 2000 AS DOUBLE) / 1000.0 - 1.0, 6) AS y1".format(
                    h0=A.spark_md5i(f"'if0:' || CAST({i} AS STRING)"),
                    h1=A.spark_md5i(f"'if1:' || CAST({i} AS STRING)"),
                )
            ).first()
            itemf[i] = (float(fr["y0"]), float(fr["y1"]))
    by_user: dict = {}
    for row in ratings:
        by_user.setdefault(row["o_custkey"], []).append(
            (itemf[row["l_partkey"]], row["r"])
        )
    checked = 0
    for u in sorted(by_user)[:5]:
        Y = np.array([yf for yf, _ in by_user[u]])
        r = np.array([rv for _, rv in by_user[u]])
        x = np.linalg.solve(Y.T @ Y + A.LAMBDA * np.eye(2), Y.T @ r)
        assert got[u]["x1"] == pytest.approx(x[0], abs=2e-6)
        assert got[u]["x2"] == pytest.approx(x[1], abs=2e-6)
        assert got[u]["n_items"] == len(r)
        checked += 1
    assert checked == 5
