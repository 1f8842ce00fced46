"""Distributed linear-model training via exact normal equations.

A quality-classifier training loop is part of any serious curation
pipeline (`functions/text.tx_hash_classifier` SERVES a hashed linear model
at scan speed; this module TRAINS one). For linear least squares the
scalable recipe at 100 TB is not SGD — it is the **normal equations**: the
entire dataset folds into a tiny Gram matrix of feature moments
(``X'X`` and ``X'y``) with ONE map-side-combined aggregate, and the solve
is O(p³) driver-side math on a handful of numbers. No iterations, no
second pass over the data for the fit, no parameter server.

Determinism contract (matches the repo-wide oracle conventions,
``queries.py`` module docstring): the moment sums accumulate in DECIMAL
(exact, order-insensitive — double partial sums would differ between
Spark's partial-aggregation order and DuckDB's single-node order), are
cast to double once, and the 3x3 Cramer solve is written as the *same
expression text* in both engines so each performs the identical IEEE
evaluation. Coefficients are rounded to 6 dp BEFORE the scoring pass, so
the train-accuracy comparison is against bit-identical predictions.

Least-squares probes over embeddings ("linear probing") are the standard
cheap read-out of representation quality; the one-vs-rest 0/1 target makes
this the LS analogue of the fastText-style classifier the serving path
uses. Reference scope: none — engine completion (SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Cramer's rule for A·b = v, A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],
# v = [sy,s1y,s2y]. The same text is compiled by Spark AND DuckDB (the
# oracle embeds it verbatim) so the IEEE evaluation trees are identical.
DET_EXPRS = {
    "det": (
        "n_d * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2)"
    ),
    "det0": (
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s2y * s12)"
        " + s2 * (s1y * s12 - s2y * s11)"
    ),
    "det1": (
        "n_d * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2)"
    ),
    "det2": (
        "n_d * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2)"
    ),
}


def feature_frame(
    df: DataFrame, x1: Column, x2: Column, y: Column
) -> DataFrame:
    """Project to 6-dp-rounded doubles (the cross-engine float contract:
    rounding first leaves ~10 guard digits, so the later double→decimal
    cast agrees between engines)."""
    return df.select(
        F.round(x1.cast("double"), 6).alias("x1"),
        F.round(x2.cast("double"), 6).alias("x2"),
        y.cast("double").alias("y"),
    )


MOMENT_COLS = ("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")


def _moment_agg_cols() -> list[Column]:
    """The ONE definition of the nine Gram-moment aggregate columns —
    shared by the global, per-fold, and streaming paths so the monoid
    identities (merge == recompute, total − fold == complement) can never
    drift between hand-maintained copies."""

    def dsum(expr: Column, name: str) -> Column:
        return F.sum(expr.cast("decimal(38,12)")).alias(name)

    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    return [
        F.count(F.lit(1)).alias("n"),
        dsum(x1, "s1"),
        dsum(x2, "s2"),
        dsum(y, "sy"),
        dsum(x1 * x1, "s11"),
        dsum(x1 * x2, "s12"),
        dsum(x2 * x2, "s22"),
        dsum(x1 * y, "s1y"),
        dsum(x2 * y, "s2y"),
    ]


def moment_sums_decimal(feats: DataFrame) -> DataFrame:
    """One map-side-combined aggregate → the full Gram matrix, kept in
    DECIMAL(38,12). Decimal addition is exact and order-insensitive, so
    these rows form a MONOID: per-partition (or per-micro-batch) moment
    rows merged with ``merge_moment_states`` equal the single-pass
    aggregate bit-for-bit — the property the streaming model-maintenance
    path (streaming/model_stream.py) is built on."""
    return feats.agg(*_moment_agg_cols())


def merge_moment_states(states: DataFrame) -> DataFrame:
    """Fold any number of decimal moment rows into one — exact, so
    merge(recompute(parts)) == recompute(whole)."""
    return states.agg(
        F.sum("n").cast("bigint").alias("n"),
        *[F.sum(c).alias(c) for c in MOMENT_COLS],
    )


def moments_to_double(m: DataFrame) -> DataFrame:
    """Exact decimal sums → one double per moment (the solve's input)."""
    return m.select(
        "n", *[F.col(c).cast("double").alias(c) for c in MOMENT_COLS]
    )


def moment_sums(feats: DataFrame) -> DataFrame:
    """One map-side-combined aggregate → the full Gram matrix (exact
    DECIMAL accumulation, order-insensitive), cast to double for the
    solve."""
    return moments_to_double(moment_sums_decimal(feats))


def ridge_dets(lam: str) -> dict[str, str]:
    """Cramer determinant text for RIDGE normal equations: the slope
    diagonal gets + lam*n (scale-free penalty; the intercept stays
    unpenalized), produced by textual substitution into DET_EXPRS so the
    whole regularization PATH reuses one Gram aggregate — sweeping a
    hyperparameter never rescans the data. `lam` is a literal kept as
    TEXT so Spark and DuckDB parse the identical constant."""
    return {
        k: v.replace("s11", f"(s11 + {lam} * n_d)").replace(
            "s22", f"(s22 + {lam} * n_d)"
        )
        for k, v in DET_EXPRS.items()
    }


def solve_coefficients(moments: DataFrame) -> DataFrame:
    """Cramer solve of the 3-unknown normal equations; coefficients
    rounded to 6 dp (they are inputs to the scoring pass — rounding first
    pins cross-engine prediction parity)."""
    m = moments.withColumn("n_d", F.col("n").cast("double"))
    for name, text in DET_EXPRS.items():
        m = m.withColumn(name, F.expr(text))
    return m.select(
        "n",
        "sy",
        F.round(F.expr("det0 / det"), 6).alias("b0"),
        F.round(F.expr("det1 / det"), 6).alias("b1"),
        F.round(F.expr("det2 / det"), 6).alias("b2"),
    )


def fit_and_score(feats: DataFrame) -> DataFrame:
    """Train (one aggregate) then score the training set (one more scan
    with the 1-row coefficient table broadcast): train accuracy at the 0.5
    threshold, SSE → R². Returns ONE row:
    (n_train, b0, b1, b2, train_acc, r2)."""
    coef = solve_coefficients(moment_sums(feats))
    scored = feats.crossJoin(F.broadcast(coef)).withColumn(
        "pred", F.expr("b0 + b1 * x1 + b2 * x2")
    )
    # y is 0/1 so SST folds to sy - sy^2/n without a second moment
    return (
        scored.groupBy("n", "sy", "b0", "b1", "b2")
        .agg(
            F.sum(
                F.when(
                    (F.col("pred") >= 0.5) == (F.col("y") >= 0.5), 1
                ).otherwise(0)
            ).alias("n_correct"),
            F.sum(
                F.expr("cast(round((y - pred) * (y - pred), 10) as decimal(38,12))")
            )
            .cast("double")
            .alias("sse"),
        )
        .select(
            F.col("n").alias("n_train"),
            "b0",
            "b1",
            "b2",
            F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias(
                "train_acc"
            ),
            F.round(
                F.lit(1.0)
                - F.col("sse")
                / F.expr("sy - sy * sy / cast(n as double)"),
                6,
            ).alias("r2"),
        )
    )


# ---------------------------------------------------------------------------
# logistic regression via IRLS / Newton (Fisher scoring)
#
# The scalable logreg recipe mirrors the normal equations above: each
# iteration folds the dataset into a 3-vector gradient and 3x3 Hessian with
# ONE map-side-combined aggregate (per-row terms rounded to 10 dp then
# DECIMAL-accumulated — exact, order-insensitive), and the Newton step is a
# Cramer solve on nine numbers. Two iterations from beta = 0 reach useful
# coefficients (IRLS converges quadratically); the iteration count is part
# of the operator contract so the DuckDB oracle can unroll it.

SIGMOID_EXPR = "1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))"

# per-row aggregate terms, shared verbatim with the oracle
ROW_TERMS = {
    "g0": "y - p",
    "g1": "x1 * (y - p)",
    "g2": "x2 * (y - p)",
    "h00": "p * (1.0 - p)",
    "h01": "x1 * (p * (1.0 - p))",
    "h02": "x2 * (p * (1.0 - p))",
    "h11": "(x1 * x1) * (p * (1.0 - p))",
    "h12": "(x1 * x2) * (p * (1.0 - p))",
    "h22": "(x2 * x2) * (p * (1.0 - p))",
}

# Cramer solve of H·delta = g for the symmetric 3x3 Hessian
NEWTON_DETS = {
    "det": (
        "h00 * (h11 * h22 - h12 * h12) - h01 * (h01 * h22 - h12 * h02)"
        " + h02 * (h01 * h12 - h11 * h02)"
    ),
    "d0": (
        "g0 * (h11 * h22 - h12 * h12) - h01 * (g1 * h22 - h12 * g2)"
        " + h02 * (g1 * h12 - h11 * g2)"
    ),
    "d1": (
        "h00 * (g1 * h22 - h12 * g2) - g0 * (h01 * h22 - h12 * h02)"
        " + h02 * (h01 * g2 - g1 * h02)"
    ),
    "d2": (
        "h00 * (h11 * g2 - g1 * h12) - h01 * (h01 * g2 - g1 * h02)"
        " + g0 * (h01 * h12 - h11 * h02)"
    ),
}

LOGLOSS_EXPR = "-(y * ln(p) + (1.0 - y) * ln(1.0 - p))"


def _dsum_term(text: str, name: str) -> Column:
    return (
        F.sum(F.expr(f"cast(round({text}, 10) as decimal(38,12))"))
        .cast("double")
        .alias(name)
    )


def logreg_irls(feats: DataFrame, iterations: int = 2) -> DataFrame:
    """Train 0/1 logistic regression on (x1, x2, y) by ``iterations``
    Newton steps from beta = 0; returns ONE row
    (n_train, b0, b1, b2, train_acc, log_loss). Coefficients are rounded
    to 6 dp after every step (the cross-engine prediction contract)."""
    spark = feats.sparkSession
    beta = spark.createDataFrame(
        [(0.0, 0.0, 0.0)], "b0 double, b1 double, b2 double"
    )
    for _ in range(iterations):
        scored = feats.crossJoin(F.broadcast(beta)).withColumn(
            "p", F.expr(SIGMOID_EXPR)
        )
        agg = scored.groupBy("b0", "b1", "b2").agg(
            *[_dsum_term(text, name) for name, text in ROW_TERMS.items()]
        )
        for name, text in NEWTON_DETS.items():
            agg = agg.withColumn(name, F.expr(text))
        beta = agg.select(
            F.round(F.expr("b0 + d0 / det"), 6).alias("b0"),
            F.round(F.expr("b1 + d1 / det"), 6).alias("b1"),
            F.round(F.expr("b2 + d2 / det"), 6).alias("b2"),
        )
    final = feats.crossJoin(F.broadcast(beta)).withColumn(
        "p", F.expr(SIGMOID_EXPR)
    )
    return (
        final.groupBy("b0", "b1", "b2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when((F.col("p") >= 0.5) == (F.col("y") >= 0.5), 1).otherwise(0)
            ).alias("n_correct"),
            _dsum_term(LOGLOSS_EXPR, "nll"),
        )
        .select(
            F.col("n").alias("n_train"),
            "b0",
            "b1",
            "b2",
            F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias(
                "train_acc"
            ),
            F.round(F.col("nll") / F.col("n").cast("double"), 6).alias(
                "log_loss"
            ),
        )
    )


# ---------------------------------------------------------------------------
# k-fold cross-validation by moment subtraction
#
# Because the Gram moments are a monoid (see moment_sums_decimal), the
# complement-of-fold moments are total − fold: k leave-one-fold-out models
# train from ONE grouped aggregate over the data — no per-fold passes, no
# resampling. The subtraction is exact decimal arithmetic, so each fold's
# model is bit-identical to retraining on the complement from scratch.


def fold_moment_sums(feats_with_fold: DataFrame) -> DataFrame:
    """Per-fold decimal Gram moments — one map-side-combined aggregate
    over the same shared column definitions as the global path."""
    return feats_with_fold.groupBy("fold").agg(*_moment_agg_cols())


def kfold_cv(feats_with_fold: DataFrame) -> DataFrame:
    """Leave-one-fold-out CV of the LS probe: per fold, train on the
    complement via moment subtraction, validate on the fold. Returns one
    row per fold: (fold, n_train, n_val, val_acc), fold ascending."""
    pf = fold_moment_sums(feats_with_fold).localCheckpoint(eager=False)
    tot = pf.agg(
        F.sum("n").cast("bigint").alias("tn"),
        *[F.sum(c).alias(f"t{c}") for c in MOMENT_COLS],
    )
    comp = pf.crossJoin(F.broadcast(tot)).select(
        "fold",
        F.col("n").alias("n_val"),
        (F.col("tn") - F.col("n")).cast("bigint").alias("n_train"),
        *[
            (F.col(f"t{c}") - F.col(c)).cast("double").alias(c)
            for c in MOMENT_COLS
        ],
    )
    m = comp.withColumn("n_d", F.col("n_train").cast("double"))
    for name, text in DET_EXPRS.items():
        # DET_EXPRS reference the global count as n_d — set above
        m = m.withColumn(name, F.expr(text))
    models = m.select(
        "fold",
        "n_train",
        "n_val",
        F.round(F.expr("det0 / det"), 6).alias("b0"),
        F.round(F.expr("det1 / det"), 6).alias("b1"),
        F.round(F.expr("det2 / det"), 6).alias("b2"),
    )
    scored = feats_with_fold.join(F.broadcast(models), "fold").withColumn(
        "pred", F.expr("b0 + b1 * x1 + b2 * x2")
    )
    return (
        scored.groupBy("fold", "n_train", "n_val")
        .agg(
            F.sum(
                F.when(
                    (F.col("pred") >= 0.5) == (F.col("y") >= 0.5), 1
                ).otherwise(0)
            ).alias("n_correct")
        )
        .select(
            "fold",
            "n_train",
            "n_val",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_val"), 6
            ).alias("val_acc"),
        )
        .orderBy("fold")
    )
