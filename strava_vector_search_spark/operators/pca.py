"""Principal component extraction for embedding columns: distributed Gram
aggregate + fixed-iteration power method.

The reference's scale ladder prescribes dimensionality-aware regimes for
vector retrieval (`02_method2_manual_vector_embedding.sql:438-442`); PCA is
the engine-completion companion: the covariance of an embedding corpus is a
d×d matrix obtainable in ONE map-side-combined aggregate (d(d+1)/2 decimal
sums — a monoid, like the linear-probe moments in operators/linear.py), so
the top principal direction costs one scan regardless of corpus size. The
eigen step runs on the aggregate row itself (d² numbers — driver/broadcast
scale), here unrolled as a FIXED number of power iterations in shared
expression text so the DuckDB oracle replays bit-identical IEEE arithmetic
(the PageRank/IRLS unrolled-CTE pattern).

Scale shape at 100 TB: the only distributed work is the Gram aggregate —
partial-combined per partition, shuffling one 44-column decimal row per
partition. Everything after is O(d²) on one row. For d=768 the same design
holds with the aggregate built from `array` outer-product sums and the
eigensolve in numpy on the driver (model-state-is-a-broadcast-row, as with
the linear probe); the d=8 expression-text form exists so the whole
computation is oracle-replayable value-for-value.
"""

from __future__ import annotations

D = 8
ITERS = 6

_IDX = range(D)
_PAIRS = [(i, j) for i in _IDX for j in _IDX if i <= j]


def _c(i: int, j: int) -> str:
    """Covariance cell name (upper-triangle storage, symmetric access)."""
    a, b = (i, j) if i <= j else (j, i)
    return f"c{a}_{b}"


def feat_exprs(one_based: bool) -> list[str]:
    """x_i = round(double(embedding[i]), 6) — the cross-engine float
    contract (6-dp inputs leave guard digits for the decimal cast).
    DuckDB lists are 1-based, Spark arrays 0-based."""
    off = 1 if one_based else 0
    return [
        f"ROUND(CAST(embedding[{i + off}] AS DOUBLE), 6) AS x{i}"
        for i in _IDX
    ]


def gram_exprs() -> list[str]:
    """The one distributed aggregate: exact decimal accumulation so
    partial-agg order can never change the sums (identical engine-side)."""
    out = ["COUNT(*) AS n"]
    for i in _IDX:
        out.append(f"SUM(CAST(x{i} AS DECIMAL(38,12))) AS s{i}")
    for i, j in _PAIRS:
        out.append(f"SUM(CAST(x{i} * x{j} AS DECIMAL(38,12))) AS s{i}_{j}")
    return out


def double_exprs() -> list[str]:
    """Exact decimal sums → one double each (the eigensolve's input)."""
    out = ["CAST(n AS DOUBLE) AS nd"]
    for i in _IDX:
        out.append(f"CAST(s{i} AS DOUBLE) AS d{i}")
    for i, j in _PAIRS:
        out.append(f"CAST(s{i}_{j} AS DOUBLE) AS d{i}_{j}")
    return out


def cov_exprs() -> list[str]:
    """C_ij = (S_ij − S_i·S_j/n)/n, all-double, same text both engines."""
    return [
        f"(d{i}_{j} - d{i} * d{j} / nd) / nd AS c{i}_{j}" for i, j in _PAIRS
    ]


def power_stages() -> list[list[str]]:
    """Fixed-iteration power method as expression stages. Start vector is
    e0 (deterministic); each iteration is w = C v then v = w/‖w‖; the
    stage list is consumed as consecutive SELECT layers (Spark) /
    chained CTEs (DuckDB), so both engines run the identical IEEE ops in
    the identical order."""
    stages: list[list[str]] = []
    stages.append([f"CAST({1 if i == 0 else 0} AS DOUBLE) AS v0_{i}" for i in _IDX])
    for t in range(1, ITERS + 1):
        w = [
            f"({' + '.join(f'{_c(i, j)} * v{t - 1}_{j}' for j in _IDX)})"
            f" AS w{t}_{i}"
            for i in _IDX
        ]
        stages.append(w)
        norm = (
            "SQRT(" + " + ".join(f"w{t}_{i} * w{t}_{i}" for i in _IDX) + ")"
            f" AS nrm{t}"
        )
        stages.append([norm])
        stages.append([f"w{t}_{i} / nrm{t} AS v{t}_{i}" for i in _IDX])
    return stages


def final_exprs() -> list[str]:
    """Rayleigh quotient λ = vᵀCv, explained share λ/trace(C), and the
    sign-fixed 6-dp component vector (flip so component 0 ≥ 0 — a pure
    convention; both engines see the same v, so the same flip)."""
    t = ITERS
    lam = " + ".join(
        f"v{t}_{i} * {_c(i, j)} * v{t}_{j}" for i in _IDX for j in _IDX
    )
    trace = " + ".join(f"c{i}_{i}" for i in _IDX)
    out = [
        "n AS n_vectors",
        f"ROUND({lam}, 6) AS eigenvalue",
        f"ROUND(({lam}) / ({trace}), 6) AS explained_share",
    ]
    sign = f"(CASE WHEN v{t}_0 < 0 THEN -1.0 ELSE 1.0 END)"
    for i in _IDX:
        out.append(f"ROUND({sign} * v{t}_{i}, 6) AS pc{i}")
    return out


def oracle_sql(table: str = "embeddings") -> str:
    """The full DuckDB twin, assembled from the SAME expression text the
    Spark gate executes — value-for-value parity by construction."""
    ctes = [
        f"feats AS (SELECT {', '.join(feat_exprs(one_based=True))} "
        f"FROM {table} WHERE embedding IS NOT NULL)",
        f"g AS (SELECT {', '.join(gram_exprs())} FROM feats)",
        f"gd AS (SELECT n, {', '.join(double_exprs())} FROM g)",
        f"cv AS (SELECT *, {', '.join(cov_exprs())} FROM gd)",
    ]
    prev = "cv"
    for k, stage in enumerate(power_stages()):
        name = f"p{k}"
        ctes.append(f"{name} AS (SELECT *, {', '.join(stage)} FROM {prev})")
        prev = name
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT {', '.join(final_exprs())} "
        f"FROM {prev}"
    )


def covariance_from_gram(row) -> "object":
    """Assemble the dense covariance matrix from one decimal Gram row
    (the aggregate of :func:`gram_exprs`) — the driver-side step of the
    production path: distributed moments, O(d²) local eigensolve."""
    import numpy as np

    n = float(row["n"])
    s = np.array([float(row[f"s{i}"]) for i in _IDX])
    C = np.empty((D, D))
    for i, j in _PAIRS:
        v = (float(row[f"s{i}_{j}"]) - s[i] * s[j] / n) / n
        C[i, j] = C[j, i] = v
    return C


def top_component_dense(row) -> tuple[float, "object"]:
    """Exact top (eigenvalue, component) via a dense symmetric eigensolve
    on the Gram row — the path the engine uses at real dimensionality
    (768d): the aggregate is still one scan; this step is O(d²) driver
    work on a broadcastable row. Sign-fixed like the unrolled gate."""
    import numpy as np

    C = covariance_from_gram(row)
    w, V = np.linalg.eigh(C)
    v = V[:, -1]
    if v[0] < 0:
        v = -v
    return float(w[-1]), v
