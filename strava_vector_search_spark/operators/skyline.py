"""2-D skyline (Pareto frontier) operator: minimize one column, maximize
the other, without the quadratic dominance self-join.

Formulation (linear, window-based): fold to per-level aggregates on the
minimized column (max of the maximized column per distinct value), one
cumulative window over that bounded level table yields the best maximized
value among all strictly-better levels, and a point survives iff it is its
level's max AND beats every strictly-better level.  Equivalent to the
brute-force NOT EXISTS dominance definition (pinned by the w_skyline_2d
oracle and tests/test_round5b.py).

Scale properties:
- corpus-scale work is ONE partial-combined aggregate (per-level max);
- the window runs over the |distinct price|-bounded level table;
- the frontier is MERGEABLE: skyline(A ∪ B) == skyline(skyline(A) ∪
  skyline(B)) — the property streaming/skyline_stream.py maintains a live
  frontier with, and the 1000-executor path (per-partition local skyline,
  then frontier-of-frontiers; ties on both dimensions all survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame, min_col: str, max_col: str
) -> DataFrame:
    """Rows not dominated under (min ``min_col``, max ``max_col``).

    A row p is dominated iff some q has q.min <= p.min and q.max >= p.max
    with at least one strict. Points tied on BOTH dimensions survive
    together (neither dominates). Output keeps all input columns.

    NULL contract: dominance is undefined on NULL coordinates, so rows
    with a NULL in either dimension are excluded up front (otherwise the
    NULL level would sort first under Spark's NULLS FIRST and its max
    would poison ``_prevmax`` for every real level while the NULL rows
    themselves vanish in the equi-join — a silently wrong frontier).
    """
    df = df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
    levels = df.groupBy(min_col).agg(F.max(max_col).alias("_lmax"))
    wprev = Window.orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lv = levels.withColumn("_prevmax", F.max("_lmax").over(wprev))
    # No forced broadcast (ADVICE r05): the level table is bounded by
    # |distinct min_col|, which for a continuous minimized column can
    # approach full-table size — AQE broadcasts it when it is actually
    # small and falls back to a shuffle join when it is not, instead of
    # blowing the driver's broadcast limit at scale.
    return (
        df.join(lv, min_col)
        .filter(
            (F.col(max_col) == F.col("_lmax"))
            & (
                F.col("_prevmax").isNull()
                | (F.col("_prevmax") < F.col(max_col))
            )
        )
        .drop("_lmax", "_prevmax")
    )
