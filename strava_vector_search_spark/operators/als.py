"""Rank-2 ALS (alternating least squares) recommender step, closed form.

Engine completion for the recommender workload the reference's retrieval
stack sits next to (similar-item retrieval is `g_item_similarity`; this is
the factor-model counterpart). The 100 TB-honest formulation of ALS is the
same shape as the linear probe (`operators/linear.py`): each user's factor
solve needs only the per-user SUFFICIENT STATISTICS of the items they
touched — for rank 2 that is five decimal sums (Y'Y and Y'r entries), ONE
map-side-combined groupBy aggregate — and the 2×2 ridge solve
(Y'Y + λI)⁻¹ Y'r is closed-form expression math. One alternation step is
therefore: broadcast-join item factors onto the ratings, one aggregate,
one projection. Iterating alternates the same two steps with roles
swapped; factors stay "a table you join", never driver state.

Item factors are initialized from the portable md5 hash (deterministic
across engines, partitionings, and retries — the repo's no-RNG
convention), so the whole step is value-for-value oracle-replayable: the
algebra below is SHARED TEXT between the Spark gate and the DuckDB twin;
only the md5→bigint idiom differs per engine.
"""

from __future__ import annotations

LAMBDA = 0.1

# per-engine md5 → positive bigint (first 15 hex digits)


def spark_md5i(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duck_md5i(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def als_user_step_sql(md5i, lineitem: str = "lineitem", orders: str = "orders") -> str:
    """One ALS user-step as SQL over views `lineitem` + `orders`,
    parameterized ONLY by the engine's md5→bigint idiom. Ratings are
    summed purchase quantities (DECIMAL-routed); item factors are
    6-dp-rounded hash values in [-1, 1); the five sufficient statistics
    accumulate in DECIMAL(38,12); the ridge solve runs in doubles."""
    h0 = md5i("'if0:' || CAST(i AS STRING)")
    h1 = md5i("'if1:' || CAST(i AS STRING)")
    lam = f"{LAMBDA}"
    return f"""
WITH ratings AS (
  SELECT o.o_custkey AS u, l.l_partkey AS i,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS r
  FROM {lineitem} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_partkey
),
items AS (SELECT DISTINCT i FROM ratings),
itemf AS (
  SELECT i,
         ROUND(CAST(({h0}) % 2000 AS DOUBLE) / 1000.0 - 1.0, 6) AS y0,
         ROUND(CAST(({h1}) % 2000 AS DOUBLE) / 1000.0 - 1.0, 6) AS y1
  FROM items
),
joined AS (
  SELECT r.u, r.r, f.y0, f.y1
  FROM ratings r JOIN itemf f ON r.i = f.i
),
stats AS (
  SELECT u,
         COUNT(*) AS n_items,
         SUM(CAST(y0 * y0 AS DECIMAL(38,12))) AS a11,
         SUM(CAST(y0 * y1 AS DECIMAL(38,12))) AS a12,
         SUM(CAST(y1 * y1 AS DECIMAL(38,12))) AS a22,
         SUM(CAST(y0 * r  AS DECIMAL(38,12))) AS b1,
         SUM(CAST(y1 * r  AS DECIMAL(38,12))) AS b2
  FROM joined
  GROUP BY u
),
d AS (
  SELECT u, n_items,
         CAST(a11 AS DOUBLE) AS a11, CAST(a12 AS DOUBLE) AS a12,
         CAST(a22 AS DOUBLE) AS a22,
         CAST(b1 AS DOUBLE) AS b1, CAST(b2 AS DOUBLE) AS b2
  FROM stats
),
solved AS (
  SELECT u, n_items,
         ((a22 + {lam}) * b1 - a12 * b2)
           / ((a11 + {lam}) * (a22 + {lam}) - a12 * a12) AS x1,
         ((a11 + {lam}) * b2 - a12 * b1)
           / ((a11 + {lam}) * (a22 + {lam}) - a12 * a12) AS x2
  FROM d
)
SELECT u AS custkey, n_items,
       ROUND(x1, 6) AS x1, ROUND(x2, 6) AS x2
FROM solved
ORDER BY custkey
"""
