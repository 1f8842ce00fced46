"""Poisson bootstrap confidence intervals — the distributed bootstrap.

Classical bootstrap resampling needs a global multinomial draw (each
resample re-weights every row against the corpus SIZE — driver state). The
Poisson bootstrap replaces it with an i.i.d. per-(row, resample) weight
w ~ Poisson(1): each partition draws its own weights with no coordination,
which is the only bootstrap shape that survives 100 TB (one map-only pass
per resample batch, one partial-combined aggregate; resamples ride along
as a crossed B-column, never as data copies).

Weights come from the portable md5 hash through the inverse Poisson(1)
CDF (no RNG — deterministic across engines, partitionings, and retries,
the repo convention), so the whole computation is value-for-value
oracle-replayable: the SQL below is SHARED TEXT between the Spark gate
and the DuckDB twin; only the md5→bigint idiom and the 1..B series
generator differ per engine. All bootstrap sums are INTEGER (weights ×
integer metric), so there is no float-order hazard at all; the single
double division happens per resample mean.
"""

from __future__ import annotations

B = 100

# cumulative Poisson(1) CDF at k = 0..6 (e^-1 * sum 1/i!), 10 dp — enough
# that P(w > 7) < 1e-10 at the hash's 1e-6 resolution
_POISSON_CUM = [
    "0.3678794412",
    "0.7357588823",
    "0.9196986029",
    "0.9810118431",
    "0.9963401532",
    "0.9994058151",
    "0.9999167589",
]


def _w_case() -> str:
    arms = " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POISSON_CUM)
    )
    return f"CASE {arms} ELSE 7 END"


def bootstrap_ci_sql(md5i, series_sql: str, table: str = "documents") -> str:
    """Mean document length with a 95% Poisson-bootstrap CI (B=100):
    per-(doc, b) hash-uniform u → Poisson(1) weight, integer-exact
    weighted sums per resample, CI from the order statistics of the B
    resample means (indices 3 and 98 of 100 — conventional 2.5%/97.5%
    cut points for B=100, ties broken by b)."""
    key = "'bs:' || CAST(doc_id AS STRING) || ':' || CAST(b AS STRING)"
    u = f"(({md5i(key)}) % 1000000) / 1000000.0"
    return f"""
WITH rows_t AS (
  SELECT doc_id, LENGTH(text) AS x FROM {table} WHERE text IS NOT NULL
),
g AS (
  SELECT r.doc_id, r.x, s.b FROM rows_t r CROSS JOIN ({series_sql}) s
),
wt AS (
  SELECT doc_id, x, b, {_w_case()} AS w
  FROM (SELECT doc_id, x, b, {u} AS u FROM g)
),
means AS (
  SELECT b, ROUND(CAST(SUM(w * x) AS DOUBLE) / SUM(w), 6) AS m
  FROM wt GROUP BY b
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means
)
SELECT
  (SELECT COUNT(*) FROM rows_t) AS n_docs,
  {B} AS n_boot,
  (SELECT ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) FROM rows_t)
    AS mean_len,
  MAX(CASE WHEN rn = 3 THEN m END) AS ci_lo,
  MAX(CASE WHEN rn = 98 THEN m END) AS ci_hi
FROM ranked
"""
