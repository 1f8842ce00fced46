"""Shared expression text for the corpus/forensic statistics gates.

Each constant is a SQL fragment that parses IDENTICALLY in Spark SQL and
DuckDB; both `queries.py` and `oracles.py` import it, so the two engines
evaluate byte-identical IEEE expression trees (the DET_EXPRS /
_PROBE_COEF_CTES convention from operators/linear.py).

Reference anchor: these extend the reference's verification-query style
(e.g. 02_method2_manual_vector_embedding.sql:373-389 histogram audit)
with the statistics a 100 TB curation pipeline actually reports.
"""

from __future__ import annotations

# Interpolated Kneser-Ney bigram probability with absolute discount
# D = 0.75 (exact in binary: 3/4).  Inputs are the four integer counts the
# distributed aggregates produce:
#   c12            bigram count
#   c1             context mass  SUM(c12) over w2   (left marginal)
#   n_follow       distinct continuations of w1     N1+(w1 .)
#   n_precede      distinct left contexts of w2     N1+(. w2)
#   n_bigram_types distinct bigram types            |{(w1,w2)}|
# pkn = max(c12-D,0)/c1 + (D*n_follow/c1) * (n_precede/n_bigram_types)
KN_PKN_EXPR = (
    "ROUND("
    "GREATEST(CAST(c12 AS DOUBLE) - 0.75, CAST(0 AS DOUBLE))"
    " / CAST(c1 AS DOUBLE)"
    " + (0.75 * CAST(n_follow AS DOUBLE) / CAST(c1 AS DOUBLE))"
    " * (CAST(n_precede AS DOUBLE) / CAST(n_bigram_types AS DOUBLE))"
    ", 6)"
)

# Benford first-digit expectation p_d = log10(1 + 1/d), rounded before any
# arithmetic built on it so both engines agree bit-for-bit downstream.
BENFORD_P_EXPR = "ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 10)"

# Closed-form OLS over the (x, y) = (ln rank, ln count) moment sums --
# the Zipf log-log fit.  Inputs: np_, sx, sy, sxy, sxx, syy (all DOUBLE).
ZIPF_SLOPE_EXPR = "((np_ * sxy - sx * sy) / (np_ * sxx - sx * sx))"
ZIPF_INTERCEPT_EXPR = (
    f"((sy - {ZIPF_SLOPE_EXPR} * sx) / np_)"
)
ZIPF_R2_EXPR = (
    "((np_ * sxy - sx * sy) * (np_ * sxy - sx * sy)"
    " / ((np_ * sxx - sx * sx) * (np_ * syy - sy * sy)))"
)

# Naive-Bayes per-occurrence log-likelihood term (Laplace add-1 over the
# class token mass + global vocab size), rounded to 10 dp BEFORE the
# decimal accumulation so the sum is order-insensitive; COALESCE covers
# tokens never seen with the class.
NB_TERM_EXPR = (
    "ROUND(CAST(occ AS DOUBLE)"
    " * LN(CAST(COALESCE(cnt, 0) + 1 AS DOUBLE)"
    "      / CAST(tot + v AS DOUBLE)), 10)"
)

# Class log-prior ln(n_docs_c / n_docs), same rounding contract.
NB_PRIOR_EXPR = (
    "ROUND(LN(CAST(n_docs_c AS DOUBLE) / CAST(n_docs AS DOUBLE)), 10)"
)

# Order-insensitive fold of the rounded terms (both engines: DECIMAL
# accumulation, double only at the very end).
DEC_SUM = "CAST(SUM(CAST({t} AS DECIMAL(38,12))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Round-5 continued: inference-test and concentration shared expression text.
# Each fragment parses identically in Spark SQL and DuckDB; formulas that
# need integer division (DIV vs //) stay engine-local in queries.py/oracles.py.
# ---------------------------------------------------------------------------

# Sample mean / unbiased variance from DECIMAL-routed moments
# (n_{a}, sy_{a}, syy_{a}); format with a="a" / a="b" for the two arms.
MOMENT_MEAN = "ROUND(CAST(sy_{a} AS DOUBLE) / CAST(n_{a} AS DOUBLE), 6)"
MOMENT_VAR = (
    "ROUND((CAST(syy_{a} AS DOUBLE)"
    " - CAST(sy_{a} AS DOUBLE) * CAST(sy_{a} AS DOUBLE)"
    " / CAST(n_{a} AS DOUBLE)) / CAST(n_{a} - 1 AS DOUBLE), 6)"
)

# Welch's unequal-variance t-test from (m_a, v_a, n_a, m_b, v_b, n_b);
# df is the Welch-Satterthwaite approximation.  SQRT is IEEE
# correctly-rounded in both engines, so the rounded inputs make the
# outputs bit-identical.
_WELCH_SE2 = "(v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))"
WELCH_T_EXPR = f"ROUND((m_a - m_b) / SQRT({_WELCH_SE2}), 6)"
WELCH_DF_EXPR = (
    f"ROUND({_WELCH_SE2} * {_WELCH_SE2} / ("
    "(v_a / CAST(n_a AS DOUBLE)) * (v_a / CAST(n_a AS DOUBLE))"
    " / CAST(n_a - 1 AS DOUBLE)"
    " + (v_b / CAST(n_b AS DOUBLE)) * (v_b / CAST(n_b AS DOUBLE))"
    " / CAST(n_b - 1 AS DOUBLE)), 6)"
)

# Mann-Whitney U with tie correction, computed from the distinct-value
# kernel: u1x2 = 2*U1 (exact BIGINT), st3 = sum of (t^3 - t) over tie
# groups, n_tot = n_a + n_b.  Normal approximation, no continuity
# correction (documented gate contract).
MW_U1_EXPR = "(CAST(u1x2 AS DOUBLE) / 2.0)"
_MW_MU = "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)"
_MW_VAR = (
    "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0"
    " * (CAST(n_tot + 1 AS DOUBLE)"
    " - CAST(st3 AS DOUBLE)"
    " / (CAST(n_tot AS DOUBLE) * CAST(n_tot - 1 AS DOUBLE))))"
)
MW_Z_EXPR = f"ROUND(({MW_U1_EXPR} - {_MW_MU}) / SQRT({_MW_VAR}), 6)"

# Chi-square cell machinery: expectation from the broadcast margins and
# the 10 dp-rounded cell term (order-insensitive DECIMAL fold downstream).
CHI2_E_EXPR = (
    "(CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)"
    " / CAST(n_tot AS DOUBLE))"
)
CHI2_TERM_EXPR = (
    f"ROUND((CAST(n_obs AS DOUBLE) - {CHI2_E_EXPR})"
    f" * (CAST(n_obs AS DOUBLE) - {CHI2_E_EXPR}) / {CHI2_E_EXPR}, 10)"
)

# Gini coefficient from the sorted-rank identity
# G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)); swx/sx arrive as exact
# DECIMALs, the division is the only double step.
GINI_EXPR = (
    "ROUND((2.0 * CAST(swx AS DOUBLE)"
    " - CAST(n_c + 1 AS DOUBLE) * CAST(sx AS DOUBLE))"
    " / (CAST(n_c AS DOUBLE) * CAST(sx AS DOUBLE)), 6)"
)
