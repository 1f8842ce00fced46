"""Declarative data-quality expectations — the constraint-check pass a
training-data ingestion pipeline runs before (and after) every transform
stage. Modeled on the expectation-suite idea (dbt tests / Deequ-style
checks), expressed Spark-first:

* **row-level checks** (not_null, accepted_values, in_range, matches) fold
  into ONE aggregate per table — a SUM(CASE) per check, map-side combined,
  so N checks on a table cost one scan regardless of N.
* **uniqueness** is a groupBy on the key with a HAVING count>1 — partial
  aggregation makes the shuffle carry only distinct keys.
* **referential integrity** is a LEFT ANTI join child→parent on the key —
  broadcast when the parent is a dim, shuffle-hash otherwise (Catalyst's
  size-based choice; no hint needed).

The report is one tiny row per check: ``(table, check, column, violations,
total, pass)`` — driver-safe at any scale because every leg aggregates
before it unions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind`` ∈ {not_null, accepted_values, in_range,
    matches, unique, foreign_key}."""

    kind: str
    column: str
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    ref: str | None = None  # parent table name (foreign_key)
    ref_column: str | None = None


def not_null(column: str) -> Check:
    return Check("not_null", column)


def accepted_values(column: str, values: Sequence) -> Check:
    return Check("accepted_values", column, values=tuple(values))


def in_range(column: str, lo: float, hi: float) -> Check:
    return Check("in_range", column, lo=lo, hi=hi)


def matches(column: str, pattern: str) -> Check:
    """Full-match regex expectation (nulls don't violate — pair with
    not_null when they should)."""
    return Check("matches", column, pattern=pattern)


def unique(column: str) -> Check:
    return Check("unique", column)


def foreign_key(column: str, ref: str, ref_column: str) -> Check:
    return Check("foreign_key", column, ref=ref, ref_column=ref_column)


def _violation(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "accepted_values":
        return col.isNotNull() & ~col.isin(*c.values)
    if c.kind == "in_range":
        return col.isNotNull() & ~col.between(F.lit(c.lo), F.lit(c.hi))
    if c.kind == "matches":
        return col.isNotNull() & ~col.rlike(c.pattern)
    raise ValueError(f"not a row-level check: {c.kind}")


def expectation_report(
    tables: dict[str, DataFrame], suite: dict[str, Sequence[Check]]
) -> DataFrame:
    """Run ``suite`` (table name → checks) and return the per-check report,
    sorted (table, check, column)."""
    legs: list[DataFrame] = []
    for tname, checks in suite.items():
        df = tables[tname]
        row_level = [c for c in checks if c.kind not in ("unique", "foreign_key")]
        if row_level:
            agg = df.agg(
                F.count(F.lit(1)).alias("_total"),
                *[
                    F.sum(_violation(c).cast("long")).alias(f"_v{i}")
                    for i, c in enumerate(row_level)
                ],
            )
            for i, c in enumerate(row_level):
                legs.append(
                    agg.select(
                        F.lit(tname).alias("table"),
                        F.lit(c.kind).alias("check"),
                        F.lit(c.column).alias("column"),
                        F.col(f"_v{i}").alias("violations"),
                        F.col("_total").alias("total"),
                    )
                )
        for c in checks:
            if c.kind == "unique":
                dup = (
                    df.groupBy(c.column)
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .filter(F.col("_n") > 1)
                    .agg(
                        F.coalesce(F.sum("_n"), F.lit(0)).alias("violations"),
                    )
                )
                total = df.agg(F.count(F.lit(1)).alias("total"))
                legs.append(
                    dup.crossJoin(total).select(
                        F.lit(tname).alias("table"),
                        F.lit("unique").alias("check"),
                        F.lit(c.column).alias("column"),
                        "violations",
                        "total",
                    )
                )
            elif c.kind == "foreign_key":
                parent = tables[c.ref]
                orphans = df.filter(F.col(c.column).isNotNull()).join(
                    parent.select(F.col(c.ref_column).alias(c.column)),
                    c.column,
                    "left_anti",
                )
                legs.append(
                    orphans.agg(F.count(F.lit(1)).alias("violations"))
                    .crossJoin(df.agg(F.count(F.lit(1)).alias("total")))
                    .select(
                        F.lit(tname).alias("table"),
                        F.lit("foreign_key").alias("check"),
                        F.lit(c.column).alias("column"),
                        "violations",
                        "total",
                    )
                )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.withColumn("pass", F.col("violations") == 0).orderBy(
        "table", "check", "column"
    )
