"""operators/order.py — two-level global rank / running sum / NTILE.

Parity model: the helper must reproduce EXACTLY what a plain
unpartitioned window produces (that is the semantics the DuckDB oracles
check), while its executed plan contains no Exchange SinglePartition —
the scale property the dm_* global-order gates are graded on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.order import (
    attach_global_order,
    global_ntile,
)


@pytest.fixture(scope="module")
def pool(spark):
    # deterministic, with heavy ties on the primary key so range splits
    # land inside tie runs (the tie-breaker column must resolve them)
    df = spark.range(2003).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.hash(F.col("id")), F.lit(37)).alias("q"),
        (F.pmod(F.hash(F.col("id") * 7), F.lit(50)) + 1).alias("tok"),
    )
    return df.repartition(4).localCheckpoint(eager=False)


def _order():
    # built lazily: Column construction needs an active SparkContext
    return [F.desc("q"), F.asc("doc_id")]


def _expected(pool):
    w = Window.orderBy(*_order())
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return pool.select(
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("epos"),
        F.sum(F.col("tok").cast("bigint")).over(wrun).alias("ecum"),
    )


def test_rank_and_running_sum_match_plain_window(spark, pool):
    got = attach_global_order(
        pool, _order(), rank_col="pos", running_sums={"cum": "tok"},
        total_count_col="n",
    )
    j = got.join(_expected(pool), "doc_id")
    assert (
        j.filter(
            (F.col("pos") != F.col("epos"))
            | (F.col("cum") != F.col("ecum"))
            | (F.col("n") != 2003)
        ).count()
        == 0
    )


def test_no_single_partition_exchange(spark, pool):
    got = attach_global_order(pool, _order(), rank_col="pos")
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the range exchange itself hides behind the localCheckpoint lineage
    # cut; what must be visible is the PARTITIONED window (keyed by the
    # materialized pid), never an unpartitioned one
    assert "hashpartitioning(_go_pid" in plan


@pytest.mark.parametrize("k", [1, 3, 4, 7])
def test_global_ntile_matches_builtin(spark, pool, k):
    got = global_ntile(pool, _order(), k, tile_col="t")
    exp = pool.withColumn("et", F.ntile(k).over(Window.orderBy(*_order())))
    j = got.join(exp.select("doc_id", "et"), "doc_id")
    assert j.filter(F.col("t") != F.col("et")).count() == 0


def test_global_ntile_fewer_rows_than_tiles(spark, pool):
    small = pool.filter(F.col("doc_id") < 3)
    got = global_ntile(small, _order(), 5, tile_col="t")
    exp = small.withColumn("et", F.ntile(5).over(Window.orderBy(*_order())))
    j = got.join(exp.select("doc_id", "et"), "doc_id")
    assert j.filter(F.col("t") != F.col("et")).count() == 0


def test_decimal_running_sum_and_grand_total(spark, pool):
    """The typed running-sum lane (money-style DECIMAL columns must not
    truncate through bigint) + the driver-known grand-total literal."""
    from decimal import Decimal

    money = pool.select(
        "doc_id",
        "q",
        F.expr(
            "CAST(CAST(tok AS DECIMAL(18,6)) / 7 AS DECIMAL(18,6))"
        ).alias("amt"),
    ).localCheckpoint(eager=False)
    got = attach_global_order(
        money,
        _order(),
        rank_col="pos",
        running_sums={"cum": ("amt", "decimal(38,6)")},
        grand_total_sums={"tot": ("amt", "decimal(38,6)")},
    )
    w = Window.orderBy(*_order()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = money.select(
        "doc_id",
        F.sum(F.col("amt").cast("decimal(38,6)")).over(w).alias("ecum"),
    )
    j = got.join(exp, "doc_id")
    assert j.filter(F.col("cum") != F.col("ecum")).count() == 0
    tot = money.agg(F.sum(F.col("amt").cast("decimal(38,6)"))).collect()[0][0]
    got_tot = got.select("tot").distinct().collect()
    assert len(got_tot) == 1 and got_tot[0][0] == Decimal(tot)
    # no scalar-aggregate stage: the grand total is a literal
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_empty_input(spark, pool):
    empty = pool.filter(F.lit(False))
    got = attach_global_order(
        empty, _order(), rank_col="pos", running_sums={"cum": "tok"}
    )
    assert got.count() == 0
    assert {"pos", "cum"} <= set(got.columns)


def test_null_values_match_plain_window(spark, pool):
    """SQL window-SUM NULL contract under the two-level split: rows
    BEFORE the first non-NULL value get NULL (not 0), and an all-NULL
    prefix at the head of a range partition inherits the carry from
    earlier partitions — exactly what one unpartitioned window returns.
    The lowest-q rows sort FIRST under desc NULLS LAST? No — q is never
    NULL here; the SOURCE column is: make it NULL for the whole leading
    range (highest q values) so partition 0 is entirely NULL and later
    partitions open with NULL rows too."""
    nulled = pool.select(
        "doc_id",
        "q",
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) != 0, F.col("tok"))
        .cast("bigint")
        .alias("tok"),
    ).withColumn(
        # entire top range (q >= 30) all-NULL: the first range
        # partition(s) carry None, and q==29's rows must still see NULL
        # carry while q<=29 non-NULL rows accumulate from 0, not NULL
        "tok",
        F.when(F.col("q") >= 30, F.lit(None)).otherwise(F.col("tok")),
    ).localCheckpoint(eager=False)
    got = attach_global_order(
        nulled,
        _order(),
        rank_col="pos",
        running_sums={"cum": "tok"},
        grand_total_sums={"tot": "tok"},
        num_partitions=8,
    )
    w = Window.orderBy(*_order())
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exp = nulled.select(
        "doc_id",
        F.row_number().over(w).cast("bigint").alias("epos"),
        F.sum(F.col("tok").cast("bigint")).over(wrun).alias("ecum"),
    )
    j = got.join(exp, "doc_id")
    bad = j.filter(
        (F.col("pos") != F.col("epos"))
        | ~(
            (F.col("cum") == F.col("ecum"))
            | (F.col("cum").isNull() & F.col("ecum").isNull())
        )
    )
    assert bad.count() == 0
    # grand total matches a plain SUM (NULLs skipped, not zeroed)
    etot = nulled.agg(F.sum("tok")).collect()[0][0]
    assert got.select("tot").distinct().collect()[0][0] == etot


def test_all_null_source_keeps_null_sums(spark, pool):
    """Degenerate: every src value NULL -> every running sum and the
    grand total must be NULL (a fabricated 0 would diverge from SQL)."""
    allnull = pool.select(
        "doc_id", "q", F.lit(None).cast("bigint").alias("tok")
    )
    got = attach_global_order(
        allnull,
        _order(),
        rank_col="pos",
        running_sums={"cum": "tok"},
        grand_total_sums={"tot": "tok"},
    )
    assert got.filter(F.col("cum").isNotNull()).count() == 0
    assert got.select("tot").distinct().collect()[0][0] is None


def test_global_ntile_rejects_bad_k(spark, pool):
    with pytest.raises(ValueError, match="k >= 1"):
        global_ntile(pool, _order(), 0)
