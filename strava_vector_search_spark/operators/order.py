"""Distributed global total-order primitives: rank / running sum / NTILE
over an arbitrary sort order WITHOUT a single-partition window.

The problem: ``Window.orderBy(...)`` with no partitionBy moves the whole
table into one task ("No Partition Defined for Window operation" — the
scale-killer for curriculum ordering, budget admission, and interleave
schedules at 100 TB: one executor must hold and sort the corpus).

The fix is the classic two-level prefix-sum (the same recipe
``ev_max_concurrency`` uses for its sweep line, applied to rank):

1. ``repartitionByRange`` on the order keys — Spark's RangePartitioner
   assigns ascending key ranges to ascending partition ids, so partition
   p holds exactly the rows whose global position precedes everything in
   partition p+1 (the order keys include a unique tie-breaker, so the
   order is strict and range splits cannot separate "equal" rows).
2. Per-partition ``row_number`` / running sums — parallel windows keyed
   by the materialized ``spark_partition_id()``.
3. Per-partition totals (|partitions| rows) come back to the driver via
   Arrow; exclusive prefix offsets are computed in plain Python and
   broadcast-joined back. Global pos = offset + local rank; global
   running sum = carry + local running sum.

Doing step 3 driver-side (instead of a window over the totals table) is
deliberate: it keeps the EXECUTED PLAN free of any
``Exchange SinglePartition`` / unpartitioned WindowExec — the plan
property PLANS.md asserts for the dm_* global-order gates. The collect
is |shuffle partitions| rows (32 locally, a few thousand on a real
cluster), the same bounded-driver-table class as centroids and zonemap
file lists.

Correctness hinges on one subtlety: the pid column and the totals must
be computed from the SAME physical partitioning. ``localCheckpoint
(eager=False)`` on the partitioned projection pins it — both consumers
(the local-rank window and the totals aggregate) read the checkpointed
partitions, so a re-sampled RangePartitioner boundary can never put the
offsets and the local ranks in different worlds.

Reference provenance: the reference's curation queries express global
order as a plain ORDER BY over the result (01_method1_cortex_search.sql
:153 ordering style); this module is the Spark-scale re-expression.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_go_pid"
_RN = "_go_rn"


def attach_global_order(
    df: DataFrame,
    order: Sequence[Column],
    rank_col: Optional[str] = "pos",
    running_sums: Optional[dict] = None,
    num_partitions: Optional[int] = None,
    total_count_col: Optional[str] = None,
    grand_total_sums: Optional[dict] = None,
) -> DataFrame:
    """Attach a global 1-based rank (``rank_col``) and optional inclusive
    running sums (``running_sums``: {out_col: source_col_name} for exact
    BIGINT sums, or {out_col: (source_col_name, spark_type)} where
    spark_type is e.g. ``"decimal(38,6)"`` for exact DECIMAL running
    sums — money-style columns must not truncate through bigint) under
    the total order ``order``, with no single-partition stage.

    ``order`` MUST be a strict total order (include a unique tie-breaker
    column) — range partitioning splits at sampled key boundaries, and
    only strictness guarantees the per-partition ranks + offsets compose
    to the exact global row_number a plain window (or the DuckDB oracle)
    would produce.

    ``total_count_col``: if set, the global row count (already known on
    the driver as the sum of per-partition counts — no extra scan) is
    attached as a literal column under that name.

    ``grand_total_sums``: {out_col: src or (src, spark_type)} — attach
    the GLOBAL sum of src as a literal column. The per-partition sums
    are already collected for the prefix offsets, so the grand total
    costs one extra column in the |partitions|-row driver table; it
    replaces a separate scalar aggregate (which would re-scan the input
    and add an ``Exchange SinglePartition`` stage to the plan).
    """
    running_sums = {
        out: (spec if isinstance(spec, tuple) else (spec, "bigint"))
        for out, spec in (running_sums or {}).items()
    }
    grand_total_sums = {
        out: (spec if isinstance(spec, tuple) else (spec, "bigint"))
        for out, spec in (grand_total_sums or {}).items()
    }
    spark = df.sparkSession
    if num_partitions is None:
        # conf may be non-numeric on some runtimes (e.g. "auto"): fall
        # back to the input's current partitioning rather than raising
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except (TypeError, ValueError):
            num_partitions = max(df.rdd.getNumPartitions(), 1)
    order = list(order)

    part = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    aggs = (
        [F.count(F.lit(1)).alias("_go_cnt")]
        + [
            F.sum(F.col(src).cast(typ)).alias(f"_go_t_{out}")
            for out, (src, typ) in running_sums.items()
        ]
        + [
            F.sum(F.col(src).cast(typ)).alias(f"_go_g_{out}")
            for out, (src, typ) in grand_total_sums.items()
        ]
    )
    # collect(), not toPandas(): a NULL partition sum would coerce a
    # pandas int64 column to float64 and silently round sums past 2^53 —
    # Row objects keep exact Python int / Decimal / None per cell. The
    # table is |partitions| rows, so the Arrow fast path buys nothing.
    totals = sorted(
        part.groupBy(_PID).agg(*aggs).collect(), key=lambda r: r[_PID]
    )

    def _zero(typ: str):
        return Decimal(0) if typ.startswith("decimal") else 0

    def _acc(v, typ: str):
        return Decimal(v) if typ.startswith("decimal") else int(v)

    # exclusive prefix offsets, plain Python over |partitions| rows
    # (exact arithmetic either way: Python int / decimal.Decimal).
    # Carries start as None — SQL SUM is NULL until the first non-NULL
    # value, and the carry must preserve that distinction so a partition
    # whose leading rows are all-NULL composes to exactly what one global
    # window would produce (NULL if nothing preceded, the carry if
    # something did — never a fabricated 0).
    rows = []
    rank_off = 0
    sum_off = {out: None for out in running_sums}
    grand = {out: None for out in grand_total_sums}
    for r in totals:
        row = [int(r[_PID]), rank_off]
        rank_off += int(r["_go_cnt"])
        for out, (_, typ) in running_sums.items():
            row.append(sum_off[out])
            t = r[f"_go_t_{out}"]
            if t is not None:
                prev = sum_off[out]
                sum_off[out] = (
                    _zero(typ) if prev is None else prev
                ) + _acc(t, typ)
        for out, (_, typ) in grand_total_sums.items():
            g = r[f"_go_g_{out}"]
            if g is not None:
                prev = grand[out]
                grand[out] = (
                    _zero(typ) if prev is None else prev
                ) + _acc(g, typ)
        rows.append(tuple(row))
    schema = f"{_PID} int, _go_off bigint" + "".join(
        f", _go_c_{out} {typ}" for out, (_, typ) in running_sums.items()
    )
    offsets = spark.createDataFrame(rows, schema)

    wloc = Window.partitionBy(_PID).orderBy(*order)
    wrun = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out_df = part.withColumn(_RN, F.row_number().over(wloc))
    for out, (src, typ) in running_sums.items():
        out_df = out_df.withColumn(
            f"_go_s_{out}", F.sum(F.col(src).cast(typ)).over(wrun)
        )

    out_df = out_df.join(F.broadcast(offsets), _PID)
    if total_count_col is not None:
        out_df = out_df.withColumn(
            total_count_col, F.lit(rank_off).cast("bigint")
        )
    for out, (_, typ) in grand_total_sums.items():
        out_df = out_df.withColumn(out, F.lit(grand[out]).cast(typ))
    if rank_col is not None:
        out_df = out_df.withColumn(
            rank_col,
            (F.col("_go_off") + F.col(_RN)).cast("bigint"),
        )
    for out, (_, typ) in running_sums.items():
        carry = F.col(f"_go_c_{out}")
        loc = F.col(f"_go_s_{out}")
        # SQL window-SUM NULL contract: NULL while no non-NULL value has
        # appeared in the global prefix. A local all-NULL prefix makes
        # loc NULL — the answer is then the carry as-is (itself NULL only
        # if nothing preceded); once loc is non-NULL a NULL carry means
        # "no prior values" and contributes 0, not NULL.
        out_df = out_df.withColumn(
            out,
            F.when(loc.isNull(), carry)
            .otherwise(F.coalesce(carry, F.lit(0).cast(typ)) + loc)
            .cast(typ),
        )
    drop = [_PID, _RN, "_go_off"] + [
        c
        for out in running_sums
        for c in (f"_go_c_{out}", f"_go_s_{out}")
    ]
    return out_df.drop(*drop)


def global_ntile(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    tile_col: str = "tile",
    num_partitions: Optional[int] = None,
    grand_total_sums: Optional[dict] = None,
) -> DataFrame:
    """NTILE(k) over a global order, built from the two-level rank.

    SQL NTILE semantics: with n rows, q = n div k and r = n mod k, the
    first r tiles get q+1 rows and the rest get q. The tile is a pure
    expression of the global row number rn and the total n, so once
    ``attach_global_order`` has produced rn distributively, the tile
    assignment is map-only (n rides in as a literal — it is already on
    the driver as the sum of the per-partition counts).
    """
    if k < 1:
        raise ValueError(f"global_ntile requires k >= 1, got {k}")
    ranked = attach_global_order(
        df,
        order,
        rank_col="_go_ntile_rn",
        num_partitions=num_partitions,
        total_count_col="_go_ntile_n",
        grand_total_sums=grand_total_sums,
    )
    # n is a literal (driver-known), so q/r/cut fold to constants and the
    # tile assignment is a pure map-side expression — integer DIV only
    # (no double round-trip; floor-vs-truncate parity is moot on
    # non-negative operands but DIV keeps it exact at any scale).
    rn = "_go_ntile_rn"
    tile = F.expr(
        f"""CASE
              WHEN _go_ntile_n DIV {k} = 0 THEN {rn}
              WHEN {rn} <= (_go_ntile_n % {k}) * (_go_ntile_n DIV {k} + 1)
                THEN ({rn} - 1) DIV (_go_ntile_n DIV {k} + 1) + 1
              ELSE (_go_ntile_n % {k})
                   + ({rn} - 1 - (_go_ntile_n % {k}) * (_go_ntile_n DIV {k} + 1))
                     DIV (_go_ntile_n DIV {k}) + 1
            END"""
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop(
        "_go_ntile_rn", "_go_ntile_n"
    )
