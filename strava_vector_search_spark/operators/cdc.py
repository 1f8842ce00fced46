"""CDC changelog application — the MERGE INTO / upsert step that keeps a
warehouse snapshot current from an insert/update/delete feed (the batch
half of a change-data-capture pipeline; the reference's in-place embedding
UPDATE, 02_method2_manual_vector_embedding.sql:170-172, is the single-column special
case).

Spark-first shape, two operators on the snapshot scan:

1. **latest-per-key** over the change feed: one shuffle on the key,
   ``row_number`` ordered by (seq DESC, op DESC) — a window whose state is
   one row per key (WindowGroupLimit prunes eagerly in Spark ≥3.5).
2. **left-anti join** snapshot → changed keys, union the surviving
   (non-delete) latest images. A CDC batch is small relative to the
   snapshot, so Catalyst/AQE broadcasts the change side and the snapshot
   is never shuffled at all — the property that makes this viable against
   a 100 TB table.

Idempotent by construction: re-applying the same changelog yields the same
snapshot (latest-per-key is stable, anti-join removes the same keys).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """One row per key: the change with the highest (seq, op) — op DESC
    breaks exact seq ties deterministically ('U' > 'I' > 'D')."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Merge an I/U/D change feed into a snapshot (SCD type 1: latest image
    wins, deletes drop the row, inserts add it).

    ``changes`` must carry ``keys + [seq_col, op_col]`` plus every
    non-key snapshot column (the full new row image for I/U; ignored for
    D). Untouched snapshot rows pass through unchanged.
    """
    keys = list(keys)
    payload = [c for c in snapshot.columns if c not in keys]
    latest = latest_changes(changes, keys, seq_col, op_col)
    survivors = latest.filter(F.col(op_col) != F.lit("D")).select(
        *keys, *payload
    )
    untouched = snapshot.join(latest.select(*keys), keys, "left_anti")
    return untouched.unionByName(survivors)


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """SCD type 2: turn an I/U/D change feed into versioned history rows
    with validity intervals.

    Every I/U change opens a version at its ``seq``; the version closes at
    the NEXT change's seq (``valid_to_seq``, NULL while current). A delete
    closes the preceding version and opens nothing, so a deleted key has
    no current row. One window (= one shuffle on the key) computes every
    interval; there is no self-join.

    Output: the change columns with ``seq`` renamed ``valid_from_seq``,
    plus ``valid_to_seq`` and ``is_current``.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.asc(seq_col), F.asc(op_col))
    return (
        changes.withColumn("valid_to_seq", F.lead(seq_col).over(w))
        .filter(F.col(op_col) != F.lit("D"))
        .withColumnRenamed(seq_col, "valid_from_seq")
        .withColumn("is_current", F.col("valid_to_seq").isNull())
        .drop(op_col)
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """The inverse of :func:`apply_changelog`: derive the I/U/D change feed
    that turns ``old`` into ``new`` — snapshot diffing for replication,
    audit, and backfill-vs-recompute validation.

    One full-outer join on the keys; each side projects only
    ``keys + compare_cols``, so the shuffle carries the compared payload
    once per side. Emits ``op`` ∈ {I, U, D}: key only in new → I, only in
    old → D, in both with any compared column differing (null-safely) → U.
    Unchanged rows are dropped BEFORE the result materializes.

    Key columns must be non-null (presence on a side is detected via the
    first key's null-ness after the outer join — a legitimate NULL key
    would read as absence). Value columns may be NULL freely; comparison
    is null-safe.
    """
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    cond = None
    for k in keys:
        c = o[k].eqNullSafe(n[k])
        cond = c if cond is None else cond & c
    j = o.alias("o").join(n.alias("n"), cond, "full_outer")
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    changed = None
    for c in compare_cols:
        d = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        changed = d if changed is None else changed | d
    op = (
        F.when(in_old & ~in_new, F.lit("D"))
        .when(~in_old & in_new, F.lit("I"))
        .when(changed, F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ] + [F.col(f"n.{c}").alias(c) for c in compare_cols]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", *out_cols)
    )
