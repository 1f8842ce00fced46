"""Entity resolution: blocking → fuzzy match → connected components →
survivorship (the "golden record").

Generalizes the reference's similarity-match-then-decide loop
(``02_method2_manual_vector_embedding.sql:301-317`` decides hit/miss per
query; ER decides same-entity/distinct per record pair) to the standard
record-linkage pipeline every large-scale data platform ships.

Scale design — the edge set stays LINEAR in records:

* the O(block²) Levenshtein kernel runs over DISTINCT ``(block, name)``
  values only (catalog/text corpora repeat values heavily — same trick as
  ``dd_fuzzy_name_pairs``);
* records are wired to their name representative with STAR edges
  (record ↔ min-record-of-its-name) instead of the C(c,2) clique per
  repeated name, and fuzzy edges connect representatives only — components
  come out identical, with |edges| = N + |distinct fuzzy pairs| instead of
  Σ c_i·c_j. At a billion records that is the difference between a shuffle
  of the corpus and a shuffle that never fits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.dedup import (
    connected_components,
)


def er_resolve(
    df: DataFrame,
    id_col: str,
    block_col: str,
    name_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Label every record with its entity component id.

    Two records are the same entity iff they connect through a chain of
    (same block) ∧ (same name ∨ Levenshtein ≤ ``max_dist``) links —
    blocking is a hard wall (cross-block records never merge), matching is
    transitively closed, ids are never compared across blocks. Records
    with a NULL block or name never match anything (null keys drop out of
    the equi-joins) and come back as singletons.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_b"),
        F.col(name_col).alias("_n"),
    )
    # one representative record per distinct (block, name)
    reps = base.groupBy("_b", "_n").agg(F.min("_id").alias("_rep"))
    with_rep = base.join(reps, ["_b", "_n"])
    # star edges: every record to its name representative (self-loops for
    # the representative itself are harmless — filtered for edge volume)
    star = with_rep.filter(F.col("_id") != F.col("_rep")).select(
        F.col("_rep").alias("id1"), F.col("_id").alias("id2")
    )
    # fuzzy edges between representatives, within block, over DISTINCT names
    a = reps.select("_b", F.col("_n").alias("n1"), F.col("_rep").alias("r1"))
    b = reps.select("_b", F.col("_n").alias("n2"), F.col("_rep").alias("r2"))
    fuzzy = (
        a.join(b, "_b")
        .filter(F.col("n1") < F.col("n2"))
        .withColumn("dist", F.levenshtein(F.col("n1"), F.col("n2"), max_dist))
        .filter(F.col("dist") >= 0)
        .select(F.col("r1").alias("id1"), F.col("r2").alias("id2"))
    )
    edges = star.unionByName(fuzzy)
    cc = connected_components(edges)
    return df.join(cc, df[id_col] == cc["id"], "left").select(
        df["*"], F.coalesce(F.col("comp"), df[id_col]).alias("comp")
    )


def golden_records(
    resolved: DataFrame,
    id_col: str,
    quality: Column,
) -> DataFrame:
    """Survivorship: one golden record per entity — ``max_by(id, quality)``
    (embed a unique-id tiebreak in ``quality``). One map-side-combinable
    aggregate over the labeled records."""
    g = resolved.withColumn("__q", quality)
    return g.groupBy("comp").agg(
        F.expr(f"max_by({id_col}, __q)").alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.max("__q").alias("best_quality"),
    )
