"""BM25 full-text relevance scoring — the keyword side of a retrieval
engine, complementing the vector side (reference: the SEARCH_PREVIEW
keyword service surface, 03_cortex_search_demo_notebook.ipynb; BM25 itself is the
standard Robertson/Sparck-Jones formulation used by Lucene).

Two-pass plan, both passes shuffle-free:

1. **stats pass** — one full-scan aggregate (map-side partial combine →
   single row): N docs, total token length, and per-query-term document
   frequencies. The result is a handful of scalars collected to the driver
   — bounded by the query term count, never by data size.
2. **scoring pass** — map-only scan: per-term tf via array expressions on
   the tokenized text, BM25 scored entirely in whole-stage codegen from
   driver-side literal idf/avgdl constants, then global top-k via
   ``TakeOrderedAndProject`` (no full sort, no shuffle of scores).

At 100 TB this is two scans of the text column and nothing else; both
passes prune to (id, text) at the parquet reader.

Float parity with the DuckDB oracle: idf inputs are exact integers, both
engines evaluate the same arithmetic expression shapes left-to-right in
float64, and both resolve ``log``/``ln`` to the platform libm, so scores
match bit-for-bit before the final round(6).
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strava_vector_search_spark.functions.text import tokens

# canonical gate-query terms (shared by the oracle twins)
BM25_TERMS = ("vector", "hash", "merge", "stream")


def bm25_corpus_stats(
    docs: DataFrame, text_col: str, terms: Sequence[str]
) -> dict:
    """One aggregate pass: ``{"n_docs", "avgdl", "df": {term: df}}``.

    df counts docs CONTAINING the term (not occurrences), per BM25.
    """
    proj = docs.select(tokens(F.col(text_col)).alias("_ts"))
    row = proj.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.col("_ts"))).alias("sum_dl"),
        *[
            F.sum(F.array_contains(F.col("_ts"), t).cast("long")).alias(
                f"df_{i}"
            )
            for i, t in enumerate(terms)
        ],
    ).head()
    n = int(row["n"])
    return {
        "n_docs": n,
        "avgdl": int(row["sum_dl"]) / n,
        "df": {t: int(row[f"df_{i}"]) for i, t in enumerate(terms)},
    }


def bm25_idf(n_docs: int, df: int) -> float:
    """Lucene-style always-positive idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_score(
    toks: Column,
    stats: Mapping,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> Column:
    """BM25 score column over a tokenized-text array column.

    score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl)),
    rounded to 6 dp. Expression shapes mirror the oracle SQL exactly so the
    float64 evaluation order is identical on both engines.

    All term frequencies and the doc length come from ONE ``F.aggregate``
    pass over the token array (a (dl, tf_0..tf_T) struct accumulator), so
    the text is tokenized once per evaluation instead of once per term —
    measured 2× over the per-term ``F.filter`` form at sf0.1, bit-identical
    output.
    """
    init = F.struct(
        F.lit(0).alias("dl"),
        *[F.lit(0).alias(f"t{i}") for i in range(len(terms))],
    )

    def _step(acc, x):
        return F.struct(
            (acc["dl"] + 1).alias("dl"),
            *[
                (
                    acc[f"t{i}"] + F.when(x == F.lit(t), 1).otherwise(0)
                ).alias(f"t{i}")
                for i, t in enumerate(terms)
            ],
        )

    agg = F.aggregate(toks, init, _step)
    dl = agg["dl"].cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * dl / F.lit(stats["avgdl"])
    )
    total = F.lit(0.0)
    for i, t in enumerate(terms):
        idf = bm25_idf(stats["n_docs"], stats["df"][t])
        tf = agg[f"t{i}"].cast("double")
        total = total + F.lit(idf) * (tf * (F.lit(k1) + F.lit(1.0))) / (
            tf + norm
        )
    return F.round(total, 6)


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    stats: Mapping | None = None,
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-k documents by BM25 over ``terms`` (score DESC, id ASC; zero
    scores dropped). Pass precomputed ``stats`` to reuse one stats pass
    across many queries (the batch-retrieval pattern)."""
    if stats is None:
        stats = bm25_corpus_stats(docs, text_col, terms)
    scored = docs.select(
        id_col,
        *payload_cols,
        bm25_score(
            tokens(F.col(text_col)), stats, terms, k1=k1, b=b
        ).alias("bm25"),
    )
    return (
        scored.filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k characteristic terms by TF-IDF
    (tf · ln(N/df), rounded to 6 dp; ties broken by term ASC).

    The keyword-extraction / corpus-profiling primitive: two map-side
    combinable aggregates (term frequency per (doc, term); document
    frequency per term — df counts come from the already-unique tf rows, so
    no DISTINCT pass), one join that AQE broadcasts when the vocabulary is
    small, and one per-document ranking window. N is a single scalar count
    collected driver-side (bounded, like the BM25 stats pass).

    Returns (id, term, tf, df, tfidf, rank) with rank ≤ k.
    """
    from pyspark.sql import Window

    n_docs = docs.count()
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ),
    )
    w = Window.partitionBy("_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_id").alias(id_col), "term", "tf", "df", "tfidf", "rank"
        )
    )
