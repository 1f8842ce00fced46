"""Distributed BPE tokenizer training — byte-pair-encoding merge learning
over a corpus, the vocabulary-construction step of a training-data
pipeline (the tokenizer itself, not just token counting).

Standard trainer decomposition (the same one fastBPE / sentencepiece-BPE
use), mapped onto Spark:

* **Word pre-aggregation (one corpus scan).** BPE pair statistics only
  depend on the DISTINCT-word multiset: tokenize → ``groupBy(word)`` →
  count.  Everything after runs on the word vocabulary, whose size is
  bounded by language (millions), NOT by corpus bytes — this is what
  makes BPE training corpus-size-independent after a single 100 TB scan.
* **State = one row per (word, position, symbol)** with the word's corpus
  count carried alongside.  The relational layout (rows, not arrays)
  keeps every step a window/aggregate Catalyst can pipeline, and is the
  layout the DuckDB oracle replays verbatim.
* **Each merge round** is (a) one map-side-combined aggregate — adjacent
  pairs via ``lead(sym)`` per word, weighted by word count, argmax by
  (count DESC, pair ASC) for determinism — and (b) one window pass that
  applies the winning merge with GREEDY LEFTMOST semantics: occurrences
  can overlap only when left==right (``aaa`` + merge (a,a) → ``[aa, a]``,
  never ``[a, aa]``); runs of consecutive match positions are resolved by
  gaps-and-islands (run id = pos − running match count) keeping the odd
  ranks.  Lineage is truncated per round (``localCheckpoint``) so the
  plan does not grow with the merge count — the same iterative-algorithm
  pattern as ``dedup.connected_components``.

No reference-repo counterpart (the reference consumes a hosted
embedding model's tokenizer, 02_method2_manual_vector_embedding.sql:168);
engine-completion operator for the LLM-data-pipeline layer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from strava_vector_search_spark.functions.text import tokens


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcnt): distinct corpus words with occurrence counts — the
    one pass that touches the full corpus."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def char_state(words: DataFrame) -> DataFrame:
    """Split each distinct word into single-character symbol rows:
    (word, pos, sym, wcnt), pos 1-based dense."""
    return words.select(
        "word",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
        "wcnt",
    ).select(
        "word", "pos", F.substring(F.col("word"), F.col("pos"), 1).alias("sym"), "wcnt"
    ).filter(F.col("sym") != "")


def top_pair(state: DataFrame):
    """Most frequent adjacent symbol pair, weighted by word count.
    Returns (left, right, pair_count) or None when no pairs remain.
    Deterministic tie-break: (count DESC, left ASC, right ASC)."""
    w = Window.partitionBy("word").orderBy("pos")
    pairs = (
        state.select("sym", F.lead("sym").over(w).alias("nxt"), "wcnt")
        .filter(F.col("nxt").isNotNull())
        .groupBy("sym", "nxt")
        .agg(F.sum("wcnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("sym"), F.asc("nxt"))
        .limit(1)
        .collect()
    )
    if not pairs:
        return None
    r = pairs[0]
    return r["sym"], r["nxt"], r["cnt"]


def apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every greedy-leftmost non-overlapping (left, right)
    occurrence with the concatenated symbol; re-number positions dense."""
    w = Window.partitionBy("word").orderBy("pos")
    run = Window.partitionBy("word", "grp").orderBy("pos")
    m = state.withColumn(
        "match",
        F.coalesce(
            (F.col("sym") == left) & (F.lead("sym").over(w) == F.lit(right)),
            F.lit(False),  # last symbol of a word: lead is NULL, not a match
        ),
    )
    m = m.withColumn(
        "rc", F.sum(F.col("match").cast("int")).over(w)
    ).withColumn("grp", F.col("pos") - F.col("rc"))
    m = m.withColumn(
        "kept",
        F.col("match")
        & (F.sum(F.col("match").cast("int")).over(run) % 2 == 1),
    )
    m = m.withColumn("prev_kept", F.lag("kept").over(w))
    return (
        m.filter(~F.coalesce(F.col("prev_kept"), F.lit(False)))
        .select(
            "word",
            F.row_number().over(w).alias("pos"),
            F.when(F.col("kept"), F.lit(left + right))
            .otherwise(F.col("sym"))
            .alias("sym"),
            "wcnt",
        )
        .localCheckpoint(eager=False)
    )


def train_bpe_with_state(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 1,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn merges and also return the final symbol state — the encoded
    word vocabulary (word, pos, sym, wcnt) after every merge, i.e. the
    corpus segmentation the learned tokenizer produces."""
    state = char_state(word_vocab(docs, text_col)).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        best = top_pair(state)
        if best is None or best[2] < min_pair_count:
            break
        left, right, cnt = best
        merges.append((step, left, right, int(cnt)))
        state = apply_merge(state, left, right)
    return merges, state


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    min_pair_count: int = 1,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    (step int, lhs string, rhs string, pair_count bigint) in learned
    order — the tokenizer artifact a trainer ships."""
    merges, _ = train_bpe_with_state(docs, text_col, num_merges, min_pair_count)
    return docs.sparkSession.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count bigint"
    )


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Production encode path: apply learned merges to every document —
    map-only Arrow-batched pandas UDF over the broadcast merge list (the
    merge table is bounded: vocab-size rows), NO shuffle. Returns
    (id_col, n_tokens, tokens_csv)."""
    tok_re = re.compile(r"[^a-z0-9]+")
    bc = docs.sparkSession.sparkContext.broadcast(list(merges))

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        ms = bc.value
        return texts.map(
            lambda t: [
                s
                for w in tok_re.split((t or "").lower())
                if w
                for s in encode_word_bpe(w, ms)
            ]
        )

    out = docs.select(id_col, _enc(F.col(text_col)).alias("toks"))
    return out.select(
        id_col,
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.array_join("toks", " ").alias("tokens_csv"),
    )


def encode_word_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python greedy-leftmost encoder applying learned merges in
    order — the inference twin used by tests to pin trainer semantics."""
    syms = list(word)
    for left, right in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
