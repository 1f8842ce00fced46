"""Token-vocabulary build + corpus encoding — the tokenize step of a
training-data pipeline (documents → fixed integer ids for a model).

* **build**: explode → count → top-V. The groupBy is map-side combined
  (the shuffle carries one row per distinct token per partition, not per
  occurrence) and the top-V is a ``TakeOrderedAndProject`` — no global
  sort. Ids are dense ranks of (count DESC, token ASC): deterministic
  across runs and engines; 0 is reserved for OOV/padding.
* **encode**: the vocabulary (bounded: V entries) is collected once and
  broadcast to executors; encoding is a map-only Arrow-batched pandas UDF
  — one pass over the text, NO shuffle and NO join. This is the shape that
  survives 100 TB: the alternative (explode + join + re-aggregate by
  position) shuffles every token occurrence twice.

The Python tokenizer mirrors ``functions.text.tokens`` exactly (lower →
split ``[^a-z0-9]+`` → drop empties), the same dual-implementation
contract the MinHash kernels use.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from strava_vector_search_spark.functions.text import tokens

_TOK_RE = re.compile(r"[^a-z0-9]+")


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 32768,
) -> DataFrame:
    """(id, token, cnt): top-``vocab_size`` tokens by (cnt DESC, token ASC),
    id = 1-based rank (0 reserved for OOV)."""
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(vocab_size)
    )
    # rank the (small, already-limited) top-V: single-partition window is
    # fine at any corpus scale because V is a constant
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return counts.select(
        F.row_number().over(w).alias("id"), "token", "cnt"
    )


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens, ids array<int>) — every token mapped through the
    broadcast vocabulary, OOV → 0. Map-only; the only driver traffic is
    the V-row vocabulary itself."""
    mapping ={r["token"]: r["id"] for r in vocab.select("token", "id").collect()}
    bc = docs.sparkSession.sparkContext.broadcast(mapping)

    @F.pandas_udf("array<int>")
    def _enc(texts: pd.Series) -> pd.Series:
        m = bc.value
        return texts.map(
            lambda t: [
                m.get(tok, 0)
                for tok in _TOK_RE.split((t or "").lower())
                if tok
            ]
        )

    return docs.select(
        id_col,
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        _enc(F.col(text_col)).alias("ids"),
    )
