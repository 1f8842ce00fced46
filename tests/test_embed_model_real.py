"""OPT-IN real-model parity: the one reference behavior unprovable in this
container (no model, no network) — semantic retrieval quality on REAL
``e5``-style embeddings (reference ``README.md:86-90``'s 0.90/0.80/0.70
rubric; ``02_method2_manual_vector_embedding.sql:168-171`` for the model).

Runs only when BOTH hold, and skips cleanly otherwise:

* ``sentence-transformers`` is installed (``pip install
  sentence-transformers``) — pulls the model weights on first use;
* ``SVS_REAL_MODEL`` is set (e.g. ``SVS_REAL_MODEL=1 python -m pytest
  tests/test_embed_model_real.py``) — a model download is never an
  implicit test dependency.

The point is PIPELINE parity, not model benchmarking: the model path and
the hash-embedder path (which every oracle gate uses) flow through the
SAME corpus-embed → brute_force_topk machinery; with a real model the
semantic rubric becomes checkable (the paraphrase outranks the unrelated
document for its query).
"""

from __future__ import annotations

import os

import pytest

sentence_transformers = pytest.importorskip(
    "sentence_transformers",
    reason="real-model parity is opt-in: pip install sentence-transformers",
)

if not os.environ.get("SVS_REAL_MODEL"):
    pytest.skip(
        "set SVS_REAL_MODEL=1 to run the model-download-dependent parity test",
        allow_module_level=True,
    )

from pyspark.sql import functions as F  # noqa: E402

from strava_vector_search_spark.functions.embed import (  # noqa: E402
    hash_embedding_table,
    model_embedder,
)
from strava_vector_search_spark.operators.search import (  # noqa: E402
    brute_force_topk,
)

# (id, text): 0/1 are paraphrases; 2/3 unrelated distractors
CORPUS = [
    (0, "cycling up a steep mountain pass at dawn"),
    (1, "an early-morning bike climb over a high alpine road"),
    (2, "quarterly revenue grew four percent year over year"),
    (3, "the recipe calls for two cups of flour and one egg"),
]
QUERY = "riding a bicycle uphill in the mountains early in the morning"
MODEL = "intfloat/e5-base-v2"


def _model_corpus(spark, texts):
    embed = model_embedder(MODEL)
    df = spark.createDataFrame(texts, "vec_id int, text string")
    # e5 convention: passages and queries carry role prefixes
    return df.select(
        "vec_id",
        embed(F.concat(F.lit("passage: "), F.col("text"))).alias("embedding"),
    )


def test_real_model_topk_semantic_rubric(spark):
    corpus = _model_corpus(spark, CORPUS)
    embed = model_embedder(MODEL)
    qv = (
        spark.createDataFrame([(QUERY,)], "t string")
        .select(embed(F.concat(F.lit("query: "), F.col("t"))).alias("e"))
        .collect()[0]["e"]
    )
    top = brute_force_topk(
        corpus, list(qv), k=4, id_col="vec_id", assume_normalized=True
    ).collect()
    ranked = [r["vec_id"] for r in top]
    sims = {r["vec_id"]: r["similarity"] for r in top}
    # semantic rubric: both paraphrase docs outrank both distractors,
    # and similarities are valid cosines
    assert set(ranked[:2]) == {0, 1}, (ranked, sims)
    assert all(-1.0 <= s <= 1.0 for s in sims.values())
    assert min(sims[0], sims[1]) > max(sims[2], sims[3])


def test_hash_and_model_paths_share_topk_machinery(spark):
    """Same query machinery, swapped embedder: schema and contract match."""
    model_top = brute_force_topk(
        _model_corpus(spark, CORPUS),
        list(
            spark.createDataFrame([(QUERY,)], "t string")
            .select(
                model_embedder(MODEL)(
                    F.concat(F.lit("query: "), F.col("t"))
                ).alias("e")
            )
            .collect()[0]["e"]
        ),
        k=2,
        id_col="vec_id",
        assume_normalized=True,
    )
    docs = spark.createDataFrame(CORPUS, "vec_id int, text string")
    hash_corpus = hash_embedding_table(docs, "vec_id", "text").select(
        "vec_id", "embedding"
    )
    from strava_vector_search_spark.functions.embed import hash_embed_text

    hash_top = brute_force_topk(
        hash_corpus,
        hash_embed_text(spark, QUERY),
        k=2,
        id_col="vec_id",
        assume_normalized=True,
    )
    for df in (model_top, hash_top):
        cols = set(df.columns)
        assert {"vec_id", "similarity"} <= cols
        rows = df.collect()
        assert len(rows) == 2
