"""Unit tests for operators/vocab.py (vocabulary build + encode)."""

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.vocab import (
    build_vocab,
    encode_documents,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog bird"),
            (3, "Cat, DOG! fish?"),
            (4, ""),
        ],
        "doc_id int, text string",
    )


def test_build_vocab_rank_and_tiebreak(docs):
    v = {r["token"]: (r["id"], r["cnt"]) for r in build_vocab(docs, "text").collect()}
    # counts: cat 3, dog 3, bird 1, fish 1; ties break token-ASC
    assert v["cat"] == (1, 3) and v["dog"] == (2, 3)
    assert v["bird"] == (3, 1) and v["fish"] == (4, 1)


def test_vocab_size_truncates(docs):
    assert build_vocab(docs, "text", vocab_size=2).count() == 2


def test_encode_oov_and_positions(docs, spark):
    vocab = build_vocab(docs, "text", vocab_size=2)  # only cat, dog in-vocab
    out = {
        r["doc_id"]: (r["n_tokens"], r["ids"])
        for r in encode_documents(docs, vocab).collect()
    }
    assert out[1] == (3, [1, 2, 1])          # cat dog cat
    assert out[2] == (2, [2, 0])             # dog, bird->OOV
    assert out[3] == (3, [1, 2, 0])          # case/punct folded like tokens()
    assert out[4] == (0, [])                 # empty text


def test_python_tokenizer_matches_spark_tokens(spark, sf_dir):
    """n_tokens (Spark expression) must equal len(ids) (Python kernel) on
    real corpus text — pins the dual-tokenizer contract."""
    from strava_vector_search_spark.io.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    vocab = build_vocab(docs, "text", vocab_size=16)
    bad = (
        encode_documents(docs, vocab)
        .filter(F.size("ids") != F.col("n_tokens"))
        .count()
    )
    assert bad == 0
