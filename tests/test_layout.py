from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.plans.layout import (
    bucketed_join_is_shuffle_free,
    salted_join,
    write_bucketed,
    write_partitioned,
)


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    try:
        write_bucketed(docs, "docs_b", ["doc_id"], num_buckets=8, sort_cols=["doc_id"])
        write_bucketed(emb, "emb_b", ["doc_id"], num_buckets=8, sort_cols=["doc_id"])
        joined, shuffle_free = bucketed_join_is_shuffle_free(
            spark, "docs_b", "emb_b", "doc_id"
        )
        assert shuffle_free, "bucketed join must plan without Exchange"
        assert joined.count() == emb.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_b")
        spark.sql("DROP TABLE IF EXISTS emb_b")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_part")
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out)
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [" in plan
    # pruning happened: only the en partition's rows are read
    assert back.filter(F.col("lang") == "en").count() == docs.filter(
        F.col("lang") == "en"
    ).count()


def test_salted_join_correctness(spark):
    # skewed big side: one hot key with 1000 rows
    big = spark.range(1100).select(
        F.when(F.col("id") < 1000, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(7, "hot"), (1050, "cold")], "k long, label string"
    )
    plain = big.join(small, "k").select("k", "payload", "label")
    salted = salted_join(big, small, "k").select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_compact_reduces_file_count(spark, tmp_path):
    from strava_vector_search_spark.plans.layout import compact

    path = str(tmp_path / "appendy")
    # simulate streaming appends: 12 tiny files
    for i in range(12):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(path)
    import pathlib

    before = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert before >= 12
    compact(spark, path, target_file_mb=128)
    after = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert after < before
    # data intact
    assert spark.read.parquet(path).count() == 120
