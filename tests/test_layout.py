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


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered row groups must be selective on BOTH columns at once —
    the property single-column sorting cannot give the second column."""
    import pyarrow.parquet as pq
    from strava_vector_search_spark.plans.layout import write_zordered

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 1000).cast("double").alias("x"),
        (F.pmod(F.col("id") * 2_654_435_761, F.lit(1_000_000)) % 1000)
        .cast("double")
        .alias("y"),
    )
    zpath = str(tmp_path / "z")
    write_zordered(
        df, zpath, ["x", "y"], {"x": (0, 999), "y": (0, 999)}, num_files=8
    )

    import glob

    def mean_span(path, col):
        spans, total = [], 0
        for f in glob.glob(f"{path}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    c = meta.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        spans.append(c.statistics.max - c.statistics.min)
                        total += 1
        return sum(spans) / len(spans)

    # both dimensions cluster: average row-group span far below the global
    # 0..999 span (a random layout would be ~999 on both)
    assert mean_span(zpath, "x") < 600
    assert mean_span(zpath, "y") < 600

    # and the data itself is intact
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("x")).head()[0] == df.agg(F.sum("x")).head()[0]


def test_runtime_bloom_plan_and_conf_restore(spark, sf_dir):
    """j_runtime_bloom must plan a bloom-filter runtime filter on the fact
    scan AND leave the session confs exactly as it found them."""
    from strava_vector_search_spark.queries import QUERIES

    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]

    def snapshot():
        out = {}
        for k in keys:
            try:
                out[k] = spark.conf.get(k)
            except Exception:
                out[k] = None
        return out

    before = snapshot()
    df = QUERIES["j_runtime_bloom"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    assert snapshot() == before  # scoped confs restored
    rows = df.collect()  # executes the bloom plan
    assert len(rows) >= 1 and all(r["n_items"] > 0 for r in rows)
