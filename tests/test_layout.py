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


def test_aqe_skew_join_runtime_split(spark):
    """AQE's runtime skew handling — the automatic counterpart of
    plans/layout.salted_join: one hot key dominates the fact side, and
    with the skew thresholds scoped down AQE splits the oversized shuffle
    partition at RUNTIME (the executed plan shows a skew-split shuffle
    read). Values must equal the plain join exactly — skew handling, like
    salting, must be value-invisible."""
    from pyspark.sql import functions as F

    # fact: 60K rows on hot key 7, a few hundred elsewhere
    hot = spark.range(60_000).select(
        F.lit(7).alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(300).select(
        (F.col("id") % 29 + 100).alias("k"), F.col("id").alias("v")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        joined = (
            fact.join(dim, "k")
            .groupBy("name")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        )
        got = {(r["name"], r["n"], r["sv"]) for r in joined.collect()}
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "skewed" in plan.lower()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # value parity with the unskewed reference plan (broadcast join fine)
    expected = {
        (r["name"], r["n"], r["sv"])
        for r in fact.join(dim, "k")
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == expected


def test_sorted_zstd_write_shrinks_footprint(spark, sf_dir, tmp_path):
    """write_sorted_compressed: sorting low-cardinality/correlated columns
    together before writing must shrink the parquet footprint measurably
    vs an unsorted snappy write of the same rows (RLE/dict + zstd)."""
    import pathlib

    from strava_vector_search_spark.io.tables import load_events
    from strava_vector_search_spark.plans.layout import write_sorted_compressed

    ev = load_events(spark, sf_dir)
    # shuffle rows so the baseline write has no accidental clustering
    scrambled = ev.orderBy(F.md5(F.col("event_id").cast("string"))).repartition(4)
    base = str(tmp_path / "base")
    opt = str(tmp_path / "opt")
    scrambled.write.mode("overwrite").option("compression", "snappy").parquet(base)
    write_sorted_compressed(scrambled, opt, ["event_type", "user_id"])

    def size(p):
        return sum(f.stat().st_size for f in pathlib.Path(p).rglob("*.parquet"))

    ratio = size(opt) / size(base)
    assert ratio < 0.9, f"expected >=10% shrink, got ratio {ratio:.3f}"
    # and the data is identical
    assert spark.read.parquet(opt).count() == ev.count()
