"""Live tests for stream-static enrichment and AvailableNow backfill:
dimension updates visible without stream restart; delta-only reprocessing
across backfill runs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from strava_vector_search_spark.streaming.enrich import (
    enrich_stream,
    latest_dim,
    run_backfill,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("domain", StringType())]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_static_join_sees_dim_refresh(spark, tmp_path):
    # append-only versioned dim through the catalog: overwrite under a live
    # stream is not snapshot-safe on plain parquet (see enrich.py docstring)
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, "web"), (2, "code")])
    spark.sql("DROP TABLE IF EXISTS enrich_dim_t")
    spark.createDataFrame(
        [("web", 0.5, 1), ("code", 0.3, 1)],
        "domain string, weight double, version int",
    ).write.mode("overwrite").saveAsTable("enrich_dim_t")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    enriched = enrich_stream(
        stream, latest_dim(spark.table("enrich_dim_t"), "domain"), on="domain"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r["id"], r["weight"])
            for r in spark.sql("select * from enrich_t").collect()
        }
        assert first == {(1, 0.5), (2, 0.3)}
        # refresh = APPEND higher-version rows + catalog refresh: the NEXT
        # micro-batch must see the new weights — no restart
        spark.createDataFrame(
            [("web", 0.9, 2), ("code", 0.1, 2)],
            "domain string, weight double, version int",
        ).write.mode("append").saveAsTable("enrich_dim_t")
        spark.catalog.refreshTable("enrich_dim_t")
        _write_batch(spark, src, [(3, "web")])
        q.processAllAvailable()
        rows = {
            (r["id"], r["weight"])
            for r in spark.sql("select * from enrich_t").collect()
        }
        assert (3, 0.9) in rows
    finally:
        q.stop()
        spark.sql("DROP TABLE IF EXISTS enrich_dim_t")


def test_availablenow_backfill_processes_only_delta(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, "a"), (2, "b")])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = stream.withColumn("tag", F.lit("r1"))
    run_backfill(out, sink, ckpt)
    assert spark.read.parquet(sink).count() == 2

    _write_batch(spark, src, [(3, "c")])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    run_backfill(stream2.withColumn("tag", F.lit("r2")), sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 3  # not 5: rows 1-2 were not reprocessed
    assert {r["tag"] for r in got.filter(F.col("id") == 3).collect()} == {"r2"}
