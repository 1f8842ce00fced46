"""Production-width (dim=768) pins that complement the 768-d gates: the
TARGET_LAG refresh pipeline is width-clean end-to-end, and the session
kernels behind the 768-d gates keep their contracts (unit norms, memo
identity, 96-byte codes)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_target_lag_refresh_at_768(spark, tmp_path):
    """The 64-d TARGET_LAG integration test's flow at the reference's
    production width: append a doc, the refresh stream embeds it at 768,
    and the service finds it — dims flow from the declaration through
    the stream into the index rows."""
    from strava_vector_search_spark.service import SearchService
    from strava_vector_search_spark.streaming.refresh import (
        default_embedder,
        start_refresh_stream,
    )

    docs_path = str(tmp_path / "docs")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    initial = spark.createDataFrame(
        [(1, "easy recovery run gentle pace"), (2, "endurance ride")],
        "doc_id long, text string",
    )
    initial.write.parquet(docs_path)
    embed = default_embedder("doc_id", "text", dim=768)
    embed(initial).write.parquet(index_path)
    q = start_refresh_stream(
        spark,
        docs_path,
        index_path,
        ckpt,
        embed,
        id_col="doc_id",
        docs_schema="doc_id long, text string",
        trigger_seconds=1,
    )
    try:
        spark.createDataFrame(
            [(3, "swimming technique drills flutter kick")],
            "doc_id long, text string",
        ).write.mode("append").parquet(docs_path)
        deadline, hit = time.time() + 60, None
        while time.time() < deadline:
            idx = spark.read.parquet(index_path)
            svc = SearchService(
                spark,
                spark.read.parquet(docs_path),
                id_col="doc_id",
                search_col="text",
                dim=768,
            ).attach_embeddings(idx, vec_id_col="doc_id")
            rows = svc.search(
                {"query": "swimming technique drills flutter kick", "limit": 1}
            ).collect()
            if rows and rows[0]["doc_id"] == 3 and rows[0]["similarity"] > 0.999:
                hit = rows[0]
                break
            time.sleep(1)
        assert hit is not None, "768-d refresh never surfaced the new doc"
        widths = (
            spark.read.parquet(index_path)
            .select(F.size("embedding").alias("w"))
            .distinct()
            .collect()
        )
        assert [r["w"] for r in widths] == [768]
    finally:
        q.stop()


def test_md5_emb_768_unit_kernel_contract(spark):
    """Unit norms (within float64 tolerance — l2_normalize does not
    round) and per-(session, sf) memo identity."""
    from strava_vector_search_spark.queries import _md5_emb_768_unit

    a = _md5_emb_768_unit(spark, SF_DIR)
    assert _md5_emb_768_unit(spark, SF_DIR) is a
    n2 = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    row = a.agg(
        F.min(n2).alias("lo"), F.max(n2).alias("hi"), F.count(F.lit(1)).alias("n")
    ).head()
    assert row["n"] > 0
    assert abs(row["lo"] - 1.0) < 1e-9 and abs(row["hi"] - 1.0) < 1e-9


def test_ivfpq_768_index_kernel_contract(spark):
    """Memo identity, 96-byte codes, and cluster ids present on every
    code row (the column the probed ADC scan prunes on)."""
    from strava_vector_search_spark.queries import _ivfpq_768_index

    first = _ivfpq_768_index(spark, SF_DIR)
    assert _ivfpq_768_index(spark, SF_DIR) is first
    emb, cents, books, codes = first
    assert books.shape == (96, 256, 8)
    sample = codes.limit(10).collect()
    assert sample and all(len(r["code"]) == 96 for r in sample)
    assert all(r["cluster"] is not None for r in sample)
    assert cents.count() <= 16
