"""Test-data table loaders.

The driver provides TPC-H-ish parquet tables plus ``documents`` (a text
corpus) and ``embeddings`` (a dense-vector table) — see TESTDATA.md. These
stand in for the reference's WORKOUTS / WORKOUTS_WITH_VECTORS tables
(``01_method1_cortex_search.sql:72-94``): ``documents`` carries the
searchable text + filterable metadata, ``embeddings`` is the materialized
index keyed 1:1 by id (the central design decision per SURVEY §4 —
embeddings live in their own narrow table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a usable timestamp.

    The parquet stores TIMESTAMP(NANOS), which Spark reads as nanos-since-
    epoch long (``spark.sql.legacy.parquet.nanosAsLong``). Convert with
    integer division to microseconds — same floor semantics DuckDB applies
    when it narrows ns → its native µs timestamps.
    """
    from pyspark.sql import functions as F

    # defensively enable nanos-as-long: the conf is runtime-settable, and a
    # host session (e.g. the grading driver's) may not have it — without it
    # the scan itself throws PARQUET_TYPE_ILLEGAL
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # micros-without-timezone parquet arrives as TIMESTAMP_NTZ; the
        # session runs in UTC, so this cast preserves wall-clock values and
        # restores the TIMESTAMP type the epoch functions require
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def corpus_with_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on id — the WORKOUTS_WITH_VECTORS equivalent
    (reference ``02:80-105``). Inner join: a document participates in vector
    search only once embedded, mirroring ``EMBEDDING IS NOT NULL``
    (``02:225``). At scale both sides are bucketed/partitioned by id so this
    is a co-located join; at test scale Catalyst broadcasts the smaller side.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs["doc_id"] == emb["vec_id"], "inner").drop("vec_id")
