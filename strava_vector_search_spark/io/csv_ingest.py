"""Typed CSV ingest with the reference's COPY INTO semantics
(``01_method1_cortex_search.sql:111-142``, ``02:120-151``):

* quoted multiline fields (``FIELD_OPTIONALLY_ENCLOSED_BY='"'`` — the corpus
  text has embedded newlines/commas) → ``multiLine`` + quote/escape;
* positional per-column cast (``$1::VARCHAR … $11::TIMESTAMP_NTZ``);
* empty-string → NULL for numerics (``NULLIF($5,'')::INTEGER``);
* bad-row tolerance (``ON_ERROR='CONTINUE'``) → PERMISSIVE mode with a
  corrupt-record column, quarantined not dropped silently;
* JSON column kept as raw string (VARIANT-parity strategy) + ``parse_json``
  helper with the explicit schema.

Scale note: multiLine CSV is NOT splittable — one task per file. That's
fine for landing-zone ingest (many files → many tasks); never store the
corpus as CSV. Ingest immediately rewrites to parquet partitioned by the
hot filter column (``02:407`` "consider clustering by SPORT_TYPE").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from strava_vector_search_spark.schema import RAW_JSON_SCHEMA, WORKOUTS_SCHEMA

CORRUPT_COL = "_corrupt_record"


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: StructType = WORKOUTS_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """Read a workout-corpus CSV with full S1/S2 semantics.

    All columns land as strings first (positional), then cast per the target
    schema with NULLIF on empties — byte-identical to the reference's
    ``NULLIF($n,'')::TYPE`` pipeline. Rows that fail CSV structure land in
    ``_corrupt_record`` (use :func:`corrupt_rows` to quarantine them).
    """
    raw_fields = [StructField(f.name, StringType(), True) for f in schema.fields]
    raw_schema = StructType(raw_fields + [StructField(CORRUPT_COL, StringType(), True)])
    df = spark.read.csv(
        path,
        schema=raw_schema,
        header=header,
        multiLine=True,
        quote='"',
        escape='"',
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        encoding="UTF-8",
    )
    return _apply_typed_casts(df, schema)


def _apply_typed_casts(df: DataFrame, schema: StructType) -> DataFrame:
    """The shared NULLIF($n,'')::TYPE pipeline: empty string → NULL, then
    try_cast so a malformed cell nulls the cell (the row survives) —
    mirroring ON_ERROR='CONTINUE'."""
    casts = []
    for f in schema.fields:
        c = F.col(f.name)
        if f.dataType.simpleString() == "string":
            casts.append(F.when(c == "", None).otherwise(c).alias(f.name))
        else:
            casts.append(
                F.when(c == "", None).otherwise(c).try_cast(f.dataType).alias(f.name)
            )
    return df.select(*casts, F.col(CORRUPT_COL))


def read_jsonl_typed(
    spark: SparkSession,
    path: str,
    schema: StructType = WORKOUTS_SCHEMA,
) -> DataFrame:
    """JSON-lines ingest with the same typed-load semantics as the CSV path:
    every declared column read as string first (so '' → NULL and bad cells
    null out identically across formats), structurally-corrupt lines
    quarantined in ``_corrupt_record``. JSONL splits by line, so unlike
    multiline CSV it parallelizes within a file — the preferred landing
    format at scale."""
    raw_fields = [StructField(f.name, StringType(), True) for f in schema.fields]
    raw_schema = StructType(raw_fields + [StructField(CORRUPT_COL, StringType(), True)])
    df = spark.read.schema(raw_schema).json(
        path, mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL
    )
    return _apply_typed_casts(df, schema)


def valid_rows(df: DataFrame) -> DataFrame:
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_rows(df: DataFrame) -> DataFrame:
    """The quarantine: rows Snowflake's ON_ERROR='CONTINUE' would skip.

    Caches the parsed frame first — Spark disallows plans whose referenced
    columns are ONLY the internal corrupt-record column on raw JSON/CSV
    reads (SPARK-21610); materializing lifts the restriction.
    """
    return df.cache().filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)


def parse_raw_json(df: DataFrame, col: str = "raw_json_str", schema=None) -> DataFrame:
    """PARSE_JSON equivalent (01:125): raw string → typed struct column."""
    return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema or RAW_JSON_SCHEMA))


def write_corpus_parquet(
    df: DataFrame, path: str, partition_col: str = "sport_type"
) -> None:
    """Land the corpus as parquet partitioned by the hot filter column —
    partition pruning for `sport_type = 'x'` queries for free (02:407)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
