"""Interchange formats beyond CSV/Parquet: JSONL and ORC sources/sinks.

The reference ingests exactly one format (quoted CSV via COPY INTO,
``01_method1_cortex_search.sql:111-135``); a pipeline that feeds a training run meets the
rest of the lake — JSONL (the lingua franca of web-scrape corpora: one JSON
object per line, usually gzip-compressed) and ORC (the other columnar
format). Both map onto Spark's native readers/writers, so every property
that matters at 100 TB is preserved:

* **Splittable scans** — uncompressed/bzip2 JSONL and all ORC files split
  by range, so a 1 TB input becomes thousands of parallel tasks. (gzip JSONL
  is NOT splittable — one task per file; the writer here defaults to many
  smaller files per partition for that reason.)
* **Schema-on-read with an explicit schema** — inference (`inferSchema`)
  costs a full extra pass over 100 TB; callers pass a StructType and the
  reader never scans twice.
* **Malformed-record policy** — PERMISSIVE with a ``_corrupt_record``
  column quarantines bad lines without failing the job (web-scrape JSONL
  always has some), DROPMALFORMED discards them, FAILFAST for trusted data.
* **ORC predicate pushdown** — ORC carries min/max stride indexes; Spark
  pushes filters the same way it does for Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """One JSON object per line, one file per partition. ``compression``:
    None | 'gzip' | 'bzip2' | ... — prefer bzip2/none for re-readable
    corpora (splittable); gzip only for write-once hand-offs."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-first JSONL scan. In PERMISSIVE mode malformed lines land in
    ``_corrupt_record`` (added to the schema here) with every data column
    NULL; downstream splits on ``_corrupt_record IS NULL``."""
    s = StructType(list(schema.fields))
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in s.fieldNames():
        s = s.add(CORRUPT_COL, "string")
    return (
        spark.read.schema(s)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_orc(
    df: DataFrame, path: str, compression: str = "zlib"
) -> None:
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, pattern: str | None = None
) -> DataFrame:
    """Media landing-zone scan via Spark's ``binaryFile`` source: one row
    per file with (path, modificationTime, length, content) — the ingest
    edge for image/audio/video payloads feeding the multimodal kernels
    (operators/multimodal).

    Scale: the source splits by FILE (a blob is never split), so
    parallelism = number of files; ``spark.sql.files.maxPartitionBytes``
    packs small files into shared tasks, and the ``pathGlobFilter``
    option prunes non-matching files before any read."""
    reader = spark.read.format("binaryFile")
    if pattern is not None:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(path)
