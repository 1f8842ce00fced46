"""JSONL/ORC source-sink behaviors that the roundtrip gate can't show:
malformed-line quarantine (PERMISSIVE), discard (DROPMALFORMED), and ORC
filter pushdown reaching the scan."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from strava_vector_search_spark.io import formats as FMT

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("text", StringType())]
)


@pytest.fixture()
def dirty_jsonl(tmp_path):
    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"id": 1, "text": "ok one"}\n'
        "this line is not json at all\n"
        '{"id": 2, "text": "ok two"}\n'
        '{"id": "not-a-number", "text": "bad type"}\n'
    )
    return str(p)


def test_permissive_quarantines_bad_lines(spark, dirty_jsonl):
    df = FMT.read_jsonl(spark, dirty_jsonl, SCHEMA, mode="PERMISSIVE")
    good = df.filter(F.col(FMT.CORRUPT_COL).isNull())
    bad = df.filter(F.col(FMT.CORRUPT_COL).isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    # both the non-JSON line and the type-mismatch line are quarantined,
    # with the raw text preserved for triage
    raw = [r[FMT.CORRUPT_COL] for r in bad.collect()]
    assert len(raw) == 2
    assert any("not json" in s for s in raw)
    assert any("not-a-number" in s for s in raw)


def test_dropmalformed_discards(spark, dirty_jsonl):
    df = FMT.read_jsonl(spark, dirty_jsonl, SCHEMA, mode="DROPMALFORMED")
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_jsonl_gzip_roundtrip_preserves_unicode_and_nulls(spark, tmp_path):
    rows = [(1, 'quote " and \\ backslash'), (2, "日本語 𝔘nicode"), (3, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "rt")
    FMT.write_jsonl(df, path, compression="gzip")
    back = FMT.read_jsonl(spark, path, SCHEMA).drop(FMT.CORRUPT_COL)
    assert sorted(
        [(r["id"], r["text"]) for r in back.collect()],
        key=lambda t: t[0],
    ) == rows


def test_orc_pushdown_reaches_scan(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    path = str(tmp_path / "orc")
    FMT.write_orc(df, path)
    plan = (
        FMT.read_orc(spark, path)
        .filter(F.col("bucket") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "bucket" in plan


def test_read_binary_files_roundtrip(spark, tmp_path):
    from strava_vector_search_spark.io.formats import read_binary_files

    payloads = {"x.bin": b"\x00\x01hello", "y.bin": b"world" * 10, "skip.txt": b"no"}
    for name, b in payloads.items():
        (tmp_path / name).write_bytes(b)
    out = read_binary_files(spark, str(tmp_path), pattern="*.bin")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert set(rows) == {"x.bin", "y.bin"}          # glob filter applied
    assert bytes(rows["x.bin"]["content"]) == payloads["x.bin"]
    assert rows["y.bin"]["length"] == 50
