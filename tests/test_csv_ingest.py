from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.io.csv_ingest import (
    corrupt_rows,
    parse_raw_json,
    read_csv_typed,
    valid_rows,
    write_corpus_parquet,
)
from strava_vector_search_spark.schema import (
    RAW_JSON_GENERATED_SCHEMA,
    WORKOUTS_SCHEMA,
)

# a fixture CSV exercising the reference's load semantics (FIXTURES.md):
# quoted multiline text, empty strings for null ints, one malformed row
CSV_BODY = '''id,embed_str,sport_type,difficulty,moving_time_seconds,distance_meters,generation_model,workout_source,store_version,raw_json_str,created_at
SLAM_0001,"Interval Run
## Warm-up
10 min easy, build pace
**Tips:** stay relaxed",run,hard,3600,5000,bedrock-sonnet4.0,slam,v1,"{""workout_title"": ""Interval Run"", ""workout_difficulty"": ""hard""}",2025-10-22 05:00:00.000
SLAM_0002,"Recovery ride, very gentle",ride,easy,1800,,bedrock-sonnet4.0,slam,v1,"{""workout_title"": ""Recovery""}",2025-10-22 06:00:00.000
SLAM_0003,"Yoga flow",yoga,"very hard",,not_an_int,bedrock-sonnet4.0,slam,v1,,2025-10-23 07:30:00.000
'''


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "workouts.csv"
    p.write_text(CSV_BODY)
    return str(p)


@pytest.fixture(scope="module")
def loaded(spark, csv_path):
    return read_csv_typed(spark, csv_path, WORKOUTS_SCHEMA).cache()


def test_multiline_quoted_fields(loaded):
    rows = {r["id"]: r for r in valid_rows(loaded).collect()}
    assert "## Warm-up" in rows["SLAM_0001"]["embed_str"]
    assert rows["SLAM_0001"]["embed_str"].count("\n") == 3
    assert rows["SLAM_0002"]["embed_str"] == "Recovery ride, very gentle"


def test_nullif_empty_int(loaded):
    rows = {r["id"]: r for r in valid_rows(loaded).collect()}
    assert rows["SLAM_0002"]["distance_meters"] is None  # '' -> NULL
    assert rows["SLAM_0003"]["moving_time_seconds"] is None
    assert rows["SLAM_0001"]["distance_meters"] == 5000


def test_bad_cell_nulls_not_kills_row(loaded):
    # 'not_an_int' distance: the cell nulls, the row survives
    rows = {r["id"]: r for r in valid_rows(loaded).collect()}
    assert "SLAM_0003" in rows
    assert rows["SLAM_0003"]["distance_meters"] is None
    assert rows["SLAM_0003"]["difficulty"] == "very hard"  # the spelling wrinkle


def test_timestamp_ntz_cast(loaded):
    rows = {r["id"]: r for r in valid_rows(loaded).collect()}
    assert rows["SLAM_0001"]["created_at"].hour == 5
    assert corrupt_rows(loaded).count() == 0


def test_raw_json_parse(loaded):
    parsed = parse_raw_json(valid_rows(loaded))
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows["SLAM_0001"]["raw_json_str_parsed"]["workout_title"] == "Interval Run"
    assert rows["SLAM_0003"]["raw_json_str_parsed"] is None


def test_nested_generated_json_schema(spark):
    js = (
        '{"workout_title": "T", "sets": [{"repeats_min": 4, "steps": '
        '[{"workout_step_type": "interval", "scalar_value": {"value_type": '
        '"duration", "value": 300, "min_value": 240, "max_value": 360}, '
        '"description": "hard push"}], "display_data": '
        '{"set_description": "4x300s"}}], "parametrized_strings": ["<PACE_ZONE_4>"]}'
    )
    df = spark.createDataFrame([(js,)], "raw_json_str string")
    parsed = parse_raw_json(df, schema=RAW_JSON_GENERATED_SCHEMA).head()[
        "raw_json_str_parsed"
    ]
    # 4-deep nesting: sets[0].steps[0].scalar_value.value
    assert parsed["sets"][0]["steps"][0]["scalar_value"]["value"] == 300
    assert parsed["sets"][0]["repeats_min"] == 4
    assert parsed["parametrized_strings"] == ["<PACE_ZONE_4>"]


def test_partitioned_corpus_write_prunes(spark, loaded, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus_parquet(valid_rows(loaded), out)
    back = spark.read.parquet(out)
    assert back.count() == 3
    plan = (
        back.filter(F.col("sport_type") == "run")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition pruning: the sport_type predicate appears as a partition
    # filter, not a data filter
    assert "PartitionFilters" in plan


JSONL_BODY = "\n".join(
    [
        '{"id": "SLAM_j001", "embed_str": "Run\\n## Warm-up\\neasy", "sport_type": "run", "difficulty": "hard", "moving_time_seconds": "3600", "distance_meters": "5000", "generation_model": "bedrock-sonnet4.0", "workout_source": "slam", "store_version": "v1", "raw_json_str": "{\\"workout_title\\": \\"R\\"}", "created_at": "2025-10-22 05:00:00.000"}',
        '{"id": "SLAM_j002", "embed_str": "Ride", "sport_type": "ride", "difficulty": "easy", "moving_time_seconds": "", "distance_meters": "oops", "generation_model": "bedrock-sonnet4.0", "workout_source": "slam", "store_version": "v1", "raw_json_str": null, "created_at": "2025-10-23 06:00:00.000"}',
        'this is not json at all {{{',
    ]
)


def test_jsonl_typed_load_matches_csv_semantics(spark, tmp_path):
    from strava_vector_search_spark.io.csv_ingest import read_jsonl_typed

    p = tmp_path / "workouts.jsonl"
    p.write_text(JSONL_BODY + "\n")
    loaded = read_jsonl_typed(spark, str(p), WORKOUTS_SCHEMA)
    good = {r["id"]: r for r in valid_rows(loaded).collect()}
    assert set(good) == {"SLAM_j001", "SLAM_j002"}
    assert "## Warm-up" in good["SLAM_j001"]["embed_str"]
    assert good["SLAM_j001"]["distance_meters"] == 5000
    assert good["SLAM_j002"]["moving_time_seconds"] is None  # '' -> NULL
    assert good["SLAM_j002"]["distance_meters"] is None  # bad cell nulls
    assert good["SLAM_j001"]["created_at"].hour == 5
    assert corrupt_rows(loaded).count() == 1  # the non-JSON line quarantined
