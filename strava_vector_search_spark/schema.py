"""Fixed schemas for the workout-document data model — the Spark equivalent
of the reference DDL (``01_method1_cortex_search.sql:72-94``,
``02_method2_manual_vector_embedding.sql:80-105``).

The reference declares schemas in DDL and casts CSV columns positionally at
load; it never infers. Same stance here: these StructTypes are the single
source of truth, ``inferSchema`` is never used for the corpus (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EMBEDDING_DIM = 768  # e5-base-v2 (02:87-88); tests override with smaller dims

# WORKOUTS (01:72-94): one row per workout document
WORKOUTS_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("embed_str", StringType(), nullable=True),
        StructField("sport_type", StringType(), nullable=False),
        StructField("difficulty", StringType(), nullable=False),
        StructField("moving_time_seconds", IntegerType(), nullable=True),
        StructField("distance_meters", IntegerType(), nullable=True),
        StructField("generation_model", StringType(), nullable=False),
        StructField("workout_source", StringType(), nullable=False),
        StructField("store_version", StringType(), nullable=False),
        StructField("raw_json_str", StringType(), nullable=True),
        StructField("created_at", TimestampNTZType(), nullable=False),
    ]
)

# WORKOUTS_WITH_VECTORS adds the embedding column (02:88)
WORKOUTS_WITH_VECTORS_SCHEMA = StructType(
    WORKOUTS_SCHEMA.fields
    + [StructField("embedding", ArrayType(FloatType()), nullable=True)]
)

# the narrow materialized index table (SURVEY §4: the central design choice)
EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("embedding", ArrayType(FloatType()), nullable=True),
    ]
)

# raw_json_str payload — the measured 2,000-row corpus shape (SURVEY §1.1.3),
# kept as string at rest + parsed with this explicit schema (VARIANT-parity
# strategy that stays oracle-friendly, SURVEY §7 risk 3)
RAW_JSON_SCHEMA = StructType(
    [
        StructField("workout_title", StringType()),
        StructField("workout_instructions", StringType()),
        StructField("workout_difficulty", StringType()),
        StructField(
            "sport_specs",
            ArrayType(StructType([StructField("sport_type", StringType())])),
        ),
        StructField(
            "structured_workout_source_info",
            StructType(
                [
                    StructField("source", StringType()),
                    StructField("source_uid", StringType()),
                    StructField("generation_model", StringType()),
                ]
            ),
        ),
    ]
)

# generated-cache extension: arrays-of-structs nested 4 deep (FIXTURES.md)
_SCALAR_VALUE = StructType(
    [
        StructField("value_type", StringType()),
        StructField("value", IntegerType()),
        StructField("min_value", IntegerType()),
        StructField("max_value", IntegerType()),
    ]
)

RAW_JSON_GENERATED_SCHEMA = StructType(
    RAW_JSON_SCHEMA.fields
    + [
        StructField("workout_query", StringType()),
        StructField(
            "structured_characteristics",
            StructType([StructField("workout_data_tags", ArrayType(StringType()))]),
        ),
        StructField(
            "sets",
            ArrayType(
                StructType(
                    [
                        StructField("repeats_min", IntegerType()),
                        StructField(
                            "steps",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("workout_step_type", StringType()),
                                        StructField("scalar_value", _SCALAR_VALUE),
                                        StructField("description", StringType()),
                                    ]
                                )
                            ),
                        ),
                        StructField(
                            "display_data",
                            StructType([StructField("set_description", StringType())]),
                        ),
                    ]
                )
            ),
        ),
        StructField("scalar_values", ArrayType(_SCALAR_VALUE)),
        StructField("parametrized_strings", ArrayType(StringType())),
    ]
)
