"""Source/sink connectors — alias package for :mod:`strava_vector_search_spark.io`.

The ingest implementations live in ``io/`` (csv_ingest: typed CSV/JSONL
landing with the reference's COPY INTO semantics; tables: testdata parquet
loaders). This package re-exports them under the ``sources`` name used in
the build plan so either import path works.
"""

from strava_vector_search_spark.io import csv_ingest, tables  # noqa: F401
from strava_vector_search_spark.io.csv_ingest import (  # noqa: F401
    read_csv_typed,
    read_jsonl_typed,
    valid_rows,
    corrupt_rows,
    parse_raw_json,
    write_corpus_parquet,
)
from strava_vector_search_spark.io.tables import (  # noqa: F401
    corpus_with_vectors,
    load_events,
    load_table,
    load_tables,
)
