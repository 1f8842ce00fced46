"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship filtered-cosine-top-k query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle twin. Implementations live in
``strava_vector_search_spark/queries.py`` (Spark) and ``oracles.py`` (SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from strava_vector_search_spark.oracles import ORACLES  # noqa: E402
from strava_vector_search_spark.queries import QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["vs_topk_filtered"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    return dict(ORACLES)
