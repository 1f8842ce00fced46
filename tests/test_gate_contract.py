"""Meta-guards on the driver contract itself: every registry query has an
oracle unless it is on the known rows-only list; names stay in sync."""

from __future__ import annotations

from strava_vector_search_spark.oracles import ORACLES
from strava_vector_search_spark.queries import QUERIES

# Empty since round 2: the MLlib/embedder entries whose internals are not
# SQL-expressible now gate on oracle-checkable PROPERTIES (recall bounds,
# probe-subset exactness, build invariants) instead of going rows-only.
KNOWN_ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_known_rows_only():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == KNOWN_ROWS_ONLY


def test_no_orphan_oracles():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_points_importable():
    import __spark_entry__ as m

    qs, os_ = m.queries(), m.oracle_sql()
    assert set(qs) == set(QUERIES)
    assert set(os_) == set(ORACLES)
    assert callable(qs["vs_topk_filtered"])
