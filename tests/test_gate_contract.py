"""Meta-guards on the driver contract itself: every registry query has an
oracle unless it is on the known rows-only list; names stay in sync."""

from __future__ import annotations

from strava_vector_search_spark.oracles import ORACLES
from strava_vector_search_spark.queries import QUERIES

KNOWN_ROWS_ONLY = {
    "ann_kmeans_ivf_topk",  # MLlib KMeans internals not SQL-expressible
    "ann_lsh_near_dup",  # MLlib random-hyperplane LSH internals
    "vs_index_build_stats",  # xxhash64 embedder internals
}


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
