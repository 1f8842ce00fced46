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


def test_coverage_gate_index_matches_registry():
    """COVERAGE.md's "Complete gate index" is generated from QUERIES by
    tools/gen_gate_index.py; this pins the committed file to exactly what
    the generator emits so the index can never drift again (it went 4
    entries stale in round 5)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from gen_gate_index import HEADER, render_index

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    with open(path) as f:
        text = f.read()
    _, sep, tail = text.partition(HEADER)
    assert sep, "Complete gate index section missing from COVERAGE.md"
    assert (HEADER + tail) == render_index(), (
        "COVERAGE.md gate index is stale — run tools/gen_gate_index.py"
    )
