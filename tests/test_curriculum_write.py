"""dm_curriculum_write: the written schedule must be PHYSICALLY ordered —
a trainer that streams bucket directories in bucket order and rows in
parquet row order must see exactly pos = 1, 2, 3, ... with no sort at
read time. Checked against the raw files with pyarrow (no Spark read
path in the loop, so a Spark-side reorder can't mask a bad write).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from strava_vector_search_spark.queries import QUERIES


def test_written_schedule_is_physically_ordered(spark, sf_dir):
    # run the gate (builds + caches the layout) and locate the artifact
    QUERIES["dm_curriculum_write"](spark, sf_dir).collect()
    from strava_vector_search_spark.queries import (
        _cached_layout,  # reuse the exact cache-key logic
    )

    path = _cached_layout(
        sf_dir, "documents", "curric", lambda tmp: None
    )
    bucket_dirs = sorted(
        glob.glob(os.path.join(path, "bucket=*")),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )
    assert bucket_dirs, f"no bucket directories under {path}"
    expect = 1
    for d in bucket_dirs:
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        assert len(files) == 1, f"bucket {d} must be one file, got {files}"
        pos = pq.read_table(files[0], columns=["pos"])["pos"].to_pylist()
        for p in pos:
            assert p == expect, (d, p, expect)
            expect += 1
    # the sequential walk covered the whole corpus: every document got
    # exactly one position and no position was skipped or duplicated
    n_docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    )
    assert expect - 1 == n_docs
