"""Streaming Count-Min maintenance (streaming/cms_stream.py): replay
idempotence, merge == from-scratch EXACT cell equality, never-undercount
estimates, and a live two-wave stream."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.cms import (
    cms_cells,
    cms_estimates,
)
from strava_vector_search_spark.streaming.cms_stream import (
    merged_sketch,
    process_cms_batch,
    start_cms_stream,
)


def _keys(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k bigint")


def _cells_set(df):
    return sorted((r["j"], r["bucket"], r["cnt"]) for r in df.collect())


def test_process_batch_idempotent_rewrite(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = _keys(spark, list(range(50)) * 3).repartition(4)
    process_cms_batch(batch, 0, state, "k")
    first = _cells_set(spark.read.parquet(state).drop("_batch_id"))
    process_cms_batch(batch, 0, state, "k")
    again = _cells_set(spark.read.parquet(state).drop("_batch_id"))
    assert first == again


def test_merged_equals_from_scratch_sketch(spark, tmp_path):
    """The CMS merge property makes streaming maintenance EXACT: the
    merged store is bit-identical to sketching the concatenated feed."""
    state = str(tmp_path / "state")
    w1 = _keys(spark, [i % 97 for i in range(500)]).repartition(4)
    w2 = _keys(spark, [i % 53 + 1000 for i in range(400)]).repartition(4)
    process_cms_batch(w1, 0, state, "k")
    process_cms_batch(w2, 1, state, "k")
    merged = _cells_set(merged_sketch(spark, state))
    scratch = _cells_set(cms_cells(w1.unionByName(w2), "k"))
    assert merged == scratch


def test_estimates_never_undercount(spark, tmp_path):
    state = str(tmp_path / "state")
    feed = _keys(spark, [i % 31 for i in range(600)])
    process_cms_batch(feed, 0, state, "k")
    probes = _keys(spark, list(range(31)))
    est = {
        r["k"]: r["cms_estimate"]
        for r in cms_estimates(
            merged_sketch(spark, state), probes, "k"
        ).collect()
    }
    exact = {
        r["k"]: r["cnt"]
        for r in feed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_live_stream_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _keys(spark, [i % 20 for i in range(200)]).write.parquet(incoming)
    q = start_cms_stream(
        spark, incoming, state, ckpt, schema="k bigint",
        key_col="k", trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        total = 0
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                total = (
                    merged_sketch(spark, state)
                    .groupBy("j")
                    .agg(F.sum("cnt").alias("s"))
                    .agg(F.min("s"))
                    .head()[0]
                )
                if total == 200:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert total == 200
        _keys(spark, [i % 20 for i in range(150)]).write.mode(
            "append"
        ).parquet(incoming)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            total = (
                merged_sketch(spark, state)
                .groupBy("j")
                .agg(F.sum("cnt").alias("s"))
                .agg(F.min("s"))
                .head()[0]
            )
            if total == 350:
                break
            time.sleep(1)
        assert total == 350
    finally:
        q.stop()
