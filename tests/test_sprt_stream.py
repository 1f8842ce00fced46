"""Streaming SPRT maintenance (streaming/sprt_stream.py): replay
idempotence, merge == batch-gate-over-accumulated-feed EXACT equality
(integer monoid), empty-batch safety, and a live two-wave stream."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from strava_vector_search_spark.queries import _SPRT_LA, _SPRT_LB
from strava_vector_search_spark.streaming.sprt_stream import (
    batch_sprt_partial,
    process_sprt_batch,
    sprt_decision,
    start_sprt_stream,
)


def _vals(spark, rows):
    return spark.createDataFrame([(float(r),) for r in rows], "value double")


def _expected_llr_s(rows):
    return sum(_SPRT_LA if r > 50 else _SPRT_LB for r in rows)


def test_partial_is_exact_integer_monoid(spark):
    rows = [10, 60, 90, 20, 55]
    got = batch_sprt_partial(_vals(spark, rows)).head()
    assert got["llr_s"] == _expected_llr_s(rows)
    assert got["n_obs"] == len(rows)


def test_process_batch_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = _vals(spark, [i % 100 for i in range(400)]).repartition(4)
    process_sprt_batch(batch, 0, state)
    first = sprt_decision(spark, state).head()
    process_sprt_batch(batch, 0, state)  # replay rewrites own partition
    again = sprt_decision(spark, state).head()
    assert first == again


def test_merged_equals_accumulated_feed(spark, tmp_path):
    state = str(tmp_path / "state")
    w1 = [i % 100 for i in range(500)]
    w2 = [(i * 7) % 100 for i in range(300)]
    process_sprt_batch(_vals(spark, w1), 0, state)
    process_sprt_batch(_vals(spark, w2), 1, state)
    got = sprt_decision(spark, state).head()
    assert got["n"] == 800
    exact = _expected_llr_s(w1 + w2)
    assert got["llr"] == round(exact / 1e10, 6)


def test_empty_batch_contributes_identity(spark, tmp_path):
    state = str(tmp_path / "state")
    process_sprt_batch(_vals(spark, [60, 70]), 0, state)
    before = sprt_decision(spark, state).head()
    process_sprt_batch(
        _vals(spark, [1.0]).filter(F.lit(False)), 1, state
    )
    after = sprt_decision(spark, state).head()
    assert before["llr"] == after["llr"]
    assert after["n"] == before["n"]


def test_live_stream_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _vals(spark, [90] * 50).write.parquet(incoming)
    q = start_sprt_stream(
        spark, incoming, state, ckpt, schema="value double",
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                n = sprt_decision(spark, state).head()["n"]
                if n == 50:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert n == 50
        # 50 successes push the LLR over the upper Wald boundary
        assert sprt_decision(spark, state).head()["decision"] == "accept_h1"
        _vals(spark, [90] * 30).write.mode("append").parquet(incoming)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            n = sprt_decision(spark, state).head()["n"]
            if n == 80:
                break
            time.sleep(1)
        assert n == 80
    finally:
        q.stop()
