"""Streaming Bloom-filter maintenance (streaming/bloom_stream.py):
replay idempotence, merge == from-scratch EXACT word equality, the
no-false-negative contract through the streamed filter, and a live
two-wave stream."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.bloom import (
    build_filter,
    probe_membership,
)
from strava_vector_search_spark.streaming.bloom_stream import (
    merged_filter,
    process_bloom_batch,
    start_bloom_stream,
)

M = 4096


def _keys(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "s string")


def _words(df):
    return sorted((r["word_idx"], r["word"]) for r in df.collect())


def test_process_batch_idempotent_rewrite(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = _keys(spark, [f"k{i}" for i in range(80)]).repartition(4)
    process_bloom_batch(batch, 0, state, "s", m_bits=M)
    first = _words(spark.read.parquet(state).drop("_batch_id"))
    process_bloom_batch(batch, 0, state, "s", m_bits=M)
    again = _words(spark.read.parquet(state).drop("_batch_id"))
    assert first == again


def test_merged_equals_from_scratch_filter(spark, tmp_path):
    """OR-merge makes streaming maintenance EXACT: the merged store is
    bit-identical to building one filter over the concatenated feed —
    and replaying a batch under a NEW id cannot change it (idempotent
    OR, stronger than CMS's additive merge)."""
    state = str(tmp_path / "state")
    w1 = _keys(spark, [f"a{i}" for i in range(120)]).repartition(4)
    w2 = _keys(spark, [f"b{i}" for i in range(90)]).repartition(4)
    process_bloom_batch(w1, 0, state, "s", m_bits=M)
    process_bloom_batch(w2, 1, state, "s", m_bits=M)
    merged = _words(merged_filter(spark, state))
    scratch = _words(build_filter(w1.unionByName(w2), "s", m_bits=M))
    assert merged == scratch
    process_bloom_batch(w1, 2, state, "s", m_bits=M)  # duplicate wave
    assert _words(merged_filter(spark, state)) == scratch


def test_streamed_filter_never_misses(spark, tmp_path):
    state = str(tmp_path / "state")
    inserted = [f"doc-{i}" for i in range(200)]
    process_bloom_batch(_keys(spark, inserted[:120]), 0, state, "s", m_bits=M)
    process_bloom_batch(_keys(spark, inserted[120:]), 1, state, "s", m_bits=M)
    filt = merged_filter(spark, state)
    probes = _keys(spark, inserted + [f"other-{i}" for i in range(200)])
    got = {
        r["s"]: r["maybe_member"]
        for r in probe_membership(probes, "s", filt, m_bits=M).collect()
    }
    assert all(got[k] for k in inserted)  # zero false negatives
    fp = sum(1 for k, v in got.items() if v and k.startswith("other-"))
    assert fp < 50  # 200 keys in 4096 bits: FP rate stays modest


def test_live_two_wave_stream(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    w1 = _keys(spark, [f"w1-{i}" for i in range(60)])
    w1.write.mode("append").parquet(incoming)
    q = start_bloom_stream(
        spark, incoming, state, ckpt, w1.schema, "s",
        m_bits=M, trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if merged_filter(spark, state).count() > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
        _keys(spark, [f"w2-{i}" for i in range(40)]).write.mode(
            "append"
        ).parquet(incoming)
        q.processAllAvailable()
    finally:
        q.stop()
    probes = _keys(spark, ["w1-5", "w2-7", "w1-59", "w2-39"])
    got = probe_membership(
        probes, "s", merged_filter(spark, state), m_bits=M
    ).collect()
    assert all(r["maybe_member"] for r in got)
