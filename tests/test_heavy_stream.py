"""Streaming heavy-hitter maintenance (streaming/heavy_stream.py):
mergeable per-batch MG summaries, replay idempotence, candidate-superset
guarantee mid-stream, and exact-recount parity with the batch operator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from strava_vector_search_spark.operators.heavy import heavy_hitters_exact
from strava_vector_search_spark.streaming.heavy_stream import (
    exact_heavy_hitters,
    merged_candidates,
    process_heavy_batch,
    start_heavy_stream,
)


def _items(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "item string")


def _wave(hot_n, tail_range):
    return ["hot"] * hot_n + [f"t{i}" for i in tail_range]


def test_process_batch_idempotent_rewrite(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = _items(spark, _wave(50, range(100))).repartition(4)
    process_heavy_batch(batch, 0, state, "item", capacity=8)
    first = sorted(
        (r["item"], r["cnt"])
        for r in spark.read.parquet(state).drop("_batch_id").collect()
    )
    # replay the same batch id: must rewrite identical content, not append
    process_heavy_batch(batch, 0, state, "item", capacity=8)
    again = sorted(
        (r["item"], r["cnt"])
        for r in spark.read.parquet(state).drop("_batch_id").collect()
    )
    assert first == again


def test_merged_candidates_superset_and_exact_parity(spark, tmp_path):
    state = str(tmp_path / "state")
    # two waves: 'hot' heavy in both; 'warm' heavy only when combined;
    # disjoint singleton tails
    w1 = _items(spark, _wave(80, range(200)) + ["warm"] * 30).repartition(4)
    w2 = _items(spark, _wave(70, range(200, 400)) + ["warm"] * 40).repartition(4)
    process_heavy_batch(w1, 0, state, "item", capacity=16)
    process_heavy_batch(w2, 1, state, "item", capacity=16)

    cands = {
        r["item"] for r in merged_candidates(spark, state, "item", 16).collect()
    }
    assert {"hot", "warm"} <= cands

    corpus = w1.unionByName(w2)
    got = {
        (r["item"], r["cnt"])
        for r in exact_heavy_hitters(spark, state, corpus, "item", k=9, capacity=16).collect()
    }
    want = {
        (r["item"], r["cnt"])
        for r in heavy_hitters_exact(corpus, "item", k=9, capacity=16).collect()
    }
    assert got == want
    # N = 620, k=9: threshold 68.9 — hot (150) and warm (70) qualify,
    # every tail singleton does not
    assert got == {("hot", 150), ("warm", 70)}


def test_live_stream_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _items(spark, _wave(60, range(150))).write.parquet(incoming)
    q = start_heavy_stream(
        spark, incoming, state, ckpt, schema="item string",
        item_col="item", capacity=16, trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                c = {
                    r["item"]
                    for r in merged_candidates(spark, state, "item", 16).collect()
                }
                if "hot" in c:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert "hot" in c
        # second wave lands mid-stream
        _items(spark, _wave(40, range(150, 300))).write.mode("append").parquet(
            incoming
        )
        q.processAllAvailable()
        n_parts = (
            spark.read.parquet(state).select("_batch_id").distinct().count()
        )
        assert n_parts >= 2
        c2 = {
            r["item"]
            for r in merged_candidates(spark, state, "item", 16).collect()
        }
        assert "hot" in c2
    finally:
        q.stop()
