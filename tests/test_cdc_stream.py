"""Streaming CDC apply: versioned-snapshot commit protocol + live stream."""

from __future__ import annotations

import time

from strava_vector_search_spark.streaming.cdc_stream import (
    process_cdc_batch,
    read_snapshot,
    start_cdc_stream,
)

SCHEMA = "id int, name string, v int, seq int, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap_dict(spark, path):
    return {
        r["id"]: (r["name"], r["v"])
        for r in read_snapshot(spark, path).collect()
    }


def test_bootstrap_then_advance(spark, tmp_path):
    snap = str(tmp_path / "snap")
    process_cdc_batch(
        spark, _ch(spark, [(1, "a", 10, 1, "I"), (2, "b", 20, 1, "I")]),
        0, snap, ["id"],
    )
    assert _snap_dict(spark, snap) == {1: ("a", 10), 2: ("b", 20)}
    process_cdc_batch(
        spark,
        _ch(spark, [(1, "a2", 11, 2, "U"), (2, None, None, 2, "D"),
                    (3, "c", 30, 2, "I")]),
        1, snap, ["id"],
    )
    assert _snap_dict(spark, snap) == {1: ("a2", 11), 3: ("c", 30)}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    snap = str(tmp_path / "snap")
    process_cdc_batch(spark, _ch(spark, [(1, "a", 10, 1, "I")]), 0, snap, ["id"])
    upd = _ch(spark, [(1, "a2", 11, 2, "U")])
    process_cdc_batch(spark, upd, 1, snap, ["id"])
    before = _snap_dict(spark, snap)
    # crash-and-replay: the same batch id runs again
    process_cdc_batch(spark, upd, 1, snap, ["id"])
    assert _snap_dict(spark, snap) == before == {1: ("a2", 11)}


def test_streaming_end_to_end_two_waves(spark, tmp_path):
    incoming = str(tmp_path / "in")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    _ch(spark, [(1, "a", 10, 1, "I"), (2, "b", 20, 1, "I")]).write.parquet(
        incoming
    )
    q = start_cdc_stream(
        spark, incoming, snap, ckpt, SCHEMA, ["id"], trigger_seconds=1
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if _snap_dict(spark, snap) == {1: ("a", 10), 2: ("b", 20)}:
                    break
            except FileNotFoundError:
                pass
            time.sleep(0.5)
        assert _snap_dict(spark, snap) == {1: ("a", 10), 2: ("b", 20)}

        _ch(spark, [(2, "b9", 29, 2, "U"), (1, None, None, 2, "D")]).write.mode(
            "append"
        ).parquet(incoming)
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if _snap_dict(spark, snap) == {2: ("b9", 29)}:
                break
            time.sleep(0.5)
        assert _snap_dict(spark, snap) == {2: ("b9", 29)}
    finally:
        q.stop()
