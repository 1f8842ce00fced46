from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strava_vector_search_spark.operators.multimodal import (
    decode_frames,
    extract_metadata,
    fake_decoder,
    real_decoder,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [
            (1, "image/png", bytearray(b"\x89PNG\r\n\x1a\nrest-of-payload-bytes")),
            (2, "audio/wav", bytearray(b"RIFFxxxxWAVEfmt padding")),
            (3, "video/mp4", bytearray(b"\x00\x00\x00 ftypisom-and-more-bytes!")),
            (4, "image/png", bytearray(b"tiny")),
        ],
        "media_id long, media_type string, content binary",
    )


def test_metadata_magic_bytes(media):
    meta = {r["media_id"]: r for r in extract_metadata(media).collect()}
    assert meta[1]["header_hex"] == "89504E47"  # PNG magic
    assert meta[2]["header_hex"] == "52494646"  # RIFF
    assert meta[1]["n_bytes"] == 29


def test_decode_fanout_shapes(media):
    frames = decode_frames(media).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # n_frames = max(1, min(3, n_bytes // 8))
    assert len(by_id[1]) == 3
    assert len(by_id[4]) == 1  # tiny payload -> single frame
    f0 = sorted(by_id[1], key=lambda r: r["frame_idx"])[0]
    assert len(f0["feature"]) == 4
    assert 16 <= f0["width"] < 32 and 16 <= f0["height"] < 32


def test_decode_deterministic(media):
    a = sorted(map(tuple, decode_frames(media).collect()))
    b = sorted(map(tuple, decode_frames(media).collect()))
    assert a == b


def test_fake_decoder_empty_payload():
    frames = fake_decoder(b"")
    assert len(frames) == 1
    assert frames[0][3] == [0.0, 0.0, 0.0, 0.0]


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        real_decoder(b"anything")


def test_sample_and_resize_frames(media):
    from strava_vector_search_spark.operators.multimodal import (
        resize_frames,
        sample_frames,
    )

    frames = decode_frames(media)
    sampled = sample_frames(frames, every_n=2).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in sampled)
    assert len(sampled) < frames.count()

    resized = resize_frames(frames, out_w=8, out_h=8).collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in resized)
    assert len(resized) == frames.count()
    # features rescaled by area ratio, deterministic
    again = resize_frames(frames, out_w=8, out_h=8).collect()
    assert sorted(map(tuple, resized)) == sorted(map(tuple, again))


def test_rolling_fingerprint_order_sensitive(spark):
    from strava_vector_search_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "id int, text string",
    )
    fp = {r["id"]: r["f"] for r in df.select("id", rolling_fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # order matters — unlike the set-style md5 fingerprint


def test_patch_grid_covers_frame_exactly(spark):
    from strava_vector_search_spark.operators.multimodal import patch_grid

    frames = spark.createDataFrame(
        [(1, 0, 24, 16), (1, 1, 17, 31), (2, 0, 7, 20)],
        "media_id long, frame_idx int, width int, height int",
    )
    got = patch_grid(frames, patch=8).collect()
    # frame (24, 16): 3x2=6 patches; (17, 31): 2x3=6 (remainder cropped);
    # (7, 20): narrower than one patch -> dropped entirely
    by_frame = {}
    for r in got:
        by_frame.setdefault((r["media_id"], r["frame_idx"]), []).append(r)
    assert set(by_frame) == {(1, 0), (1, 1)}
    assert len(by_frame[(1, 0)]) == 6 and len(by_frame[(1, 1)]) == 6
    f0 = sorted(by_frame[(1, 0)], key=lambda r: r["patch_idx"])
    assert [(r["x0"], r["y0"]) for r in f0] == [
        (0, 0), (8, 0), (16, 0), (0, 8), (8, 8), (16, 8)
    ]
    for r in f0:
        assert r["x0"] + 8 <= 24 and r["y0"] + 8 <= 16  # tiles stay in-frame


def test_patch_grid_is_map_only(spark):
    """No shuffle: the fan-out must not introduce an Exchange."""
    from strava_vector_search_spark.operators.multimodal import patch_grid

    frames = spark.createDataFrame(
        [(1, 0, 32, 32)], "media_id long, frame_idx int, width int, height int"
    )
    plan = (
        patch_grid(frames, patch=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_decode_pcm_and_audio_windows(spark):
    from strava_vector_search_spark.operators.multimodal import (
        audio_windows,
        decode_pcm,
    )

    payload = bytes(range(100, 180))  # 80 samples
    short = b"\x80\x84"               # 2 samples: 0, 4
    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(short))],
        "media_id long, content binary",
    )
    decoded = decode_pcm(media)
    d = {r["media_id"]: r for r in decoded.collect()}
    assert d[1]["n_samples"] == 80
    assert d[1]["samples"][:3] == [100 - 128, 101 - 128, 102 - 128]

    wins = audio_windows(decoded, win=32, hop=16).collect()
    by_media = {}
    for r in wins:
        by_media.setdefault(r["media_id"], []).append(r)
    # 80 samples, win 32 hop 16 -> starts 0,16,32,48 (48+32=80) -> 4 windows
    w1 = sorted(by_media[1], key=lambda r: r["win_idx"])
    assert [r["win_idx"] for r in w1] == [0, 1, 2, 3]
    assert all(r["n_win"] == 32 for r in w1)
    # short clip -> single truncated window
    w2 = by_media[2]
    assert len(w2) == 1 and w2[0]["n_win"] == 2
    import math
    assert w2[0]["energy"] == round(math.sqrt((0 + 16) / 2), 6)
    assert w2[0]["peak"] == 4


def test_metadata_arrow_twin_matches_expressions(media, spark):
    """mapInArrow fast lane == expression version, row for row — the
    raw-Arrow path must be value-invisible, INCLUDING on NULL payloads
    (a NULL content row is appended so the None branch actually runs)."""
    from strava_vector_search_spark.operators.multimodal import (
        extract_metadata_arrow,
    )

    with_null = media.unionByName(
        spark.createDataFrame(
            [(9999, "image/png", None)],
            "media_id long, media_type string, content binary",
        )
    )
    expr_rows = sorted(
        map(tuple, extract_metadata(with_null).collect()),
        key=lambda t: (t[0],),
    )
    arrow_rows = sorted(
        map(tuple, extract_metadata_arrow(with_null).collect()),
        key=lambda t: (t[0],),
    )
    assert expr_rows == arrow_rows and len(expr_rows) > 0
    null_row = [t for t in arrow_rows if t[0] == 9999]
    assert null_row and null_row[0][2] is None and null_row[0][3] is None
