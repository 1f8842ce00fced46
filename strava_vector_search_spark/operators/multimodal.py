"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS
behind ``decoder=`` hooks (a deterministic fake for tests, or raise
NotImplementedError when a real codec is required) — but everything Spark-
side is real and tested: schemas, batch iteration, partition sizing, UDF
signatures, and the narrow-metadata/wide-payload table split.

Scale notes (100 TB of media):
* payloads live in their own table (id, content binary, media_type), far
  from the searchable metadata — the same narrow/wide split as embeddings;
* ``mapInPandas`` streams Arrow record batches, so one task never holds
  more than spark.sql.execution.arrow.maxRecordsPerBatch payloads;
* decode fan-out (e.g. video → frames) yields MULTIPLE output rows per
  input row — mapInPandas is the right shape (1→N), not a scalar UDF;
* cap partition bytes (`maxPartitionBytes`) so a partition of blobs fits
  in executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, header_hex string"
)
FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, width int, height int, feature array<float>"
)

Decoder = Callable[[bytes], list[tuple[int, int, int, list[float]]]]
# decoder(payload) -> [(frame_idx, width, height, feature_vec), ...]


def fake_decoder(payload: bytes) -> list[tuple[int, int, int, list[float]]]:
    """Deterministic stand-in for a real codec: derives 'frames' and a tiny
    'feature vector' from the bytes themselves. Keeps the full pipeline
    runnable + assertable without image/audio libraries."""
    n = len(payload)
    n_frames = max(1, min(3, n // 8))
    return [
        (
            i,
            16 + (n % 16),
            16 + ((n >> 2) % 16),
            # whole-number floats: exact in float32, so the oracle can
            # reproduce them bit-for-bit
            [float((payload[j % n] + i) % 251) for j in range(4)] if n else [0.0] * 4,
        )
        for i in range(n_frames)
    ]


def real_decoder(_: bytes) -> list[tuple[int, int, int, list[float]]]:
    """The production hook: swap in PIL/ffmpeg/torchaudio here."""
    raise NotImplementedError(
        "no media codecs in this environment — inject a decoder built on "
        "PIL/ffmpeg/torchaudio via the decoder= parameter"
    )


def extract_metadata(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap typed metadata from opaque payloads — pure expressions, no
    Python: byte length + magic-bytes prefix for format sniffing."""
    return media.select(
        "media_id",
        "media_type",
        F.length(F.col(content_col)).cast("bigint").alias("n_bytes"),
        F.hex(F.substring(F.col(content_col), 1, 4)).alias("header_hex"),
    )


def decode_frames(
    media: DataFrame,
    decoder: Decoder = fake_decoder,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """payload → frames/features via mapInPandas (1 row → N rows).

    The iterator signature processes one Arrow batch at a time; peak memory
    per task is one batch of payloads + its decoded frames.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "width": [],
                "height": [],
                "feature": [],
            }
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(payload) if payload is not None else b""
                for frame_idx, w, h, feat in decoder(blob):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(frame_idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["feature"].append(feat)
            yield pd.DataFrame(out)

    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    return rebalance_for_kernel(media.select(id_col, content_col)).mapInPandas(
        _decode, FRAME_SCHEMA
    )


def sample_frames(frames: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: keep every n-th decoded frame — the standard
    video-pipeline decimation, a pure filter (no Python)."""
    return frames.filter(F.col("frame_idx") % every_n == 0)


def fake_resize(
    frame_feature: list[float], width: int, height: int, out_w: int, out_h: int
) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real resampler: rescales the feature
    values by the area ratio. Keeps the resize plumbing runnable without
    image libraries."""
    ratio = (out_w * out_h) / float(max(1, width * height))
    return out_w, out_h, [round(v * ratio, 6) for v in frame_feature]


def resize_frames(
    frames: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    resizer=fake_resize,
) -> DataFrame:
    """Resize decoded frames via mapInPandas (Arrow-batched; swap
    ``resizer`` for a PIL/opencv kernel in production — same signature)."""
    import pandas as pd

    def _resize(batches):
        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "width": [], "height": [], "feature": [],
            }
            for _, r in pdf.iterrows():
                w, h, feat = resizer(list(r["feature"]), r["width"], r["height"], out_w, out_h)
                out["media_id"].append(r["media_id"])
                out["frame_idx"].append(r["frame_idx"])
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return frames.mapInPandas(_resize, FRAME_SCHEMA)


def patch_grid(frames: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch grid over decoded frames: each (width × height)
    frame fans out to its non-overlapping ``patch × patch`` tiles with
    pixel offsets — the tokenization step of an image-encoder pipeline.

    Pure expressions (sequence + explode), map-only 1→N fan-out: no
    Python, no shuffle, so it composes with the decode kernel inside one
    stage at any corpus size. Remainder pixels beyond the last full patch
    are cropped (floor semantics), the standard ViT preprocessing choice;
    frames smaller than one patch are dropped.
    """
    nx = F.floor(F.col("width") / patch).cast("int")
    ny = F.floor(F.col("height") / patch).cast("int")
    return (
        frames.withColumn("nx", nx)
        .withColumn("ny", ny)
        .filter((F.col("nx") >= 1) & (F.col("ny") >= 1))
        .select(
            "media_id",
            "frame_idx",
            F.explode(
                F.sequence(F.lit(0), F.col("nx") * F.col("ny") - 1)
            ).alias("patch_idx"),
            "nx",
            "ny",
        )
        .select(
            "media_id",
            "frame_idx",
            "patch_idx",
            ((F.col("patch_idx") % F.col("nx")) * patch)
            .cast("int")
            .alias("x0"),
            (F.floor(F.col("patch_idx") / F.col("nx")) * patch)
            .cast("int")
            .alias("y0"),
            "nx",
            "ny",
        )
    )


AUDIO_SCHEMA = "media_id bigint, n_samples int, samples array<int>"


def fake_pcm_decoder(payload: bytes) -> list[int]:
    """Deterministic stand-in for an audio codec: the payload bytes read as
    signed 8-bit PCM (sample = byte - 128). Real hook: torchaudio/ffmpeg
    via the decoder= parameter, exactly like ``decode_frames``."""
    return [b - 128 for b in payload]


def decode_pcm(
    media: DataFrame,
    decoder: Callable[[bytes], list[int]] = fake_pcm_decoder,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """payload → sample array via mapInPandas — the audio twin of
    ``decode_frames``. Python touches bytes ONLY here; every downstream
    feature (windowing, energy, peak) is JVM expressions over the decoded
    array."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "n_samples": [], "samples": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(payload) if payload is not None else b""
                samples = decoder(blob)
                out["media_id"].append(mid)
                out["n_samples"].append(len(samples))
                out["samples"].append(samples)
            yield pd.DataFrame(out)

    from strava_vector_search_spark.operators.util import rebalance_for_kernel

    return rebalance_for_kernel(media.select(id_col, content_col)).mapInPandas(
        _decode, AUDIO_SCHEMA
    )


def audio_windows(
    decoded: DataFrame, win: int = 32, hop: int = 16
) -> DataFrame:
    """Overlapping analysis windows over decoded samples with per-window
    energy/peak features — the spectrogram-prep shape (frame → feature),
    minus the FFT the container can't host.

    All window math is codegen'd array expressions (slice + integer
    fold): the squared-sample sum accumulates in LONG (exact, order-free),
    so the RMS energy is bit-reproducible against the SQL oracle. Clips
    shorter than one window emit a single truncated window; otherwise
    full windows at ``hop`` stride (sequence + explode fan-out, no
    Python)."""
    n = F.col("n_samples")
    starts = F.when(
        n >= win, F.sequence(F.lit(0), n - win, F.lit(hop))
    ).otherwise(F.array(F.lit(0)))
    sm = F.col("samples")
    wins = F.transform(
        starts,
        lambda s, j: F.struct(
            j.alias("win_idx"),
            F.least(F.lit(win), n - s).alias("n_win"),
            F.slice(sm, s + 1, F.least(F.lit(win), n - s)).alias("w"),
        ),
    )
    sq_sum = lambda w: F.aggregate(  # noqa: E731
        w, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long") * x
    )
    return (
        decoded.filter(n > 0)
        .select("media_id", F.explode(wins).alias("wn"))
        .select(
            "media_id",
            F.col("wn.win_idx").alias("win_idx"),
            F.col("wn.n_win").alias("n_win"),
            F.round(
                F.sqrt(
                    sq_sum(F.col("wn.w")).cast("double")
                    / F.col("wn.n_win")
                ),
                6,
            ).alias("energy"),
            F.array_max(F.transform(F.col("wn.w"), F.abs)).alias("peak"),
        )
    )


def extract_metadata_arrow(
    media: DataFrame, content_col: str = "content"
) -> DataFrame:
    """`mapInArrow` twin of :func:`extract_metadata`: processes raw Arrow
    RecordBatches with pyarrow.compute — NO pandas materialization, so
    large binary payloads never round-trip through Python objects (the
    fast lane for multimodal byte columns; pandas conversion of a binary
    column copies every blob into a Python bytes object, Arrow compute
    operates on the buffer in place). Same output contract as the
    expression version (pinned in test_multimodal); use the expression
    version when the computation is expressible — this path exists for
    kernels that genuinely need Python over the raw buffers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            tbl = pa.Table.from_batches([batch])
            content = tbl.column(content_col)
            n_bytes = pc.cast(pc.binary_length(content), pa.int64())
            # hex of the first 4 bytes, matching F.hex(F.substring(c,1,4))
            prefix = pc.binary_slice(content, 0, 4)
            # NB: a pyarrow NULL scalar is NOT Python None — materialize
            # with as_py() first, which maps nulls to None
            header_hex = pa.array(
                [
                    None if (b := v.as_py()) is None else b.hex().upper()
                    for v in prefix
                ],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("media_id").combine_chunks(),
                    tbl.column("media_type").combine_chunks(),
                    n_bytes.combine_chunks()
                    if isinstance(n_bytes, pa.ChunkedArray)
                    else n_bytes,
                    header_hex,
                ],
                names=["media_id", "media_type", "n_bytes", "header_hex"],
            )

    return media.mapInArrow(
        batches,
        schema=(
            "media_id bigint, media_type string, "
            "n_bytes bigint, header_hex string"
        ),
    )
