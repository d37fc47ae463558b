"""Multimodal column plumbing (charter extension).

Images/audio/video are carried as opaque `binary` payload columns plus a
typed metadata struct — the lakehouse pattern for multimodal training
data: the engine moves/filters/partitions bytes and runs per-batch
Python only at the decode/feature boundary (Arrow-batched mapInPandas,
never per-row UDFs).

Image decode is REAL: `decode_images` prefers PIL when installed and
otherwise uses the repo's pure-stdlib PNG codec (`functions.png` —
zlib inflate + scanline unfiltering), so PNG payloads decode to pixel
tensors with zero external codecs. Video decode is REAL over the PNGV
container (`functions.video` — concatenated PNG frames, the MJPEG
shape): `sample_frames` keyframe-step samples and inflates only the
selected frames; an ffmpeg binding swaps in at its
`decode_video_frames` call site for compressed codecs.
`sample_frames_fake` remains the decoder-free plumbing used where
tests want pinned bytes. The md5-based fake feature extractor stands
in for a model so feature plumbing is oracle-checkable end-to-end.

Scale: payload columns ride parquet; column pruning means metadata-only
queries never read the bytes. `extract_features` is map-only — no
shuffle; repartition upstream by size if payload skew matters.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def attach_media(
    df: DataFrame,
    payload: F.Column,
    mime: str,
    media_id: F.Column | None = None,
) -> DataFrame:
    """Normalize to the media layout: (media_id, payload binary, meta)."""
    out = df.withColumn("payload", payload.cast(T.BinaryType())).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    if media_id is not None:
        out = out.withColumn("media_id", media_id)
    return out


def _fake_feature_vector(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: md5-nibble projection
    scaled to [0,1). Replace with a model in production; kept md5-based
    so the SQL oracle can replicate it exactly. Divisor is 16 (not 15)
    so every element is k/16 — an exactly-representable double whose
    decimal repr terminates, making the vector safe to serialize as a
    delimited string identically in any engine."""
    hexd = hashlib.md5(payload).hexdigest()
    return [int(hexd[i % 32], 16) / 16.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: one Python round-trip per Arrow batch (not per row);
    output schema pinned. This is the exact plumbing a real image/audio
    encoder plugs into — only `_fake_feature_vector` is a stand-in.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", df.schema[id_col].dataType),
            T.StructField("content_md5", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # NULL payloads quarantine as NULL feature rows (same
            # corrupt-data policy as the decoders below) instead of
            # TypeError-ing the whole batch.
            payloads = [
                None if p is None else bytes(p) for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content_md5": [
                        None if p is None else hashlib.md5(p).hexdigest()
                        for p in payloads
                    ],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in payloads],
                        dtype="Int64",
                    ),
                    "feature": [
                        None
                        if p is None
                        else _fake_feature_vector(p, dim)
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _decode_image_bytes(payload: bytes, size: tuple[int, int]):
    """Decode one image payload to a resized (H, W, C) uint8 array.

    Prefers PIL when installed (any format); otherwise uses the
    repo's pure-stdlib PNG codec (`functions.png`) — real zlib
    inflate + scanline unfiltering, not a fake."""
    try:
        import io

        from PIL import Image  # pragma: no cover - env-dependent

        import numpy as np

        img = Image.open(io.BytesIO(payload)).resize(size)
        return np.asarray(img)
    except ImportError:
        from ods_to_datalake_spark.functions.png import (
            decode_png,
            resize_nearest,
        )

        return resize_nearest(decode_png(payload), size)


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    size: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Image decode + nearest-neighbor resize to fixed-size pixel rows.

    Arrow-batched mapInPandas, same shape as `extract_features`: one
    Python round-trip per batch, map-only (no shuffle), output schema
    pinned to (media_id, width, height, channels, pixels binary) with
    pixels in row-major RGB(A)/grey uint8 — the tensor layout an
    image-training pipeline consumes. Decode errors surface as NULL
    dimensions + empty pixels instead of failing the whole batch
    (corrupt payloads are a fact of life in a 100 TB crawl; filter
    `width IS NULL` downstream to quarantine them)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", df.schema[id_col].dataType),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, cs, px = [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    arr = _decode_image_bytes(bytes(p), size)
                    h, w = arr.shape[:2]
                    c = 1 if arr.ndim == 2 else arr.shape[2]
                    ws.append(w)
                    hs.append(h)
                    cs.append(c)
                    px.append(arr.tobytes())
                except (ValueError, OSError):
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    px.append(b"")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                    "pixels": px,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL audio decode: WAV/PCM payloads to per-clip stats rows.

    Stdlib ``wave`` + numpy (functions/wav.py) inside Arrow-batched
    mapInPandas — (media_id, sample_rate, channels, n_samples,
    duration_ms, peak, rms). Map-only, no shuffle; corrupt/unsupported
    payloads quarantine as NULL dims (filter `sample_rate IS NULL`),
    same policy as decode_images. rms/peak are the standard
    silence/clipping filters an audio-training pipeline gates on."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", df.schema[id_col].dataType),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import wave

        import numpy as np
        import pandas as pd

        from ods_to_datalake_spark.functions.wav import decode_wav

        for pdf in batches:
            rows = {k: [] for k in out_schema.fieldNames()}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                rows["media_id"].append(mid)
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    arr, rate = decode_wav(bytes(p))
                    n, c = arr.shape
                    a = arr.astype(np.float64)
                    rows["sample_rate"].append(rate)
                    rows["channels"].append(c)
                    rows["n_samples"].append(n)
                    rows["duration_ms"].append(n * 1000 // rate)
                    rows["peak"].append(int(np.abs(arr).max()) if n else 0)
                    rows["rms"].append(
                        float(np.sqrt((a * a).mean())) if n else 0.0
                    )
                except (ValueError, EOFError, OSError, wave.Error):
                    for k in out_schema.fieldNames()[1:]:
                        rows[k].append(None)
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "sample_rate": pd.array(rows["sample_rate"], dtype="Int32"),
                    "channels": pd.array(rows["channels"], dtype="Int32"),
                    "n_samples": pd.array(rows["n_samples"], dtype="Int64"),
                    "duration_ms": pd.array(rows["duration_ms"], dtype="Int64"),
                    "peak": pd.array(rows["peak"], dtype="Int32"),
                    "rms": pd.array(rows["rms"], dtype="Float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int | None = None,
    size: tuple[int, int] | None = None,
) -> DataFrame:
    """REAL video frame sampling: PNGV containers (functions/video.py —
    concatenated PNG frames + per-frame duration, the MJPEG shape) to
    per-frame pixel rows via Arrow-batched mapInPandas.

    One video row explodes to its sampled frames (frame_idx, ts_ms,
    width, height, channels, pixels) — the layout a frame-level
    training pipeline consumes. ``every_ms=None`` decodes every frame;
    otherwise keyframe-step sampling decodes ONLY the selected frames
    (skipped frames cost a container-table walk, no inflate). Corrupt
    payloads quarantine as a single NULL-dims row (filter
    `width IS NULL`), same policy as decode_images. Map-only, no
    shuffle; an ffmpeg binding swaps in at the decode_video_frames
    call site without touching this plumbing."""
    # fail fast on the driver: a bad sampling argument must not reach
    # the per-row quarantine (which is scoped to payload-shaped errors)
    from ods_to_datalake_spark.functions.video import validate_every_ms

    validate_every_ms(every_ms)
    out_schema = T.StructType(
        [
            T.StructField("media_id", df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from ods_to_datalake_spark.functions.png import resize_nearest
        from ods_to_datalake_spark.functions.video import (
            decode_video_frames,
        )

        for pdf in batches:
            rows = {k: [] for k in out_schema.fieldNames()}

            def emit(mid, idx, ts, w, h, c, px):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["ts_ms"].append(ts)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["pixels"].append(px)

            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    frames = decode_video_frames(bytes(p), every_ms)
                except (ValueError, OSError):
                    emit(mid, None, None, None, None, None, b"")
                    continue
                for idx, ts, arr in frames:
                    if size is not None:
                        arr = resize_nearest(arr, size)
                    h, w = arr.shape[:2]
                    c = 1 if arr.ndim == 2 else arr.shape[2]
                    emit(mid, idx, ts, w, h, c, arr.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "frame_idx": pd.array(rows["frame_idx"], dtype="Int32"),
                    "ts_ms": pd.array(rows["ts_ms"], dtype="Int64"),
                    "width": pd.array(rows["width"], dtype="Int32"),
                    "height": pd.array(rows["height"], dtype="Int32"),
                    "channels": pd.array(rows["channels"], dtype="Int32"),
                    "pixels": rows["pixels"],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def sample_frames_fake(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    frame_ms: int = 1000,
) -> DataFrame:
    """Frame sampling with REAL Spark plumbing and a deterministic
    stand-in decoder (no ffmpeg in this environment — `sample_frames`
    is the real-decoder hook).

    Row explosion inside mapInPandas: one video row → `n_frames` frame
    rows (frame_idx, ts_ms, frame payload), the shape a
    frame-level training pipeline consumes. The fake "frame" is the
    md5 digest of (payload, frame index) — deterministic, so tests pin
    exact bytes. Map-only (no shuffle); frame rows are written
    partition-local. A real decoder changes ONLY the two marked lines.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * frame_ms)
                    # real decoder: seek to ts, decode, encode the frame
                    frames.append(
                        hashlib.md5(bytes(p) + bytes([i])).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
