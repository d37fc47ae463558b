"""Multimodal column plumbing (charter extension).

Images/audio/video are carried as opaque `binary` payload columns plus a
typed metadata struct — the lakehouse pattern for multimodal training
data: the engine moves/filters/partitions bytes and runs per-batch
Python only at the decode/feature boundary (Arrow-batched mapInPandas,
never per-row UDFs).

The decode/resize/frame-sample steps need image/audio libraries that are
NOT in this environment — they are STUBS behind import-tries that raise
NotImplementedError, with a deterministic md5-based fake feature
extractor standing in so the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and testable end-to-end. Swap
`_fake_feature_vector` for a real model/codec in production.

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
    scaled to [0,1]. Replace with a model in production; kept md5-based
    so the SQL oracle can replicate it exactly."""
    hexd = hashlib.md5(payload).hexdigest()
    return [int(hexd[i % 32], 16) / 15.0 for i in range(dim)]


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
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "feature": [
                        _fake_feature_vector(bytes(p), dim) for p in payloads
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def _require(module: str, purpose: str):
    try:
        return __import__(module)
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            f"STUB: {purpose} requires {module!r}, which is not available "
            "in this environment. The Spark plumbing (schema/batching) is "
            "real; install the codec library and replace this stub."
        ) from exc


def decode_images(
    df: DataFrame, payload_col: str = "payload", size: tuple[int, int] = (224, 224)
) -> DataFrame:
    """STUB — image decode + resize to pixel tensors (needs PIL)."""
    _require("PIL", "image decode/resize")
    raise NotImplementedError("wire PIL decode into extract_features-style mapInPandas")


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_ms: int = 1000
) -> DataFrame:
    """STUB — real video frame decoding (needs an ffmpeg binding).
    The Spark-side plumbing is `sample_frames_fake` below; swap its
    per-row extractor for PyAV frame iteration."""
    _require("av", "video frame sampling")
    raise NotImplementedError("wire PyAV frame iteration into mapInPandas")


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
