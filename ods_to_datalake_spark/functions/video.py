"""Minimal pure-stdlib video container codec ("PNGV").

No ffmpeg/PyAV binding exists in this environment, so the engine defines
a trivially-parseable uncompressed container — concatenated PNG frames
with a fixed per-frame duration — and decodes it for real through the
repo's stdlib PNG codec (`functions.png`: zlib inflate + scanline
unfiltering). This is the same shape MJPEG takes (a container of
independently-coded frames); a real ffmpeg binding swaps in at the
`decode_video_frames` call site without touching the Spark plumbing.

Layout (all integers big-endian):

    b"PNGV" | u16 version=1 | u16 reserved | u32 n_frames
    u32 frame_ms                      # per-frame duration
    n_frames x ( u32 length | PNG bytes )

Used by `operators/multimodal.sample_frames` (charter: multimodal video
column support) and the x30 suite query.
"""

from __future__ import annotations

import struct

import numpy as np

from ods_to_datalake_spark.functions.png import decode_png, encode_png

_MAGIC = b"PNGV"
_HEADER = struct.Struct(">4sHHII")  # magic, version, reserved, n, frame_ms


def encode_video(frames: list[np.ndarray], frame_ms: int = 1000) -> bytes:
    """Encode frames ((H, W) or (H, W, C) uint8 arrays) as one PNGV blob."""
    parts = [_HEADER.pack(_MAGIC, 1, 0, len(frames), frame_ms)]
    for arr in frames:
        png = encode_png(arr)
        parts.append(struct.pack(">I", len(png)))
        parts.append(png)
    return b"".join(parts)


def parse_video(data: bytes) -> tuple[list[bytes], int]:
    """Split a PNGV blob into (per-frame PNG bytes, frame_ms).

    Container walk only — no pixel decode, so metadata queries (frame
    count, duration) never pay inflate cost."""
    if len(data) < _HEADER.size or data[:4] != _MAGIC:
        raise ValueError("not a PNGV container (bad magic)")
    magic, version, _res, n, frame_ms = _HEADER.unpack_from(data)
    if version != 1:
        raise ValueError(f"unsupported PNGV version {version}")
    frames, pos = [], _HEADER.size
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated PNGV (frame table)")
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if pos + length > len(data):
            raise ValueError("truncated PNGV (frame payload)")
        frames.append(data[pos : pos + length])
        pos += length
    return frames, frame_ms


def validate_every_ms(every_ms: int | None) -> None:
    """Shared sampling-step validation (here and in the Spark operator
    `multimodal.sample_frames`, which fails fast on the driver).
    TypeError deliberately — NOT ValueError: callers quarantine
    payload-shaped errors (ValueError/OSError) per row, and an invalid
    argument must surface, not silently mark every row corrupt."""
    if every_ms is not None and (
        isinstance(every_ms, bool)
        or not isinstance(every_ms, int)
        or every_ms <= 0
    ):
        raise TypeError(
            f"every_ms must be a positive int or None, got {every_ms!r}"
        )


def decode_video_frames(
    data: bytes, every_ms: int | None = None
) -> list[tuple[int, int, np.ndarray]]:
    """Decode (frame_idx, ts_ms, pixel array) triples from a PNGV blob.

    ``every_ms=None`` decodes every frame. Otherwise frames are sampled
    at t = 0, every_ms, 2*every_ms, ... over the clip duration, taking
    the frame at-or-before each sample time (standard keyframe-step
    sampling); only the SELECTED frames are inflated — skipped frames
    cost a container-table walk, nothing more.

    Bad ``every_ms`` raises TypeError (see `validate_every_ms`).
    """
    validate_every_ms(every_ms)
    pngs, frame_ms = parse_video(data)
    if not pngs:
        return []
    if every_ms is None:
        idxs = range(len(pngs))
    else:
        duration = len(pngs) * frame_ms
        idxs = sorted(
            {min(t // frame_ms, len(pngs) - 1) for t in range(0, duration, every_ms)}
        )
    return [(i, i * frame_ms, decode_png(pngs[i])) for i in idxs]
