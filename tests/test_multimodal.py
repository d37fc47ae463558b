"""Multimodal plumbing tests: binary payload layout, Arrow-batched
feature extraction, stub behavior for unavailable codecs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.multimodal import (
    attach_media,
    decode_images,
    extract_features,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "")], "media_id bigint, text string"
    )
    return attach_media(
        df, F.encode("text", "utf-8"), "text/plain", media_id=F.col("media_id")
    )


def test_media_layout(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = media.select("meta.*").collect()[0]
    assert meta.mime == "text/plain"


def test_extract_features_deterministic(media):
    rows = {r.media_id: r for r in extract_features(media, dim=8).collect()}
    assert rows[1].content_md5 == hashlib.md5(b"alpha").hexdigest()
    assert rows[1].n_bytes == 5
    assert rows[3].n_bytes == 0
    assert len(rows[2].feature) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[2].feature)
    # deterministic across runs
    again = {r.media_id: r.feature for r in extract_features(media, dim=8).collect()}
    assert again == {k: r.feature for k, r in rows.items()}


def test_decode_images_real_png(spark):
    """decode_images really decodes: generated PNGs (pure-stdlib codec,
    zlib inflate + unfilter) come back as resized uint8 pixel rows, and
    a corrupt payload quarantines as NULL dims instead of failing the
    batch."""
    import numpy as np

    from ods_to_datalake_spark.functions.png import encode_png

    grad = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    solid = np.full((16, 16), 200, dtype=np.uint8)
    base = spark.createDataFrame(
        [
            (1, bytearray(encode_png(grad))),
            (2, bytearray(encode_png(solid))),
            (3, bytearray(b"not-a-png")),
        ],
        "media_id long, raw binary",
    )
    media = attach_media(base, F.col("raw"), "image/png")
    rows = {r.media_id: r for r in decode_images(media, size=(8, 8)).collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (8, 8, 3)
    assert len(bytes(rows[1].pixels)) == 8 * 8 * 3
    # nearest-neighbor of a solid image is still solid
    assert set(bytes(rows[2].pixels)) == {200}
    assert rows[2].channels == 1
    # corrupt payload -> quarantined, not thrown
    assert rows[3].width is None and bytes(rows[3].pixels) == b""


def test_png_codec_roundtrip_and_filters():
    """The stdlib PNG codec round-trips, and the decoder handles
    filtered scanlines (Sub/Up/Average/Paeth), not just filter 0."""
    import struct
    import zlib

    import numpy as np

    from ods_to_datalake_spark.functions import png as P

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)  # RGBA
    assert np.array_equal(P.decode_png(P.encode_png(arr)), arr)

    # hand-build a stream exercising every filter type on known rows
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)

    def filt(ftype, cur, prev, c=3):
        cur = cur.astype(np.int16)
        prev = prev.astype(np.int16)
        left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = prev
        elif ftype == 3:
            pred = (left + prev) // 2
        else:
            pred = np.array(
                [
                    int(P._paeth(np.uint8(a), np.uint8(b), np.uint8(cc)))
                    for a, b, cc in zip(left, prev, ul)
                ],
                dtype=np.int16,
            )
        return ((cur - pred) % 256).astype(np.uint8)

    rows = [img[y].reshape(-1) for y in range(5)]
    raw = b"\x00" + rows[0].tobytes()
    prev = rows[0]
    for y, ftype in zip(range(1, 5), [1, 2, 3, 4]):
        raw += bytes([ftype]) + filt(ftype, rows[y], prev).tobytes()
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", 3, 5, 8, 2, 0, 0, 0)
    data = (
        P._SIGNATURE
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(raw))
        + P._chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(data), img)


def test_sample_frames_fake_plumbing(spark):
    """Frame sampling: one video row explodes into n_frames frame rows
    with monotone timestamps and deterministic bytes — the exact shape
    (schema, Arrow batching, row explosion) a PyAV decoder plugs into."""
    import hashlib

    from ods_to_datalake_spark.operators.multimodal import (
        attach_media,
        sample_frames_fake,
    )

    base = spark.createDataFrame(
        [(1, b"video-bytes-a"), (2, b"video-bytes-b")],
        "media_id long, raw binary",
    )
    media = attach_media(base, F.col("raw"), "video/mp4")
    frames = sample_frames_fake(media, n_frames=3, frame_ms=500)
    rows = frames.collect()
    assert len(rows) == 6  # 2 videos x 3 frames
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        assert sorted(r.frame_idx for r in rs) == [0, 1, 2]
        assert sorted(r.ts_ms for r in rs) == [0, 500, 1000]
    # deterministic fake: exact bytes pinned
    first = next(r for r in rows if r.media_id == 1 and r.frame_idx == 0)
    assert bytes(first.frame) == hashlib.md5(b"video-bytes-a\x00").digest()
    # schema is the decoder contract
    assert [f.name for f in frames.schema.fields] == [
        "media_id", "frame_idx", "ts_ms", "frame",
    ]


def test_wav_codec_roundtrip():
    import numpy as np

    from ods_to_datalake_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    arr, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(arr[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    arr2, rate2 = decode_wav(encode_wav(stereo, 44100, channels=2))
    assert rate2 == 44100 and np.array_equal(arr2, stereo)


def test_decode_audio_real_wav(spark):
    """decode_audio really RIFF-parses PCM: stats come back exact, and
    corrupt payloads quarantine as NULL dims."""
    import numpy as np

    from ods_to_datalake_spark.functions.wav import encode_wav
    from ods_to_datalake_spark.operators.multimodal import decode_audio

    tone = np.full(160, 1000, dtype=np.int16)
    ramp = np.array([-3, 4], dtype=np.int16)
    base = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(tone, 16000))),
            (2, bytearray(encode_wav(ramp, 8000))),
            (3, bytearray(b"RIFFgarbage")),
        ],
        "media_id long, raw binary",
    )
    media = attach_media(base, F.col("raw"), "audio/wav")
    rows = {r.media_id: r for r in decode_audio(media).collect()}
    r1 = rows[1]
    assert (r1.sample_rate, r1.channels, r1.n_samples) == (16000, 1, 160)
    assert r1.duration_ms == 10 and r1.peak == 1000 and r1.rms == 1000.0
    r2 = rows[2]
    assert r2.peak == 4 and r2.rms == float(np.sqrt((9 + 16) / 2))
    assert rows[3].sample_rate is None


def test_video_codec_roundtrip_and_sampling():
    """PNGV container: encode → parse/decode round-trips exactly;
    keyframe-step sampling selects the at-or-before frame per step and
    truncated containers raise (→ quarantine upstream)."""
    import numpy as np
    import pytest as _pytest

    from ods_to_datalake_spark.functions.video import (
        decode_video_frames,
        encode_video,
        parse_video,
    )

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    blob = encode_video(frames, frame_ms=250)
    pngs, frame_ms = parse_video(blob)
    assert len(pngs) == 4 and frame_ms == 250

    out = decode_video_frames(blob)  # every frame
    assert [(i, ts) for i, ts, _ in out] == [
        (0, 0), (1, 250), (2, 500), (3, 750),
    ]
    for (_, _, arr), want in zip(out, frames):
        assert np.array_equal(arr, want)

    # sample every 600ms over a 1000ms clip: t=0 → frame 0, t=600 → 2
    sampled = decode_video_frames(blob, every_ms=600)
    assert [i for i, _, _ in sampled] == [0, 2]

    with _pytest.raises(ValueError):
        parse_video(b"nope")
    with _pytest.raises(ValueError):
        parse_video(blob[: len(blob) - 5])  # truncated payload


def test_sample_frames_real_pngv(spark):
    """sample_frames REALLY decodes PNGV video: frames come back as
    resized pixel tensors with container timestamps; corrupt payloads
    quarantine as NULL dims."""
    import numpy as np

    from ods_to_datalake_spark.functions.video import encode_video
    from ods_to_datalake_spark.operators.multimodal import sample_frames

    vids = {
        1: [np.full((16, 16), v, dtype=np.uint8) for v in (10, 20, 30)],
        2: [np.full((4, 4, 3), 7, dtype=np.uint8)],
    }
    base = spark.createDataFrame(
        [(k, bytearray(encode_video(f, 500))) for k, f in vids.items()]
        + [(3, bytearray(b"not-a-video"))],
        "media_id long, raw binary",
    )
    media = attach_media(base, F.col("raw"), "video/x-pngv")
    rows = sample_frames(media, size=(8, 8)).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)

    v1 = sorted(by_media[1], key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.ts_ms) for r in v1] == [(0, 0), (1, 500), (2, 1000)]
    assert all((r.width, r.height, r.channels) == (8, 8, 1) for r in v1)
    assert [set(bytes(r.pixels)) for r in v1] == [{10}, {20}, {30}]

    (v2,) = by_media[2]
    assert (v2.width, v2.height, v2.channels) == (8, 8, 3)
    assert set(bytes(v2.pixels)) == {7}

    (v3,) = by_media[3]
    assert v3.width is None and bytes(v3.pixels) == b""

    # every_ms sampling drops frames without decoding them
    stepped = sample_frames(media, every_ms=1000, size=(8, 8))
    idxs = sorted(
        r.frame_idx for r in stepped.collect() if r.media_id == 1
    )
    assert idxs == [0, 2]


def test_video_every_ms_validation(spark):
    """A bad sampling step must surface as TypeError (ADVICE r4): the
    per-row quarantine is scoped to payload-shaped ValueError/OSError,
    so a ValueError from range(step=0) would silently mark every row
    corrupt instead of reporting the bad argument."""
    import numpy as np
    import pytest as _pytest

    from ods_to_datalake_spark.functions.video import (
        decode_video_frames,
        encode_video,
    )
    from ods_to_datalake_spark.operators.multimodal import sample_frames

    blob = encode_video([np.zeros((2, 2), dtype=np.uint8)], frame_ms=100)
    for bad in (0, -250, 1.5, True):
        with _pytest.raises(TypeError):
            decode_video_frames(blob, every_ms=bad)
    # driver-side fail-fast: no job runs, the error is immediate
    base = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, raw binary"
    )
    media = attach_media(base, F.col("raw"), "video/x-pngv")
    with _pytest.raises(TypeError):
        sample_frames(media, every_ms=0)
