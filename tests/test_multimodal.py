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


def test_decode_stub_raises_not_implemented(media):
    with pytest.raises(NotImplementedError, match="STUB"):
        decode_images(media)


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
