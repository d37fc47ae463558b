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
