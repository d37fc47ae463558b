"""Streaming Zipf/Heaps profile (x79's streaming face): the read-time
profile must equal batch `zipf_profile` over the delivered history
after EVERY batch with NO ordering contract (token counts are additive
— late, out-of-order, and replayed documents are all correct data),
replays must be no-ops, and the end-to-end file stream must match the
batch operator bit-for-bit — including the (count DESC, token ASC)
tie order at the k-cut and the cum_share divisions."""

from __future__ import annotations

import os
import time

from ods_to_datalake_spark.operators.quality import zipf_profile
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.zipf import (
    maintain_zipf_profile,
    read_zipf_profile,
    token_counts_sink,
)

SCHEMA = "doc_id long, text string"
K = 5  # below the vocabulary size so the k-cut tie order is exercised

# DELIBERATELY contract-free: batch 1 re-mentions batch 0's tokens
# (counts must fold), batch 2 brings NULL/empty/whitespace docs and a
# tie cohort ('d','e' equal counts straddling the k-cut)
BATCH0 = [(1, "a a a b b c"), (2, "a b c d"), (3, None)]
BATCH1 = [(4, "c c e e d"), (5, ""), (6, "f g h")]
BATCH2 = [(7, "   "), (8, "b a e d f"), (9, "a")]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _prof(df):
    if df is None:
        return []
    return sorted(
        (
            r.rank,
            r.token,
            r.n_occurrences,
            r.cum_share,
            r.n_total_tokens,
            r.n_types,
        )
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return zipf_profile(
        _mk(spark, [r for b in batches for r in b]),
        "doc_id",
        "text",
        k=K,
    )


def test_streamed_profile_equals_batch_after_every_batch(
    spark, tmp_path
):
    sink = token_counts_sink(str(tmp_path / "out"), "text")
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _prof(
            read_zipf_profile(spark, str(tmp_path / "out"), k=K)
        )
        assert got == _prof(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_delivery_order_is_irrelevant(spark, tmp_path):
    """Adversarially shuffled delivery (the additive-artifact claim):
    the folded profile only sees the union of counts."""
    sink = token_counts_sink(str(tmp_path / "out"), "text")
    for i, rows in zip((0, 1, 2), (BATCH2, BATCH0, BATCH1)):
        sink(_mk(spark, rows), i)
    got = _prof(read_zipf_profile(spark, str(tmp_path / "out"), k=K))
    assert got == _prof(_batch_reference(spark, ALL))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = token_counts_sink(str(tmp_path / "out"), "text")
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _prof(
        read_zipf_profile(spark, str(tmp_path / "out"), k=K)
    )
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _prof(read_zipf_profile(spark, str(tmp_path / "out"), k=K))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "out")) == [0, 1]


def test_real_stream_matches_batch_profile(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(ALL):
        f = os.path.join(src, f"b{i}.parquet")
        _mk(spark, rows).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    q = maintain_zipf_profile(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), "text"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _prof(read_zipf_profile(spark, str(tmp_path / "out"), k=K))
    assert got == _prof(_batch_reference(spark, ALL))
