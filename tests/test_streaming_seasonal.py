"""Streaming seasonal profile (e15's streaming face): the read-time
profile must equal batch `seasonal_profile` over the delivered history
after EVERY batch with NO ordering contract (counts are additive —
late, out-of-order, and day-straddling deliveries are all correct
data), replays must be no-ops, and the end-to-end file stream must
match the batch operator bit-for-bit."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.sequence import seasonal_profile
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.seasonal import (
    daily_counts_sink,
    maintain_seasonal_profile,
    read_seasonal_profile,
)

SCHEMA = "user_id long, ts timestamp"


def _d(day, h=0):
    return datetime(2024, 3, day, h)


# DELIBERATELY contract-free: batch 1 straddles days 1/2/5, batch 2
# revisits day 1 (out of order) — all of it is correct additive data
BATCH0 = [(1, _d(1, 2)), (2, _d(1, 5)), (1, _d(2)), (None, None)]
BATCH1 = [(3, _d(2, 3)), (1, _d(5)), (2, _d(1, 23))]
BATCH2 = [(9, _d(8)), (9, _d(1, 1)), (1, _d(4))]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _prof(df):
    if df is None:
        return []
    return sorted(
        (
            r.day,
            r.dow,
            r.n_events,
            r.dow_mean,
            r.seasonal_index,
            r.residual,
        )
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return seasonal_profile(
        _mk(spark, [r for b in batches for r in b]), "ts"
    )


def test_streamed_profile_equals_batch_after_every_batch(
    spark, tmp_path
):
    sink = daily_counts_sink(str(tmp_path / "out"), "ts")
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _prof(
            read_seasonal_profile(spark, str(tmp_path / "out"))
        )
        assert got == _prof(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = daily_counts_sink(str(tmp_path / "out"), "ts")
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _prof(
        read_seasonal_profile(spark, str(tmp_path / "out"))
    )
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _prof(read_seasonal_profile(spark, str(tmp_path / "out")))
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
    q = maintain_seasonal_profile(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), "ts"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _prof(read_seasonal_profile(spark, str(tmp_path / "out")))
    assert got == _prof(_batch_reference(spark, ALL))
