"""Streaming CUSUM (e16's streaming face): the read-time statistic
must equal batch `cusum_shift_scores` over the delivered history after
EVERY batch with NO ordering contract (daily counts are additive; the
sink is literally the seasonal face's — one additive artifact, two
read-time derivations), replays must be no-ops, and the end-to-end
file stream must match the batch operator bit-for-bit. The statistic
is GLOBAL (N and T enter every deviation), so a late batch can flip
earlier days' flags — that is correct: the folded history IS the new
series."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.timeseries import (
    cusum_shift_scores,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.cusum import (
    daily_counts_sink,
    maintain_cusum,
    read_cusum,
)

SCHEMA = "user_id long, ts timestamp"


def _d(day, h=0):
    return datetime(2024, 3, day, h)


# a sustained step arriving across batches, plus out-of-order
# revisits of earlier days and a NULL ts
BATCH0 = [(1, _d(1)), (2, _d(1)), (1, _d(2)), (None, None)]
BATCH1 = [(3, _d(3)), (1, _d(3)), (2, _d(3)), (9, _d(1, 23))]
BATCH2 = [(7, _d(4)), (8, _d(4)), (9, _d(4)), (1, _d(2, 5))]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _stat(df):
    if df is None:
        return []
    return sorted(
        (r.day, r.n_events, r.cusum_pos, r.cusum_neg, r.is_shift)
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return cusum_shift_scores(
        _mk(spark, [r for b in batches for r in b]), "ts"
    )


def test_streamed_cusum_equals_batch_after_every_batch(
    spark, tmp_path
):
    sink = daily_counts_sink(str(tmp_path / "out"), "ts")
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _stat(read_cusum(spark, str(tmp_path / "out")))
        assert got == _stat(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = daily_counts_sink(str(tmp_path / "out"), "ts")
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _stat(read_cusum(spark, str(tmp_path / "out")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert _stat(read_cusum(spark, str(tmp_path / "out"))) == before
    assert list_cdc_snapshots(spark, str(tmp_path / "out")) == [0, 1]


def test_real_stream_matches_batch_cusum(spark, tmp_path):
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
    q = maintain_cusum(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), "ts"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _stat(read_cusum(spark, str(tmp_path / "out")))
    assert got == _stat(_batch_reference(spark, ALL))
