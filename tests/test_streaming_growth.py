"""Streaming growth curve (e14's streaming face): the union of
emitted partitions must equal batch `running_distinct` over the
delivered history (day-aligned ordered batches — the module
contract), replays must be no-ops, re-appearing keys must never count
as new, and out-of-contract first-seen days must surface in the
rejected side output instead of silently corrupting published rows."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.sequence import running_distinct
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.growth import (
    maintain_running_distinct,
    read_growth_output,
    read_growth_rejected,
    running_distinct_sink,
)

SCHEMA = "user_id long, ts timestamp"


def _d(day, h=0):
    return datetime(2024, 3, day, h)


# days are disjoint across batches (the module contract); users 1/2
# re-appear across batches and must never re-count
BATCH0 = [(1, _d(1, 2)), (1, _d(1, 9)), (2, _d(1, 5)), (None, _d(1))]
BATCH1 = [(1, _d(2)), (3, _d(2, 3)), (4, _d(3, 1)), (3, None)]
BATCH2 = [(2, _d(4)), (5, _d(4, 8)), (1, _d(4))]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _curve(df):
    if df is None:
        return []
    return sorted(
        (r.day, r.new_keys, r.cumulative_keys) for r in df.collect()
    )


def _batch_reference(spark, batches):
    return running_distinct(
        _mk(spark, [r for b in batches for r in b]), "user_id", "ts"
    )


def _sink(tmp_path):
    return running_distinct_sink(
        str(tmp_path / "state"), str(tmp_path / "out"), "user_id", "ts"
    )


def test_streamed_curve_equals_batch_running_distinct(spark, tmp_path):
    sink = _sink(tmp_path)
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _curve(read_growth_output(spark, str(tmp_path / "out")))
        assert got == _curve(_batch_reference(spark, ALL[: i + 1])), (
            f"divergence after batch {i}"
        )
    rej = read_growth_rejected(spark, str(tmp_path / "out"))
    assert rej is not None and rej.count() == 0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _curve(read_growth_output(spark, str(tmp_path / "out")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _curve(read_growth_output(spark, str(tmp_path / "out")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "state")) == [0, 1]


def test_out_of_contract_day_is_rejected_not_rewritten(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)  # day 1 published (users 1, 2)
    before = _curve(read_growth_output(spark, str(tmp_path / "out")))
    # user 9 first seen on the ALREADY-EMITTED day 1: its day's row is
    # immutable — evidence goes to the rejected artifact, published
    # rows stay bit-identical
    sink(_mk(spark, [(9, _d(1, 7))]), 1)
    assert (
        _curve(read_growth_output(spark, str(tmp_path / "out")))
        == before
    )
    rej = read_growth_rejected(spark, str(tmp_path / "out"))
    assert [(r.user_id, r.day.isoformat()) for r in rej.collect()] == [
        (9, "2024-03-01")
    ]
    # ...but user 9 IS seen now: a later re-appearance is not new,
    # and the cumulative base counts every seen key (documented)
    sink(_mk(spark, [(9, _d(5)), (10, _d(5))]), 2)
    day5 = (
        read_growth_output(spark, str(tmp_path / "out"))
        .filter("day = date'2024-03-05'")
        .collect()[0]
    )
    assert day5.new_keys == 1  # only user 10
    assert day5.cumulative_keys == 4  # users 1, 2, 9, 10


def test_real_stream_matches_batch_curve(spark, tmp_path):
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
    q = maintain_running_distinct(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "user_id",
        "ts",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _curve(read_growth_output(spark, str(tmp_path / "out")))
    assert got == _curve(_batch_reference(spark, ALL))
