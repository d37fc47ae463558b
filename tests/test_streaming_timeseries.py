"""Streaming LOCF gap-fill: the union of emitted grid partitions must
equal batch `gap_fill` over the delivered history (bucket-disjoint
ordered batches — the module contract), replays must be no-ops, the
frontier must never rewind on late data, and a real file-source stream
must reproduce the batch grid end-to-end."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.timeseries import gap_fill
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.timeseries import (
    gap_fill_sink,
    maintain_gap_fill,
    read_gap_fill_output,
)

SCHEMA = "user_id long, ts timestamp, amount double, event_id long"


def _t(h, m=0):
    return datetime(2024, 3, 1, h, m)


# hour buckets are disjoint across batches (the module contract)
BATCH0 = [
    (1, _t(0, 10), 1.0, 100),
    (1, _t(0, 40), 1.5, 101),  # same bucket: later ts wins
    (1, _t(2, 20), 2.0, 102),  # gap at hour 01 -> carries 1.5
    (2, _t(0, 30), 5.0, 103),
]
BATCH1 = [
    (1, _t(5, 0), 3.0, 200),  # gaps 03,04 carry 2.0 across batches
    (3, _t(4, 0), 9.0, 201),  # first sight of key 3
]
BATCH2 = [
    (2, _t(3, 0), 6.0, 300),  # gaps 01,02 carry 5.0
]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _grid(df):
    return sorted(
        (r.user_id, r.bucket, r.amount, r.observed) for r in df.collect()
    )


def _batch_reference(spark, batches):
    return gap_fill(
        _mk(spark, [r for b in batches for r in b]),
        "user_id",
        "ts",
        "amount",
        unit="hour",
        tiebreak="event_id",
    )


def _sink(tmp_path):
    return gap_fill_sink(
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        "user_id",
        "ts",
        "amount",
        unit="hour",
        tiebreak="event_id",
    )


def test_streamed_grid_equals_batch_gap_fill(spark, tmp_path):
    sink = _sink(tmp_path)
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _grid(read_gap_fill_output(spark, str(tmp_path / "out")))
        assert got == _grid(_batch_reference(spark, ALL[: i + 1])), (
            f"divergence after batch {i}"
        )


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _grid(read_gap_fill_output(spark, str(tmp_path / "out")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _grid(read_gap_fill_output(spark, str(tmp_path / "out")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "state")) == [0, 1]


def test_frontier_never_rewinds_on_late_data(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    # key 1's frontier is hour 02; a straggler at hour 01 (already
    # published as a filled row) must be dropped, not re-emitted
    late = [(1, _t(1, 30), 99.0, 999)]
    sink(_mk(spark, late), 1)
    got = _grid(read_gap_fill_output(spark, str(tmp_path / "out")))
    assert got == _grid(_batch_reference(spark, [BATCH0]))
    assert 99.0 not in {v for _, _, v, _ in got}


def test_silent_key_carries_frontier_across_batches(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)  # key 2 silent
    sink(_mk(spark, BATCH2), 2)  # key 2 returns: fill from hour 00
    got = [
        (r.bucket.hour, r.amount, r.observed)
        for r in read_gap_fill_output(spark, str(tmp_path / "out"))
        .filter("user_id = 2")
        .collect()
    ]
    assert sorted(got) == [
        (0, 5.0, True),
        (1, 5.0, False),
        (2, 5.0, False),
        (3, 6.0, True),
    ]


def test_real_stream_matches_batch_grid(spark, tmp_path):
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
    q = maintain_gap_fill(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "user_id",
        "ts",
        "amount",
        unit="hour",
        tiebreak="event_id",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _grid(read_gap_fill_output(spark, str(tmp_path / "out")))
    assert got == _grid(_batch_reference(spark, ALL))


def test_late_data_lands_in_rejected_side_output(spark, tmp_path):
    from ods_to_datalake_spark.streaming.timeseries import (
        read_gap_fill_rejected,
    )

    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    assert (
        read_gap_fill_rejected(spark, str(tmp_path / "out")).count()
        == 0
    )
    # the dropped straggler from the frontier test: observable now
    sink(_mk(spark, [(1, _t(1, 30), 99.0, 999)]), 1)
    rej = read_gap_fill_rejected(spark, str(tmp_path / "out"))
    assert [
        (r.user_id, r.bucket.hour, r.amount) for r in rej.collect()
    ] == [(1, 1, 99.0)]
    # published grid unchanged (same assertion as the frontier test)
    got = _grid(read_gap_fill_output(spark, str(tmp_path / "out")))
    assert got == _grid(_batch_reference(spark, [BATCH0]))
