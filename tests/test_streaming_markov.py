"""Streaming Markov transition counts (e12's streaming face): the
read-time fold of per-batch count partitions must be bit-identical to
batch `transition_matrix` over the delivered history (per-key
event-time-ordered batches — the module contract), boundary
transitions must span batches, replays must be no-ops, and
out-of-order events must surface in the rejected side output."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.sequence import transition_matrix
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.markov import (
    maintain_transition_matrix,
    read_transition_matrix,
    read_transition_rejected,
    transition_counts_sink,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _t(h, m=0):
    return datetime(2024, 3, 1, h, m)


# per-key event-time ordered across batches (the module contract);
# user 1's view->click boundary pair spans batches 0/1, user 2 is
# silent in batch 1 and returns in batch 2, NULL states/ts drop
BATCH0 = [
    (100, _t(0), 1, "view"),
    (101, _t(1), 1, "view"),
    (102, _t(0, 30), 2, "view"),
    (103, _t(2), 1, None),
    (104, None, 2, "click"),
]
BATCH1 = [
    (200, _t(3), 1, "click"),
    (201, _t(4), 1, "purchase"),
    (202, _t(3, 30), 3, "view"),
]
BATCH2 = [
    (300, _t(6), 2, "click"),
    (301, _t(7), 3, "purchase"),
]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _matrix(df):
    if df is None:
        return []
    return sorted(
        (r.prev_state, r.state, r.n_transitions, r.p)
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return transition_matrix(
        _mk(spark, [r for b in batches for r in b]),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )


def _sink(tmp_path):
    return transition_counts_sink(
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )


def test_folded_counts_equal_batch_matrix(spark, tmp_path):
    sink = _sink(tmp_path)
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _matrix(
            read_transition_matrix(spark, str(tmp_path / "out"))
        )
        assert got == _matrix(_batch_reference(spark, ALL[: i + 1])), (
            f"divergence after batch {i}"
        )
    rej = read_transition_rejected(spark, str(tmp_path / "out"))
    assert rej is not None and rej.count() == 0


def test_boundary_pair_spans_batches(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    counts = {
        (r.prev_state, r.state): r.n_transitions
        for r in read_transition_matrix(
            spark, str(tmp_path / "out")
        ).collect()
    }
    # user 1: view->view (batch 0), view->click (BOUNDARY),
    # click->purchase (batch 1)
    assert counts[("view", "click")] == 1
    assert counts[("click", "purchase")] == 1


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _matrix(
        read_transition_matrix(spark, str(tmp_path / "out"))
    )
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _matrix(read_transition_matrix(spark, str(tmp_path / "out")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "state")) == [0, 1]


def test_out_of_order_event_is_rejected_not_recounted(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    before = _matrix(
        read_transition_matrix(spark, str(tmp_path / "out"))
    )
    # user 1's frontier is (01:00, 101): an event at 00:30 would
    # re-write already-counted pairs — rejected, matrix unchanged
    sink(_mk(spark, [(999, _t(0, 30), 1, "click")]), 1)
    assert (
        _matrix(read_transition_matrix(spark, str(tmp_path / "out")))
        == before
    )
    rej = read_transition_rejected(spark, str(tmp_path / "out"))
    assert [(r.user_id, r.event_id) for r in rej.collect()] == [
        (1, 999)
    ]


def test_real_stream_matches_batch_matrix(spark, tmp_path):
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
    q = maintain_transition_matrix(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _matrix(read_transition_matrix(spark, str(tmp_path / "out")))
    assert got == _matrix(_batch_reference(spark, ALL))
