"""Streaming burstiness (e17's streaming face): under the per-key
in-order contract the read-time stats must equal batch
`interarrival_stats` over the delivered history after EVERY batch
(gap sums are mergeable — the multiset depends only on sorted
timestamps, so a boundary gap + in-batch gaps fold exactly), replays
must be no-ops, out-of-contract events must surface as rejected
evidence, and the end-to-end file stream must match batch bit-for-bit.
NULL keys are dropped on ingest (the streaks divergence rule)."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.sequence import (
    interarrival_stats,
)
from ods_to_datalake_spark.streaming.burstiness import (
    burstiness_sink,
    maintain_burstiness,
    read_burstiness,
    read_burstiness_rejected,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)

SCHEMA = "event_id long, user_id long, ts timestamp"


def _t(h, m=0, s=0):
    return datetime(2024, 3, 1, h, m, s)


# per-key in-order across batches; ties inside and across batches;
# user 2 appears in one batch only; user 3 is all-simultaneous
BATCH0 = [(0, 1, _t(0)), (1, 1, _t(1)), (2, 3, _t(5)), (3, 3, _t(5))]
BATCH1 = [(4, 1, _t(1)), (5, 1, _t(4)), (6, 2, _t(2)), (7, None, _t(3))]
BATCH2 = [(8, 1, _t(9)), (9, 2, _t(2)), (10, 3, _t(5)), (11, 1, None)]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _stats(df):
    if df is None:
        return []
    return sorted(
        (
            r.user_id,
            r.n_events,
            r.n_gaps,
            r.sum_gap_s,
            r.mean_gap_s,
            r.std_gap_s,
            r.burstiness,
        )
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    rows = [
        r for b in batches for r in b if r[1] is not None
    ]  # the pinned NULL-key ingest drop
    return interarrival_stats(
        _mk(spark, rows), "user_id", "ts", "event_id"
    )


def test_streamed_stats_equal_batch_after_every_batch(spark, tmp_path):
    sink = burstiness_sink(
        str(tmp_path / "state"), str(tmp_path / "out"), "user_id", "ts"
    )
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _stats(
            read_burstiness(spark, str(tmp_path / "state"))
        )
        assert got == _stats(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"
    assert (
        read_burstiness_rejected(spark, str(tmp_path / "out")).count()
        == 0
    )


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = burstiness_sink(
        str(tmp_path / "state"), str(tmp_path / "out"), "user_id", "ts"
    )
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _stats(read_burstiness(spark, str(tmp_path / "state")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _stats(read_burstiness(spark, str(tmp_path / "state")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "state")) == [0, 1]


def test_out_of_contract_event_rejected_not_folded(spark, tmp_path):
    """An event strictly before its key's last_t would need insertion
    into the middle of the gap sequence — it must surface as rejected
    evidence and leave the state untouched."""
    sink = burstiness_sink(
        str(tmp_path / "state"), str(tmp_path / "out"), "user_id", "ts"
    )
    sink(_mk(spark, [(0, 1, _t(5)), (1, 1, _t(7))]), 0)
    before = _stats(read_burstiness(spark, str(tmp_path / "state")))
    sink(_mk(spark, [(2, 1, _t(3)), (3, 2, _t(1))]), 1)  # 1 is late
    after = _stats(read_burstiness(spark, str(tmp_path / "state")))
    assert [r for r in after if r[0] == 1] == [
        r for r in before if r[0] == 1
    ]
    assert [r[0] for r in after] == [1, 2]  # user 2's event folded
    rej = read_burstiness_rejected(spark, str(tmp_path / "out"))
    assert [(r.user_id, r.t) for r in rej.collect()] == [
        (1, int(_t(3).timestamp()))
    ]


def test_boundary_tie_is_in_contract(spark, tmp_path):
    """A batch event at exactly last_t is a zero gap, not a
    violation — the multiset absorbs equal timestamps."""
    sink = burstiness_sink(
        str(tmp_path / "state"), str(tmp_path / "out"), "user_id", "ts"
    )
    sink(_mk(spark, [(0, 1, _t(5))]), 0)
    sink(_mk(spark, [(1, 1, _t(5))]), 1)
    (r,) = read_burstiness(spark, str(tmp_path / "state")).collect()
    assert (r.n_events, r.n_gaps, r.sum_gap_s) == (2, 1, 0)
    assert (
        read_burstiness_rejected(spark, str(tmp_path / "out")).count()
        == 0
    )


def test_real_stream_matches_batch(spark, tmp_path):
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
    q = maintain_burstiness(
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
    got = _stats(read_burstiness(spark, str(tmp_path / "state")))
    assert got == _stats(_batch_reference(spark, ALL))
