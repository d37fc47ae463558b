"""Streaming CDC upsert maintenance: the snapshot-per-batch fold must
equal the batch-mode cdc_apply fold, replays must be no-ops, crashed
partial snapshots must be invisible, and retention must keep the
serving snapshot."""

from __future__ import annotations

import os

from ods_to_datalake_spark.operators.cdc import cdc_apply
from ods_to_datalake_spark.streaming.cdc_ingest import (
    cdc_upsert_sink,
    list_cdc_snapshots,
    prune_cdc_snapshots,
    read_cdc_snapshot,
)

SCHEMA = "k long, v string, op string, ver int"

BATCH0 = [  # bootstrap inserts (one double-versioned)
    (1, "a", "I", 1),
    (2, "b", "I", 1),
    (2, "b2", "U", 2),
    (3, "c", "I", 1),
]
# versions are GLOBALLY unique and increasing across batches: the fold
# is then invariant to micro-batch regrouping (a file source may merge
# or split trigger batches), and within-batch winners are well-defined
BATCH1 = [  # update, delete, insert
    (1, "a2", "U", 11),
    (3, None, "D", 11),
    (4, "d", "I", 11),
]
BATCH2 = [  # re-insert a deleted key, delete an updated one
    (3, "c2", "I", 21),
    (1, None, "D", 21),
]


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def _batch_fold(spark, batches):
    snap = spark.createDataFrame([], "k long, v string")
    for rows in batches:
        ch = spark.createDataFrame(rows, SCHEMA)
        snap = cdc_apply(snap, ch, ["k"], op_col="op", version_col="ver")
    return snap


def test_streamed_snapshots_equal_batch_fold(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = cdc_upsert_sink(state, ["k"], op_col="op", version_col="ver")
    batches = [BATCH0, BATCH1, BATCH2]
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, SCHEMA), i)
        assert _rows(read_cdc_snapshot(spark, state)) == _rows(
            _batch_fold(spark, batches[: i + 1])
        )
    assert _rows(read_cdc_snapshot(spark, state)) == [
        (2, "b2"),
        (3, "c2"),
        (4, "d"),
    ]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch redelivers the LAST batch id after a crash: the
    sink re-reads the same prior snapshot (id < current) and rewrites
    an identical snapshot — even though the crashed attempt already
    left a snapshot under the replayed id."""
    state = str(tmp_path / "state")
    sink = cdc_upsert_sink(state, ["k"], op_col="op", version_col="ver")
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)
    after_first = _rows(read_cdc_snapshot(spark, state))
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)  # replay
    assert _rows(read_cdc_snapshot(spark, state)) == after_first
    assert list_cdc_snapshots(spark, state) == [0, 1]


def test_partial_snapshot_without_success_is_invisible(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = cdc_upsert_sink(state, ["k"], op_col="op", version_col="ver")
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)
    # crash mid-write of batch 1: data files but no _SUCCESS
    partial = os.path.join(state, "snapshot=1")
    os.makedirs(partial)
    open(os.path.join(partial, "part-00000.parquet"), "w").write("junk")
    assert list_cdc_snapshots(spark, state) == [0]
    assert _rows(read_cdc_snapshot(spark, state)) == _rows(
        _batch_fold(spark, [BATCH0])
    )
    # the replay overwrites the partial dir and commits
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)
    assert list_cdc_snapshots(spark, state) == [0, 1]
    assert _rows(read_cdc_snapshot(spark, state)) == _rows(
        _batch_fold(spark, [BATCH0, BATCH1])
    )


def test_time_travel_and_prune(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = cdc_upsert_sink(state, ["k"], op_col="op", version_col="ver")
    for i, rows in enumerate([BATCH0, BATCH1, BATCH2]):
        sink(spark.createDataFrame(rows, SCHEMA), i)
    assert _rows(read_cdc_snapshot(spark, state, batch_id=0)) == _rows(
        _batch_fold(spark, [BATCH0])
    )
    pruned = prune_cdc_snapshots(spark, state, keep_last=1)
    assert pruned == [0, 1]
    assert list_cdc_snapshots(spark, state) == [2]
    assert _rows(read_cdc_snapshot(spark, state)) == [
        (2, "b2"),
        (3, "c2"),
        (4, "d"),
    ]


def test_real_stream_maintains_snapshot(spark, tmp_path):
    """End-to-end through Structured Streaming: a file-source change
    feed drives maintain_cdc_snapshot; the final snapshot equals the
    batch fold of everything delivered."""
    import time

    from ods_to_datalake_spark.streaming.cdc_ingest import (
        maintain_cdc_snapshot,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate([BATCH0, BATCH1, BATCH2]):
        f = os.path.join(src, f"b{i}.parquet")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    state = str(tmp_path / "state")
    q = maintain_cdc_snapshot(
        stream,
        state,
        str(tmp_path / "ckpt"),
        ["k"],
        op_col="op",
        version_col="ver",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # micro-batch boundaries may differ from file boundaries, but the
    # FINAL snapshot must equal the batch fold of all changes...
    got = _rows(read_cdc_snapshot(spark, state))
    assert got == _rows(_batch_fold(spark, [BATCH0, BATCH1, BATCH2]))


DIM_ROWS = [(1, "gold"), (2, "silver"), (3, "gold"), (4, "bronze")]


def test_materialized_join_sink_equals_apply_then_join(spark, tmp_path):
    """The maintained join snapshot must equal cdc_apply-fold-then-join
    after every batch (the streaming u09 identity), and replays must be
    no-ops — the dimension only ever meets the change batch."""
    from ods_to_datalake_spark.streaming.cdc_ingest import (
        materialized_join_sink,
    )

    dim = spark.createDataFrame(DIM_ROWS, "k long, tier string")
    state = str(tmp_path / "state")
    sink = materialized_join_sink(
        state, ["k"], dim, ["k"], op_col="op", version_col="ver"
    )
    batches = [BATCH0, BATCH1, BATCH2]

    def _joined_rows(df):
        return sorted(
            (r.k, r.v, r.tier) for r in df.collect()
        )

    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, SCHEMA), i)
        expect = _batch_fold(spark, batches[: i + 1]).join(dim, "k")
        assert _joined_rows(read_cdc_snapshot(spark, state)) == (
            _joined_rows(expect)
        )
    # replay the last batch: identical snapshot, no duplicate rows
    before = _joined_rows(read_cdc_snapshot(spark, state))
    sink(spark.createDataFrame(BATCH2, SCHEMA), 2)
    assert _joined_rows(read_cdc_snapshot(spark, state)) == before
    assert list_cdc_snapshots(spark, state) == [0, 1, 2]


def test_prune_reclaims_uncommitted_leftovers(spark, tmp_path):
    """A crashed partial snapshot BELOW the newest committed one can
    never be completed by a replay (only the last batch redelivers) —
    prune must reclaim it, as its docstring promises (r7 review)."""
    import os

    from ods_to_datalake_spark.streaming.cdc_ingest import (
        prune_cdc_snapshots,
    )

    state = str(tmp_path / "state")
    sink = cdc_upsert_sink(state, ["k"], op_col="op", version_col="ver")
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)
    sink(spark.createDataFrame(BATCH1, SCHEMA), 2)
    # crash leftover between them: data, no _SUCCESS
    partial = os.path.join(state, "snapshot=1")
    os.makedirs(partial)
    open(os.path.join(partial, "part-0.parquet"), "w").write("junk")
    pruned = prune_cdc_snapshots(spark, state, keep_last=2)
    assert pruned == [1]
    assert not os.path.exists(partial)
    assert list_cdc_snapshots(spark, state) == [0, 2]
