"""Streaming activity streaks (e13's streaming face): the serving
table from the newest state snapshot must equal batch
`longest_daily_streak` over the delivered history after EVERY batch
(per-user day-ordered batches — the module contract), replays must be
no-ops, runs must merge across batch boundaries, and out-of-contract
days must surface in the rejected side output instead of silently
double-extending a run."""

from __future__ import annotations

import os
import time
from datetime import datetime

from ods_to_datalake_spark.operators.sequence import (
    longest_daily_streak,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.streaks import (
    maintain_streaks,
    read_streaks,
    read_streaks_rejected,
    streaks_sink,
)

SCHEMA = "user_id long, ts timestamp"


def _d(day, h=0):
    return datetime(2024, 3, day, h)


# per-user days strictly advance across batches (the contract).
# user 1: days 1,2 | 3 (merges across the boundary) | 7 (new run,
#   shorter — best stays 1-3)
# user 2: day 1 | gap | days 5,6,8 in ONE batch (two islands in-batch)
# user 3: appears only in batch 1, single day
BATCH0 = [
    (1, _d(1, 2)),
    (1, _d(1, 9)),
    (1, _d(2)),
    (2, _d(1, 5)),
    (None, _d(1)),
]
BATCH1 = [(1, _d(3)), (3, _d(3, 3)), (3, None)]
BATCH2 = [(1, _d(7)), (2, _d(5)), (2, _d(6, 8)), (2, _d(8))]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _table(df):
    if df is None:
        return []
    return sorted(
        (r.user_id, r.streak_days, r.streak_start, r.streak_end)
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    # the batch operator keeps a NULL-user group (SQL GROUP BY); the
    # streaming face tracks NON-NULL keys only (a NULL key cannot be
    # joined to its own state row) — documented, pinned here
    return longest_daily_streak(
        _mk(spark, [r for b in batches for r in b]).filter(
            "user_id IS NOT NULL"
        ),
        "user_id",
        "ts",
    )


def _sink(tmp_path):
    return streaks_sink(
        str(tmp_path / "state"), str(tmp_path / "out"), "user_id", "ts"
    )


def test_streamed_streaks_equal_batch_after_every_batch(
    spark, tmp_path
):
    sink = _sink(tmp_path)
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _table(read_streaks(spark, str(tmp_path / "state")))
        assert got == _table(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"
    rej = read_streaks_rejected(spark, str(tmp_path / "out"))
    assert rej is not None and rej.count() == 0


def test_run_merges_across_batch_boundary(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    rows = {
        r.user_id: r
        for r in read_streaks(
            spark, str(tmp_path / "state")
        ).collect()
    }
    # user 1's days 1-2 (batch 0) + day 3 (batch 1) are ONE run
    assert rows[1].streak_days == 3
    assert rows[1].streak_start.isoformat() == "2024-03-01"
    assert rows[1].streak_end.isoformat() == "2024-03-03"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _table(read_streaks(spark, str(tmp_path / "state")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _table(read_streaks(spark, str(tmp_path / "state")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "state")) == [0, 1]


def test_out_of_contract_day_is_rejected_not_double_counted(
    spark, tmp_path
):
    sink = _sink(tmp_path)
    sink(_mk(spark, BATCH0), 0)  # user 1 through day 2
    before = _table(read_streaks(spark, str(tmp_path / "state")))
    # day 2 re-delivered, and day 1 out of order: both at or before
    # user 1's cur_end — evidence, not a double extension
    sink(_mk(spark, [(1, _d(2, 11)), (1, _d(1, 3))]), 1)
    assert (
        _table(read_streaks(spark, str(tmp_path / "state")))
        == before
    )
    rej = read_streaks_rejected(spark, str(tmp_path / "out"))
    assert sorted(
        (r.user_id, r.day.isoformat()) for r in rej.collect()
    ) == [(1, "2024-03-01"), (1, "2024-03-02")]
    # the valid NEXT day still extends the run normally afterwards
    sink(_mk(spark, [(1, _d(3))]), 2)
    rows = {
        r.user_id: r
        for r in read_streaks(
            spark, str(tmp_path / "state")
        ).collect()
    }
    assert rows[1].streak_days == 3


def test_multi_island_batch_and_best_tiebreak(spark, tmp_path):
    # one batch containing two equal-length islands: best must take
    # the EARLIER start (the e13 tiebreak)
    sink = _sink(tmp_path)
    sink(
        _mk(
            spark,
            [(7, _d(1)), (7, _d(2)), (7, _d(5)), (7, _d(6))],
        ),
        0,
    )
    got = _table(read_streaks(spark, str(tmp_path / "state")))
    ref = _table(
        _batch_reference(
            spark,
            [[(7, _d(1)), (7, _d(2)), (7, _d(5)), (7, _d(6))]],
        )
    )
    assert got == ref
    (row,) = got
    assert row[1] == 2 and row[2].isoformat() == "2024-03-01"


def test_real_stream_matches_batch_streaks(spark, tmp_path):
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
    q = maintain_streaks(
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
    got = _table(read_streaks(spark, str(tmp_path / "state")))
    assert got == _table(_batch_reference(spark, ALL))


def test_middle_island_best_and_cross_boundary_tie(spark, tmp_path):
    # batch 0 has three islands where the MIDDLE one is longest (the
    # __midbest leg, neither mergeable-first nor current-last); batch
    # 1 then merges across the boundary into a run that TIES it — the
    # batch tiebreak (earlier start) must win in the streaming state
    sink = _sink(tmp_path)
    b0 = [(1, _d(1)), (1, _d(5)), (1, _d(6)), (1, _d(7)),
          (1, _d(8)), (1, _d(20))]
    sink(_mk(spark, b0), 0)
    assert _table(read_streaks(spark, str(tmp_path / "state"))) == _table(
        _batch_reference(spark, [b0])
    )
    b1 = [(1, _d(21)), (1, _d(22)), (1, _d(23))]
    sink(_mk(spark, b1), 1)
    got = _table(read_streaks(spark, str(tmp_path / "state")))
    assert got == _table(_batch_reference(spark, [b0, b1]))
    (row,) = got
    # 20-23 (merged, 4 days) ties 5-8 (4 days): earlier start wins
    assert row[1] == 4 and row[2].isoformat() == "2024-03-05"


def test_streaks_hypothesis_parity_with_batch(spark, tmp_path):
    # derandomized mini-property check: random per-user day sets,
    # split into contract-respecting batches (each user's days sorted,
    # chunked in order) — the streamed state must equal batch e13
    # after the last batch, for every corpus
    import itertools
    import random

    rnd = random.Random(90210)
    for case in range(4):
        days = {
            u: sorted(
                rnd.sample(range(1, 25), rnd.randint(1, 8))
            )
            for u in range(1, rnd.randint(2, 5))
        }
        cut = rnd.random()
        batches = [[], [], []]
        for u, ds in days.items():
            # contract: each user's days are split ORDER-PRESERVING
            # across batches (cut points per user)
            c1 = int(len(ds) * cut)
            c2 = c1 + max(0, int((len(ds) - c1) * rnd.random()))
            for i, chunk in enumerate(
                (ds[:c1], ds[c1:c2], ds[c2:])
            ):
                batches[i].extend((u, _d(d)) for d in chunk)
        base = tmp_path / f"case{case}"
        sink = streaks_sink(
            str(base / "state"), str(base / "out"), "user_id", "ts"
        )
        delivered = []
        for i, rows in enumerate(batches):
            if not rows:
                continue
            delivered.append(rows)
            sink(_mk(spark, rows), i)
        got = _table(read_streaks(spark, str(base / "state")))
        ref = _table(_batch_reference(spark, delivered))
        assert got == ref, f"case {case}: {days} -> {got} != {ref}"
