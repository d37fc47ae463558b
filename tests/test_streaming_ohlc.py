"""Streaming daily OHLC (e19's streaming face): the read-time candle
table must equal batch `daily_ohlc` over the delivered history after
EVERY batch with NO ordering contract — open/close are not additive
but the struct picks are MERGEABLE (semigroup min/max), so a late
batch whose event beats the stored open simply wins the next merge
(the cross-batch fixture pins exactly that). Replays must be no-ops;
the end-to-end file stream must match batch bit-for-bit."""

from __future__ import annotations

import os
import time

from ods_to_datalake_spark.operators.timeseries import daily_ohlc
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.ohlc import (
    maintain_daily_ohlc,
    ohlc_partials_sink,
    read_daily_ohlc,
)

SCHEMA_STR = "event_id long, ts string, value double"

# Batch 1 delivers day-1 events EARLIER than batch 0's (out-of-order
# across batches): the true day-1 open (05:00, value 7.0) arrives a
# batch late and must win the min-merge; same-timestamp tiebreak pair
# split across batches; batch 2 brings NULL values and a NULL ts.
BATCH0 = [
    (10, "2024-01-01 12:00:00", 3.0),
    (11, "2024-01-01 18:00:00", 9.0),
    (20, "2024-01-02 08:00:00", 4.0),
]
BATCH1 = [
    (1, "2024-01-01 05:00:00", 7.0),   # late-arriving true open
    (2, "2024-01-01 12:00:00", 5.0),   # ties batch 0's noon event...
    (30, "2024-01-02 23:00:00", 1.0),
]
BATCH2 = [
    (3, "2024-01-03 00:00:00", None),
    (4, None, 99.0),
    (5, "2024-01-03 09:00:00", 2.5),
]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_STR).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )


def _candles(df):
    if df is None:
        return []
    return sorted(
        (
            str(r.day),
            r.open,
            r.high,
            r.low,
            r.close,
            r.n_events,
            r.volume_cents,
        )
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return daily_ohlc(
        _mk(spark, [r for b in batches for r in b]),
        "ts",
        "event_id",
        "value",
    )


def test_streamed_candles_equal_batch_after_every_batch(
    spark, tmp_path
):
    sink = ohlc_partials_sink(
        str(tmp_path / "out"), "ts", "event_id", "value"
    )
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _candles(read_daily_ohlc(spark, str(tmp_path / "out")))
        assert got == _candles(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_late_open_wins_the_merge(spark, tmp_path):
    """Batch 0 sets day-1 open 3.0 (noon); batch 1 delivers the TRUE
    05:00 open (7.0) and a same-timestamp tiebreak rival for noon —
    the merged candle must re-open at 7.0 (no frontier contract:
    lateness is just data)."""
    sink = ohlc_partials_sink(
        str(tmp_path / "out"), "ts", "event_id", "value"
    )
    sink(_mk(spark, BATCH0), 0)
    before = {
        str(r.day): r.open
        for r in read_daily_ohlc(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert before["2024-01-01"] == 3.0
    sink(_mk(spark, BATCH1), 1)
    after = {
        str(r.day): r
        for r in read_daily_ohlc(
            spark, str(tmp_path / "out")
        ).collect()
    }
    d1 = after["2024-01-01"]
    assert d1.open == 7.0  # the late event re-opened the candle
    assert d1.close == 9.0
    assert d1.n_events == 4


def test_delivery_order_is_irrelevant(spark, tmp_path):
    sink = ohlc_partials_sink(
        str(tmp_path / "out"), "ts", "event_id", "value"
    )
    for i, rows in zip((0, 1, 2), (BATCH2, BATCH0, BATCH1)):
        sink(_mk(spark, rows), i)
    got = _candles(read_daily_ohlc(spark, str(tmp_path / "out")))
    assert got == _candles(_batch_reference(spark, ALL))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = ohlc_partials_sink(
        str(tmp_path / "out"), "ts", "event_id", "value"
    )
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _candles(read_daily_ohlc(spark, str(tmp_path / "out")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _candles(read_daily_ohlc(spark, str(tmp_path / "out")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "out")) == [0, 1]


def test_real_stream_matches_batch_candles(spark, tmp_path):
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
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    q = maintain_daily_ohlc(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "ts",
        "event_id",
        "value",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _candles(read_daily_ohlc(spark, str(tmp_path / "out")))
    assert got == _candles(_batch_reference(spark, ALL))


def test_drawdown_derives_from_the_same_artifact(spark, tmp_path):
    """The shared-sink contract (cusum/seasonal pattern): one candle-
    partials artifact, TWO read-time derivations — the drawdown read
    must equal batch max_drawdown over the delivered history after
    every batch, with no second ingest store."""
    from ods_to_datalake_spark.operators.timeseries import max_drawdown
    from ods_to_datalake_spark.streaming.ohlc import read_max_drawdown

    sink = ohlc_partials_sink(
        str(tmp_path / "out"), "ts", "event_id", "value"
    )
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = [
            (str(r.day), r.value_cents, r.peak_cents, r.drawdown_cents)
            for r in read_max_drawdown(
                spark, str(tmp_path / "out")
            ).collect()
        ]
        ref = [
            (str(r.day), r.value_cents, r.peak_cents, r.drawdown_cents)
            for r in max_drawdown(
                _mk(spark, [x for b in ALL[: i + 1] for x in b]),
                "ts",
                "value",
            ).collect()
        ]
        assert got == ref, f"divergence after batch {i}"


def test_realized_vol_derives_from_the_same_artifact(spark, tmp_path):
    """Third read-time derivation of the candle artifact (e24): the
    volatility read must equal batch realized_volatility over the
    delivered history after every batch — a late event that moves a
    day's close wins the max-struct merge and the returns recompute
    from the corrected series."""
    from ods_to_datalake_spark.operators.timeseries import (
        realized_volatility,
    )
    from ods_to_datalake_spark.streaming.ohlc import read_realized_vol

    sink = ohlc_partials_sink(
        str(tmp_path / "out"), "ts", "event_id", "value"
    )
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = [
            (r.n_returns, r.mean_log_return, r.realized_vol)
            for r in read_realized_vol(
                spark, str(tmp_path / "out")
            ).collect()
        ]
        ref = [
            (r.n_returns, r.mean_log_return, r.realized_vol)
            for r in realized_volatility(
                _mk(spark, [x for b in ALL[: i + 1] for x in b]),
                "ts",
                "event_id",
                "value",
            ).collect()
        ]
        assert got == ref, f"divergence after batch {i}"
