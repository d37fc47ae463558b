"""Streaming daily OHLC/candlestick panel: maintain e19's candle table
(`operators/timeseries.daily_ohlc`) from a micro-batched event stream
— the canonical metered-stream downsample kept live as events arrive.

This face's state algebra is one step beyond the additive-sums faces
(zipf/dup-spectrum/correlation maintain plain sums): a candle's
open/close are NOT additive, but they ARE mergeable — the first/last
picks carried as full (ts, tiebreak, value) structs make every
component a SEMIGROUP fold (min of min-structs, max of max-structs,
sums of counts/volume), so partial candles from any batch split merge
EXACTLY to the single-pass candle. Late, out-of-order, and replayed
events are all correct data: a late event that beats the stored open
simply wins the next min-merge — no frontier contract, no rejected
side output. Each batch writes its per-day partial candles
(`ohlc_partials`) under the ``snapshot=<batch_id>`` idempotence
layout; the read folds every committed partition through
`ohlc_merge` and projects with the SAME `ohlc_finalize` the batch
operator uses — bit-identical to batch `daily_ohlc` over the
delivered history, unconditionally, regardless of delivery order.

Scale: each batch pays one day-keyed partial agg over its own rows
(map-side combinable, calendar-sized output); the read folds
days × batches rows. Compact periodically — `ohlc_merge`'s output is
itself a valid partial, so compaction is just re-writing the fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def ohlc_partials_sink(
    out_dir: str, ts_col: str, tiebreak_col: str, value_col: str
):
    """foreachBatch sink appending per-batch per-day candle partials —
    mergeable artifact, so no state dir (module docstring)."""
    from ods_to_datalake_spark.operators.timeseries import (
        ohlc_partials,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ohlc_partials(
            batch_df, ts_col, tiebreak_col, value_col
        ).write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_daily_ohlc(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
):
    """Attach the candle-partials sink to an event stream and start
    it."""
    return (
        stream.writeStream.foreachBatch(
            ohlc_partials_sink(out_dir, ts_col, tiebreak_col, value_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_daily_ohlc(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(day, open, high, low, close, n_events, volume_cents) over the
    delivered history: semigroup fold of every committed partial
    partition (`ohlc_merge` — one flat multi-path read), projected
    through the batch operator's own `ohlc_finalize` — bit-identical
    to batch `daily_ohlc` with no ordering contract at all. None
    before any commit."""
    from ods_to_datalake_spark.operators.timeseries import (
        ohlc_finalize,
        ohlc_merge,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    partials = spark.read.parquet(
        *[f"{out_dir}/snapshot={b}" for b in snaps]
    )
    return ohlc_finalize(ohlc_merge(partials))


def read_max_drawdown(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(day, value_cents, peak_cents, drawdown_cents) — e20's maximum
    drawdown derived from the SAME candle-partials artifact the OHLC
    read folds (the cusum/seasonal shared-sink pattern: one ingest
    write, several read-time derivations — the folded candles' daily
    volume_cents IS the drawdown's input series): semigroup fold via
    `ohlc_merge`, then batch `timeseries.drawdown_from_daily`'s own
    windows — bit-identical to batch `max_drawdown` over the
    delivered history. None before any commit."""
    from ods_to_datalake_spark.operators.timeseries import (
        drawdown_from_daily,
        ohlc_merge,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    partials = spark.read.parquet(
        *[f"{out_dir}/snapshot={b}" for b in snaps]
    )
    from pyspark.sql import functions as F

    daily = ohlc_merge(partials).select(
        "day", F.col("volume_cents").alias("value_cents")
    )
    return drawdown_from_daily(daily)


def read_realized_vol(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(n_returns, mean_log_return, realized_vol) — e24's realized
    volatility derived from the SAME candle-partials artifact (the
    third derivation: OHLC reads the candles, drawdown their depth,
    this their jitter): semigroup fold via `ohlc_merge`, then batch
    `timeseries.realized_vol_from_daily`'s own expressions over the
    folded closes — bit-identical to batch `realized_volatility`
    over the delivered history, because a late event that changes a
    day's close simply wins the next max-struct merge and the log
    returns recompute from the corrected series. None before any
    commit."""
    from ods_to_datalake_spark.operators.timeseries import (
        ohlc_finalize,
        ohlc_merge,
        realized_vol_from_daily,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    partials = spark.read.parquet(
        *[f"{out_dir}/snapshot={b}" for b in snaps]
    )
    daily = ohlc_finalize(ohlc_merge(partials)).select(
        "day", "close"
    )
    return realized_vol_from_daily(daily)
