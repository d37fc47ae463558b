"""Streaming seasonal profile: maintain e15's day-of-week volume
decomposition (`operators/sequence.seasonal_profile`) from a
micro-batched event stream — the ingest-volume dashboard's "is
Monday's dip seasonal or an incident" panel, kept current on ingest.

This is the simplest member of the streaming-face matrix, ON PURPOSE:
the maintained artifact is per-day event COUNTS, which are ADDITIVE —
so unlike the streaks/growth/Markov sinks there is NO frontier state,
NO alignment contract, and NO rejected side output. Late, out-of-order
and day-straddling events are all simply correct data: each batch
writes its own (day, n) partial counts under the
``snapshot=<batch_id>`` idempotence layout (a replayed batch
overwrites its own partition — the additive-artifact design of the
streaming HLL/CMS sketches and the Markov counts), and the profile is
derived at READ time from the sum-fold of every committed partition
through the SAME arithmetic the batch operator uses
(`sequence.profile_from_daily`) — bit-identical to batch
`seasonal_profile` over the delivered history, unconditionally
(tested, including an adversarially shuffled delivery order).

Scale: each batch pays one day-keyed partial agg over its own rows
(map-side combinable, calendar-sized output); the read folds
calendar × batches rows. Compact the count partitions periodically
like any additive lake artifact if batch count grows unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def daily_counts_sink(out_dir: str, ts_col: str):
    """foreachBatch sink appending per-batch (day, n) partial counts —
    see the module docstring for why this needs no state dir."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        daily = (
            batch_df.filter(F.col(ts_col).isNotNull())
            .groupBy(
                F.to_date(
                    F.date_trunc("day", F.col(ts_col))
                ).alias("day")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        daily.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_seasonal_profile(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str,
):
    """Attach the daily-count sink to an event stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            daily_counts_sink(out_dir, ts_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_seasonal_profile(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(day, dow, n_events, dow_mean, seasonal_index, residual) — the
    profile over the delivered history: sum-fold of every committed
    count partition (one flat multi-path read), then the batch
    operator's own arithmetic (`sequence.profile_from_daily`) over the
    folded exact integers — bit-identical to batch `seasonal_profile`
    with no ordering contract at all (counts are additive). None
    before any commit."""
    from ods_to_datalake_spark.operators.sequence import (
        profile_from_daily,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    daily = (
        spark.read.parquet(
            *[f"{out_dir}/snapshot={b}" for b in snaps]
        )
        .groupBy("day")
        .agg(F.sum("n").cast("long").alias("n_events"))
    )
    return profile_from_daily(daily)
