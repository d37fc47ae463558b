"""Streaming CUSUM level-shift monitor: maintain e16's Page-CUSUM
volume-shift statistic (`operators/timeseries.cusum_shift_scores`)
from a micro-batched event stream — the "did ingest volume step, and
when" panel next to the seasonal profile on an ingest dashboard.

Same contract-free design as the seasonal and Zipf faces: the
maintained artifact is per-day event COUNTS, which are ADDITIVE, so
there is no frontier state, no alignment contract, no rejected side
output — late, out-of-order, and replayed events are all correct data.
The SINK is literally the seasonal face's `daily_counts_sink`
(one additive artifact, two read-time derivations — maintaining a
second count store for the same numbers would just double the ingest
write); the profile is derived at READ time from the sum-fold of every
committed partition through the SAME arithmetic the batch operator
uses (`timeseries.cusum_from_daily`) — bit-identical to batch
`cusum_shift_scores` over the delivered history, unconditionally.

NOTE the statistic is GLOBAL over the delivered series (N days, total
T enter every deviation), so unlike a per-day panel each read
recomputes the calendar-sized windows — that is the batch operator's
own cost shape (two stacked windows over ~days rows), trivial at read
time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.seasonal import daily_counts_sink

__all__ = ["daily_counts_sink", "maintain_cusum", "read_cusum"]


def maintain_cusum(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str,
):
    """Attach the (shared) daily-count sink to an event stream."""
    return (
        stream.writeStream.foreachBatch(
            daily_counts_sink(out_dir, ts_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_cusum(
    spark: SparkSession,
    out_dir: str,
    h_num: int = 2,
    h_den: int = 1,
) -> DataFrame | None:
    """(day, n_events, cusum_pos, cusum_neg, is_shift) over the
    delivered history: sum-fold of every committed count partition,
    then the batch operator's own window arithmetic
    (`timeseries.cusum_from_daily`) — bit-identical to batch
    `cusum_shift_scores`. None before any commit."""
    from ods_to_datalake_spark.operators.timeseries import (
        cusum_from_daily,
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
    return cusum_from_daily(daily, h_num=h_num, h_den=h_den)
