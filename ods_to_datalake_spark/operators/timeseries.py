"""Time-series regularization: resample an event stream onto a fixed
grid and fill the gaps by carrying the last observation forward.

Irregular event streams (the `events` table; any ODS changelog) need a
regular grid before trend/anomaly/feature work — the missing operator
between raw events and e10's daily-stats anomaly scan. Two pieces:

- `resample_last`: one row per (key, bucket) carrying the LATEST
  observation in the bucket (deterministic: ordered by (ts, unique
  tiebreaker), resolved by a partial-aggregated max-struct — never a
  window over the event stream);
- `gap_fill`: per-key dense bucket spine between the key's first and
  last observation (sequence + explode — generated distributed,
  never on the driver), left-joined to the observations, value
  forward-filled by `last(ignorenulls)` over the per-key ordered
  window.

Scale: the max-struct agg and the spine/fill share one partitioning
by key — Exchange on (key) carries the agg, the bounds agg, the join,
and the fill window. The fill itself is the carried DOUBLE bit-moved,
never recomputed, so cross-engine parity is exact. A key whose span
dwarfs its observation count (one stray epoch-0 timestamp against
today's data = millions of empty buckets) is the operational hazard;
`max_buckets_per_key` drops such keys (and `oversized_spans` reports
them) — the same opt-in width-guard pattern as
`dedup.cap_bucket_width`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# units date_trunc supports identically in Spark and DuckDB
_UNITS = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}


def resample_last(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest observation per (key, date_trunc(unit, ts)) bucket:
    max-struct over (ts, tiebreak) — (ts, tiebreak) must be unique per
    key, the suite-wide determinism rule. NULL-ts rows are unplaceable
    on the grid and drop (their bucket is NULL, excluded)."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    picked = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("__bucket", F.date_trunc(unit, F.col(ts_col)))
        .groupBy(key, "__bucket")
        .agg(
            F.max(F.struct(*order, F.col(value_col).alias("__v")))
            .alias("__top")
        )
    )
    return picked.select(
        key,
        F.col("__bucket").alias("bucket"),
        F.col("__top.__v").alias(value_col),
    )


def gap_fill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    tiebreak: str | None = None,
    max_buckets_per_key: int | None = None,
) -> DataFrame:
    """Dense per-key grid from the key's first to last observed bucket,
    last-observation-carried-forward. Output: (key, bucket, value,
    observed) — `observed` FALSE on filled rows. A filled value is the
    carried observation verbatim (no arithmetic), so DOUBLE values
    stay bit-identical cross-engine."""
    obs = resample_last(df, key, ts_col, value_col, unit, tiebreak)
    bounds = obs.groupBy(key).agg(
        F.min("bucket").alias("__lo"),
        F.max("bucket").alias("__hi"),
        F.count(F.lit(1)).alias("__n_obs"),
    )
    if max_buckets_per_key is not None:
        # integer bucket arithmetic (never float division — CLAUDE.md):
        # span_buckets > cap  <=>  (hi - lo) >= cap * step
        step = {"minute": 60, "hour": 3600, "day": 86400}[unit]
        diff = F.unix_timestamp("__hi") - F.unix_timestamp("__lo")
        bounds = bounds.filter(
            diff < F.lit(step) * F.lit(max_buckets_per_key)
        )
    spine = bounds.select(
        key,
        F.explode(
            F.expr(
                f"sequence(__lo, __hi, interval {_UNITS[unit]})"
            )
        ).alias("bucket"),
    )
    joined = spine.join(obs, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        "bucket",
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNotNull().alias("observed"),
    )


def oversized_spans(
    df: DataFrame,
    key: str,
    ts_col: str,
    unit: str,
    max_buckets_per_key: int,
) -> DataFrame:
    """Report keys `gap_fill(max_buckets_per_key=...)` would drop:
    (key, first/last bucket, span_buckets, n_obs) — the triage list
    for stray-timestamp cleanup before an uncapped fill."""
    step = {"minute": 60, "hour": 3600, "day": 86400}[unit]
    obs = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("__bucket", F.date_trunc(unit, F.col(ts_col)))
        .groupBy(key)
        .agg(
            F.min("__bucket").alias("first_bucket"),
            F.max("__bucket").alias("last_bucket"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    return (
        obs.withColumn(
            "__diff",
            F.unix_timestamp("last_bucket")
            - F.unix_timestamp("first_bucket"),
        )
        .withColumn(
            # bucket-aligned diff is an exact multiple of step;
            # integer `div`, never float division (CLAUDE.md)
            "span_buckets",
            F.expr(f"__diff div {step}") + F.lit(1),
        )
        .filter(F.col("span_buckets") > F.lit(max_buckets_per_key))
        .drop("__diff")
    )
