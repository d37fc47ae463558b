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


def cusum_shift_scores(
    df: DataFrame,
    ts_col: str,
    h_num: int = 2,
    h_den: int = 1,
) -> DataFrame:
    """(day, n_events, cusum_pos, cusum_neg, is_shift) — Page's CUSUM
    level-shift detector over the daily event-volume series: the
    "did ingest volume step up/down, and when" panel that a
    mean±z-score test (e10) structurally misses, because a small
    sustained shift never trips a per-day threshold while its
    CUMULATIVE sum grows linearly (Page 1954 — the sequential-analysis
    classic).

    Exact-integer formulation: with N observed days and T total
    events, the per-day deviation is d_t = N·n_t − T (an integer that
    sums to 0 over the series — no mean division anywhere); the
    one-sided statistics use the prefix-sum identity

        cusum_pos_t = max(0, cusum_pos_{t-1} + d_t)
                    = S_t − min(0, min_{i<=t} S_i)   (S = prefix sum)

    (the min/max clamp includes the VIRTUAL S_0 = 0 origin — Page's
    statistic starts at 0, so a first-day deficit already registers
    on the negative side)

    so the sequential recurrence becomes TWO stacked windows (prefix
    sum, then running min/max of it) instead of a per-row loop —
    the same trick both engines compute identically on BIGINTs.
    `is_shift` flags days where either side exceeds the equivalent of
    ``h_num/h_den`` days of average volume: cusum·h_den > T·h_num,
    an ALL-integer comparison (the x42 boundary rule — never a float
    threshold). Zero-slack CUSUM on purpose: slack k trades detection
    delay for run length, and k=0 keeps the statistic an exact
    integer with no rate parameter to tune cross-engine.

    The series is the OBSERVED days (NULL timestamps excluded);
    days with zero events are absent — compose with `gap_fill` first
    if silence itself should register as a downward shift.

    Scale: ONE day-keyed partial agg over the events (map-side
    combinable), then windows over the CALENDAR-sized daily frame —
    the prefix windows order ~days rows, never events (the e14 rule);
    the 1-row totals broadcast; the daily frame feeds the window leg
    and the totals agg, so it is localCheckpointed (calendar-sized)."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return cusum_from_daily(daily, h_num=h_num, h_den=h_den)


def cusum_from_daily(
    daily: DataFrame, h_num: int = 2, h_den: int = 1
) -> DataFrame:
    """`cusum_shift_scores`'s window arithmetic over a pre-built
    (day, n_events) frame — split out so the STREAMING face (which
    folds per-batch additive daily counts from the lake) and the
    batch operator derive the statistic through the SAME expressions
    and stay bit-identical by construction (the zipf_from_counts /
    profile_from_daily pattern)."""
    from pyspark.sql import Window

    daily = daily.localCheckpoint()  # feeds totals AND the window leg
    totals = daily.agg(
        F.count(F.lit(1)).cast("long").alias("__nd"),
        F.coalesce(F.sum("n_events"), F.lit(0))
        .cast("long")
        .alias("__tot"),
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scored = (
        daily.crossJoin(F.broadcast(totals))
        .withColumn(
            "__s",
            F.sum(
                F.col("n_events") * F.col("__nd") - F.col("__tot")
            ).over(w_cum),
        )
        .withColumn(
            "cusum_pos",
            F.col("__s")
            - F.least(F.lit(0).cast("long"), F.min("__s").over(w_cum)),
        )
        .withColumn(
            "cusum_neg",
            F.greatest(
                F.lit(0).cast("long"), F.max("__s").over(w_cum)
            )
            - F.col("__s"),
        )
    )
    return scored.select(
        "day",
        "n_events",
        "cusum_pos",
        "cusum_neg",
        (
            (
                F.greatest("cusum_pos", "cusum_neg") * F.lit(h_den)
                > F.col("__tot") * F.lit(h_num)
            )
        ).alias("is_shift"),
    )


def volume_autocorrelation(
    df: DataFrame,
    ts_col: str,
    lag_days: int = 7,
) -> DataFrame:
    """(n_days, n_pairs, autocorr) — lag-``lag_days`` autocorrelation
    of the daily event-volume series: r_L = Σ d_t·d_{t+L} / Σ d_t²
    with d_t the deviation from the series mean — the "is volume
    actually weekly-periodic" NUMBER behind e15's seasonal profile
    (a profile computed on a non-periodic series is noise dressed as
    seasonality; r_7 near its ceiling says the weekday decomposition
    is earning its keep, near 0 says don't ship it). Standard
    (biased) estimator: the lag pairs' products divide by ALL N
    squared deviations, so even a strict period reads (N−L)/N, not
    1.0 — compare r against that ceiling, not against 1 (pinned by
    test).

    Exact-integer formulation: d_t = N·n_t − T (the e16 scaled
    deviation — no mean division anywhere); both Σ d_t·d_{t+L} and
    Σ d_t² are exact DECIMAL(38,0) sums (products reach ~1e30 at
    daily volumes of 1e6 over 1e3 days — far past int64, fine in
    decimal38/HUGEINT), and the ratio is ONE IEEE division whose
    operands the oracle VARCHAR-hops (the u17 rule). Lag pairs are
    CALENDAR-lagged (a self-join on day = day + L days), not
    row-lagged — an observed-day gap must break the pair, not
    silently shift it. r is scale-free: the common N² factor in
    numerator and denominator cancels mathematically and is kept in
    BOTH (exactness beats simplification the engines might disagree
    on).

    Edge semantics: fewer than 2 days, or no lag pairs, or a
    zero-variance series (all days equal → Σd² = 0) → NULL autocorr
    (CASE-guarded; an ANSI divide-by-zero unguarded).

    Scale: ONE day agg over the events, then calendar-sized frames —
    the lag self-join and both sums move ~days rows."""
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # feeds totals, the dev frame ×2 legs
    )
    d38 = "decimal(38,0)"
    totals = daily.agg(
        F.count(F.lit(1)).cast("long").alias("__nd"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("__t"),
    )
    dev = (
        daily.crossJoin(F.broadcast(totals))
        .select(
            "day",
            (
                F.col("n").cast(d38) * F.col("__nd").cast(d38)
                - F.col("__t").cast(d38)
            ).alias("__d"),
        )
        .localCheckpoint()  # feeds the denominator AND the lag join
    )
    den = dev.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.coalesce(
            F.sum(F.col("__d") * F.col("__d")), F.lit(0).cast(d38)
        ).alias("__den"),
    )
    lagged = dev.select(
        F.date_sub(F.col("day"), lag_days).alias("day"),
        F.col("__d").alias("__dl"),
    )
    num = dev.join(lagged, "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(
            F.sum(F.col("__d") * F.col("__dl")), F.lit(0).cast(d38)
        ).alias("__num"),
    )
    return den.crossJoin(F.broadcast(num)).select(
        "n_days",
        "n_pairs",
        F.when(
            (F.col("n_pairs") > 0)
            & (F.col("__den") != F.lit(0).cast(d38)),
            F.col("__num").cast("double")
            / F.col("__den").cast("double"),
        ).alias("autocorr"),
    )


def daily_ohlc(
    df: DataFrame,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """(day, open, high, low, close, n_events, volume_cents) — the
    OHLC/candlestick rollup per calendar day: first and last observed
    value (by event time), the day's extremes, and the cents-exact
    value volume — the canonical downsample for any metered stream
    (prices, latencies, spend) and the storage-side face of a
    monitoring panel: the raw stream is N rows, the candle table is
    365 rows/year.

    Determinism: "first"/"last" are defined by (ts, tiebreak) with a
    UNIQUE tiebreak (the repo-wide top-k rule — same-timestamp events
    are real), computed as ONE min-struct/max-struct fold — never a
    window over the raw stream (resample_last's rule: the agg is
    map-side combinable, a window is a full sort). The struct
    comparison never reaches the value field (ts+tiebreak is unique),
    so NULL values ride along safely; open/close are PICKED doubles
    (bit-moved, never recomputed — the q02 raw-double rule), high/low
    skip NULLs in both engines, volume sums cents exactly
    (Decimal(18,2)·100) and reads 0 — not NULL — on an all-NULL day.
    Rows with NULL ts have no day and are excluded (e18's rule).

    Scale: ONE day-keyed partial-aggregated shuffle; output is
    calendar-sized. The oracle mirrors first/last with ROW_NUMBER
    windows — equal BY the unique tiebreak. Composition of
    `ohlc_partials` (the per-day MERGEABLE candle state — min/max
    are associative, so partial candles from different batches fold
    exactly; the streaming face's per-batch sink payload) and
    `ohlc_finalize` (the shared projection)."""
    return ohlc_finalize(
        ohlc_partials(df, ts_col, tiebreak_col, value_col)
    )


def ohlc_partials(
    df: DataFrame,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """(day, first_pick, last_pick, high, low, n_events,
    volume_cents) — the per-day MERGEABLE candle state behind
    `daily_ohlc`: first/last carried as full (ts, tiebreak, v)
    structs so min/max stay associative ACROSS partial frames (two
    batches' partials merge to exactly the single-pass candle —
    min/max/count/sum are all semigroup folds; this is the algebra
    the streaming face relies on, a step beyond the additive-sums
    faces: mergeable, not merely additive)."""
    day = F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day")
    v = F.col(value_col)
    pick = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        v.alias("v"),
    )
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(day)
        .agg(
            F.min(pick).alias("first_pick"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(pick).alias("last_pick"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.coalesce(
                F.sum(
                    (v.cast("decimal(18,2)") * 100).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("volume_cents"),
        )
    )


def ohlc_merge(partials: DataFrame) -> DataFrame:
    """Fold a union of `ohlc_partials` frames back into one candle
    per day — the semigroup merge (min of min-structs, max of
    max-structs, sums of counts): bit-identical to a single-pass
    `ohlc_partials` over the concatenated raw stream."""
    return partials.groupBy("day").agg(
        F.min("first_pick").alias("first_pick"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("last_pick").alias("last_pick"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("volume_cents").cast("long").alias("volume_cents"),
    )


def ohlc_finalize(partials: DataFrame) -> DataFrame:
    """Project the mergeable candle state to the public
    (day, open, high, low, close, n_events, volume_cents) schema —
    shared by batch `daily_ohlc` and the streaming face so the two
    cannot drift."""
    return partials.select(
        "day",
        F.col("first_pick").getField("v").alias("open"),
        "high",
        "low",
        F.col("last_pick").getField("v").alias("close"),
        "n_events",
        "volume_cents",
    )


def max_drawdown(
    df: DataFrame, ts_col: str, value_col: str
) -> DataFrame:
    """(day, value_cents, peak_cents, drawdown_cents) — the single
    worst peak-to-trough decline of the daily cents-exact value
    series: for each day, drawdown = (running max of daily value) −
    (that day's value); the emitted row is the day the gap is widest —
    the risk/regression headline number (a revenue stream, a
    throughput metric, a model-quality series: "how far below its
    best has it fallen, and when"), and the e10 anomaly face's
    complement (e10 flags per-day deviation from a LOCAL baseline;
    drawdown measures decline from the GLOBAL running best).

    Exactness: daily values are cents-exact BIGINTs (Decimal(18,2)·100
    — all-NULL days read 0, the e19 rule), the running max and the
    subtraction stay integer, and the winner is picked by (drawdown
    DESC, day ASC) — deterministic at ties. NULL-ts rows are excluded
    (no day). Empty input → empty result.

    Scale: one day-keyed partial-agg shuffle over the events, then a
    single-partition prefix-max window over the CHECKPOINTED
    calendar-sized daily frame (the e16 rule — 365 rows/year however
    large the stream) and a 1-row limit."""
    from pyspark.sql import Window

    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias(
                "day"
            )
        )
        .agg(
            F.coalesce(
                F.sum(
                    (F.col(value_col).cast("decimal(18,2)") * 100)
                    .cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("value_cents")
        )
        .localCheckpoint()  # calendar-sized; the window + top-1 read
        # this, not the event-stream lineage
    )
    return drawdown_from_daily(daily)


def drawdown_from_daily(daily: DataFrame) -> DataFrame:
    """`max_drawdown`'s derivation over a pre-built (day, value_cents)
    frame — split out so the STREAMING read (which folds the OHLC
    face's per-batch candle partials into exactly this daily series)
    derives the drawdown through the SAME windows and stays
    bit-identical to batch by construction (the cusum_from_daily
    pattern: one lake artifact, several read-time derivations)."""
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.select(
            "day",
            "value_cents",
            F.max("value_cents").over(w).cast("long").alias(
                "peak_cents"
            ),
        )
        .withColumn(
            "drawdown_cents",
            (F.col("peak_cents") - F.col("value_cents")).cast("long"),
        )
        .orderBy(F.col("drawdown_cents").desc(), F.col("day").asc())
        .limit(1)
    )


def drawdown_duration(
    df: DataFrame, ts_col: str, value_col: str
) -> DataFrame:
    """(n_days_below, start_day, end_day) — the LONGEST consecutive
    run of observed days strictly below the running best daily value:
    e20 measures how DEEP the worst decline went, this measures how
    LONG the stream stayed under water (time-to-recover — the two
    numbers every drawdown review wants together; a shallow-but-
    year-long slump and a one-day crash read identically on depth
    alone). The value-conditioned cousin of e13's activity streaks
    and w08's rising runs — the same gaps-and-islands machinery with
    the run predicate derived from a PREFIX WINDOW (below = value <
    running max) instead of a row property.

    Determinism: days are the OBSERVED daily series (the e20/e16
    convention — absent days don't break a run: the run is over
    observed points; compose with gap_fill first if silence should
    count); "below" is STRICT (a day that re-touches the peak ends
    the run); islands via day_index − below_rank (both row_numbers
    over the unique day order — no ties possible); winner by
    (length DESC, start_day ASC). All integers. A series that never
    dips (monotone running max) has no runs — empty result, the
    no-evidence rule.

    Scale: one day-keyed agg over the events, then prefix-max /
    row-number windows over the CHECKPOINTED calendar-sized daily
    frame (the e16 single-partition-is-fine pattern), an island agg
    and a 1-row limit."""
    from pyspark.sql import Window

    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias(
                "day"
            )
        )
        .agg(
            F.coalesce(
                F.sum(
                    (F.col(value_col).cast("decimal(18,2)") * 100)
                    .cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("value_cents")
        )
        .localCheckpoint()  # calendar-sized
    )
    w_prefix = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_idx = Window.orderBy("day")
    flagged = daily.select(
        "day",
        (
            F.col("value_cents")
            < F.max("value_cents").over(w_prefix)
        ).alias("__below"),
        F.row_number().over(w_idx).alias("__idx"),
    )
    below = flagged.where(F.col("__below")).select(
        "day",
        (
            F.col("__idx")
            - F.row_number().over(Window.orderBy("day"))
        ).alias("__island"),
    )
    runs = below.groupBy("__island").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_below"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    return (
        runs.orderBy(
            F.col("n_days_below").desc(), F.col("start_day").asc()
        )
        .limit(1)
        .select("n_days_below", "start_day", "end_day")
    )


def realized_volatility(
    df: DataFrame,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """(n_returns, mean_log_return, realized_vol) — sample standard
    deviation of daily close-to-close log returns over e19's candle
    series: the canonical dispersion number of any metered stream
    (price volatility, but equally latency / throughput / spend
    stability), and the THIRD read-time derivation of the same daily
    candle artifact (e20's drawdown reads its depth, e22 its
    duration, this its jitter — one lake artifact, several readers,
    the cusum_from_daily pattern).

    Exactness: closes are e19's PICKED doubles (bit-moved); the ratio
    close/prev_close is one IEEE division of identical operands; each
    ln is quantized to DECIMAL(18,6) BEFORE aggregation (the x72
    transcendental rule — 1-ulp ln wiggle flips the quantization only
    ~2e-9/term; the oracle hops through VARCHAR per the u17 rule,
    this side's double→decimal cast rounds the same shortest repr);
    Σr and Σr² fold as exact decimal sums (order-free), then the
    variance (n·Σr² − (Σr)²)/(n(n−1)) and √ run in IEEE on identical
    operands — bit-identical cross-engine. Non-positive closes have
    no log return (CASE-guarded out in BOTH engines — an unguarded ln
    is an ANSI crash); n < 2 → NULL vol; a numerically negative
    variance (IEEE cancellation) clamps to 0 identically.

    Scale: ONE day-keyed partial-agg shuffle (the candle fold), then
    lag/agg over the CHECKPOINTED calendar-sized close series — 365
    rows/year however large the stream (the e16 rule)."""
    daily = (
        ohlc_finalize(
            ohlc_partials(df, ts_col, tiebreak_col, value_col)
        )
        .select("day", "close")
        .localCheckpoint()  # calendar-sized; lag + stats read this
    )
    return realized_vol_from_daily(daily)


def realized_vol_from_daily(daily: DataFrame) -> DataFrame:
    """`realized_volatility`'s derivation over a pre-built
    (day, close) frame — split out so the STREAMING read (which folds
    the OHLC face's per-batch candle partials into exactly this close
    series) derives the volatility through the SAME expressions and
    stays bit-identical to batch by construction."""
    from pyspark.sql import Window

    w = Window.orderBy("day")
    rets = daily.select(
        "close",
        F.lag("close").over(w).alias("__prev"),
    )
    lr = rets.where(
        F.col("__prev").isNotNull()
        & (F.col("__prev") > 0)
        & (F.col("close") > 0)
    ).select(
        F.log(F.col("close") / F.col("__prev"))
        .cast("decimal(18,6)")
        .alias("__r")
    )
    s = lr.agg(
        F.count(F.lit(1)).cast("long").alias("n_returns"),
        F.sum("__r").alias("__sr"),
        F.sum(F.col("__r") * F.col("__r")).alias("__sr2"),
    )
    nd = F.col("n_returns").cast("double")
    srd = F.col("__sr").cast("double")
    sr2d = F.col("__sr2").cast("double")
    var = (nd * sr2d - srd * srd) / (nd * (nd - F.lit(1.0)))
    return s.select(
        "n_returns",
        F.when(F.col("n_returns") > 0, srd / nd).alias(
            "mean_log_return"
        ),
        F.when(
            F.col("n_returns") >= 2,
            F.sqrt(F.greatest(var, F.lit(0.0))),
        ).alias("realized_vol"),
    )
