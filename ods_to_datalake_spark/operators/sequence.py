"""Sequence analytics over per-key ordered event streams: first-order
Markov transition matrices and gaps-and-islands activity streaks —
the two classic "what happens next / how long do they stay" shapes
between e09's path mining and e06's retention cohorts.

Both cost ONE shuffle of the event stream (the per-key window), then
work over state-vocabulary- or island-sized frames:

- `transition_matrix`: LAG pairs per key, (prev, next) counts, and the
  row-normalized probability. Counts are exact BIGINTs; the
  probability is ONE raw double division of two BIGINTs (identical
  IEEE operands → bit-identical cross-engine, the q02 rule — never
  re-rounded). The normalizing total rides a window over the
  AGGREGATED matrix (|states|² rows, never the event stream).
- `longest_daily_streak`: distinct active days per key, island id =
  day − row_number days (consecutive days share it), longest island
  per key with (length DESC, start ASC) deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    events: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """(prev_state, state, n_transitions, p) — first-order Markov
    transition counts over each key's (ts, tiebreak)-ordered stream,
    row-normalized. NULL states never form transitions (removed from
    the sequence BEFORE pairing), and NULL-ts rows are unplaceable in
    a sequence and drop (the `resample_last` rule — also a cross-
    engine hazard: Spark windows order NULLS FIRST, DuckDB's LAST, so
    an unfiltered NULL ts would pair at opposite ends of the stream).
    ``p`` is n/total-from-prev as a single raw double quotient."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    pairs = (
        events.filter(
            F.col(state_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .select(
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("state"),
        )
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    total = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(total).cast("double")
        ).alias("p"),
    )


def longest_daily_streak(
    events: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """(key, streak_days, streak_start, streak_end) — each key's
    longest run of CONSECUTIVE active days (distinct calendar days of
    its events), ties resolved to the earliest start. The
    gaps-and-islands identity: over per-key day-ordered rows,
    day − row_number is constant exactly on consecutive runs."""
    days = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            key,
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias(
                "__day"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy(key).orderBy("__day")
    islands = days.withColumn(
        "__island",
        F.date_sub(
            F.col("__day"), F.row_number().over(w).cast("int")
        ),
    )
    runs = islands.groupBy(key, "__island").agg(
        F.count(F.lit(1)).cast("long").alias("__len"),
        F.min("__day").alias("__start"),
        F.max("__day").alias("__end"),
    )
    best = runs.groupBy(key).agg(
        F.min(
            F.struct(
                (-F.col("__len")).alias("__neg"),
                F.col("__start").alias("__s"),
                F.col("__end").alias("__e"),
            )
        ).alias("__top")
    )
    return best.select(
        key,
        (-F.col("__top.__neg")).cast("long").alias("streak_days"),
        F.col("__top.__s").alias("streak_start"),
        F.col("__top.__e").alias("streak_end"),
    )


def seasonal_profile(
    events: DataFrame, ts_col: str
) -> DataFrame:
    """(day, dow, n_events, dow_mean, seasonal_index, residual) — the
    classical-decomposition day-of-week seasonality profile of the
    daily event volume: each calendar day's count, its weekday's mean
    count, the multiplicative seasonal index (dow mean / grand mean),
    and the additive residual (count − dow mean) — the "is Monday's
    dip seasonal or an incident" baseline behind e10's anomaly scores
    and every ingest-volume dashboard.

    Determinism: the weekday is computed engine-neutrally as
    pmod(days since Monday 1970-01-05, 7) — Spark's dayofweek
    (1=Sunday) and DuckDB's dayofweek (0=Sunday) disagree, date
    arithmetic doesn't (and pmod keeps pre-1970 days positive where
    raw % truncates negative). dow_mean and grand mean are each ONE
    IEEE division of exact BIGINTs (the q02 raw-quotient rule);
    seasonal_index and residual are one further IEEE op on those
    identical doubles — bit-stable without quantization (nothing
    transcendental, nothing order-dependent).

    Scale: ONE event shuffle (the day groupBy, map-side partial);
    everything after runs on the CALENDAR-sized daily frame — the
    7-row weekday profile broadcasts back, the grand mean is a 1-row
    crossJoin (the e12/e14 accounting)."""
    daily = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return profile_from_daily(daily)


def profile_from_daily(daily: DataFrame) -> DataFrame:
    """`seasonal_profile`'s arithmetic over an ALREADY-AGGREGATED
    (day, n_events) frame — shared verbatim by the batch operator and
    the streaming artifact read (`streaming/seasonal.py`), so the two
    faces are bit-identical by construction."""
    daily = daily.withColumn(
        "dow",
        F.pmod(
            F.datediff(
                F.col("day"), F.to_date(F.lit("1970-01-05"))
            ),
            F.lit(7),
        ).cast("long"),
        # feeds THREE legs (weekday profile, grand mean, output join)
        # — uncheckpointed, each leg re-runs the upstream scan+agg
        # (the x25/g03 shared-frame rule); the frame is calendar-sized
    ).localCheckpoint()
    dowp = daily.groupBy("dow").agg(
        (
            F.sum("n_events").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dow_mean")
    )
    grand = daily.agg(
        (
            F.sum("n_events").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__grand")
    )
    return (
        daily.join(F.broadcast(dowp), "dow")
        .crossJoin(F.broadcast(grand))
        .select(
            "day",
            "dow",
            "n_events",
            "dow_mean",
            (F.col("dow_mean") / F.col("__grand")).alias(
                "seasonal_index"
            ),
            (
                F.col("n_events").cast("double") - F.col("dow_mean")
            ).alias("residual"),
        )
    )


def running_distinct(
    events: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """(day, new_keys, cumulative_keys) — the growth curve: per day,
    how many keys appear for the FIRST time, and the running distinct
    total. Distinct-count over an expanding window is intractable
    directly; first-seen day + a cumulative sum over the DAILY
    aggregate is the standard exact reduction: one key-keyed groupBy
    (map-side partial min), one day-keyed count, then a running sum
    over the calendar-sized frame (the global window orders ~days
    rows, never events — same accounting as `transition_matrix`'s
    normalizing window)."""
    firsts = (
        events.filter(
            F.col(key).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(key)
        .agg(
            F.min(
                F.to_date(F.date_trunc("day", F.col(ts_col)))
            ).alias("day")
        )
    )
    daily = firsts.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_keys")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "day",
        "new_keys",
        F.sum("new_keys").over(w).cast("long").alias(
            "cumulative_keys"
        ),
    )


def interarrival_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """(key, n_events, n_gaps, sum_gap_s, mean_gap_s, std_gap_s,
    burstiness) — per-key inter-arrival-time statistics over the
    event stream, with the Goh–Barabási burstiness coefficient
    B = (σ−μ)/(σ+μ) (Goh & Barabási 2008): B → −1 is a metronome,
    B ≈ 0 is Poisson, B → 1 is bursty — the behavioral feature that
    separates schedulers/bots (periodic) from humans (bursty) at
    identical event VOLUMES, where rate-based features are blind.

    Exactness: gaps are INTEGER seconds between consecutive events
    sorted by (ts, id) — the id tiebreak makes the order total, and
    the gap multiset depends only on the sorted timestamps, so every
    downstream sum is over the same integers in both engines. The
    variance uses the integer identity n·Σg² − (Σg)² over
    DECIMAL(38,0) (g² sums overflow BIGINT at ~1e3 year-scale gaps —
    the e10/g08 rule); σ is ONE IEEE sqrt of one IEEE division (sqrt
    is correctly rounded, unlike ln — no quantization needed), and
    mean/burstiness are further IEEE ops on identically-derived
    doubles. Single-event keys have no gaps → NULL stats (not 0 — no
    evidence is not zero dispersion); an all-simultaneous key has
    σ+μ = 0 → NULL burstiness (CASE-guarded: unguarded it is an ANSI
    DIVIDE_BY_ZERO). NULL timestamps are excluded.

    Scale: ONE key shuffle — the lag window and the per-key aggregate
    reuse the same partitioning; output is key-count-sized."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    gaps = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            key,
            id_col,
            F.unix_timestamp(F.col(ts_col)).alias("__t"),
        )
        .withColumn(
            "__gap",
            F.col("__t")
            - F.lag("__t").over(
                Window.partitionBy(key).orderBy("__t", id_col)
            ),
        )
    )
    agg = gaps.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("__gap").cast("long").alias("n_gaps"),
        F.sum("__gap").cast("long").alias("sum_gap_s"),
        F.sum(F.col("__gap").cast(d38) * F.col("__gap").cast(d38))
        .alias("__sq"),
    )
    return gap_stats_from_sums(agg, key)


def gap_stats_from_sums(agg: DataFrame, key: str) -> DataFrame:
    """`interarrival_stats`' final μ/σ/burstiness arithmetic over a
    pre-built (key, n_events, n_gaps, sum_gap_s, __sq DECIMAL(38,0))
    frame — split out so the STREAMING face (which maintains the four
    sums as per-key state) derives the statistics through the SAME
    expressions and stays bit-identical by construction (the
    zipf_from_counts / cusum_from_daily pattern; gap sums are
    mergeable because the gap multiset depends only on sorted
    timestamps)."""
    d38 = "decimal(38,0)"
    mean = F.col("sum_gap_s").cast("double") / F.col(
        "n_gaps"
    ).cast("double")
    var = (
        F.col("n_gaps").cast(d38) * F.col("__sq")
        - F.col("sum_gap_s").cast(d38) * F.col("sum_gap_s").cast(d38)
    ).cast("double") / (
        F.col("n_gaps").cast("double") * F.col("n_gaps").cast("double")
    )
    return agg.select(
        key,
        "n_events",
        "n_gaps",
        F.when(F.col("n_gaps") > 0, F.col("sum_gap_s")).alias(
            "sum_gap_s"
        ),
        F.when(F.col("n_gaps") > 0, mean).alias("mean_gap_s"),
        F.when(F.col("n_gaps") > 0, F.sqrt(var)).alias("std_gap_s"),
        F.when(
            (F.col("n_gaps") > 0)
            & (F.sqrt(var) + mean != F.lit(0.0)),
            (F.sqrt(var) - mean) / (F.sqrt(var) + mean),
        ).alias("burstiness"),
    )


def ab_proportion_test(
    df: DataFrame,
    key_col: str,
    cohort: Column,
    converted: Column,
    negative: Column | None = None,
) -> DataFrame:
    """(n_a, conv_a, rate_a, n_b, conv_b, rate_b, lift, z_score) — the
    two-proportion z-test over per-key conversion, the experiment
    readout every A/B assignment funnels into: cohort 0 vs cohort 1
    unit counts, converted counts, rates, absolute lift, and the
    pooled-variance z statistic

        z = (p_a − p_b) / √( p̂(1−p̂) · (1/n_a + 1/n_b) ),
        p̂ = (c_a + c_b) / (n_a + n_b)

    (the standard normal-approximation test; |z| > 1.96 ≈ p < .05
    two-sided). The UNIT is the key (user), never the event — one
    heavy user must not count as many conversions, the classic A/B
    unit-of-analysis error — so the first fold collapses each key to
    (cohort, converted) and the cohort agg counts keys. ``converted``
    alone means converted-at-least-once; with ``negative`` the key
    converts iff it has strictly MORE converted than negative events
    (the net-positive readout — exact integer comparison).

    Cross-engine exactness: all counts exact BIGINTs; rates, lift,
    p̂, the variance product, the √, and z are a fixed chain of
    correctly-rounded IEEE ops on identical integer operands —
    bit-identical in both engines with no quantization (√ is exact
    per IEEE-754; no transcendentals anywhere). Degenerate guards:
    either cohort empty, or pooled p̂ ∈ {0, 1} (zero variance —
    all-converted/none-converted), → NULL z (no evidence, not 0);
    the counts still report. NULL keys carry no cohort and are
    excluded; ``cohort`` must evaluate to 0/1.

    Scale: one key-keyed partial agg over the events + one tiny
    cohort rollup folded into a single wide row (conditional sums) —
    two shuffles total, output exactly 1 row."""
    if negative is None:
        conv_agg = F.max(F.when(converted, 1).otherwise(0))
    else:
        # net-positive conversion: strictly more `converted` events
        # than `negative` ones (exact integer comparison)
        conv_agg = F.when(
            F.coalesce(F.sum(F.when(converted, 1).otherwise(0)), F.lit(0))
            > F.coalesce(F.sum(F.when(negative, 1).otherwise(0)), F.lit(0)),
            1,
        ).otherwise(0)
    per_key = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col))
        .agg(
            F.max(cohort).alias("__g"),
            conv_agg.alias("__conv"),
        )
    )
    wide = per_key.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("__g") == g, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"n_{t}")
            for g, t in ((0, "a"), (1, "b"))
        ],
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("__g") == g) & (F.col("__conv") == 1),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"conv_{t}")
            for g, t in ((0, "a"), (1, "b"))
        ],
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = (
        F.col("conv_a").cast("double"),
        F.col("conv_b").cast("double"),
    )
    ra, rb = ca / na, cb / nb
    pooled = (ca + cb) / (na + nb)
    var = pooled * (F.lit(1.0) - pooled) * (
        F.lit(1.0) / na + F.lit(1.0) / nb
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (
            F.col("conv_a") + F.col("conv_b")
            < F.col("n_a") + F.col("n_b")
        )
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return wide.select(
        "n_a",
        "conv_a",
        F.when(F.col("n_a") > 0, ra).alias("rate_a"),
        "n_b",
        "conv_b",
        F.when(F.col("n_b") > 0, rb).alias("rate_b"),
        F.when(both, ra - rb).alias("lift"),
        F.when(ok, (ra - rb) / F.sqrt(var)).alias("z_score"),
    )


def session_spectrum(sessions: DataFrame) -> DataFrame:
    """(n_events, n_sessions, n_users, session_share, total_duration_s,
    mean_duration_s) — the engagement spectrum over a sessionized
    frame (e02's `sessionize_batch` output: one row per (user,
    session) with session_start/session_end/n_events): how many
    sessions are 1-event bounces, how long does each depth class
    stay — the bounce-rate / depth panel product analytics reads
    first, and the x84/x90 multiplicity-histogram idea applied to
    SESSIONS instead of documents (one funnel stage later than raw
    event counts: e02 defines the unit, this reads its distribution).

    Exactness: durations are integer SECONDS (unix_timestamp of the
    min/max event — sub-second parquet precision truncates
    identically in both engines via epoch-seconds floor); counts
    exact BIGINTs; session_share and mean_duration_s are single IEEE
    divisions of exact integers (the spectrum frame is tiny, but the
    per-class sums are decimal-free: second-magnitude · corpus rows
    stays far inside int64 at any scale that fits a cluster —
    9e18 s ≈ 3e11 years).

    Scale: rides the sessionize shuffle (user-keyed) with ONE further
    depth-keyed count agg over the SESSION frame (map-side
    combinable); output is bounded by the maximum session depth, a
    domain-sized spectrum like x84's. The checkpoint covers the
    total-agg + report legs (the x25 rule applied to the tiny frame,
    not the corpus)."""
    per = (
        sessions.select(
            F.col("n_events").cast("long").alias("n_events"),
            F.col("user_id"),
            (
                F.unix_timestamp(F.col("session_end"))
                - F.unix_timestamp(F.col("session_start"))
            )
            .cast("long")
            .alias("__dur"),
        )
        .groupBy("n_events")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.count_distinct(F.col("user_id"))
            .cast("long")
            .alias("n_users"),
            F.coalesce(F.sum("__dur"), F.lit(0))
            .cast("long")
            .alias("total_duration_s"),
        )
        .localCheckpoint()
    )
    tot = per.agg(
        F.coalesce(F.sum("n_sessions"), F.lit(0))
        .cast("long")
        .alias("__t")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "n_events",
        "n_sessions",
        "n_users",
        F.when(
            F.col("__t") > 0,
            F.col("n_sessions").cast("double")
            / F.col("__t").cast("double"),
        ).alias("session_share"),
        "total_duration_s",
        F.when(
            F.col("n_sessions") > 0,
            F.col("total_duration_s").cast("double")
            / F.col("n_sessions").cast("double"),
        ).alias("mean_duration_s"),
    )


def activation_latency(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    start_type: str = "signup",
    convert_type: str = "purchase",
    type_col: str = "event_type",
) -> DataFrame:
    """(n_signed, n_converted, conversion_rate, min_latency_s,
    median_latency_s, max_latency_s) — the activation-latency panel:
    of the users who ever emitted ``start_type``, how many went on to
    ``convert_type`` AT OR AFTER their first start, and how long did
    it take — the time-to-value number activation funnels optimize
    (e05 answers WHICH touch gets credit, e06 whether users COME
    BACK, e07 how far they get; this is how FAST the key transition
    happens).

    Semantics: per user, start = MIN start-event time, conversion =
    MIN convert-event time >= start (a purchase BEFORE ever signing
    up does not activate the signup — the causality filter); latency
    = integer unix seconds (floor-of-epoch difference, e02's gap
    arithmetic — sub-second parquet precision truncates identically
    in both engines). NULL users/timestamps excluded (no identity /
    no time). The median is the LOWER-MIDDLE order statistic over
    converted users (u16's convention — an ELEMENT of the data, so
    everything stays exact BIGINT); conversion_rate is ONE IEEE
    division of exact counts; zero signups → empty result (no
    evidence), zero conversions → NULL latencies with a real 0 rate.

    Scale: one user-keyed partial agg for starts, one conditional
    join+agg for conversions (both map-side-combinable after the
    user shuffle), then a per-distinct-latency count frame and ONE
    cumulative window over the LATENCY DOMAIN (the u23/u25 shape —
    never a rank over all users), 1-row output."""
    from pyspark.sql import Window

    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__t"),
    ).where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    starts = (
        ev.where(F.col("__t") == start_type)
        .groupBy("__u")
        .agg(F.min("__ts").alias("__s0"))
    )
    conv = (
        ev.where(F.col("__t") == convert_type)
        .join(starts, "__u")
        .where(F.col("__ts") >= F.col("__s0"))
        .groupBy("__u")
        .agg(
            (
                F.unix_timestamp(F.min("__ts"))
                - F.unix_timestamp(F.min("__s0"))
            )
            .cast("long")
            .alias("__lat")
        )
    )
    per_lat = conv.groupBy("__lat").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w_cum = Window.orderBy("__lat").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = per_lat.select(
        "__lat",
        F.sum("__c").over(w_cum).cast("long").alias("__cum"),
        F.sum("__c").over(w_all).cast("long").alias("__nc"),
        F.min("__lat").over(w_all).cast("long").alias("__min"),
        F.max("__lat").over(w_all).cast("long").alias("__max"),
    )
    med = (
        # lower-middle order statistic: first value whose cumulative
        # count reaches rank (n+1) div 2 (all-integer, u16's pick)
        cum.where(
            F.col("__cum") >= F.expr("(__nc + 1) div 2")
        )
        .groupBy("__nc", "__min", "__max")
        .agg(F.min("__lat").cast("long").alias("__med"))
        # <=1 row; the converted/zero-converted branches below both
        # read it — checkpoint so the user-keyed funnel runs ONCE
        # (the x25 multi-leg rule applied to the tiny frame)
        .localCheckpoint()
    )
    n_signed = starts.agg(
        F.count(F.lit(1)).cast("long").alias("n_signed")
    )
    base = n_signed.where(
        F.col("n_signed") > 0
    ).localCheckpoint()  # 1 row, read by both branches
    return (
        base.crossJoin(
            F.broadcast(
                med.select(
                    F.col("__nc").alias("n_converted"),
                    F.col("__min").alias("min_latency_s"),
                    F.col("__med").alias("median_latency_s"),
                    F.col("__max").alias("max_latency_s"),
                )
            )
        )
        .unionByName(
            # zero-conversion shape: real 0 count, NULL latencies
            base.join(
                F.broadcast(med.select(F.lit(1).alias("__has"))),
                how="left_anti",
                on=F.lit(True),
            ).select(
                "n_signed",
                F.lit(0).cast("long").alias("n_converted"),
                F.lit(None).cast("long").alias("min_latency_s"),
                F.lit(None).cast("long").alias("median_latency_s"),
                F.lit(None).cast("long").alias("max_latency_s"),
            )
        )
        .select(
            "n_signed",
            "n_converted",
            (
                F.col("n_converted").cast("double")
                / F.col("n_signed").cast("double")
            ).alias("conversion_rate"),
            "min_latency_s",
            "median_latency_s",
            "max_latency_s",
        )
    )
