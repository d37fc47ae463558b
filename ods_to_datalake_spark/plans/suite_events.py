"""Event-stream suite: batch faces of the streaming operators (SURVEY
§2.8 extension) — each the `spark.read` face of a function whose
`spark.readStream` face is tested in tests/test_streaming.py — plus
the as-of join generalization over event time and the round-6
batch-analytic additions (e09 path analysis, e10 daily anomaly)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.plans.suite import register


@register(
    "e01_tumbling_window",
    double_cols=['sum_value'],
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling-window aggregation — the batch face of the watermarked "
    "streaming agg (streaming/events.py tumbling_counts); state bounded "
    "by watermark on the stream path, plain hash-agg here.",
    headline=True,
)
def e01_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.streaming.events import tumbling_counts

    cat = load_testdata(spark, sf_dir)
    return tumbling_counts(cat.table("events"), "1 hour")


# e02's session definition, shared verbatim by e23's spectrum oracle
# (the x25 single-source rule: one session definition, two readers)
_SQL_SESSIONS = """marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN FLOOR(epoch(ts)) -
                  FLOOR(epoch(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) + 1 AS BIGINT) AS session_seq
      FROM marked
    ), sess AS (
      SELECT user_id, session_seq,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM numbered
      GROUP BY user_id, session_seq
    )"""


@register(
    "e02_sessionize",
    oracle=f"""
    WITH {_SQL_SESSIONS}
    SELECT user_id, session_seq, session_start, session_end, n_events
    FROM sess
    """,
    doc="Sessionization (30-min gap) via lag + running sum — one shuffle "
    "on user_id, window reuses the partitioning; the streaming face uses "
    "session_window state merge (tests/test_streaming.py).",
)
def e02_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.streaming.events import sessionize_batch

    cat = load_testdata(spark, sf_dir)
    out = sessionize_batch(cat.table("events"), "30 minutes")
    return out.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "session_start",
        "session_end",
        "n_events",
    )


@register(
    "e04_json_extract",
    oracle="""
    WITH s AS (
      SELECT event_id,
             json_extract_string(TRY_CAST(props AS JSON), '$.k') AS kv
      FROM events
    ), typed AS (
      -- mirror Spark's STRING-path semantics exactly: extract the
      -- value's text form, cast only integral literals. DuckDB's
      -- CAST(JSON AS INT) converts booleans (true→1) and its
      -- VARCHAR→INT TRY_CAST rounds fractionals ('49.9'→50), both of
      -- which Spark's get_json_object + try_cast NULL out — found by
      -- the events fuzz tier on {"k": true}.
      SELECT event_id,
             CASE WHEN regexp_matches(trim(kv), '^[+-]?[0-9]+$')
                  THEN TRY_CAST(kv AS INT) END AS k_value
      FROM s
    )
    SELECT event_id, k_value,
           CASE WHEN k_value >= 50 THEN 'high' ELSE 'low' END AS k_band
    FROM typed
    """,
    doc="Semi-structured extraction: JSON property column → typed "
    "columns (get_json_object / from_json path) — scans stay columnar; "
    "the JSON parse is per-row JVM-side, no Python. Malformed/NULL/"
    "non-scalar/boolean/fractional props must NULL out, not throw: "
    "Spark's get_json_object is lenient and its string→int cast takes "
    "integral literals only, so the oracle extracts TEXT and gates the "
    "cast on an integral regex (DuckDB's JSON→INT converts booleans "
    "and its VARCHAR→INT rounds '49.9' — caught by the fuzz tier).",
)
def e04_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    # try_cast, not cast: a non-scalar/non-numeric $.k (nested object,
    # string) must NULL out — ANSI cast throws INVALID_INPUT on it
    k = F.get_json_object("props", "$.k").try_cast("int")
    return cat.table("events").select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "e05_purchase_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
    doc="Interval join (purchase→click attribution within 1h) — the "
    "batch face of the watermarked stream-stream join "
    "(streaming/events.py purchase_attribution); state bounded by "
    "watermark + interval on the stream path.",
)
def e05_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.streaming.events import purchase_attribution

    cat = load_testdata(spark, sf_dir)
    return purchase_attribution(cat.table("events"), "1 hour")


@register(
    "e03_asof_join",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'signup' THEN ts END
                      IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_signup_ts
    FROM events
    """,
    doc="As-of join (backward): each event matched to the user's latest "
    "at-or-before signup — union-tag + window implementation, ONE "
    "shuffle on the key, no per-row range scan (operators/joins.py "
    "asof_join).",
)
def e03_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.joins import asof_join

    cat = load_testdata(spark, sf_dir)
    ev = cat.table("events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    joined = asof_join(
        ev,
        signups.withColumnRenamed("signup_ts", "ts_r").withColumn(
            "last_signup_ts", F.col("ts_r")
        ),
        on=["user_id"],
        left_time="ts",
        right_time="ts_r",
        direction="backward",
        right_cols=["last_signup_ts"],
    )
    return joined.select("event_id", "user_id", "last_signup_ts")


@register(
    "e06_retention_cohorts",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             -- floor(x/7.0), not x // 7: DuckDB's integer // truncates
             -- toward zero while Spark's floor() floors — they differ
             -- on pre-anchor (negative-day) timestamps (epoch-0 edge)
             CAST(floor(date_diff('day', DATE '1970-01-05',
                                  CAST(ts AS DATE)) / 7.0) AS INTEGER)
               AS wk
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id
    )
    SELECT c.cohort_wk,
           uw.wk - c.cohort_wk AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM uw JOIN cohorts c ON uw.user_id = c.user_id
    GROUP BY c.cohort_wk, week_offset
    """,
    doc="Retention-cohort matrix: first-activity week per user (cohort) "
    "x weeks-since-cohort, distinct active users per cell. Week index "
    "is Monday-aligned integer (days since 1970-01-05 div 7) computed "
    "identically in both engines — no date_trunc('week') semantics "
    "dependence. Two aggregations share the user_id shuffle; the "
    "distinct (user, week) pass bounds the join input.",
)
def e06_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    events = cat.table("events")
    wk = F.floor(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")
        )
        / 7
    ).cast("int")
    uw = events.select("user_id", wk.alias("wk")).distinct()
    cohorts = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        uw.join(cohorts, "user_id")
        .groupBy(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "e07_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
             AS n_clicked_after_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
             AS n_purchased_after_click
    """,
    doc="Ordered conversion funnel (view → click-after-view → "
    "purchase-after-click): each stage anchors on the PREVIOUS stage's "
    "first-event time, so out-of-order events don't count — the "
    "product-analytics staple. All three stage anchors are consecutive "
    "windows over the same user_id partitioning, so the whole funnel "
    "costs ONE shuffle of events (the naive groupBy-per-stage plus "
    "join-back formulation costs 8 exchanges — measured).",
)
def e07_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    ev = cat.table("events")
    # three stage anchors as consecutive windows over the SAME user
    # partitioning — Spark reuses one shuffle for all of them (vs the
    # naive per-stage groupBy+join-back, which costs 8 exchanges)
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    staged = (
        ev.withColumn(
            "first_view", F.min(F.when(is_("view"), F.col("ts"))).over(w)
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    is_("click") & (F.col("ts") > F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "first_purchase",
            F.min(
                F.when(
                    is_("purchase") & (F.col("ts") > F.col("first_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.agg(
        F.count_distinct(
            F.when(F.col("first_view").isNotNull(), F.col("user_id"))
        ).alias("n_viewed"),
        F.count_distinct(
            F.when(F.col("first_click").isNotNull(), F.col("user_id"))
        ).alias("n_clicked_after_view"),
        F.count_distinct(
            F.when(F.col("first_purchase").isNotNull(), F.col("user_id"))
        ).alias("n_purchased_after_click"),
    )


@register(
    "e08_trailing_window",
    double_cols=['trailing_7d_value'],
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_sec
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,4)) AS trailing_7d_value
    FROM (
      SELECT event_id, user_id, value,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_sec
      FROM events WHERE event_type = 'purchase'
    ) t
    """,
    doc="Trailing-interval aggregate: 7-day rolling purchase value per "
    "user via a RANGE frame over epoch seconds (value-based frame — "
    "peers at the same timestamp are always all included, unlike a "
    "ROWS frame, so the result is tie-insensitive and cross-engine "
    "deterministic). Complements w05's ROWS frames; one shuffle on "
    "the partition key.",
)
def e08_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    purchases = (
        cat.table("events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("value").cast("decimal(18,2)").alias("v"),
            F.unix_timestamp("ts").alias("epoch_sec"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_sec")
        .rangeBetween(-604800, 0)
    )
    return purchases.select(
        "event_id",
        "user_id",
        F.sum("v").over(w).cast("decimal(38,4)").alias("trailing_7d_value"),
    )


@register(
    "e09_event_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      -- event_type filtered too: Spark's concat_ws SKIPS nulls where
      -- || propagates them, so a NULL type must never reach the concat
      SELECT event_type || '>' || t1 || '>' || t2 AS path
      FROM seq WHERE event_type IS NOT NULL
        AND t1 IS NOT NULL AND t2 IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
    doc="Path/flow analysis: top-10 event-type trigram paths over each "
    "user's time-ordered stream (LEAD x2 over one user_id window — the "
    "whole path extraction costs ONE shuffle of events, like e07's "
    "funnel), corpus-wide count, total-order top-k (count desc, path "
    "asc — ties inside and beyond the cut resolve identically in both "
    "engines). The product-analytics 'common user journeys' query; "
    "unique event_id tiebreak makes same-timestamp ordering exact.",
)
def e09_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    ev = cat.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(
        F.col("event_type").isNotNull()
        & F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
    )
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "e10_daily_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(n) AS BIGINT) AS s1,
             CAST(SUM(n * n) AS BIGINT) AS s2
      FROM daily GROUP BY event_type
    ), scored AS (
      SELECT d.event_type, d.day, d.n,
             CAST(s1 AS DOUBLE) / nn AS mean,
             CASE WHEN nn >= 2 AND nn * s2 - s1 * s1 > 0
                  THEN sqrt(CAST(nn * s2 - s1 * s1 AS DOUBLE)
                            / CAST(nn * (nn - 1) AS DOUBLE))
             END AS std
      FROM daily d JOIN stats USING (event_type)
    )
    SELECT event_type, day, n,
           CASE WHEN std IS NOT NULL
                THEN (CAST(n AS DOUBLE) - mean) / std
           END AS z,
           CAST(CASE WHEN std IS NOT NULL
                      AND abs((CAST(n AS DOUBLE) - mean) / std) > 2
                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM scored
    """,
    double_cols=["z"],
    doc="Daily-count anomaly detection per event type: sample z-score "
    "of each day's event count against that type's daily distribution. "
    "Variance is computed from EXACT integer sums (nn*s2 - s1^2 over "
    "BIGINTs) so the only floating-point ops are two divides, a sqrt "
    "(correctly rounded by IEEE — bit-stable cross-engine, unlike ln) "
    "and a subtract, replayed in the same order by both engines; "
    "single-day or zero-variance types yield NULL z (CASE-guarded — "
    "no ANSI division hazard). Two map-side-combined shuffles + one "
    "broadcast-sized stats join; the ops monitoring query.",
)
def e10_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.streaming.events import daily_anomaly_batch

    cat = load_testdata(spark, sf_dir)
    return daily_anomaly_batch(cat.table("events"))


@register(
    "e12_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_state,
             event_type AS state
      -- ts filtered like event_type: Spark windows order NULLS
      -- FIRST, DuckDB's LAST — an unfiltered NULL ts would pair at
      -- opposite ends of the stream in the two engines
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ),
    counts AS (
      SELECT prev_state, state,
             CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE prev_state IS NOT NULL
      GROUP BY prev_state, state
    )
    SELECT prev_state, state, n_transitions,
           CAST(n_transitions AS DOUBLE) /
             CAST(CAST(SUM(n_transitions) OVER (
               PARTITION BY prev_state) AS BIGINT) AS DOUBLE) AS p
    FROM counts
    """,
    doc="First-order Markov transition matrix over each user's "
    "(ts, event_id)-ordered event-type stream: (prev, next) counts "
    "and the row-normalized transition probability — the "
    "next-event-prediction / journey-simulation primitive between "
    "e09's path mining and e06's cohorts. NULL types are removed "
    "from the sequence BEFORE pairing (both engines lag over the "
    "filtered stream). One shuffle of events (the user window); the "
    "normalizing total is a window over the AGGREGATED "
    "|states|^2-row matrix, never the stream; p is one raw "
    "BIGINT/BIGINT double quotient (identical IEEE operands -> "
    "bit-identical; the oracle re-casts DuckDB's HUGEINT window sum "
    "back to BIGINT per CLAUDE.md). "
    "operators/sequence.transition_matrix.",
    headline=True,
)
def e12_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        transition_matrix,
    )

    cat = load_testdata(spark, sf_dir)
    return transition_matrix(
        cat.table("events"), "user_id", "event_type", "ts", "event_id"
    )


@register(
    "e13_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events WHERE ts IS NOT NULL
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS island
      FROM days
    ),
    runs AS (
      SELECT user_id, island,
             CAST(COUNT(*) AS BIGINT) AS streak_days,
             MIN(day) AS streak_start, MAX(day) AS streak_end
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, streak_days, streak_start, streak_end
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id
        ORDER BY streak_days DESC, streak_start) AS rn
      FROM runs
    ) AS _r WHERE rn = 1
    """,
    doc="Longest consecutive-day activity streak per user — the "
    "gaps-and-islands identity (day minus per-user day-ordered "
    "row_number is constant exactly on consecutive runs; the same "
    "trick the BPE rewrite builds on, here in its classic calendar "
    "form). Distinct active days first (bounded by the calendar, not "
    "event volume), one user-keyed shuffle shared by the window and "
    "both groupBys, (length DESC, start ASC) deterministic tiebreak "
    "via min-struct vs ROW_NUMBER=1 — the engagement/retention "
    "feature engineering query. "
    "operators/sequence.longest_daily_streak.",
)
def e13_activity_streaks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        longest_daily_streak,
    )

    cat = load_testdata(spark, sf_dir)
    return longest_daily_streak(cat.table("events"), "user_id", "ts")


@register(
    "e14_running_distinct_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS new_keys
      FROM firsts GROUP BY day
    )
    SELECT day, new_keys,
           CAST(SUM(new_keys) OVER (
             ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_keys
    FROM daily
    """,
    doc="Running distinct users by day — the growth curve. Exact "
    "distinct over an expanding window is intractable directly; the "
    "standard reduction is first-seen day per user (one key-keyed "
    "partial-agg min) + daily first-seen counts + a cumulative sum "
    "over the CALENDAR-sized frame (the global window orders ~days "
    "rows, never events — the e12 normalizing-window accounting; "
    "DuckDB's HUGEINT window sum is re-cast to BIGINT per "
    "CLAUDE.md). operators/sequence.running_distinct.",
)
def e14_running_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        running_distinct,
    )

    cat = load_testdata(spark, sf_dir)
    return running_distinct(cat.table("events"), "user_id", "ts")


@register(
    "e15_seasonal_profile",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    dd AS (
      SELECT day, n_events,
             CAST((((day - DATE '1970-01-05') % 7) + 7) % 7
               AS BIGINT) AS dow
      FROM daily
    ),
    dowp AS (
      SELECT dow,
             CAST(CAST(SUM(n_events) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dow_mean
      FROM dd GROUP BY dow
    ),
    g AS (
      SELECT CAST(CAST(SUM(n_events) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS grand
      FROM dd
    )
    SELECT d.day, d.dow, d.n_events, p.dow_mean,
           p.dow_mean / g.grand AS seasonal_index,
           CAST(d.n_events AS DOUBLE) - p.dow_mean AS residual
    FROM dd d JOIN dowp p USING (dow) CROSS JOIN g
    """,
    doc="Day-of-week seasonal decomposition of daily event volume "
    "(classical decomposition's seasonal term): per calendar day, the "
    "count, its weekday's mean, the multiplicative seasonal index "
    "(dow mean / grand mean) and additive residual (count − dow mean) "
    "— the 'is Monday's dip seasonal or an incident' baseline behind "
    "e10's anomaly z-scores and every ingest-volume dashboard. The "
    "weekday is pmod(days since Monday 1970-01-05, 7) — Spark "
    "dayofweek (1=Sunday) and DuckDB dayofweek (0=Sunday) DISAGREE, "
    "date arithmetic doesn't, and pmod keeps pre-1970 days positive "
    "where raw % truncates negative. Each mean is ONE IEEE division "
    "of exact BIGINTs; index and residual are one further IEEE op on "
    "those identical doubles — bit-stable with no quantization "
    "needed. ONE event shuffle (the day groupBy), then calendar-sized "
    "frames: the 7-row weekday profile broadcasts back, the grand "
    "mean is a 1-row crossJoin (the e12/e14 accounting). "
    "operators/sequence.seasonal_profile.",
)
def e15_seasonal_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        seasonal_profile,
    )

    cat = load_testdata(spark, sf_dir)
    return seasonal_profile(cat.table("events"), "ts")


@register(
    "e16_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS t
      FROM daily
    ),
    s AS (
      SELECT day, n_events, t,
             CAST(SUM(n_events * nd - t) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS sv
      FROM daily CROSS JOIN tot
    ),
    g AS (
      SELECT day, n_events, t,
             CAST(sv - LEAST(CAST(0 AS BIGINT), CAST(MIN(sv) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT)) AS BIGINT) AS cusum_pos,
             CAST(GREATEST(CAST(0 AS BIGINT), CAST(MAX(sv) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT)) - sv AS BIGINT) AS cusum_neg
      FROM s
    )
    SELECT day, n_events, cusum_pos, cusum_neg,
           (GREATEST(cusum_pos, cusum_neg) * 1 > t * 2) AS is_shift
    FROM g
    """,
    doc="Page's CUSUM level-shift detector over daily event volume: "
    "the 'did ingest volume step up/down, and when' panel that e10's "
    "per-day z-score structurally misses (a small SUSTAINED shift "
    "never trips a daily threshold while its cumulative sum grows "
    "linearly). Exact-integer formulation: deviations d_t = N·n_t − T "
    "sum to zero with no mean division; the sequential max(0, ·) "
    "recurrence becomes prefix-sum minus running-min (and running-max "
    "minus prefix-sum for the downward side), each clamped through "
    "the VIRTUAL S_0 = 0 origin Page's statistic starts from — two "
    "stacked BIGINT windows both engines compute identically; the "
    "shift flag is the "
    "all-integer comparison cusum·h_den > T·h_num (x42 boundary "
    "rule), h = 2 average days of volume. One event shuffle, then "
    "calendar-sized windows (the e14 rule); DuckDB's HUGEINT window "
    "sums recast to BIGINT. operators/timeseries.cusum_shift_scores.",
)
def e16_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.timeseries import (
        cusum_shift_scores,
    )

    cat = load_testdata(spark, sf_dir)
    return cusum_shift_scores(cat.table("events"), "ts")


@register(
    "e17_interarrival_stats",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id,
             epoch_us(ts) // 1000000 AS t
      FROM events WHERE ts IS NOT NULL
    ),
    g AS (
      SELECT user_id,
             t - LAG(t) OVER (
               PARTITION BY user_id ORDER BY t, event_id
             ) AS gap
      FROM ev
    ),
    a AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(gap) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS sg,
             SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sq
      FROM g GROUP BY user_id
    ),
    s AS (
      SELECT user_id, n_events, n_gaps, sg,
             CASE WHEN n_gaps > 0 THEN
               CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)
             END AS mu,
             CASE WHEN n_gaps > 0 THEN
               sqrt(CAST(CAST(CAST(n_gaps AS HUGEINT) * sq
                      - CAST(sg AS HUGEINT) * CAST(sg AS HUGEINT)
                      AS VARCHAR) AS DOUBLE)
                    / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
             END AS sigma
      FROM a
    )
    SELECT user_id, n_events, n_gaps,
           CASE WHEN n_gaps > 0 THEN sg END AS sum_gap_s,
           mu AS mean_gap_s,
           sigma AS std_gap_s,
           CASE WHEN n_gaps > 0 AND sigma + mu <> 0 THEN
             (sigma - mu) / (sigma + mu)
           END AS burstiness
    FROM s
    """,
    doc="Per-user inter-arrival statistics with the Goh–Barabási "
    "burstiness coefficient B = (σ−μ)/(σ+μ): B→−1 metronome, B≈0 "
    "Poisson, B→1 bursty — the behavioral feature separating "
    "schedulers/bots from humans at identical event VOLUMES, where "
    "rate features are blind. Gaps are integer seconds between "
    "(ts, event_id)-sorted events (total order; the gap multiset "
    "depends only on sorted timestamps — Spark unix_timestamp ≡ "
    "DuckDB epoch_us // 1e6 on the post-1970 domain; bare epoch() is "
    "DOUBLE with fraction); variance via the integer identity "
    "n·Σg²−(Σg)² over DECIMAL(38,0)/HUGEINT (the e10/g08 rule — the "
    "operand crosses 1e13, so the oracle VARCHAR-round-trips its "
    "HUGEINT→DOUBLE cast per CLAUDE.md); σ is ONE correctly-rounded "
    "IEEE sqrt — no quantization needed, unlike ln. Single-event "
    "users → NULL stats (no evidence ≠ zero dispersion); "
    "all-simultaneous users → NULL burstiness (σ+μ=0 is an ANSI "
    "DIVIDE_BY_ZERO unguarded). ONE user shuffle — the lag window "
    "and the aggregate reuse the same partitioning. "
    "operators/sequence.interarrival_stats.",
)
def e17_interarrival_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        interarrival_stats,
    )

    cat = load_testdata(spark, sf_dir)
    return interarrival_stats(
        cat.table("events"), "user_id", "ts", "event_id"
    )


AC_LAG = 7


@register(
    "e18_weekly_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(COALESCE(SUM(n), 0) AS BIGINT) AS t
      FROM daily
    ),
    dev AS (
      SELECT day,
             CAST(n AS HUGEINT) * nd - t AS d
      FROM daily CROSS JOIN tot
    ),
    den AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             COALESCE(SUM(d * d), 0) AS dd
      FROM dev
    ),
    num AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             COALESCE(SUM(a.d * b.d), 0) AS nn
      FROM dev a JOIN dev b
        ON b.day = a.day + INTERVAL {AC_LAG} DAY
    )
    SELECT den.n_days, num.n_pairs,
           CASE WHEN num.n_pairs > 0 AND den.dd <> 0 THEN
             CAST(CAST(num.nn AS VARCHAR) AS DOUBLE)
               / CAST(CAST(den.dd AS VARCHAR) AS DOUBLE)
           END AS autocorr
    FROM den CROSS JOIN num
    """,
    doc=f"Lag-{AC_LAG} autocorrelation of daily event volume — the "
    "'is volume actually weekly-periodic' NUMBER behind e15's "
    "seasonal profile (a weekday decomposition of a non-periodic "
    "series is noise dressed as seasonality; r₇ near +1 says ship "
    "it, near 0 says don't). Exact-integer: deviations d_t = N·n_t−T "
    "(the e16 scaling — no mean division), Σd_t·d_{t+7} and Σd_t² "
    "exact DECIMAL(38,0)/HUGEINT sums (products reach ~1e30 at "
    "scale), ONE IEEE division with VARCHAR-hopped oracle casts (the "
    "u17 rule); the common N² factor cancels mathematically but is "
    "KEPT in both operands — exactness beats a simplification the "
    "engines might disagree on. Lag pairs are CALENDAR-lagged "
    "(day+7 self-join) — an observed-day gap breaks the pair, never "
    "silently shifts it (a row-lag would). Sub-2-day / no-pair / "
    "zero-variance series → NULL (ANSI guard). One event shuffle, "
    "then calendar-sized frames. "
    "operators/timeseries.volume_autocorrelation.",
)
def e18_weekly_autocorrelation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.timeseries import (
        volume_autocorrelation,
    )

    cat = load_testdata(spark, sf_dir)
    return volume_autocorrelation(
        cat.table("events"), "ts", lag_days=AC_LAG
    )


@register(
    "e19_daily_ohlc",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id, value
      FROM events WHERE ts IS NOT NULL
    ),
    ranked AS (
      SELECT day, value,
             ROW_NUMBER() OVER (
               PARTITION BY day
               ORDER BY ts ASC, event_id ASC NULLS FIRST
             ) AS rf,
             ROW_NUMBER() OVER (
               PARTITION BY day
               ORDER BY ts DESC, event_id DESC NULLS LAST
             ) AS rl
      FROM ev
    ),
    agg AS (
      SELECT day,
             MAX(value) AS high,
             MIN(value) AS low,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2))
                                    * 100 AS BIGINT)), 0) AS BIGINT)
               AS volume_cents
      FROM ev GROUP BY day
    )
    SELECT agg.day, o.value AS open, agg.high, agg.low,
           c.value AS close, agg.n_events, agg.volume_cents
    FROM agg
    JOIN (SELECT day, value FROM ranked WHERE rf = 1) o
      ON o.day = agg.day
    JOIN (SELECT day, value FROM ranked WHERE rl = 1) c
      ON c.day = agg.day
    """,
    doc="Daily OHLC/candlestick rollup of the event value stream: "
    "first/last observed value by event time (UNIQUE (ts, event_id) "
    "tiebreak — the repo-wide rule; computed as ONE min-struct/"
    "max-struct fold, never a window over the raw stream), the day's "
    "extremes, and the cents-exact volume (Decimal(18,2)·100, 0 not "
    "NULL on an all-NULL day) — the canonical downsample for any "
    "metered stream and the 365-rows-a-year face of an N-row firehose. "
    "Open/close are PICKED doubles (bit-moved, never recomputed — the "
    "q02 rule); the oracle mirrors the picks with ROW_NUMBER windows, "
    "equal BY the unique tiebreak (NULLS FIRST pinned to Spark's "
    "null-smallest struct order). ONE day-keyed partial-agg shuffle. "
    "operators/timeseries.daily_ohlc.",
)
def e19_daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.timeseries import daily_ohlc

    cat = load_testdata(spark, sf_dir)
    return daily_ohlc(cat.table("events"), "ts", "event_id", "value")


@register(
    "e20_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2))
                                    * 100 AS BIGINT)), 0) AS BIGINT)
               AS value_cents
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    dd AS (
      SELECT day, value_cents,
             CAST(MAX(value_cents) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS peak_cents
      FROM daily
    )
    SELECT day, value_cents, peak_cents,
           CAST(peak_cents - value_cents AS BIGINT)
             AS drawdown_cents
    FROM dd
    ORDER BY drawdown_cents DESC, day ASC
    LIMIT 1
    """,
    doc="Maximum drawdown of the daily event-value series: the day the "
    "gap between the running best daily total and that day's total is "
    "widest — the risk/regression headline ('how far below its best "
    "has this stream fallen, and when'); e10 flags deviation from a "
    "LOCAL baseline, this measures decline from the GLOBAL running "
    "best. Cents-exact BIGINTs end to end (Decimal(18,2)·100; "
    "all-NULL days read 0 — the e19 rule), integer prefix-max and "
    "subtraction, winner by (drawdown DESC, day ASC) — deterministic "
    "at ties. One day-keyed shuffle; the prefix window and top-1 run "
    "over the CHECKPOINTED calendar-sized daily frame (the e16 "
    "single-partition-is-fine pattern). "
    "operators/timeseries.max_drawdown.",
)
def e20_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.timeseries import max_drawdown

    cat = load_testdata(spark, sf_dir)
    return max_drawdown(cat.table("events"), "ts", "value")


@register(
    "e21_ab_proportion_test",
    oracle="""
    WITH per_key AS (
      SELECT user_id,
             CAST(((user_id % 2) + 2) % 2 AS BIGINT) AS g,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN event_type = 'error'
                           THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS conv
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id
    ),
    w AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_a,
        CAST(COALESCE(SUM(CASE WHEN g = 0 AND conv = 1
                               THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS conv_a,
        CAST(COALESCE(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_b,
        CAST(COALESCE(SUM(CASE WHEN g = 1 AND conv = 1
                               THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS conv_b
      FROM per_key
    )
    SELECT n_a, conv_a,
           CASE WHEN n_a > 0 THEN
             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           END AS rate_a,
           n_b, conv_b,
           CASE WHEN n_b > 0 THEN
             CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
           END AS rate_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
           END AS lift,
           CASE WHEN n_a > 0 AND n_b > 0
                 AND conv_a + conv_b > 0
                 AND conv_a + conv_b < n_a + n_b THEN
             (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt(
                 ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                  / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                 * (1.0 - (CAST(conv_a AS DOUBLE)
                           + CAST(conv_b AS DOUBLE))
                        / (CAST(n_a AS DOUBLE)
                           + CAST(n_b AS DOUBLE)))
                 * (1.0 / CAST(n_a AS DOUBLE)
                    + 1.0 / CAST(n_b AS DOUBLE))
               )
           END AS z_score
    FROM w
    """,
    doc="Two-proportion z-test of per-USER conversion (more "
    "purchases than errors — a balanced split at every SF, so the z "
    "path is exercised at the gate) between the user-parity cohorts — the experiment readout every "
    "A/B assignment funnels into (|z| > 1.96 ≈ p < .05 two-sided). "
    "The unit is the USER, never the event (one heavy user must not "
    "count as many conversions — the classic unit-of-analysis "
    "error): the first fold collapses each user to converted-at-"
    "least-once, the cohort agg counts users. Exact BIGINT counts; "
    "rates/pooled-variance/√/z are a fixed chain of correctly-"
    "rounded IEEE ops on identical integers — bit-identical, no "
    "transcendentals (√ is exact per IEEE-754). Empty cohort or "
    "zero-variance pooled rate → NULL z (no evidence). Two shuffles "
    "(user fold + 1-row rollup), 1 output row. "
    "operators/sequence.ab_proportion_test.",
)
def e21_ab_proportion_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        ab_proportion_test,
    )

    cat = load_testdata(spark, sf_dir)
    return ab_proportion_test(
        cat.table("events"),
        "user_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long"),
        F.col("event_type") == "purchase",
        negative=F.col("event_type") == "error",
    )


@register(
    "e22_drawdown_duration",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2))
                                    * 100 AS BIGINT)), 0) AS BIGINT)
               AS value_cents
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    ),
    flagged AS (
      SELECT day,
             value_cents < CAST(MAX(value_cents) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS below,
             ROW_NUMBER() OVER (ORDER BY day) AS idx
      FROM daily
    ),
    below AS (
      SELECT day,
             idx - ROW_NUMBER() OVER (ORDER BY day) AS island
      FROM flagged WHERE below
    ),
    runs AS (
      SELECT island,
             CAST(COUNT(*) AS BIGINT) AS n_days_below,
             MIN(day) AS start_day,
             MAX(day) AS end_day
      FROM below GROUP BY island
    )
    SELECT n_days_below, start_day, end_day
    FROM runs
    ORDER BY n_days_below DESC, start_day ASC
    LIMIT 1
    """,
    doc="Longest consecutive run of observed days strictly below the "
    "running best daily value — time-under-water, e20's duration "
    "twin (depth and duration are the two numbers every drawdown "
    "review wants: a year-long shallow slump and a one-day crash "
    "read identically on depth alone). The value-conditioned member "
    "of the gaps-and-islands family (e13 streaks, w08 rising runs) "
    "with the run predicate from a PREFIX window; islands via "
    "day_index − below_rank (unique day order, no ties), winner by "
    "(length DESC, start ASC), strict <, all integers; a never-"
    "dipping series reads EMPTY (no evidence). Windows over the "
    "CHECKPOINTED calendar-sized daily frame (the e16 pattern). "
    "operators/timeseries.drawdown_duration.",
)
def e22_drawdown_duration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.timeseries import (
        drawdown_duration,
    )

    cat = load_testdata(spark, sf_dir)
    return drawdown_duration(cat.table("events"), "ts", "value")


@register(
    "e23_session_spectrum",
    oracle=f"""
    WITH {_SQL_SESSIONS},
    per AS (
      SELECT n_events,
             CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(COALESCE(SUM(FLOOR(epoch(session_end))
                               - FLOOR(epoch(session_start))), 0)
                  AS BIGINT) AS total_duration_s
      FROM sess GROUP BY n_events
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(n_sessions), 0) AS BIGINT) AS t
      FROM per
    )
    SELECT n_events, n_sessions, n_users,
           CASE WHEN t > 0 THEN
             CAST(n_sessions AS DOUBLE) / CAST(t AS DOUBLE)
           END AS session_share,
           total_duration_s,
           CASE WHEN n_sessions > 0 THEN
             CAST(total_duration_s AS DOUBLE)
               / CAST(n_sessions AS DOUBLE)
           END AS mean_duration_s
    FROM per CROSS JOIN tot
    """,
    doc="Session-depth spectrum over e02's sessions (the oracle "
    "EMBEDS e02's session CTE — one session definition, two readers, "
    "the x25 single-source rule): per depth class, session count, "
    "distinct users, corpus share, and total/mean dwell seconds — "
    "the bounce-rate / engagement-depth panel (n_events=1 IS the "
    "bounce row), x84's multiplicity-histogram idea applied to "
    "SESSIONS. Durations are integer unix seconds (FLOOR(epoch) in "
    "the oracle = unix_timestamp in Spark, e02's gap arithmetic); "
    "shares/means single IEEE divisions of exact BIGINTs. Rides the "
    "sessionize shuffle + ONE depth-keyed agg over the session "
    "frame; output bounded by max session depth. "
    "operators/sequence.session_spectrum.",
)
def e23_session_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        session_spectrum,
    )
    from ods_to_datalake_spark.streaming.events import sessionize_batch

    cat = load_testdata(spark, sf_dir)
    return session_spectrum(
        sessionize_batch(cat.table("events"), "30 minutes")
    )


@register(
    "e24_realized_volatility",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id, value
      FROM events WHERE ts IS NOT NULL
    ),
    ranked AS (
      SELECT day, value,
             ROW_NUMBER() OVER (
               PARTITION BY day
               ORDER BY ts DESC, event_id DESC NULLS LAST
             ) AS rl
      FROM ev
    ),
    closes AS (SELECT day, value AS close FROM ranked WHERE rl = 1),
    rets AS (
      SELECT close,
             LAG(close) OVER (ORDER BY day) AS prev
      FROM closes
    ),
    lr AS (
      -- ln quantized DECIMAL(18,6) via the VARCHAR hop (u17 rule)
      SELECT CAST(CAST(ln(close / prev) AS VARCHAR)
                  AS DECIMAL(18,6)) AS r
      FROM rets
      WHERE prev IS NOT NULL AND prev > 0 AND close > 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(r) AS sr,
             SUM(r * r) AS sr2
      FROM lr
    ),
    d AS (
      SELECT n,
             CAST(CAST(sr AS VARCHAR) AS DOUBLE) AS srd,
             CAST(CAST(sr2 AS VARCHAR) AS DOUBLE) AS sr2d,
             CAST(n AS DOUBLE) AS nd
      FROM s
    )
    SELECT n AS n_returns,
           CASE WHEN n > 0 THEN srd / nd END AS mean_log_return,
           CASE WHEN n >= 2 THEN
             sqrt(GREATEST(
               (nd * sr2d - srd * srd) / (nd * (nd - 1.0)), 0.0))
           END AS realized_vol
    FROM s JOIN d USING (n)
    """,
    doc="Realized volatility: sample stddev of daily close-to-close "
    "log returns over e19's candle series — the THIRD read-time "
    "derivation of the daily candle artifact (e20 reads its depth, "
    "e22 its duration, this its jitter; one lake artifact, several "
    "readers). Closes are e19's PICKED doubles; close/prev is one "
    "IEEE division; each ln quantized DECIMAL(18,6) BEFORE the "
    "order-free decimal folds (x72 rule, VARCHAR-hopped in the "
    "oracle per u17); variance and sqrt run in IEEE on identical "
    "operands — bit-identical. Non-positive closes CASE-guarded out "
    "in BOTH engines (unguarded ln is an ANSI crash); n<2 -> NULL "
    "vol; IEEE-negative variance clamps to 0 identically. ONE "
    "day-keyed candle shuffle, then lag/agg over the CHECKPOINTED "
    "calendar-sized close series. "
    "operators/timeseries.realized_volatility.",
)
def e24_realized_volatility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.timeseries import (
        realized_volatility,
    )

    cat = load_testdata(spark, sf_dir)
    return realized_volatility(
        cat.table("events"), "ts", "event_id", "value"
    )


@register(
    "e25_activation_latency",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_type FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    starts AS (
      SELECT user_id, MIN(ts) AS s0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             CAST(FLOOR(epoch(MIN(e.ts))) - FLOOR(epoch(MIN(s.s0)))
               AS BIGINT) AS lat
      FROM ev e JOIN starts s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.s0
      GROUP BY e.user_id
    ),
    per_lat AS (
      SELECT lat, CAST(COUNT(*) AS BIGINT) AS c
      FROM conv GROUP BY lat
    ),
    cum AS (
      SELECT lat,
             CAST(SUM(c) OVER (
               ORDER BY lat
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cm,
             CAST(SUM(c) OVER () AS BIGINT) AS nc,
             CAST(MIN(lat) OVER () AS BIGINT) AS mn,
             CAST(MAX(lat) OVER () AS BIGINT) AS mx
      FROM per_lat
    ),
    med AS (
      SELECT nc, mn, mx, CAST(MIN(lat) AS BIGINT) AS md
      FROM cum WHERE cm >= (nc + 1) // 2
      GROUP BY nc, mn, mx
    ),
    ns AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_signed FROM starts
    )
    SELECT n_signed,
           CAST(COALESCE(m.nc, 0) AS BIGINT) AS n_converted,
           CAST(COALESCE(m.nc, 0) AS DOUBLE)
             / CAST(n_signed AS DOUBLE) AS conversion_rate,
           m.mn AS min_latency_s,
           m.md AS median_latency_s,
           m.mx AS max_latency_s
    FROM ns LEFT JOIN med m ON TRUE
    WHERE n_signed > 0
    """,
    doc="Activation latency panel: of users who ever signed up, how "
    "many purchased AT OR AFTER their first signup and how fast — "
    "the time-to-value number activation funnels optimize (e05 says "
    "WHICH touch gets credit, e06 whether users RETURN, e07 how far "
    "they get; this is how FAST the key transition happens). A "
    "purchase BEFORE ever signing up does not activate (causality "
    "filter); latency = integer unix seconds (floor-of-epoch, e02's "
    "arithmetic); median = the LOWER-MIDDLE order statistic over "
    "converted users via rank (n+1) div 2 on the cumulative "
    "latency-DOMAIN frame (u16's pick, u23's shape — never a rank "
    "over users); rate ONE IEEE division; zero conversions -> real "
    "0 rate with NULL latencies; zero signups -> empty. One "
    "user-keyed agg + one conditional join/agg + a domain-sized "
    "window, 1-row output. operators/sequence.activation_latency.",
)
def e25_activation_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sequence import (
        activation_latency,
    )

    cat = load_testdata(spark, sf_dir)
    return activation_latency(cat.table("events"), "user_id", "ts")
