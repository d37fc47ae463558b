"""Unit + adversarial-parity coverage for operators/timeseries: the
resample tiebreak, fill/observed semantics, the span width guard, and
the registered e11 query↔oracle pair replayed over an adversarial
event corpus (timestamp ties, NULL ts/value/user, a single-event user,
an epoch-0 user) — the gap-fill face of the events edge tier, with the
span kept bounded so the spine stays test-sized."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.timeseries import (
    gap_fill,
    oversized_spans,
    resample_last,
)
from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

# user 1: a tie inside hour 0 (event_id breaks it), a 3-hour gap, then
# a NULL-value observation (fill must carry 2.0 THROUGH it)
# user 2: single event (1-row spine)
# user 3: NULL ts row (unplaceable, dropped) + one real event
# user NULL: grid built, but null-unsafe join leaves it unobserved
# user 5: epoch-0 events (pre-1970-adjacent boundary, tiny span)
EDGE_EVENTS = [
    (0, _ts("2024-01-01T00:10:00"), 1, "view", 1.0, None),
    (1, _ts("2024-01-01T00:10:00"), 1, "click", 2.0, None),  # tie
    (2, _ts("2024-01-01T04:30:00"), 1, "view", None, None),
    (3, _ts("2024-01-01T05:59:00"), 1, "view", 9.0, None),
    (4, _ts("2024-01-02T00:00:00"), 2, "view", 7.0, None),
    (5, None, 3, "view", 100.0, None),
    (6, _ts("2024-01-03T12:00:00"), 3, "view", 3.0, None),
    (7, _ts("2024-01-04T00:00:00"), None, "view", 4.0, None),
    (8, _ts("2024-01-04T02:00:00"), None, "view", 5.0, None),
    (9, _ts("1970-01-01T00:05:00"), 5, "view", 6.0, None),
    (10, _ts("1970-01-01T02:05:00"), 5, "view", 8.0, None),
]


@pytest.fixture(scope="module")
def ev_df(spark):
    return spark.createDataFrame(EDGE_EVENTS, EV_SCHEMA)


def test_resample_last_tiebreak_and_null_ts(spark, ev_df):
    got = {
        (r.user_id, r.bucket): r.value
        for r in resample_last(
            ev_df, "user_id", "ts", "value", "hour", "event_id"
        ).collect()
    }
    # the tie resolves to the larger event_id (2.0), never 1.0
    assert got[(1, _ts("2024-01-01T00:00:00"))] == 2.0
    # NULL-ts rows are unplaceable: user 3 has exactly one bucket
    assert [k for k in got if k[0] == 3] == [
        (3, _ts("2024-01-03T12:00:00"))
    ]


def test_gap_fill_carries_and_flags(spark, ev_df):
    rows = {
        (r.user_id, r.bucket): (r.value, r.observed)
        for r in gap_fill(
            ev_df, "user_id", "ts", "value", "hour", "event_id"
        ).collect()
    }
    u1 = sorted(k[1] for k in rows if k[0] == 1)
    assert len(u1) == 6  # 00:00 .. 05:00 inclusive
    # gap hours carry the last observation forward
    assert rows[(1, _ts("2024-01-01T01:00:00"))] == (2.0, False)
    assert rows[(1, _ts("2024-01-01T03:00:00"))] == (2.0, False)
    # the NULL-value observation is carried THROUGH, flagged unobserved
    assert rows[(1, _ts("2024-01-01T04:00:00"))] == (2.0, False)
    assert rows[(1, _ts("2024-01-01T05:00:00"))] == (9.0, True)
    # single-event user: one observed row
    assert rows[(2, _ts("2024-01-02T00:00:00"))] == (7.0, True)
    # NULL user: spine exists, null-unsafe join leaves it unobserved
    null_rows = [v for k, v in rows.items() if k[0] is None]
    assert len(null_rows) == 3
    assert all(v == (None, False) for v in null_rows)
    # epoch-0 user fills its 3-hour span
    assert rows[(5, _ts("1970-01-01T01:00:00"))] == (6.0, False)


def test_gap_fill_span_guard_and_report(spark):
    rows = [
        (0, _ts("2024-01-01T00:00:00"), 1, "v", 1.0, None),
        (1, _ts("2024-01-01T09:00:00"), 1, "v", 2.0, None),
        (2, _ts("2024-01-01T00:00:00"), 2, "v", 3.0, None),
        (3, _ts("2024-03-01T00:00:00"), 2, "v", 4.0, None),  # stray
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    filled = gap_fill(
        df, "user_id", "ts", "value", "hour", "event_id",
        max_buckets_per_key=100,
    )
    assert {r.user_id for r in filled.collect()} == {1}
    report = oversized_spans(df, "user_id", "ts", "hour", 100).collect()
    assert [r.user_id for r in report] == [2]
    assert report[0].span_buckets == 60 * 24 + 1  # Jan1->Mar1 hours


def test_e11_parity_on_adversarial_events(spark, tmp_path):
    df = spark.createDataFrame(EDGE_EVENTS, EV_SCHEMA)
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb_conn(str(tmp_path))
    try:
        q = load_all()["e11_gap_fill"]
        report = compare(q.fn(spark, str(tmp_path)), con, q.oracle)
        assert report["match"], report
    finally:
        con.close()


def test_gap_fill_empty_input(spark):
    df = spark.createDataFrame([], EV_SCHEMA)
    assert (
        gap_fill(df, "user_id", "ts", "value", "hour", "event_id")
        .count()
        == 0
    )


def test_bad_unit_rejected(spark, ev_df):
    with pytest.raises(ValueError):
        resample_last(ev_df, "user_id", "ts", "value", "week")


def test_cusum_detects_sustained_shift(spark):
    """A small sustained step (10/day → 14/day, never an outlier day)
    must accumulate past the 2-average-days threshold while the
    pre-shift days stay unflagged — the exact case a per-day z-score
    misses; hand-checked integers."""
    from datetime import datetime

    from ods_to_datalake_spark.operators.timeseries import (
        cusum_shift_scores,
    )

    rows = []
    eid = 0
    for d in range(1, 11):  # days 1-10: 10 events
        for _ in range(10):
            rows.append((eid, datetime(2024, 1, d, 12)))
            eid += 1
    for d in range(11, 21):  # days 11-20: 14 events (+40%)
        for _ in range(14):
            rows.append((eid, datetime(2024, 1, d, 12)))
            eid += 1
    rows.append((eid, None))  # NULL ts excluded
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {
        r.day.day: r
        for r in cusum_shift_scores(df, "ts").collect()
    }
    assert len(out) == 20
    # N=20 days, T=240: scaled deviation -40/day before, +40/day after
    assert out[1].cusum_pos == 0 and out[1].cusum_neg == 40
    assert out[10].cusum_neg == 400  # 10 days * 40 below the mean
    assert out[20].cusum_pos == 400  # fully recovered by day 20
    # both one-sided peaks are 400 < threshold 2*T = 480: a +40%
    # 10-day shift on this series needs h < 400/240 days to flag —
    # the statistic itself is the hand-checkable artifact
    assert not out[10].is_shift and not out[20].is_shift
    # mid-recovery: pos has accumulated 5*40, neg has decayed to 200
    assert out[15].cusum_pos == 200 and out[15].cusum_neg == 200


def test_cusum_flag_thresholds(spark):
    """is_shift fires exactly when max(cusum) * h_den > T * h_num —
    integer boundary semantics (strictly greater)."""
    from datetime import datetime

    from ods_to_datalake_spark.operators.timeseries import (
        cusum_shift_scores,
    )

    # 2 days: 0 and 4 events -> N=2 T=4; day1 d=-4, day2 d=+4
    # S = -4, 0; pos on day2 = 4; neg on day1 = 4... min at day1
    rows = [(0, datetime(2024, 1, 2, 1))] * 4 + [
        (1, datetime(2024, 1, 1, 1))
    ] * 0
    rows = [(i, ts) for i, (_, ts) in enumerate(rows)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    # single-day series: d = 1*n - T = 0 everywhere, nothing flags
    out = cusum_shift_scores(df, "ts").collect()
    assert len(out) == 1
    assert out[0].cusum_pos == 0 and not out[0].is_shift

    # h_num=0: any nonzero cusum flags (strict >)
    rows2 = [
        (0, datetime(2024, 1, 1, 1)),
        (1, datetime(2024, 1, 2, 1)),
        (2, datetime(2024, 1, 2, 2)),
        (3, datetime(2024, 1, 2, 3)),
    ]
    df2 = spark.createDataFrame(rows2, "event_id long, ts timestamp")
    out2 = {
        r.day.day: r
        for r in cusum_shift_scores(df2, "ts", h_num=0).collect()
    }
    # N=2 T=4: d1 = 2*1-4 = -2, d2 = 2*3-4 = 2; S=-2,0
    assert out2[1].cusum_neg == 2 and out2[1].is_shift
    assert out2[2].cusum_pos == 2 and out2[2].is_shift


def test_cusum_empty_input(spark):
    from ods_to_datalake_spark.operators.timeseries import (
        cusum_shift_scores,
    )

    df = spark.createDataFrame([], "event_id long, ts timestamp")
    assert cusum_shift_scores(df, "ts").count() == 0


def test_autocorr_perfect_weekly_period(spark):
    """A strict 7-day-periodic series reads r7 = 1.0 exactly on whole
    periods (every pair multiplies identical deviations)."""
    from datetime import datetime

    from ods_to_datalake_spark.operators.timeseries import (
        volume_autocorrelation,
    )

    rows = []
    eid = 0
    pattern = [10, 2, 2, 2, 2, 2, 1]  # one week, repeated exactly
    for week in range(3):
        for dow, n in enumerate(pattern):
            for _ in range(n):
                rows.append((eid, datetime(2024, 1, 1 + week * 7 + dow)))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    (r,) = volume_autocorrelation(df, "ts").collect()
    assert (r.n_days, r.n_pairs) == (21, 14)
    # the standard (biased) estimator divides the 14 pair products by
    # all 21 squared deviations, so perfect periodicity reads exactly
    # (N−L)/N = 14/21 — the ceiling, hit only by a strict period
    assert r.autocorr == 14.0 / 21.0


def test_autocorr_calendar_lag_breaks_on_gaps_and_guards(spark):
    from datetime import datetime

    from ods_to_datalake_spark.operators.timeseries import (
        volume_autocorrelation,
    )

    # days 1 and 5 only: no day+7 partner -> no pairs -> NULL
    rows = [(0, datetime(2024, 1, 1)), (1, datetime(2024, 1, 5))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    (r,) = volume_autocorrelation(df, "ts").collect()
    assert r.n_pairs == 0 and r.autocorr is None
    # constant series: zero variance -> NULL, not a divide crash
    rows2 = [(i, datetime(2024, 1, 1 + i)) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "event_id long, ts timestamp")
    (r2,) = volume_autocorrelation(df2, "ts").collect()
    assert r2.n_pairs == 3 and r2.autocorr is None


# --- daily OHLC (e19) --------------------------------------------------------


def test_daily_ohlc_picks_by_unique_tiebreak(spark):
    from ods_to_datalake_spark.operators.timeseries import daily_ohlc

    rows = [
        # one day, same-timestamp open pair: tiebreak decides
        (1, "2024-01-01 00:00:00", 5.0),
        (2, "2024-01-01 00:00:00", 7.0),
        (3, "2024-01-01 09:00:00", 1.0),
        (4, "2024-01-01 23:00:00", 4.0),
        # NULL ts: excluded entirely
        (9, None, 99.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    (r,) = daily_ohlc(df, "ts", "event_id", "value").collect()
    assert str(r.day) == "2024-01-01"
    assert r.open == 5.0  # event_id 1 beats 2 at the tied timestamp
    assert r.close == 4.0
    assert (r.high, r.low) == (7.0, 1.0)
    assert r.n_events == 4
    assert r.volume_cents == 1700


def test_daily_ohlc_null_values_ride_along(spark):
    """NULL values: picked open/close may BE NULL (the first event had
    no value — that is the fact), high/low/volume skip NULLs, and an
    all-NULL day reads volume 0, not NULL."""
    from ods_to_datalake_spark.operators.timeseries import daily_ohlc

    rows = [
        (1, "2024-01-01 00:00:00", None),
        (2, "2024-01-01 12:00:00", 3.0),
        (3, "2024-01-02 00:00:00", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    got = {
        str(r.day): r
        for r in daily_ohlc(df, "ts", "event_id", "value").collect()
    }
    d1 = got["2024-01-01"]
    assert d1.open is None and d1.close == 3.0
    assert d1.high == 3.0 and d1.low == 3.0 and d1.volume_cents == 300
    d2 = got["2024-01-02"]
    assert d2.open is None and d2.close is None
    assert d2.high is None and d2.low is None
    assert d2.n_events == 1 and d2.volume_cents == 0


def test_drawdown_duration_islands_and_strictness(spark):
    from ods_to_datalake_spark.operators.timeseries import (
        drawdown_duration,
    )

    # peaks 10, then 3 below-days, a re-touch (NOT below: strict),
    # then 2 below-days: longest run is the first (3 days)
    rows = [
        (1, "2024-01-01", 10.0),
        (2, "2024-01-02", 4.0),
        (3, "2024-01-03", 5.0),
        (4, "2024-01-04", 6.0),
        (5, "2024-01-05", 10.0),  # re-touch ends the run
        (6, "2024-01-06", 9.0),
        (7, "2024-01-07", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    (r,) = drawdown_duration(df, "ts", "value").collect()
    assert r.n_days_below == 3
    assert str(r.start_day) == "2024-01-02"
    assert str(r.end_day) == "2024-01-04"


def test_drawdown_duration_monotone_is_empty(spark):
    from ods_to_datalake_spark.operators.timeseries import (
        drawdown_duration,
    )

    rows = [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    assert drawdown_duration(df, "ts", "value").count() == 0


def test_realized_volatility_hand_case_and_guards(spark):
    import math

    import pytest

    from ods_to_datalake_spark.operators.timeseries import (
        realized_volatility,
    )

    def vol(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, value double"
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
        )
        (r,) = realized_volatility(
            df, "ts", "event_id", "value"
        ).collect()
        return r

    # closes 100 -> 110 -> 99: two returns ln(1.1), ln(0.9); the
    # intraday event (value 500) must NOT leak in — only closes count
    r = vol(
        [
            (1, "2024-01-01 09:00:00", 500.0),
            (2, "2024-01-01 16:00:00", 100.0),
            (3, "2024-01-02 16:00:00", 110.0),
            (4, "2024-01-03 16:00:00", 99.0),
        ]
    )
    assert r.n_returns == 2
    # expressions quantize each ln to 6dp before the stats
    q = [round(math.log(1.1), 6), round(math.log(0.9), 6)]
    m = sum(q) / 2
    want = math.sqrt(sum((x - m) ** 2 for x in q) / 1)
    assert r.mean_log_return == pytest.approx(m, abs=1e-12)
    assert r.realized_vol == pytest.approx(want, rel=1e-9)

    # a non-positive close breaks the chain on BOTH sides of the day
    # (no ln for -5 as numerator or denominator) -> only 30->33 counts
    r2 = vol(
        [
            (1, "2024-01-01 16:00:00", 10.0),
            (2, "2024-01-02 16:00:00", -5.0),
            (3, "2024-01-03 16:00:00", 30.0),
            (4, "2024-01-04 16:00:00", 33.0),
        ]
    )
    assert r2.n_returns == 1
    assert r2.realized_vol is None  # n < 2

    # single day -> no returns at all
    r3 = vol([(1, "2024-01-01 16:00:00", 42.0)])
    assert r3.n_returns == 0
    assert r3.mean_log_return is None and r3.realized_vol is None
