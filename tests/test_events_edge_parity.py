"""Edge-case oracle parity for the events suite: adversarial event rows
(malformed/NULL/nested JSON props, epoch-0 and far-future timestamps,
exact-tie timestamps, negative/zero values, a single-event user)
replayed through the SAME query↔oracle pairs — the temporal face of
the text/embedding edge tiers.

What this pins: JSON extraction must NULL out (not throw) on garbage
in BOTH engines; window/sessionization semantics must agree on exact
timestamp ties (every ordering in the suite carries a unique
tiebreaker — this corpus proves it); aggregates must agree across a
56-year timestamp span.
"""

from __future__ import annotations

import datetime as dt

import pytest

from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


T0 = _ts("2024-01-01T00:00:00")

EDGE_EVENTS = [
    # epoch zero and a far-future (but pandas-ns-safe) timestamp
    (0, _ts("1970-01-01T00:00:00"), 1, "view", 1.0, '{"k": 1}'),
    (1, _ts("2200-12-31T23:59:59.999999"), 1, "purchase", 5.0, '{"k": 2}'),
    # exact timestamp TIE for one user — orderings need the tiebreaker
    (2, T0, 2, "view", 2.0, '{"k": 3}'),
    (3, T0, 2, "click", 3.0, '{"k": 4}'),
    (4, T0, 2, "purchase", 0.0, '{"k": 5}'),
    # malformed / empty / NULL / nested / wrong-type props
    (5, _ts("2024-01-01T01:00:00"), 3, "view", -7.5, "not json at all"),
    (6, _ts("2024-01-01T01:01:00"), 3, "click", 0.0, ""),
    (7, _ts("2024-01-01T01:02:00"), 3, "purchase", 1e6, None),
    (8, _ts("2024-01-01T01:03:00"), 3, "view", 0.01, '{"k": {"nested": 1}}'),
    (9, _ts("2024-01-01T01:04:00"), 3, "view", 2.0, '{"k": "str"}'),
    (10, _ts("2024-01-01T01:05:00"), 3, "error", 3.0, '{"other": 9}'),
    # single-event user; signup for the retention/attribution shapes
    (11, _ts("2024-01-02T00:00:00"), 4, "signup", 0.0, '{"k": 7}'),
    (12, _ts("2024-01-02T00:30:00"), 4, "purchase", 9.0, '{"k": 8}'),
    (13, _ts("2024-01-08T00:00:00"), 4, "click", 1.0, '{"k": 9}'),
    (14, _ts("2024-01-03T00:00:00"), 5, "signup", 0.0, "[1, 2]"),
    # fuzz-shrunk (2026-08, round 6): JSON booleans and fractionals —
    # DuckDB's CAST(JSON AS INT) maps true→1 and its VARCHAR→INT
    # rounds '49.9'→50 where Spark NULLs both; the e04 oracle gates
    # the cast on an integral-literal regex
    (15, _ts("2024-01-04T00:00:00"), 5, "view", 1.0, '{"k": true}'),
    (16, _ts("2024-01-04T00:01:00"), 5, "view", 1.0, '{"k": false}'),
    (17, _ts("2024-01-04T00:02:00"), 5, "view", 1.0, '{"k": 49.9}'),
    (18, _ts("2024-01-04T00:03:00"), 5, "view", 1.0, '{"k": "+50"}'),
    # NULL event_type: e09 must filter it before the path concat
    # (concat_ws skips NULLs where || propagates), e01/e10 group it as
    # its own NULL bucket, and e10's stats equi-join drops it — all
    # identically in both engines
    (19, _ts("2024-01-04T00:04:00"), 5, None, 1.0, '{"k": 7}'),
]

EDGE_QUERIES = [
    "e01_tumbling_window",
    "e02_sessionize",
    "e03_asof_join",
    "e04_json_extract",
    "e05_purchase_attribution",
    "e06_retention_cohorts",
    "e07_event_funnel",
    "e08_trailing_window",
    "e09_event_paths",
    "e10_daily_anomaly",
    # round-8: NULL event types must be excised from the sequence
    # identically before pairing (e12); epoch-0 rows hit the streak
    # island arithmetic's pre-1970 date math (e13). NULL-ts rows are
    # NOT in this corpus (several e-queries would need a cross-engine
    # NULLS FIRST/LAST audit first); the e12/e13 NULL-ts drop is
    # pinned by tests/test_sequence.py::test_null_ts_parity instead.
    "e12_markov_transitions",
    "e13_activity_streaks",
    "e14_running_distinct_users",  # epoch-0 first-seen days + the
    # HUGEINT-window-sum recast
    # round-11: OHLC picks at tied timestamps (the unique-tiebreak
    # rule), NULL-value open/close ride-along, epoch-0 days
    "e19_daily_ohlc",
    # round-11: per-user A/B fold (NULL users excluded, tied
    # purchase/error counts are NOT conversions, z guards)
    "e21_ab_proportion_test",
    # round-11: below-peak runs on the adversarial daily series
    # (epoch-0 day, ties at the peak are NOT below - strict <)
    "e22_drawdown_duration",
    # round-12: session spectrum over the tied-timestamp /
    # single-event corpus (bounce rows, zero-duration sessions, the
    # epoch-0 user) — the oracle embeds e02's session CTE
    "e23_session_spectrum",
    # round-12: activation latency — the tied-timestamp corpus has a
    # same-second signup+purchase class via u2's events, epoch-0
    # users, and a purchase-before-signup user (the causality filter)
    "e25_activation_latency",
    # round-12: realized vol over adversarial closes — the 0.0 close
    # (2024-01-03) breaks the return chain on BOTH sides identically
    # (the ANSI ln guard), epoch-0 and far-future days, tied
    # timestamps pick the close by the unique tiebreak
    "e24_realized_volatility",
]


@pytest.fixture(scope="module")
def ev_edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ev_edge")
    df = spark.createDataFrame(
        EDGE_EVENTS,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def ev_edge_con(ev_edge_dir):
    con = duckdb_conn(ev_edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_events_edge_parity(spark, ev_edge_dir, ev_edge_con, name):
    q = load_all()[name]
    report = compare(q.fn(spark, ev_edge_dir), ev_edge_con, q.oracle)
    assert report["match"], f"{name}: {report}"
