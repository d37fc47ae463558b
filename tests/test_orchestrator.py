"""Orchestrator property tests (SURVEY §5 item 'property-based'):
priority groups complete in ascending order with barriers; sequential
lane precedes parallel lane; one failing job never kills its group."""

from __future__ import annotations

import threading
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ods_to_datalake_spark.orchestrate.runner import (
    ControlJob,
    RunReport,
    load_control_jobs,
    run_priority_groups,
)

JOBS = [
    ControlJob(1, "customers", 1, True),
    ControlJob(2, "orders", 2, False),  # sequential row
    ControlJob(3, "payments", 2, True),
    ControlJob(4, "riders", 2, True),
    ControlJob(5, "docs", 3, True),
]


def test_priority_barrier_and_lanes():
    report = run_priority_groups(JOBS, lambda j: j.target_table)
    prios = [p for p, _ in report.completion_order]
    assert prios == sorted(prios)  # groups ascending, barrier respected
    group2 = [t for p, t in report.completion_order if p == 2]
    assert group2[0] == "orders"  # sequential lane first
    assert not report.failed


def test_failure_isolation():
    def run(job):
        if job.target_table == "payments":
            raise RuntimeError("boom")
        return "ok"

    report = run_priority_groups(JOBS, run)
    assert [r.job.target_table for r in report.failed] == ["payments"]
    # the rest of the group AND later groups still ran
    done = {t for _, t in report.completion_order}
    assert done == {"customers", "orders", "payments", "riders", "docs"}


def test_parallel_lane_actually_concurrent():
    active = []
    peak = []
    lock = threading.Lock()

    def run(job):
        with lock:
            active.append(job.table_id)
            peak.append(len(active))
        time.sleep(0.2)
        with lock:
            active.remove(job.table_id)

    jobs = [ControlJob(i, f"t{i}", 1, True) for i in range(3)]
    run_priority_groups(jobs, run, max_workers=3)
    assert max(peak) == 3  # all three overlapped


def test_legacy_piority_alias(spark):
    control = spark.createDataFrame(
        [(1, "orders", 2, False), (2, "lineitem", 1, True)],
        "table_id int, target_table string, piority int, parallel_run boolean",
    )
    jobs = load_control_jobs(control)
    assert {(j.target_table, j.priority) for j in jobs} == {
        ("orders", 2),
        ("lineitem", 1),
    }


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # priority
            st.booleans(),  # parallel_run
            st.booleans(),  # fails?
        ),
        min_size=1,
        max_size=12,
    )
)
def test_property_group_order_and_isolation(spec):
    jobs = [
        ControlJob(i, f"t{i}", prio, par) for i, (prio, par, _) in enumerate(spec)
    ]
    fail_ids = {i for i, (_, _, f) in enumerate(spec) if f}

    def run(job):
        if job.table_id in fail_ids:
            raise RuntimeError("x")

    report = run_priority_groups(jobs, run)
    # every job ran exactly once
    assert sorted(r.job.table_id for r in report.results) == sorted(
        j.table_id for j in jobs
    )
    # completion priorities are non-decreasing (barrier property)
    prios = [p for p, _ in report.completion_order]
    assert prios == sorted(prios)
    # failures are exactly the injected ones
    assert {r.job.table_id for r in report.failed} == fail_ids


def test_ingest_metrics_single_pass(spark, tmp_path):
    """observe()-based metrics come out of the write action itself —
    verified against explicitly computed values, no second scan."""
    from ods_to_datalake_spark.orchestrate.metrics import with_ingest_metrics

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "k int, v string"
    )
    observed, obs = with_ingest_metrics(df, null_cols=["v"])
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 4
    assert got["null_v"] == 2
