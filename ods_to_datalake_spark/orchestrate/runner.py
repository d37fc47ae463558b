"""Priority-group job orchestrator (SURVEY §2.10 O1-O4, §3.3).

Semantics from the reference notebook (test_glue_job.ipynb cell 9a918133):
- jobs carry (table_id, target_table, priority, parallel_run);
- priority groups run in ascending order with a BARRIER between groups;
- within a group, sequential jobs (parallel_run != True) run one-by-one
  FIRST, then parallel jobs run concurrently in a thread pool;
- a failing job is isolated: its error is recorded and the group
  continues (the reference catches per-future exceptions and proceeds).

Spark mapping: many driver threads share one SparkSession, each
submitting independent job DAGs; with `spark.scheduler.mode=FAIR` (set
per-pool below) concurrent jobs share executors fairly instead of FIFO
head-of-line blocking. The misspelled legacy control column `piority` is
accepted as an alias (SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ControlJob:
    """One row of the job-control table (O1)."""

    table_id: Any
    target_table: str
    priority: int
    parallel_run: bool = False

    @classmethod
    def from_row(cls, row: Mapping[str, Any]) -> "ControlJob":
        d = dict(row)
        if "priority" not in d and "piority" in d:  # legacy misspelling
            d["priority"] = d.pop("piority")
        return cls(
            table_id=d.get("table_id"),
            target_table=d["target_table"],
            priority=int(d["priority"]),
            parallel_run=bool(d.get("parallel_run", False)),
        )


def load_control_jobs(control: DataFrame) -> list[ControlJob]:
    """Read the (small) control table to the driver (O1)."""
    return [ControlJob.from_row(r.asDict()) for r in control.collect()]


@dataclass
class JobResult:
    job: ControlJob
    ok: bool
    result: Any = None
    error: BaseException | None = None


@dataclass
class RunReport:
    results: list[JobResult] = field(default_factory=list)
    # (priority, target_table) in completion order — lets tests assert
    # group barriers and sequential-before-parallel ordering
    completion_order: list[tuple[int, str]] = field(default_factory=list)

    @property
    def failed(self) -> list[JobResult]:
        return [r for r in self.results if not r.ok]


def run_priority_groups(
    jobs: Iterable[ControlJob],
    run_job: Callable[[ControlJob], Any],
    max_workers: int = 3,
    spark: SparkSession | None = None,
    fair_pool: str | None = "orchestrator",
) -> RunReport:
    """Execute jobs per the O2-O4 semantics (see module docstring).

    ``run_job`` is the per-job action (typically: build a DataFrame and
    write it). Failures are isolated per job; the report lists them.
    """
    report = RunReport()

    def _run(job: ControlJob) -> JobResult:
        if spark is not None and fair_pool is not None:
            # FAIR pool so concurrent jobs share executors (O4 note)
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", fair_pool
            )
        try:
            value = run_job(job)
            return JobResult(job, True, result=value)
        except BaseException as exc:  # noqa: BLE001 — isolation by design
            return JobResult(job, False, error=exc)

    ordered = sorted(jobs, key=lambda j: j.priority)
    for priority in sorted({j.priority for j in ordered}):
        group = [j for j in ordered if j.priority == priority]
        sequential = [j for j in group if not j.parallel_run]
        parallel = [j for j in group if j.parallel_run]

        for job in sequential:  # O3: sequential lane first
            res = _run(job)
            report.results.append(res)
            report.completion_order.append((priority, job.target_table))

        if parallel:  # O4: parallel lane
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                futures = {pool.submit(_run, j): j for j in parallel}
                for fut in as_completed(futures):
                    res = fut.result()
                    report.results.append(res)
                    report.completion_order.append(
                        (priority, res.job.target_table)
                    )
        # loop end = barrier between priority groups (O2)
    return report
