"""Run-condition provenance for benchmark artifacts.

The BENCH_r* series runs on a shared VM whose wall-times swing ±30-50%
with concurrent load (adjudicating round 9's +23% headline move took two
full local re-measurements — VERDICT r9, Missing #1). Every benchmark
JSON therefore carries a ``conditions`` block: OS load, free memory,
process count, and a same-session REFERENCE PROBE — a fixed data-free
Spark job whose cost depends only on the machine, so any reader can
classify a swing (probe moved with the suite → machine drift; probe flat
while a query moved → plan change) in seconds.
"""

from __future__ import annotations

import os
import statistics
import time


def _meminfo_mb(field: str) -> float | None:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith(field + ":"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        return None
    return None


def _nproc_running() -> int | None:
    # /proc/loadavg field 4 is "running/total" scheduler entities
    try:
        with open("/proc/loadavg") as f:
            running, total = f.read().split()[3].split("/")
            return int(running)
    except (OSError, ValueError, IndexError):
        return None


def reference_probe(spark, reps: int = 3) -> float:
    """Median seconds for a fixed data-free job (range → sum, noop sink).

    Pure whole-stage-codegen arithmetic over ``spark.range`` — no IO, no
    shuffle variance, no dependence on SF or repo code — so the number
    moves only when the machine does. Run AFTER warmup, in the same
    session as the timed suite.
    """
    df = spark.range(0, 200_000_000, 1).selectExpr(
        "sum(id * 3 + 1) as probe"
    )
    df.write.mode("overwrite").format("noop").save()  # JIT warmup
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def run_conditions(spark=None) -> dict:
    """Snapshot of machine conditions (+ probe timing when a session is
    passed). Cheap enough to call at suite start AND end — load can
    change mid-run, and bracketing timestamps expose that."""
    la1, la5, la15 = os.getloadavg()
    cond = {
        "loadavg": [round(la1, 2), round(la5, 2), round(la15, 2)],
        "cpus": os.cpu_count(),
        "mem_available_mb": _meminfo_mb("MemAvailable"),
        "procs_running": _nproc_running(),
    }
    if spark is not None:
        cond["probe_sec"] = reference_probe(spark)
    return cond
