#!/usr/bin/env python
"""Paired A/B timing for plan variants, robust to machine drift.

The shared VM's throughput swings 2-3x within minutes (probe-verified),
so sequential before/after runs are not comparable. This harness runs
variant A and variant B ALTERNATED in one session (A B A B ...) and
reports per-pair ratios next to the medians — a ratio is trustworthy
even when absolute seconds drift mid-run.

Each variant is a callable returning a DataFrame; timing is the noop
write (bench.py methodology).
"""

from __future__ import annotations

import statistics
import time


def ab(spark, variants: dict, reps: int = 5, sf_dir: str | None = None):
    """variants: {label: fn(spark, sf_dir) -> DataFrame}."""
    import os

    sf = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    labels = list(variants)
    # warmup each once
    for lb in labels:
        spark.sparkContext.setJobDescription(f"warmup {lb}")
        variants[lb](spark, sf).write.mode("overwrite").format(
            "noop"
        ).save()
    times: dict[str, list[float]] = {lb: [] for lb in labels}
    for r in range(reps):
        for lb in labels:
            spark.sparkContext.setJobDescription(f"{lb} rep{r}")
            t0 = time.perf_counter()
            variants[lb](spark, sf).write.mode("overwrite").format(
                "noop"
            ).save()
            times[lb].append(time.perf_counter() - t0)
    for lb in labels:
        med = statistics.median(times[lb])
        print(f"{lb}: median {med:.3f}s of {[round(s,3) for s in times[lb]]}")
    if len(labels) == 2:
        a, b = labels
        ratios = [x / y for x, y in zip(times[a], times[b])]
        print(
            f"per-pair ratio {a}/{b}: median "
            f"{statistics.median(ratios):.3f} of "
            f"{[round(r, 3) for r in ratios]}"
        )
    return times
