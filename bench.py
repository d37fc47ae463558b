#!/usr/bin/env python
"""Headline-query benchmark.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a ``noop``-format write — the action that
evaluates EVERY row of EVERY output column. It must not be .count():
under a count Catalyst prunes unreferenced aggregate expressions and
eliminates unique-key outer joins, so count() times a hollowed-out
plan (measured at sf0.1: the flagship a02 fold "cost" 0.085s under
count vs 2.23s for the real fold — the collect_list arrays were never
built; q01 0.23s vs 0.71s). Rounds ≤ 4 used count() and therefore
under-report agg-heavy queries; BENCH_r05 onward is the honest series
(the round-over-round jump at r05 is this methodology fix, not a
regression). A warmup pass runs first so JVM/codegen startup isn't
billed to the first query, and each query reports the MEDIAN of
``$SPARK_GRAFT_BENCH_REPS`` (default 5) repetitions — single-shot
timings moved ±40% on first-touch JIT/IO order alone (BENCH_r03).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# The cross-round comparison set, FROZEN at the BENCH_r05 membership
# (the first honest noop-write round). The headline set may grow —
# g03 joined at r10 — but round-over-round ratios are only meaningful
# on a fixed set, so bench emits a ``comparable_subtotal`` over this
# list alongside the full headline total (VERDICT r10 ask #4; before
# this field, r10's 16.64s vs r09's 9.49s read as +75% until the
# reader hand-subtracted g03 and checked loadavg).
COMPARABLE_SET = (
    "a02_document_fold",
    "e01_tumbling_window",
    "e12_markov_transitions",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "u07_incremental_agg",
    "x04_minhash_lsh_candidates",
    "x07_cosine_topk",
    "x52_hll_vocab",
    "x58_histogram_quantiles",
    "x68_target_encoding",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ods_to_datalake_spark.plans.suite import headline_queries, load_all
    from ods_to_datalake_spark.runcond import run_conditions
    from ods_to_datalake_spark.session import build_session

    load_all()
    spark = build_session(app_name="ods_to_datalake_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = headline_queries()

    # Warmup: touch every table, then run each headline query once
    # untimed. First execution pays whole-stage-codegen JIT + shuffle
    # infra startup (~4s on this JVM) that a long-running cluster job
    # amortizes to zero; steady-state timings are the comparable metric.
    from ods_to_datalake_spark.catalog import TESTDATA_TABLES, load_testdata

    cat = load_testdata(spark, sf_dir)
    for t in TESTDATA_TABLES:
        cat.table(t).count()
    counts = {}
    for name, fn in queries.items():
        df = fn(spark, sf_dir)
        counts[name] = df.count()
        df.write.mode("overwrite").format("noop").save()

    # Run-condition provenance (VERDICT r9, Missing #1): loadavg / free
    # memory / a fixed data-free probe timing, bracketed around the
    # timed suite so the series carries its own noise context — a
    # headline swing whose probe moved with it is machine drift, not a
    # plan regression.
    cond_start = run_conditions(spark)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        n = counts[name]
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(
            f"# {name}: median {timings[name]:.3f}s of "
            f"{[round(s, 3) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    cond_end = run_conditions(spark)
    # A partial subtotal silently invalidates cross-round ratios (the
    # field's whole purpose), so a frozen-set member missing from the
    # headline run is surfaced in the JSON instead of dropped.
    comparable_missing = [n for n in COMPARABLE_SET if n not in timings]
    comparable = (
        round(sum(timings[n] for n in COMPARABLE_SET), 4)
        if not comparable_missing
        else None
    )
    # Machine-drift-corrected subtotal: divide by the mean data-free
    # probe time (runcond.reference_probe — pure codegen arithmetic, so
    # it moves only with the machine). Cross-round, compare THIS number
    # first; if it is flat while raw seconds moved, the swing is load.
    probes = [
        c["probe_sec"]
        for c in (cond_start, cond_end)
        if c.get("probe_sec")
    ]
    probe_mean = round(statistics.mean(probes), 4) if probes else None
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "reps": reps,
                "comparable_set": list(COMPARABLE_SET),
                "comparable_subtotal": comparable,
                "comparable_missing": comparable_missing,
                "probe_sec_mean": probe_mean,
                "comparable_per_probe": (
                    round(comparable / probe_mean, 3) if probe_mean else None
                ),
                "conditions": {
                    "start": cond_start,
                    "end": cond_end,
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
