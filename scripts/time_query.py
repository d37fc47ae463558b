#!/usr/bin/env python
"""Time registered queries in isolation (noop write, median of reps).

Usage: python scripts/time_query.py name [name ...] [--sf DIR] [--reps N]

Same methodology as bench.py (warmup pass, noop-format write, median)
but for an arbitrary query subset — the fast A/B loop while optimizing
one operator. bench.py remains the headline series.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 5
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from ods_to_datalake_spark.plans.suite import REGISTRY, load_all
    from ods_to_datalake_spark.session import build_session

    load_all()
    spark = build_session(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(
            f"{name}: median {med:.3f}s of {[round(s, 3) for s in samples]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
