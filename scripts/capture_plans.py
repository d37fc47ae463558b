#!/usr/bin/env python
"""Capture .explain("formatted") for headline (or named) queries.

Usage: python scripts/capture_plans.py <outdir> [suffix] [name ...]

Writes <outdir>/<query>_<suffix>.txt (suffix defaults to "before") for
each named query, or every headline query when no names are given.
Planning only for most queries — but operators that materialize an
eager localCheckpoint (or run a strategy-picking count) at
DataFrame-CONSTRUCTION time — the graph family, x68 — do run Spark
jobs here; budget for those. With AQE on the captured plan is the
initial plan (isFinalPlan=false); the judge reads Exchange counts,
join strategies and PushedFilters from it, which are all pre-AQE
properties.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from ods_to_datalake_spark.plans.suite import REGISTRY, load_all
    from ods_to_datalake_spark.session import build_session

    load_all()
    spark = build_session(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if not names:
        names = [n for n, q in REGISTRY.items() if q.headline]
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"{path}: {n_ex} Exchange mentions")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
