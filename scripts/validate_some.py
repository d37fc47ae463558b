#!/usr/bin/env python
"""Targeted oracle gate: validate only the named queries.

Usage: python scripts/validate_some.py name [name ...] [--sf DIR]

Same compare as validate.py (row count + columns + order-insensitive
value hash vs DuckDB) but only for the listed queries — the fast loop
while optimizing a single operator. validate.py stays the full gate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    if not names:
        print("usage: validate_some.py name [name ...] [--sf DIR]")
        return 2

    from tests.oracle_utils import compare, duckdb_conn

    from ods_to_datalake_spark.plans.suite import load_all
    from ods_to_datalake_spark.session import build_session

    queries = load_all()
    spark = build_session(app_name="validate-some")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)

    failures = []
    for name in names:
        q = queries[name]
        try:
            if not q.oracle:
                n = q.fn(spark, sf_dir).count()
                print(f"  rows-only  {name}: {n} rows")
                continue
            report = compare(q.fn(spark, sf_dir), con, q.oracle)
        except Exception as exc:  # noqa: BLE001
            print(f"  ERROR      {name}: {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        status = "ok" if report["match"] else "MISMATCH"
        print(
            f"  {status:9s}  {name}: spark={report['spark_rows']} "
            f"oracle={report['oracle_rows']}"
        )
        if not report["match"]:
            failures.append(name)
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
