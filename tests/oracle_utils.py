"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs a suite query in Spark and its ANSI-SQL oracle in DuckDB over the
same parquet tables, then compares row count + (column-name-sorted,
order-insensitive) value multisets — the same shape of check the driver
records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from ods_to_datalake_spark.catalog import TESTDATA_TABLES

# text/varchar comparisons: DuckDB returns str, Spark str — fine.
# floats: compared exactly (suite queries are designed so float values are
# either raw (identical bits) or rounded/decimal on both sides).


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):  # spark writes directories; glob inside
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a comparison report; report['match'] is the verdict."""
    oracle = con.sql(sql)
    o_cols = [c.lower() for c in oracle.columns]
    o_rows = oracle.fetchall()

    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    report = {
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
    }
    report["cols_match"] = sorted(s_cols) == sorted(o_cols)
    report["count_match"] = len(s_rows) == len(o_rows)

    if report["cols_match"]:
        s_order = [s_cols.index(c) for c in sorted(s_cols)]
        o_order = [o_cols.index(c) for c in sorted(o_cols)]
        s_set = sorted(
            "|".join(_norm(r[i]) for i in s_order) for r in s_rows
        )
        o_set = sorted(
            "|".join(_norm(r[i]) for i in o_order) for r in o_rows
        )
        report["values_match"] = s_set == o_set
        if not report["values_match"]:
            diff_s = [r for r in s_set if r not in set(o_set)][:3]
            diff_o = [r for r in o_set if r not in set(s_set)][:3]
            report["spark_only"] = diff_s
            report["oracle_only"] = diff_o
    else:
        report["values_match"] = False

    report["match"] = (
        report["cols_match"]
        and report["count_match"]
        and report["values_match"]
    )
    return report
