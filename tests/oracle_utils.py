"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs a suite query in Spark and its ANSI-SQL oracle in DuckDB over the
same parquet tables, then compares row count + (column-name-sorted,
order-insensitive) value multisets — the same shape of check the driver
records in CORRECTNESS_r{N}.json.

Driver fidelity: the driver compares PANDAS frames (spark.toPandas vs
duckdb .df()), so value canonicalization must happen at the pandas-dtype
level — a DuckDB HUGEINT (e.g. SUM(BIGINT) OVER promotion) lands in
pandas as float64 and hashes as "0.0" against Spark's int64 "0" even
though the values are identical. Round 3 shipped a red driver row (x28)
precisely because the old fetchall()-based gate normalized through
Python ints and could not see this; ints and floats now hash apart here
too.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from ods_to_datalake_spark.catalog import TESTDATA_TABLES


def _norm(v):
    """Canonicalize one pandas-level cell. Int-like and float-like cells
    hash into DISJOINT spaces (i: vs f:) — the dtype drift the driver
    sees must be visible locally."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "\x00NULL"
    if isinstance(v, (bool, np.bool_)):  # before int: bool ⊂ int
        return f"b:{bool(v)}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:nan"
        return f"f:{f!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    if isinstance(v, datetime.datetime):  # covers pd.Timestamp
        # pandas has no date dtype: a DuckDB DATE arrives as a midnight
        # datetime64 while Spark's DateType stays datetime.date — the
        # driver's green rows on date-output queries (p06/q03/u05,
        # r01-r03) prove it folds the two, so fold midnight naive
        # timestamps to their date form here too
        if (
            v.tzinfo is None
            and v.hour == v.minute == v.second == 0
            and v.microsecond == 0
        ):
            return f"d:{v.date().isoformat()}"
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:
        if pd.isna(v):  # pd.NA and friends
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
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


def _row_strings(pdf, cols: list[str]) -> list[str]:
    return sorted(
        "|".join(_norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a comparison report; report['match'] is the verdict."""
    o_pdf = con.sql(sql).df()
    s_pdf = spark_df.toPandas()
    o_cols = [c.lower() for c in o_pdf.columns]
    s_cols = [c.lower() for c in s_pdf.columns]
    o_pdf.columns = o_cols
    s_pdf.columns = s_cols

    report = {
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
        "spark_rows": len(s_pdf),
        "oracle_rows": len(o_pdf),
    }
    report["cols_match"] = sorted(s_cols) == sorted(o_cols)
    report["count_match"] = len(s_pdf) == len(o_pdf)

    if report["cols_match"]:
        s_set = _row_strings(s_pdf, sorted(s_cols))
        o_set = _row_strings(o_pdf, sorted(o_cols))
        report["values_match"] = s_set == o_set
        if not report["values_match"]:
            report["spark_only"] = [
                r for r in s_set if r not in set(o_set)
            ][:3]
            report["oracle_only"] = [
                r for r in o_set if r not in set(s_set)
            ][:3]
    else:
        report["values_match"] = False

    report["match"] = (
        report["cols_match"]
        and report["count_match"]
        and report["values_match"]
    )
    return report
