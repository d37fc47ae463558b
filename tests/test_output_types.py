"""Output-type policy: no registered query may emit a DECIMAL column.

Decimal is the *internal* summation type (exact, partition-order
independent — CLAUDE.md rule); as an output type it hash-mismatches
across engines because Spark renders scale-padded strings
("253942.00") while shortest-repr normalizers emit "253942.0".
``suite.finalize_output`` auto-casts decimal outputs to DOUBLE and the
matching oracle wrap (``register(double_cols=...)``) does the same in
DuckDB. This test pins the policy: schema analysis only, no execution.
"""

from __future__ import annotations

import pyspark.sql.types as T

from ods_to_datalake_spark.plans.suite import load_all

SF_SMOKE = "/root/testdata/sf0.001"


def test_no_decimal_output_columns(spark):
    offenders = {}
    for name, q in load_all().items():
        df = q.fn(spark, SF_SMOKE)  # analysis only — schema is lazy
        decs = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.DecimalType)
        ]
        if decs:
            offenders[name] = decs
    assert not offenders, (
        "DECIMAL-typed output columns leak the cross-engine repr gap; "
        f"route through register(double_cols=...): {offenders}"
    )


def test_double_cols_wrap_applied():
    """Every oracle registered with double_cols carries the REPLACE wrap."""
    wrapped = [
        q.name
        for q in load_all().values()
        if q.oracle and "SELECT * REPLACE (CAST(" in q.oracle
    ]
    assert len(wrapped) >= 25, wrapped
