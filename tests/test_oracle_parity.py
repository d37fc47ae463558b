"""The t2 gate, locally: every suite query must hash-match its DuckDB
oracle on the correctness scale factor (parametrized per query so failures
are attributable)."""

from __future__ import annotations

import pytest

from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

QUERIES = load_all()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb_conn(sf_correct)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_correct, con, name):
    q = QUERIES[name]
    report = compare(q.fn(spark, sf_correct), con, q.oracle)
    assert report["match"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_correct, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_correct)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
