"""Null-injected parity: deterministic nulls in VALUE columns (keys and
ordering columns stay non-null) — verifies the null-policy paths of the
relational suite against the oracles, where engine null semantics
genuinely differ (Spark CONCAT nulls the result, SQL CONCAT skips it;
sum/avg skip nulls in both)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import TESTDATA_TABLES, load_testdata
from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

QUERIES = load_all()

# value columns to null out (deterministically, ~1 in 7 rows)
NULL_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag"],
    "orders": ["o_totalprice", "o_orderpriority"],
    "customer": ["c_acctbal", "c_mktsegment"],
}

# relational queries whose null-value paths this exercises
NULL_QUERIES = [
    "a01_fold_sorted_array",
    "a02_document_fold",
    "a03_conditional_sum",
    "a04_pivot",
    "a06_rollup",
    "a07_distinct_agg",
    "a08_two_phase_agg",
    "a09_percentiles",
    "j02_left_attach_preagg",
    "q01_pricing_summary",
    "q06_revenue_forecast",
    "q18_large_orders",
    "t02_top_k_per_group",
    "w01_sequence",
    "w05_running_total",
    "f08_case_decode",
    "p07_isin_filter",
    "p10_trim_compound_filter",
    "u01_set_ops",
]


@pytest.fixture(scope="module")
def nulls_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nulls")
    cat = load_testdata(spark, "/root/testdata/sf0.001")
    for t in TESTDATA_TABLES:
        df = cat.table(t)
        for i, c in enumerate(NULL_COLS.get(t, [])):
            key = df.columns[0]
            df = df.withColumn(
                c,
                F.when(
                    F.pmod(F.col(key) + F.lit(i), F.lit(7)) == 0,
                    F.lit(None),
                ).otherwise(F.col(c)),
            )
        df.coalesce(1).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def nulls_con(nulls_dir):
    con = duckdb_conn(nulls_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", NULL_QUERIES)
def test_query_on_null_values(spark, nulls_dir, nulls_con, name):
    q = QUERIES[name]
    report = compare(q.fn(spark, nulls_dir), nulls_con, q.oracle)
    assert report["match"], f"{name}: {report}"
