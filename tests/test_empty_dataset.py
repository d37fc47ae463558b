"""Degenerate-input robustness: every suite query must run (and agree
with its oracle) over schema-correct EMPTY tables — folds, windows,
joins, LSH, and ANN all have zero-row paths that production backfills
hit on day one."""

from __future__ import annotations

import pytest

from ods_to_datalake_spark.catalog import TESTDATA_TABLES
from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

QUERIES = load_all()


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    from ods_to_datalake_spark.catalog import load_testdata

    d = tmp_path_factory.mktemp("empty")
    cat = load_testdata(spark, "/root/testdata/sf0.001")  # handles nanos ts
    for t in TESTDATA_TABLES:
        cat.table(t).limit(0).coalesce(1).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb_conn(empty_dir)
    yield con
    con.close()


# Known engine divergence: the SQL standard (and DuckDB) emit the
# grand-total grouping-set row even for EMPTY input (count=0); Spark's
# rollup/cube emit zero rows on empty input. Irrelevant on any non-empty
# table (zero-row cells never materialize), so the correctness gate at
# sf>0 is unaffected — documented here rather than papered over.
GROUPING_SET_EMPTY_DIVERGENCE = {
    "a06_rollup",
    "u02_intersect_cube",
    "a10_grouping_sets",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_on_empty_tables(spark, empty_dir, empty_con, name):
    if name in GROUPING_SET_EMPTY_DIVERGENCE:
        pytest.xfail(
            "Spark emits no grand-total row for grouping sets on empty "
            "input; DuckDB follows the SQL standard and emits one"
        )
    q = QUERIES[name]
    df = q.fn(spark, empty_dir)
    if q.oracle:
        report = compare(df, empty_con, q.oracle)
        assert report["match"], f"{name}: {report}"
    else:
        assert df.count() == 0
