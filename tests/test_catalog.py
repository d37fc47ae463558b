"""Catalog + nest roundtrip tests: resolution precedence, nanos fixup,
and fold→unnest returning the original rows exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import Catalog, load_testdata
from ods_to_datalake_spark.operators.nest import fold_to_array, unnest_array

SF = "/root/testdata/sf0.001"


def test_catalog_resolution_precedence(spark):
    cat = Catalog(spark, base_dir=SF)
    # parquet-dir resolution
    assert cat.table("region").count() == 5
    # explicit registration wins over the parquet file
    override = spark.createDataFrame([(99, "X")], "r_regionkey int, r_name string")
    cat.register("region", override)
    assert cat.table("region").count() == 1


def test_catalog_nanos_fixup(spark):
    events = load_testdata(spark, SF).table("events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    # values are sane (year 2024, not 1970 — i.e. unit conversion right)
    years = events.select(F.year("ts").alias("y")).distinct().collect()
    assert {r.y for r in years} == {2024}


def test_fold_unnest_roundtrip(spark):
    li = load_testdata(spark, SF).table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    folded = fold_to_array(
        li,
        ["l_orderkey"],
        [
            F.col("l_linenumber").alias("l_linenumber"),
            F.col("l_quantity").alias("l_quantity"),
            F.col("l_returnflag").alias("l_returnflag"),
        ],
        out_col="items",
    )
    back = unnest_array(folded, "items")
    orig = sorted(tuple(r) for r in li.collect())
    round_tripped = sorted(
        tuple(r) for r in back.select(*li.columns).collect()
    )
    assert round_tripped == orig  # fold → unnest is lossless


def test_unnest_with_position_matches_sort_order(spark):
    df = spark.createDataFrame(
        [("g", "b", 2), ("g", "a", 1), ("g", "c", 3)], "k string, s string, v int"
    )
    folded = fold_to_array(df, ["k"], ["s", "v"], out_col="arr")
    rows = unnest_array(folded, "arr", with_position=True).collect()
    assert [(r.pos, r.s) for r in sorted(rows, key=lambda r: r.pos)] == [
        (0, "a"), (1, "b"), (2, "c")
    ]


def test_persist_external_table(spark, tmp_path):
    """persist_external publishes a written dataset to the metastore:
    plain spark.table() sees it (partition metadata repaired — a
    partitioned external table is silently EMPTY otherwise), and
    dropping it never deletes the data files."""
    import glob

    from ods_to_datalake_spark.catalog import Catalog
    from ods_to_datalake_spark.sources.writer import (
        write_partitioned_parquet,
    )

    path = str(tmp_path / "pub")
    df = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3)], "d string, v int"
    )
    write_partitioned_parquet(df, path, partition_by=["d"])
    cat = Catalog(spark)
    cat.persist_external("published_t", path)
    t = spark.table("published_t")
    assert t.count() == 3  # MSCK ran: partitions visible
    assert t.filter(F.col("d") == "d1").count() == 2
    n_files = len(glob.glob(f"{path}/*/*.parquet"))
    spark.sql("DROP TABLE published_t")
    assert len(glob.glob(f"{path}/*/*.parquet")) == n_files  # data kept


def test_qualified_namespace_resolution(spark, tmp_path):
    """Two-level `database.table` names (the reference reads
    `processing_ibs.<table>`, ibs_ordinary_payment_utilities.py:25-26)
    fall through Catalog.table to spark.table and resolve through the
    metastore database."""
    from ods_to_datalake_spark.catalog import Catalog

    spark.sql("CREATE DATABASE IF NOT EXISTS processing_ibs")
    try:
        df = spark.createDataFrame(
            [("J1", "05"), ("J2", "99")], "job_id string, channel string"
        )
        df.write.mode("overwrite").saveAsTable("processing_ibs.ctl_jobs")
        cat = Catalog(spark, base_dir=str(tmp_path))  # dir has no such file
        got = cat.table("processing_ibs.ctl_jobs")
        assert sorted(r.job_id for r in got.collect()) == ["J1", "J2"]
        # registered in-memory frames still win over the metastore
        override = spark.createDataFrame([("J9", "01")], df.schema)
        cat.register("processing_ibs.ctl_jobs", override)
        assert cat.table("processing_ibs.ctl_jobs").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS processing_ibs.ctl_jobs")
        spark.sql("DROP DATABASE IF EXISTS processing_ibs")


@pytest.mark.parametrize("flavor", ["ns", "ns_ltz", "us_ntz", "us_ltz", "ms_ntz", "int96"])
def test_catalog_timestamp_physicality_matrix(spark, tmp_path, flavor):
    """Whatever parquet timestamp flavor a producer writes — NANOS,
    naive micros/millis (NTZ), or instant-adjusted micros — the catalog
    surfaces the SAME session-TZ TimestampType with the same values.
    (Round 3 broke when the testdata regenerated from nanos to
    micros-NTZ; this pins the whole matrix so the next writer change is
    a no-op.)"""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    want = [
        datetime.datetime(2024, 3, 1, 12, 0, 5),
        datetime.datetime(2024, 3, 2, 23, 59, 59),
    ]
    typ = {
        "ns": pa.timestamp("ns"),
        "ns_ltz": pa.timestamp("ns", tz="UTC"),  # adjusted nanos: longified too
        "us_ntz": pa.timestamp("us"),
        "us_ltz": pa.timestamp("us", tz="UTC"),
        "ms_ntz": pa.timestamp("ms"),
        "int96": pa.timestamp("ns"),  # physical INT96, the Spark writer default
    }[flavor]
    table = pa.table({"id": [1, 2], "ts": pa.array(want, type=typ)})
    path = str(tmp_path / "tbl.parquet")
    pq.write_table(
        table,
        path,
        version="2.6",
        coerce_timestamps=None,
        use_deprecated_int96_timestamps=(flavor == "int96"),
    )

    got = Catalog(spark, base_dir=str(tmp_path)).table("tbl")
    assert dict(got.dtypes)["ts"] == "timestamp", flavor
    vals = sorted(r.ts for r in got.collect())
    assert vals == want, flavor


def test_parquet_footer_schema_cache(tmp_path, monkeypatch):
    """Footer reads are cached on the file's stat signature: repeated
    table resolutions cost zero I/O, a rewritten file (the driver
    regenerates testdata between rounds) misses the cache and re-reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ods_to_datalake_spark import parquet_meta

    path = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2]}), str(path))

    calls = {"n": 0}
    real = pq.read_schema

    def counting(p, *a, **k):
        calls["n"] += 1
        return real(p, *a, **k)

    monkeypatch.setattr(pq, "read_schema", counting)
    s1 = parquet_meta.read_schema_cached(str(path))
    s2 = parquet_meta.read_schema_cached(str(path))
    assert calls["n"] == 1 and s1 is s2

    # rewrite with a different schema → stat signature changes → re-read
    import os
    import time

    pq.write_table(pa.table({"a": [1], "b": ["x"]}), str(path))
    os.utime(path, ns=(time.time_ns(), time.time_ns()))
    s3 = parquet_meta.read_schema_cached(str(path))
    assert calls["n"] == 2 and "b" in s3.names

    with pytest.raises(FileNotFoundError):
        parquet_meta.read_schema_cached(str(tmp_path / "missing.parquet"))
