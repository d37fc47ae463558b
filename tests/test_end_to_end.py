"""End-to-end lakehouse flow: flagship pipeline → JSON document sink →
read-back — the full ODS→data-lake story wired together, plus the
orchestrator driving real Spark jobs into real sinks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.orchestrate.runner import (
    ControlJob,
    run_priority_groups,
)
from ods_to_datalake_spark.plans.ordinary_payment import order_documents
from ods_to_datalake_spark.sources.writer import (
    write_json_documents,
    write_run_indexed,
)

SF = "/root/testdata/sf0.001"


def test_documents_to_json_lake_roundtrip(spark, tmp_path):
    path = str(tmp_path / "doclake")
    docs = order_documents(spark, SF)
    write_json_documents(docs, path, target_files=2)

    back = spark.read.json(path)
    assert back.count() == docs.count() == 1500
    # ids survive the round trip and stay content-addressed
    orig = {r.o_orderkey: r.id for r in docs.select("o_orderkey", "id").collect()}
    readback = {r.o_orderkey: r.id for r in back.select("o_orderkey", "id").collect()}
    assert orig == readback
    # nested periods survived as structured JSON, not strings
    row = back.filter(F.col("n_periods") > 0).first()
    assert row.periods[0].quantity is not None


def test_orchestrator_runs_real_spark_jobs(spark, tmp_path):
    """O1-O5 integration: priority-grouped jobs each write a run-indexed
    dataset; a poisoned job is isolated; outputs are all readable."""
    cat = load_testdata(spark, SF)
    out = {t: str(tmp_path / t) for t in ("region", "nation", "customer")}

    def run(job: ControlJob):
        if job.target_table == "poison":
            raise RuntimeError("bad source")
        df = cat.table(job.target_table)
        write_run_indexed(df, out[job.target_table], "20260123", 1)
        return df.count()

    jobs = [
        ControlJob(1, "region", 1, False),
        ControlJob(2, "nation", 2, True),
        ControlJob(3, "customer", 2, True),
        ControlJob(4, "poison", 2, True),
    ]
    report = run_priority_groups(jobs, run, max_workers=3, spark=spark)
    assert [r.job.target_table for r in report.failed] == ["poison"]
    counts = {
        r.job.target_table: r.result for r in report.results if r.ok
    }
    assert counts == {"region": 5, "nation": 25, "customer": 150}
    for t, path in out.items():
        assert spark.read.parquet(path).count() == counts[t]
