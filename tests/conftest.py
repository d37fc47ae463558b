"""Shared pytest fixtures: one local SparkSession for the whole run
(the reference's local-mock pattern, test_glue_job.ipynb cell 2d9f9cb1,
without any Glue dependency)."""

from __future__ import annotations

import os

import pytest

from ods_to_datalake_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="ods_to_datalake_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_configs={"spark.ui.enabled": "false"},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_CORRECT)
