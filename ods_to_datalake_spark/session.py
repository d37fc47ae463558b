"""SparkSession factory with scale-oriented defaults.

The reference creates sessions via AWS Glue (`pyspark_add_index_on_s3.py:9-12`)
or a local mock (`test_glue_job.ipynb` cell 2d9f9cb1). We keep a plain
SparkSession factory — no Glue dependency — with configs chosen for the
100-TB design point (AQE, adaptive partition coalescing, skew-join handling,
bounded output file sizes per `all_from_gemini.txt:322-368` guidance).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Writer policy from the reference design notes: ~2M rows per file keeps
# snappy parquet files in the 100-300MB sweet spot (links.txt:56-62,
# all_from_gemini.txt:322-340). Applied session-wide; writers may override.
DEFAULT_MAX_RECORDS_PER_FILE = 2_000_000

DEFAULT_CONFIGS: dict[str, str] = {
    # Adaptive query execution: runtime shuffle-partition coalescing,
    # skew-join splitting, and dynamic broadcast conversion. Essential at
    # scale, harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas-UDF path and toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bounded output file size (see module docstring).
    "spark.sql.files.maxRecordsPerFile": str(DEFAULT_MAX_RECORDS_PER_FILE),
    # Read-side split size: 128MB aligns with the parquet sweet spot.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Deterministic session timezone; the reference emits +07:00 wall-clock
    # strings (ibs_ordinary_payment_utilities.py:191-210) but stores real
    # timestamps naive — keep UTC so parquet timestamps round-trip stably.
    "spark.sql.session.timeZone": "UTC",
    # The document-fold aggregations (collect_list of wide structs) run on
    # ObjectHashAggregate; keep its sort-based fallback at default but make
    # sure it is enabled.
    "spark.sql.execution.useObjectHashAggregateExec": "true",
    # FAIR scheduling so the orchestrator's concurrent driver threads
    # (orchestrate/runner.py O4 lane) share executors instead of FIFO
    # head-of-line blocking; pools are named per run via the local
    # property spark.scheduler.pool.
    "spark.scheduler.mode": "FAIR",
}


def build_session(
    app_name: str = "ods_to_datalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` with a pre-set master, or yarn/k8s via spark-submit.
    ``shuffle_partitions`` defaults to the local core count; on a cluster you
    want ~2-3× total executor cores, or rely on AQE coalescing from a high
    initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    configs = dict(DEFAULT_CONFIGS)
    configs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # Local mode: one JVM, give it headroom for the object-hash aggregates.
    if master.startswith("local"):
        configs.setdefault("spark.driver.memory", "8g")
    if extra_configs:
        configs.update(extra_configs)
    for k, v in configs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_session() -> SparkSession:
    """Return the active session, or build a default local one."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
