"""Schema-pinned readers (SURVEY §1.3: schemas inferred at the edges in
the reference, explicitly pinned in the engine) + run-index dataset
helpers (the read side of O5).

Readers never infer on production paths: inference costs an extra pass
at scale and silently drifts types. Every reader takes a DDL/StructType
contract; `mode` picks the bad-record policy (FAILFAST for gated loads,
PERMISSIVE + corrupt-record column for exploratory ones).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    return (
        spark.read.schema(schema).options(mode=mode, **options).json(path)
    )


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Parquet carries its own schema; an optional contract is enforced
    by selection+cast (so surplus columns are pruned at the scan and
    missing ones fail loudly). Reader options pass through — e.g.
    ``mergeSchema="true"`` for datasets with additive schema evolution,
    where a plain read resolves columns from whichever file footer wins
    and can silently miss late-added columns."""
    return _enforce_contract(
        spark.read.options(**options).parquet(path), schema
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """ORC twin of `read_parquet` (self-describing columnar format with
    stats-based pushdown) — same optional schema contract."""
    return _enforce_contract(spark.read.options(**options).orc(path), schema)


def _enforce_contract(
    df: DataFrame, schema: T.StructType | str | None
) -> DataFrame:
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema]
        )
    return df


_RUN_PART = re.compile(r"^([\w.-]+)=(\d{4}-\d{2}-\d{2})_(\d+)$")


def list_run_indexes(path: str) -> list[tuple[str, int]]:
    """(date, run_index) pairs present in a run-indexed dataset, sorted."""
    out = []
    for name in os.listdir(path):
        m = _RUN_PART.match(name)
        if m:
            out.append((m.group(2), int(m.group(3))))
    return sorted(out)


def read_latest_run(
    spark: SparkSession,
    path: str,
    partition_col: str = "transactiondate_index",
) -> DataFrame:
    """Read ONLY the newest (date, run) partition — partition pruning
    makes this a single-directory scan regardless of dataset size; the
    rerun-appends-new-partition layout (O5) makes it the 'current
    snapshot' read."""
    runs = list_run_indexes(path)
    if not runs:
        raise FileNotFoundError(f"no run-indexed partitions under {path}")
    date, idx = runs[-1]
    return spark.read.parquet(path).filter(
        F.col(partition_col) == f"{date}_{idx}"
    )


def read_run(
    spark: SparkSession,
    path: str,
    date: str,
    run_index: int,
    partition_col: str = "transactiondate_index",
) -> DataFrame:
    """Snapshot time travel: read one SPECIFIC historical (date, run)
    partition. The run-index layout (O5) never overwrites, so every
    past snapshot stays readable — table-format time travel without a
    table format. Fails fast if the snapshot doesn't exist (a typo'd
    date would otherwise return an empty frame and flow downstream)."""
    if (date, run_index) not in list_run_indexes(path):
        raise FileNotFoundError(
            f"no partition {partition_col}={date}_{run_index} under {path}"
        )
    return spark.read.parquet(path).filter(
        F.col(partition_col) == f"{date}_{run_index}"
    )


def read_text_documents(
    spark: SparkSession,
    path: str,
    whole_files: bool = True,
    **options,
) -> DataFrame:
    """(doc_path, text, doc_id): raw text files as a documents table —
    the ingestion edge of the text-curation operators (one row per
    FILE with ``whole_files``, one row per LINE without).

    doc_id is the md5 of the content (same content-hash identity as
    `nest.doc_id` / `dedup.exact_dedup`), so re-ingesting an identical
    file is idempotent under the exact-dedup tier regardless of its
    path; doc_path carries provenance via the scan-native
    `input_file_name` (no directory listing round-trip).

    Scale note: ``whole_files`` makes a file the unit of parallelism —
    fine for web-page/document corpora (KB-MB files), wrong for
    multi-GB archives, which should be split line-wise (the default
    text source splits on newlines and parallelizes by block).
    """
    # NB: the whole-file switch only works as the .text() kwarg — the
    # .option("wholetext", ...) string form is silently ignored in
    # Spark 4 (measured: still splits on newlines)
    df = spark.read.options(**options).text(path, wholetext=whole_files)
    return df.select(
        F.input_file_name().alias("doc_path"),
        F.col("value").alias("text"),
        F.md5(F.col("value")).alias("doc_id"),
    )
