"""Lakehouse writers: partition layout + file-size policy (SURVEY §2.1
S3/S4/S6, §2.10 O5, §4).

Policies encoded from the reference design notes:
- snappy parquet, target file size 128-512 MB via a row cap
  (`maxRecordsPerFile = 2_000_000`, links.txt:56-62,
  all_from_gemini.txt:322-368);
- run-indexed hive partitions `<col>=<yyyy-MM-dd>_<run>` appended per
  run so reruns land in a NEW partition instead of overwriting
  (pyspark_add_index_on_s3.py:31-57, all_from_gemini.txt:243-255);
- when a single output file is required, `repartition(1)` (shuffle-
  balanced) over `coalesce(1)` (single-worker OOM risk,
  all_from_gemini.txt:356-361);
- JSON document sink with a sha2 content-hash `id`
  (PMT_KAL_5776815_1_New.json:346).

At 100 TB you never write one file — `target_files` sizes the output by
partition count instead, and `maxRecordsPerFile` bounds stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_RECORDS_PER_FILE = 2_000_000


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    target_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """Hive-partitioned parquet append with bounded file sizes.

    ``target_files``: optional exact output-file count per write —
    implemented with `repartition(n)` (never `coalesce`, see module
    docstring). Leave None at scale and let AQE + the row cap govern.
    """
    _write_partitioned(
        df,
        path,
        "parquet",
        partition_by,
        mode,
        max_records_per_file,
        target_files,
        compression,
    )


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    target_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """ORC variant of `write_partitioned_parquet` — same layout and
    file-size policy for consumers standardized on ORC (Hive/Trino
    estates). Both formats carry column stats + predicate pushdown."""
    _write_partitioned(
        df,
        path,
        "orc",
        partition_by,
        mode,
        max_records_per_file,
        target_files,
        compression,
    )


def _write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_by: list[str] | None,
    mode: str,
    max_records_per_file: int,
    target_files: int | None,
    compression: str,
    cluster_by: list[str] | None = None,
) -> None:
    if cluster_by is not None:
        # range-partition + sort: each output file covers a disjoint
        # key range, so its parquet/orc min-max stats actually prune
        n = target_files or df.sparkSession.sparkContext.defaultParallelism
        df = df.repartitionByRange(
            n, *[F.col(c) for c in cluster_by]
        ).sortWithinPartitions(*cluster_by)
    elif target_files is not None:
        keys = [F.col(c) for c in (partition_by or [])]
        df = df.repartition(target_files, *keys) if keys else df.repartition(
            target_files
        )
    writer = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    mode: str = "append",
    target_files: int | None = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    compression: str = "snappy",
) -> None:
    """Clustered parquet: range-partition on `cluster_by` then sort
    within each output task, so every data file covers a DISJOINT key
    range and its row-group min/max statistics become selective.

    A random-order write gives every row group min≈global-min,
    max≈global-max — stats that prune nothing. Clustering is the
    data-skipping primitive under a non-partition predicate column
    (too high-cardinality to hive-partition by, e.g. timestamps or
    customer ids): the reader skips whole row groups / files whose
    range misses the filter. At 100 TB this is the second pruning
    axis after partition pruning.
    """
    _write_partitioned(
        df,
        path,
        "parquet",
        None,
        mode,
        max_records_per_file,
        target_files,
        compression,
        cluster_by=cluster_by,
    )


ZORDER_BITS = 12


def zorder_key(
    bucketed: list,  # list[Column] of non-negative bucket ids < 2^bits
    bits: int = ZORDER_BITS,
) -> "F.Column":
    """Morton (Z-order) interleave of per-column bucket ids: bit i of
    column j lands at position i·n + j. Disjoint target bits, so the
    terms combine by plain +. Pure codegen shifts/masks — no UDF.

    bits·n must fit a signed long: JVM shiftleft wraps the shift
    amount mod 64, so an out-of-range position would silently alias
    onto a low bit and scramble the sort key — raise instead."""
    n = len(bucketed)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: {bits} bits x {n} columns needs bit positions"
            f" beyond a signed long (max 63) — lower bits to {63 // n}"
        )
    out = F.lit(0).cast("long")
    for j, c in enumerate(bucketed):
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                i * n + j,
            )
    return out


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    ranges: dict[str, tuple[float, float]] | None = None,
    bits: int = ZORDER_BITS,
    mode: str = "append",
    target_files: int | None = None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    compression: str = "snappy",
) -> None:
    """Z-order clustered parquet: multi-column data skipping.

    `write_clustered_parquet` makes ONE column's file ranges disjoint;
    a filter on any other column still reads everything. Z-ordering
    sorts by the Morton interleave of the columns' bucket ids, so
    every file covers a small sub-range of EVERY z-column — min/max
    stats prune under predicates on any of them (the Delta/Iceberg
    OPTIMIZE ZORDER layout, built from plain Spark ops: bucket =
    integer grid cell, key = codegen bit-interleave, then the same
    range-partition + sort as clustering).

    ``ranges`` maps column → (lo, hi) numeric bounds for the fixed
    bucket grid (values clamp; NULLs land in bucket 0 — an explicit
    choice, since letting them ride greatest/least's NULL-skipping
    would silently co-locate them with the maximum values and widen
    those files' stat ranges); at 100 TB pass the known domain so the
    write is one pass. When omitted, one cheap min/max aggregate per
    call derives them (a map-side-combined 2·n-column scan). ``bits``
    auto-shrinks so the interleave fits a signed long (documented
    skipping-resolution tradeoff beyond 5 columns at the default 12).
    """
    cols = list(zorder_by)
    if not cols:
        raise ValueError("write_zordered_parquet: zorder_by is empty")
    bits = min(int(bits), 63 // len(cols))
    if ranges is None:
        row = df.agg(
            *[
                e
                for c in cols
                for e in (
                    F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"hi_{c}"),
                )
            ]
        ).collect()[0]
        ranges = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
        missing = [c for c in cols if ranges[c][0] is None]
        if missing:
            raise ValueError(
                "write_zordered_parquet: cannot derive z-order ranges "
                f"for {missing} (empty input or all-NULL column) — "
                "pass ranges= explicitly"
            )
    m = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo, hi = ranges[c]
        span = float(hi) - float(lo) or 1.0
        frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
        cell = F.floor(frac * (1 << bits)).cast("long")
        buckets.append(
            F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(
                F.greatest(F.lit(0), F.least(F.lit(m), cell))
            )
        )
    staged = df.withColumn("__z", zorder_key(buckets, bits))
    n = target_files or df.sparkSession.sparkContext.defaultParallelism
    out = (
        staged.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    (
        out.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def write_run_indexed(
    df: DataFrame,
    path: str,
    date_value: str,
    run_index: int,
    date_col: str | None = None,
    partition_col: str = "transactiondate_index",
    in_fmt: str = "yyyyMMdd",
    **kwargs,
) -> str:
    """Run-indexed partition write (O5): stamp or derive
    `<yyyy-MM-dd>_<run_index>` and append.

    Two variants from the reference: derive per-row from ``date_col``
    (pyspark_add_index_on_s3.py:31-41), or — when the run covers ONE
    logical date — precompute the literal on the driver (links.txt:22-50)
    which both constant-folds and fails fast on a bad date. We default to
    the driver-literal variant when ``date_col`` is None.

    Returns the partition value written.
    """
    from ods_to_datalake_spark.functions.timefmt import run_index_key

    if date_col is not None:
        out = df.withColumn(
            partition_col, run_index_key(date_col, run_index, in_fmt=in_fmt)
        )
        value = f"<derived per row from {date_col}>"
    else:
        # driver-side parse: ValueError here, not a task failure later
        import datetime

        parsed = datetime.datetime.strptime(date_value, "%Y%m%d").date()
        value = f"{parsed.isoformat()}_{run_index}"
        out = df.withColumn(partition_col, F.lit(value))
    write_partitioned_parquet(
        out, path, partition_by=[partition_col], **kwargs
    )
    return value


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
    compression: str = "snappy",
) -> None:
    """Selective partition overwrite: replace ONLY the partitions
    present in `df`, leave every other partition untouched (dynamic
    partition-overwrite mode) — the reprocess-one-date primitive when a
    true rewrite is wanted instead of the run-index append (O5).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .option("compression", compression)
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_dataset(
    spark,
    path: str,
    partition_by: list[str] | None = None,
    target_files_per_partition: int = 1,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> None:
    """Small-file compaction: rewrite a dataset with consolidated files.

    The reference's design notes quantify the small-file problem
    (~0.5-1 MB files → slow scans, all_from_gemini.txt:479-492); this is
    the maintenance job that fixes it: read → repartition per partition
    value → dynamic-overwrite in place. Row cap still bounds the upper
    end so compaction can't create unsplittable giants.
    """
    df = spark.read.parquet(path)
    keys = [F.col(c) for c in (partition_by or [])]
    if keys:
        df = df.repartition(target_files_per_partition, *keys)
        overwrite_partitions(
            df, path, partition_by, max_records_per_file=max_records_per_file
        )
    else:
        df = df.repartition(target_files_per_partition)
        # no partition columns: full rewrite via a staging subdir would
        # be needed for atomicity; local rewrite is acceptable here
        df.write.mode("overwrite").option(
            "maxRecordsPerFile", max_records_per_file
        ).parquet(path + "_compacted")


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Bucketed (hash-clustered) managed table for co-located joins.

    Two large fact tables bucketed by the same key with the same bucket
    count join WITHOUT a shuffle — the physical plan reads bucket i of
    both sides into the same task. At 100 TB this turns the recurring
    fact⋈fact join (payments⋈policy-master, orders⋈lineitem) from a
    full-network exchange per query into a local merge per query; the
    one-time bucketing write pays for itself after the first join.
    `sort_by` additionally pre-sorts within buckets so sort-merge joins
    skip their sort.

    On overwrite, an orphaned warehouse directory (location exists but
    the table is gone from the metastore — e.g. a deleted
    `metastore_db` with a surviving `spark-warehouse/`) is removed
    first; Spark otherwise fails with LOCATION_ALREADY_EXISTS. The
    cleanup resolves the table's real default location (database
    subdirectory, lowercased name) and only acts on local-filesystem
    warehouses — on hdfs://s3a:// an orphaned location still needs an
    out-of-band cleanup.
    """
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        _remove_orphaned_location(spark, table)
    writer = (
        df.write.mode(mode)
        .option("compression", compression)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table, format="parquet")


def _remove_orphaned_location(spark, table: str) -> None:
    """Delete the managed-table directory a dropped `table` would own.

    Layout (matching Spark's SessionCatalog defaults): the lowercased
    table name under `<warehouse>` for the `default` database, else
    under `<warehouse>/<db>.db/`. Only file:-scheme warehouses are
    touched (shutil cannot reach object stores, and silently "cleaning"
    nothing would mask the problem the caller is about to hit).
    """
    import shutil
    from urllib.parse import urlparse

    parts = table.lower().split(".")
    name = parts[-1]
    db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if warehouse.scheme not in ("", "file"):
        return
    base = warehouse.path
    location = (
        f"{base}/{name}" if db == "default" else f"{base}/{db}.db/{name}"
    )
    shutil.rmtree(location, ignore_errors=True)


def write_json_documents(
    df: DataFrame,
    path: str,
    id_cols: list[str] | None = None,
    mode: str = "append",
    target_files: int | None = None,
) -> None:
    """Nested-document JSON sink (S6) with a sha2 content-hash `id`.

    ``id_cols``: columns hashed into the document id (defaults to all
    columns). Decimal/struct canonicalization comes from Spark's
    `to_json`; ids are stable across runs for identical content.
    """
    if "id" not in df.columns:
        cols = id_cols or df.columns
        df = df.withColumn(
            "id", F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256)
        )
    if target_files is not None:
        df = df.repartition(target_files)
    df.write.mode(mode).json(path)


def delete_keys(
    spark,
    path: str,
    keys: DataFrame,
    key_col: str,
    partition_col: str,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> int:
    """Right-to-be-forgotten delete from a hive-partitioned dataset:
    rewrite ONLY the partitions that contain the doomed keys.

    Without a transactional table format, deletion is rewrite — the
    scalable version prunes the rewrite to affected partitions:
    1. semi-join the dataset against `keys` to find affected partition
       values (a broadcast when the key list is small — the usual
       GDPR case);
    2. read back just those partitions (partition pruning), anti-join
       out the doomed rows;
    3. dynamic-partition-overwrite them in place.
    A 100 TB lake with daily partitions rewrites only the days a user
    actually appears in, not the lake.

    Returns the number of partitions rewritten. Not atomic across
    partitions (each partition swap is); run from the orchestrator's
    sequential lane.
    """
    data = spark.read.parquet(path)
    kdf = F.broadcast(keys.select(F.col(key_col).alias("__doomed")))
    affected = [
        r[0]
        for r in data.join(
            kdf, data[key_col] == F.col("__doomed"), "left_semi"
        )
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return 0
    slice_df = data.filter(F.col(partition_col).isin(affected))
    kept = slice_df.join(
        kdf, slice_df[key_col] == F.col("__doomed"), "left_anti"
    )
    overwrite_partitions(
        kept,
        path,
        [partition_col],
        max_records_per_file=max_records_per_file,
    )
    return len(affected)


def compact_run_snapshot(
    spark,
    path: str,
    target_records: int = DEFAULT_MAX_RECORDS_PER_FILE,
    partition_col: str = "transactiondate_index",
) -> dict:
    """Small-file compaction for a run-indexed dataset — the nightly
    lakehouse maintenance job: rewrite the newest (date, run) snapshot
    as run+1 with ceil(rows/target_records) right-sized files. Readers
    (`read_latest_run`) switch to the compacted snapshot ATOMICALLY:
    the rewrite lands in a ``_``-prefixed temp dir (invisible to
    partition discovery), and the commit is ONE directory rename — a
    crash before it leaves the temp dir hidden and the old snapshot
    serving; a rerun simply overwrites the temp. Time travel keeps the
    uncompacted run until `prune_runs` retires it.

    This rounds out the write-policy story: `maxRecordsPerFile` bounds
    file size at write time, but a lake accumulates small files anyway
    (many small incremental runs, dynamic partition overwrites) — and
    at 100 TB the file count is a planning-time cost (listing, footer
    reads, task scheduling) that compaction pays down once per day.

    Returns {files_before, files_after, rows, snapshot}.
    """
    import math

    from ods_to_datalake_spark.sources.reader import list_run_indexes

    runs = list_run_indexes(path)
    if not runs:
        raise FileNotFoundError(f"no run-indexed partitions under {path}")
    date, idx = runs[-1]
    src = f"{path}/{partition_col}={date}_{idx}"
    df = spark.read.parquet(src)
    rows = df.count()
    n_files = max(1, math.ceil(rows / target_records))
    tmp = f"{path}/_compacting_{date}_{idx + 1}"
    df.repartition(n_files).write.mode("overwrite").option(
        "maxRecordsPerFile", target_records
    ).parquet(tmp)
    jvm = spark._jvm
    dst = f"{path}/{partition_col}={date}_{idx + 1}"
    jsrc = jvm.org.apache.hadoop.fs.Path(tmp)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    fs = jsrc.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.rename(jsrc, jdst):
        raise OSError(f"compaction commit rename failed: {tmp} -> {dst}")

    def _n_files(p):
        jp = jvm.org.apache.hadoop.fs.Path(p)
        return sum(
            1
            for st in fs.listStatus(jp)
            if st.getPath().getName().endswith(".parquet")
        )

    return {
        "files_before": _n_files(src),
        "files_after": _n_files(dst),
        "rows": rows,
        "snapshot": (date, idx + 1),
    }


def prune_runs(
    path: str,
    keep_last: int,
    partition_col: str = "transactiondate_index",
) -> list[tuple[str, int]]:
    """Retention for run-indexed datasets: delete every (date, run)
    snapshot partition except the newest ``keep_last``; returns the
    pruned (date, run) pairs. The run-index layout (O5) appends a new
    partition per rerun and never overwrites — time travel for free,
    but unbounded storage growth without this companion. Driver-side
    directory removal only (each snapshot is one partition directory);
    the data itself is never read. ``keep_last`` must be >= 1 — the
    current snapshot is not deletable retention.
    """
    import shutil

    from ods_to_datalake_spark.sources.reader import list_run_indexes

    import os

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    runs = list_run_indexes(path)
    doomed = runs[:-keep_last] if keep_last < len(runs) else []
    for date, idx in doomed:
        shutil.rmtree(
            os.path.join(path, f"{partition_col}={date}_{idx}")
        )
    return doomed
