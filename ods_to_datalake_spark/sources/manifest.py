"""Manifest-committed partitioned datasets — crash-atomic
multi-partition mutations (VERDICT r6 item 2).

`overwrite_partitions` / `delete_keys` on a plain hive layout swap each
partition atomically but not the SET of partitions: a crash between two
partition swaps leaves readers a half-mutated table. This module
generalizes `compact_run_snapshot`'s stage-then-single-rename pattern
(sources/writer.py) into a tiny run-level manifest, giving the lake a
transactional layout without a table-format dependency:

    <path>/
      _manifests/manifest-00000003.json   # {"partitions": {value: version}}
      <pcol>=2024-01-01/v-<token>/part-*.parquet   # immutable data dirs
      <pcol>=2024-01-01/v-<older>/...              # prior version (vacuumable)

- Data dirs are IMMUTABLE and write-once; a mutation stages new version
  dirs (invisible to readers — nothing references them yet) and then
  publishes ONE new manifest file. The manifest file itself is written
  to a dot-tmp name and renamed into place, so the commit is a single
  atomic filesystem rename no matter how many partitions changed.
- Readers (`read_snapshot`) load exactly the (value → version) dirs the
  newest manifest lists. Every crash window leaves either the old
  manifest fully serving or the new one — never a mix. Historical
  manifests stay readable (`version=` time travel) until `vacuum`.
- Concurrency: single committer assumed (the reference runs mutations
  from the orchestrator's sequential lane — links.txt run protocol);
  manifest numbering would detect, not merge, a concurrent commit.

Scale: the manifest holds one (value, version) string pair per live
partition — KB-sized at thousands of partitions, read once per query on
the driver. Data files are never copied during commit: staging writes
them in their final location's parent and the commit is metadata-only.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _jp(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _unescape_hive(value: str) -> str:
    """Undo Spark's partition-directory escaping (%XX for the chars
    escapePathName reserves — ':', '%', ... ; non-ASCII passes through
    unescaped, so per-char decode is safe)."""
    import re as _re

    return _re.sub(
        r"%([0-9A-Fa-f]{2})",
        lambda m: chr(int(m.group(1), 16)),
        value,
    )


def _write_file_atomic(spark, directory: str, name: str, content: str):
    """Create ``directory/name`` atomically: write a dot-tmp sibling,
    close, then one rename. A crash mid-write leaves only the tmp
    (ignored by the reader's name filter); the rename either fully
    publishes or doesn't."""
    jvm, fs = _fs(spark, directory)
    fs.mkdirs(_jp(jvm, directory))
    tmp = f"{directory}/.tmp-{uuid.uuid4().hex}-{name}"
    out = fs.create(_jp(jvm, tmp), True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    dst = f"{directory}/{name}"
    if not fs.rename(_jp(jvm, tmp), _jp(jvm, dst)):
        fs.delete(_jp(jvm, tmp), False)
        raise OSError(f"manifest commit rename failed: {tmp} -> {dst}")


def _read_file(spark, path: str) -> str:
    jvm, fs = _fs(spark, path)
    stream = fs.open(_jp(jvm, path))
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def list_manifest_versions(spark: SparkSession, path: str) -> list[int]:
    import re

    jvm, fs = _fs(spark, path)
    mdir = _jp(jvm, f"{path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        m = re.fullmatch(r"manifest-(\d+)\.json", st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_manifest(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    versions = list_manifest_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no manifests under {path}/{MANIFEST_DIR}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"no manifest version {v} under {path}")
    return json.loads(
        _read_file(spark, f"{path}/{MANIFEST_DIR}/manifest-{v:08d}.json")
    )


def _commit(spark, path: str, manifest: dict) -> int:
    versions = list_manifest_versions(spark, path)
    next_v = (versions[-1] + 1) if versions else 1
    manifest = dict(manifest, version=next_v)
    _write_file_atomic(
        spark,
        f"{path}/{MANIFEST_DIR}",
        f"manifest-{next_v:08d}.json",
        json.dumps(manifest, sort_keys=True, indent=1),
    )
    return next_v


def _stage_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
    max_records_per_file: int,
    compression: str,
) -> dict[str, str]:
    """Write one NEW immutable version dir per partition value in `df`;
    returns {value: version_token}. Nothing references these dirs until
    the caller commits a manifest, so a crash here is invisible to
    readers (vacuum reclaims orphans)."""
    spark = df.sparkSession
    token = f"v-{uuid.uuid4().hex}"
    staging = f"{path}/_staging/{token}"
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(staging)
    )
    jvm, fs = _fs(spark, path)
    staged: dict[str, str] = {}
    for st in fs.listStatus(_jp(jvm, staging)):
        name = st.getPath().getName()
        if not name.startswith(f"{partition_col}="):
            continue
        value = name.split("=", 1)[1]
        final_parent = f"{path}/{name}"
        fs.mkdirs(_jp(jvm, final_parent))
        dst = f"{final_parent}/{token}"
        if not fs.rename(st.getPath(), _jp(jvm, dst)):
            raise OSError(f"staging move failed: {name} -> {dst}")
        staged[value] = token
    fs.delete(_jp(jvm, staging), True)
    return staged


def write_manifested(
    df: DataFrame,
    path: str,
    partition_col: str,
    max_records_per_file: int = 1_000_000,
    compression: str = "snappy",
) -> int:
    """Full-table commit: stage every partition of `df`, publish a
    manifest listing exactly those versions. Prior snapshot (if any)
    stays readable via `version=` until vacuumed. Returns the new
    manifest version."""
    staged = _stage_partitions(
        df, path, partition_col, max_records_per_file, compression
    )
    return _commit(
        df.sparkSession,
        path,
        {
            "partition_col": partition_col,
            "partition_type": df.schema[
                partition_col
            ].dataType.simpleString(),
            "partitions": staged,
        },
    )


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    raw_col: str | None = None,
) -> DataFrame:
    """Read the manifest-listed snapshot: exactly the committed
    (value → version) dirs, with the partition column restored from
    the manifest — Hive-UNESCAPED ('%3A' → ':') and cast back to the
    dtype recorded at write time, so a timestamp/int partition column
    round-trips with its original type and value; the NULL partition
    (``__HIVE_DEFAULT_PARTITION__``) restores as NULL. ``raw_col``
    optionally attaches the raw directory value — the key the
    manifest bookkeeping (delete/overwrite) must use, since logical
    values re-escape on restage.

    Uncommitted data is unreachable on purpose: only the listed
    (value → version) dirs are read, never discovered."""
    man = read_manifest(spark, path, version)
    pcol = man["partition_col"]
    ptype = man.get("partition_type", "string")
    parts = man["partitions"]
    if not parts:
        raise FileNotFoundError(f"manifest lists no partitions for {path}")
    frames = []
    for value, token in sorted(parts.items()):
        logical = (
            None
            if value == HIVE_DEFAULT_PARTITION
            else _unescape_hive(value)
        )
        df = spark.read.parquet(
            f"{path}/{pcol}={value}/{token}"
        ).withColumn(pcol, F.lit(logical).cast(ptype))
        if raw_col is not None:
            df = df.withColumn(raw_col, F.lit(value))
        frames.append(df)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def overwrite_partitions_atomic(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
    compression: str = "snappy",
) -> int:
    """Replace ONLY the partitions present in `df` — the crash-atomic
    successor of `writer.overwrite_partitions`: all affected partitions
    flip to their new version in ONE manifest rename, untouched
    partitions keep their committed version. Returns the new manifest
    version."""
    spark = df.sparkSession
    man = read_manifest(spark, path)
    pcol = man["partition_col"]
    ptype = man.get("partition_type", "string")
    if pcol not in df.columns:
        raise ValueError(f"df lacks partition column {pcol!r}")
    got = df.schema[pcol].dataType.simpleString()
    if got != ptype:
        raise ValueError(
            f"partition dtype drift: table has {ptype}, df has {got}"
        )
    staged = _stage_partitions(
        df, path, pcol, max_records_per_file, compression
    )
    merged = dict(man["partitions"])
    merged.update(staged)
    return _commit(
        spark,
        path,
        {
            "partition_col": pcol,
            "partition_type": ptype,
            "partitions": merged,
        },
    )


def delete_keys_atomic(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str,
    max_records_per_file: int = 1_000_000,
    compression: str = "snappy",
) -> int:
    """Crash-atomic GDPR delete: rewrite only the partitions containing
    doomed keys (broadcast semi-join finds them, partition-pruned read
    feeds the anti-join — same pruning story as `writer.delete_keys`),
    then flip every affected partition, INCLUDING ones emptied
    entirely, in one manifest commit. Returns the number of partitions
    rewritten (0 = no commit made)."""
    man = read_manifest(spark, path)
    pcol = man["partition_col"]
    # bookkeeping runs on the RAW directory value (`raw_col`): the
    # restored logical column re-escapes on restage, so popping /
    # filtering by it would desync manifest keys on any partition
    # value Hive escapes (':', '%', ...)
    snap = read_snapshot(spark, path, raw_col="__pdir")
    kdf = F.broadcast(keys.select(F.col(key_col).alias("__doomed")))
    affected = [
        r[0]
        for r in snap.join(kdf, snap[key_col] == F.col("__doomed"), "left_semi")
        .select("__pdir")
        .distinct()
        .collect()
    ]
    if not affected:
        return 0
    slice_df = snap.filter(F.col("__pdir").isin(affected))
    kept = slice_df.join(
        kdf, slice_df[key_col] == F.col("__doomed"), "left_anti"
    ).drop("__pdir")
    staged = _stage_partitions(
        kept, path, pcol, max_records_per_file, compression
    )
    merged = dict(man["partitions"])
    for value in affected:
        # a partition whose every row was doomed stages nothing —
        # removing its manifest entry IS its (atomic) deletion
        merged.pop(value, None)
    merged.update(staged)
    _commit(
        spark,
        path,
        {
            "partition_col": pcol,
            "partition_type": man.get("partition_type", "string"),
            "partitions": merged,
        },
    )
    return len(affected)


def vacuum(
    spark: SparkSession, path: str, keep_manifests: int = 1
) -> list[str]:
    """Reclaim data dirs unreferenced by the ``keep_manifests`` newest
    manifests (old snapshot versions, crashed staging leftovers) and
    retire older manifest files. Runs AFTER commits, never during:
    everything it deletes is unreachable from every kept manifest, so a
    reader pinned to a kept version is never broken. Returns deleted
    paths."""
    if keep_manifests < 1:
        raise ValueError("keep_manifests must be >= 1")
    versions = list_manifest_versions(spark, path)
    if not versions:
        return []
    kept_versions = versions[-keep_manifests:]
    live: set[tuple[str, str]] = set()
    pcol = None
    for v in kept_versions:
        man = read_manifest(spark, path, v)
        pcol = man["partition_col"]
        live.update(man["partitions"].items())
    jvm, fs = _fs(spark, path)
    deleted: list[str] = []
    staging = _jp(jvm, f"{path}/_staging")
    if fs.exists(staging):
        fs.delete(staging, True)
        deleted.append(f"{path}/_staging")
    for st in fs.listStatus(_jp(jvm, path)):
        name = st.getPath().getName()
        if not name.startswith(f"{pcol}="):
            continue
        value = name.split("=", 1)[1]
        for vd in fs.listStatus(st.getPath()):
            token = vd.getPath().getName()
            if (value, token) not in live:
                fs.delete(vd.getPath(), True)
                deleted.append(f"{path}/{name}/{token}")
        if not fs.listStatus(st.getPath()):  # no live version left
            fs.delete(st.getPath(), True)
    for v in versions[:-keep_manifests]:
        fs.delete(
            _jp(jvm, f"{path}/{MANIFEST_DIR}/manifest-{v:08d}.json"), False
        )
        deleted.append(f"{path}/{MANIFEST_DIR}/manifest-{v:08d}.json")
    return deleted
