"""Streaming CDC upserts: maintain a row-level snapshot from a change
stream — the streaming face of `operators/cdc.cdc_apply` (u06).

Layout: ``state_dir/snapshot=<batch_id>/`` — each micro-batch applies
its changes to the latest PRIOR snapshot and writes a complete new
snapshot partition:

- **replay-idempotent by construction**: prior = newest committed
  snapshot with batch id **strictly below** the current one, so a
  redelivered batch re-reads the same input (still on disk) and
  overwrites its own partition with identical rows — the same
  layout-level idempotence as `ingest._batch_overwrite`, extended to a
  read-modify-write state;
- **crash-safe**: a snapshot dir without ``_SUCCESS`` (crash
  mid-write) is ignored by the readers and the prior-selection, and
  the replay overwrites it;
- **time travel for free**: every batch's snapshot stays readable
  (`read_cdc_snapshot`) until `prune_cdc_snapshots` retires it — the
  run-index pattern (O5) with the batch id as the run.

Scale: each batch rewrites the whole snapshot — the dimension /
control-table pattern (the reference syncs ODS tables by full
overwrite, ibs_ordinary_payment_utilities.py's flow; this is that sync
done incrementally and versioned). For a fact-sized table, partition
the snapshot and flip only touched partitions via
`sources/manifest.overwrite_partitions_atomic` instead — the change
batch names its touched keys, so the rewrite prunes exactly like
`writer.delete_keys`.

No eager-checkpoint hazard: the batch reads ``snapshot=<prior>`` and
writes ``snapshot=<current>`` — never the directory it appends to
(contrast the admission sinks' rule in CLAUDE.md).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ods_to_datalake_spark.operators.cdc import cdc_apply
from ods_to_datalake_spark.sources.manifest import _fs  # shared FS
# acquisition — one Hadoop-FS boilerplate for the whole lake layer

SNAP_COL = "snapshot"
_SNAP_RE = re.compile(rf"{SNAP_COL}=(\d+)$")


def list_cdc_snapshots(spark: SparkSession, state_dir: str) -> list[int]:
    """Committed (``_SUCCESS``-marked) snapshot batch ids, ascending."""
    jvm, fs = _fs(spark, state_dir)
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        m = _SNAP_RE.search(st.getPath().getName())
        if (
            m
            and st.isDirectory()
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            )
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def read_cdc_snapshot(
    spark: SparkSession,
    state_dir: str,
    batch_id: int | None = None,
    before: int | None = None,
) -> DataFrame | None:
    """Read a maintained snapshot: the newest committed one by default,
    a specific ``batch_id``, or the newest strictly below ``before``
    (the prior-selection the sink itself uses). Returns None when no
    committed snapshot qualifies."""
    snaps = list_cdc_snapshots(spark, state_dir)
    if batch_id is not None:
        if batch_id not in snaps:
            raise FileNotFoundError(
                f"no committed snapshot {batch_id} under {state_dir}"
            )
        chosen = batch_id
    else:
        if before is not None:
            snaps = [s for s in snaps if s < before]
        if not snaps:
            return None
        chosen = snaps[-1]
    return spark.read.parquet(f"{state_dir}/{SNAP_COL}={chosen}")


def cdc_upsert_sink(
    state_dir: str,
    keys: list[str],
    op_col: str = "op",
    version_col: str | None = None,
):
    """foreachBatch sink: apply each change micro-batch to the latest
    prior snapshot and write the result as ``snapshot=<batch_id>``.
    The first batch bootstraps from an empty snapshot (pure-insert
    batch). See the module docstring for the idempotence/crash
    contract."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        data_cols = [
            c
            for c in batch_df.columns
            if c not in (op_col, version_col)
        ]
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:
            prior = spark.createDataFrame(
                [], batch_df.select(*data_cols).schema
            )
        snap = cdc_apply(
            prior, batch_df, keys, op_col=op_col, version_col=version_col
        )
        snap.write.mode("overwrite").parquet(
            f"{state_dir}/{SNAP_COL}={batch_id}"
        )

    return sink


def materialized_join_sink(
    state_dir: str,
    keys: list[str],
    dim: DataFrame,
    dim_keys: list[str],
    op_col: str = "op",
    version_col: str | None = None,
):
    """foreachBatch sink maintaining a MATERIALIZED fact ⋈ dim join
    from a fact-side change stream — the streaming face of
    `operators/incremental.cdc_maintain_join` (u09), under the same
    ``snapshot=<batch_id>`` layout/idempotence contract as
    `cdc_upsert_sink`: each batch pays one touched-keys anti-join
    against the prior join snapshot plus the change batch against the
    (broadcast) dimension — the materialized join is never re-joined.
    The dimension is fixed for the stream's lifetime (a dim-side
    change is a rebuild, not a micro-batch)."""
    from ods_to_datalake_spark.operators.incremental import (
        cdc_maintain_join,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        data_cols = [
            c
            for c in batch_df.columns
            if c not in (op_col, version_col)
        ]
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:  # bootstrap: empty join, joined schema
            prior = batch_df.select(*data_cols).limit(0).join(
                dim, dim_keys
            )
        snap = cdc_maintain_join(
            prior,
            batch_df,
            keys,
            dim,
            dim_keys,
            op_col=op_col,
            version_col=version_col,
        )
        snap.write.mode("overwrite").parquet(
            f"{state_dir}/{SNAP_COL}={batch_id}"
        )

    return sink


def maintain_cdc_snapshot(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str = "op",
    version_col: str | None = None,
):
    """Attach the CDC upsert sink to a change stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            cdc_upsert_sink(
                state_dir, keys, op_col=op_col, version_col=version_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def prune_cdc_snapshots(
    spark: SparkSession, state_dir: str, keep_last: int
) -> list[int]:
    """Retention: delete all but the newest ``keep_last`` committed
    snapshots (plus any uncommitted crash leftovers older than the
    newest kept one); returns pruned batch ids. ``keep_last`` >= 1 —
    the serving snapshot is not deletable, and the prior-selection of
    a replayed batch id older than the retention window is explicitly
    out of contract (checkpointed streams never replay that far back:
    only the LAST batch can redeliver)."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    snaps = list_cdc_snapshots(spark, state_dir)
    doomed = set(snaps[:-keep_last] if keep_last < len(snaps) else [])
    jvm, fs = _fs(spark, state_dir)
    if snaps:
        # uncommitted (no _SUCCESS) crash leftovers strictly below the
        # newest COMMITTED snapshot can never be completed by a replay
        # (foreachBatch only redelivers the last batch id) — reclaim
        # them too, as documented
        newest = snaps[-1]
        root = jvm.org.apache.hadoop.fs.Path(state_dir)
        for st in fs.listStatus(root):
            m = _SNAP_RE.search(st.getPath().getName())
            if not m or not st.isDirectory():
                continue
            b = int(m.group(1))
            if b < newest and b not in snaps:
                doomed.add(b)
    for b in sorted(doomed):
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                f"{state_dir}/{SNAP_COL}={b}"
            ),
            True,
        )
    return sorted(doomed)
