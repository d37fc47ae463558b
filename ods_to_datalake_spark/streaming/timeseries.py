"""Streaming LOCF gap-fill: maintain the dense regular grid of
`operators/timeseries.gap_fill` (e11) from a micro-batched event
stream — the streaming face the time-series story was missing (e10 and
u09 got theirs in earlier rounds).

State is the per-key FRONTIER — (key, bucket, value) of the last
emitted grid row — kept under the same ``snapshot=<batch_id>`` layout
and idempotence/crash contract as `cdc_ingest` (prior = newest
committed snapshot strictly below the current batch id, so a replayed
batch re-reads the same frontier and overwrites its own partitions
with identical rows; a dir without ``_SUCCESS`` is invisible). Each
micro-batch:

1. resamples its events to (key, bucket, value) last-observations;
2. seeds the fill with the prior frontier (the carried value), emits
   the dense grid from ``frontier + 1 unit`` (or the key's first
   observed bucket) through the batch's last observed bucket — filled
   rows carry the frontier/last-observed value VERBATIM, the e11
   bit-stability rule;
3. writes the emitted rows to ``out_dir/snapshot=<batch_id>`` and the
   advanced frontier (unchanged keys carried along) to
   ``state_dir/snapshot=<batch_id>``.

Contract: the stream is event-time ordered and a grid bucket never
straddles two batches (a file-source replay of time-partitioned files,
the tests' shape — the usual cutoff discipline for any event-time fold
without a watermark). Observations at or before a key's frontier are
dropped: the frontier never rewinds, exactly as an already-published
grid row is immutable. Under that contract the union of all emitted
partitions is bit-identical to batch `gap_fill` over the full history.
Contract violations are OBSERVABLE, not silent: every dropped
observation lands in ``out_dir/rejected/snapshot=<batch_id>``
(`read_gap_fill_rejected`) — on an in-order stream a non-empty
rejected partition means a bucket straddled two batches.

Scale: per batch, state is one row per key (the frontier — bounded by
key cardinality, not history), the resample/spine/fill share one
partitioning by key (the e11 plan), and the emitted partition is only
the NEW grid rows. No eager-checkpoint hazard: the batch reads
``snapshot=<prior>`` and writes ``snapshot=<current>`` — never the
directory it appends to (the cdc_ingest rule, not the admission-sink
rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.timeseries import (
    _UNITS,
    resample_last,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
    read_cdc_snapshot,
)


def gap_fill_sink(
    state_dir: str,
    out_dir: str,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    tiebreak: str | None = None,
):
    """foreachBatch sink maintaining the dense LOCF grid — see the
    module docstring for the layout/idempotence contract."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    interval = _UNITS[unit]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        obs = resample_last(
            batch_df, key, ts_col, value_col, unit, tiebreak
        )
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:
            prior = obs.select(
                key, F.col("bucket"), F.col(value_col)
            ).limit(0)
        # the frontier never rewinds: late observations at or before
        # it are dropped (already-published grid rows are immutable).
        # Dropped observations are EVIDENCE, not noise: on an in-order
        # stream they mean a grid bucket straddled two micro-batches
        # (the module contract was violated) — side-output them so the
        # violation is observable instead of a silent batch/stream
        # divergence (r8 advice). One materialization feeds both the
        # kept and rejected branches (the x25 shared-frame rule).
        tagged = obs.join(
            prior.select(key, F.col("bucket").alias("__fb")),
            key,
            "left",
        ).localCheckpoint()
        rejected = tagged.filter(
            F.col("__fb").isNotNull()
            & (F.col("bucket") <= F.col("__fb"))
        ).drop("__fb")
        rejected.write.mode("overwrite").parquet(
            f"{out_dir}/rejected/snapshot={batch_id}"
        )
        obs = tagged.filter(
            F.col("__fb").isNull() | (F.col("bucket") > F.col("__fb"))
        ).drop("__fb")
        # per-key emission window: (frontier + 1 unit | first obs)
        # through the batch's last observed bucket; keys silent this
        # batch produce no spine rows (their frontier just carries)
        bounds = (
            obs.groupBy(key)
            .agg(
                F.min("bucket").alias("__obs_lo"),
                F.max("bucket").alias("__hi"),
            )
            .join(
                prior.select(
                    key, F.col("bucket").alias("__frontier")
                ),
                key,
                "left",
            )
            .select(
                key,
                F.coalesce(
                    F.expr(f"__frontier + interval {interval}"),
                    F.col("__obs_lo"),
                ).alias("__lo"),
                "__hi",
            )
        )
        spine = bounds.select(
            key,
            F.explode(
                F.expr(f"sequence(__lo, __hi, interval {interval})")
            ).alias("bucket"),
        )
        # seed the fill window with the frontier row (one step before
        # __lo) so a batch whose first observation lands after __lo
        # still carries the prior value into the leading gap
        seeded = spine.unionByName(
            prior.join(bounds.select(key), key, "left_semi").select(
                key, "bucket"
            )
        ).join(
            obs.unionByName(
                prior.join(bounds.select(key), key, "left_semi")
            ),
            [key, "bucket"],
            "left",
        )
        w = (
            Window.partitionBy(key)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = seeded.select(
            key,
            "bucket",
            F.last(value_col, ignorenulls=True)
            .over(w)
            .alias(value_col),
            F.col(value_col).isNotNull().alias("observed"),
        )
        emit = filled.join(
            bounds.select(key, "__lo"), key
        ).filter(F.col("bucket") >= F.col("__lo")).drop("__lo")
        # frontier rows seeded into the fill were emitted by an
        # EARLIER batch; `observed` on them belongs to that batch and
        # the >= __lo filter excludes them here.
        # Materialize ONCE before the two writes (the CLAUDE.md
        # persist-across-two-writes sink rule + the x25 shared-frame
        # rule): emit feeds its own write AND the new frontier, and
        # uncheckpointed the state write would re-run the whole
        # resample/spine/fill lineage a second time
        emit = emit.localCheckpoint()
        new_frontier = emit.groupBy(key).agg(
            F.max(
                F.struct(F.col("bucket"), F.col(value_col).alias("__v"))
            ).alias("__top")
        ).select(
            key,
            F.col("__top.bucket").alias("bucket"),
            F.col("__top.__v").alias(value_col),
        )
        carried = prior.join(new_frontier, key, "left_anti")
        state = new_frontier.unionByName(carried)
        emit.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )
        state.write.mode("overwrite").parquet(
            f"{state_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_gap_fill(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    tiebreak: str | None = None,
):
    """Attach the gap-fill sink to an event stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            gap_fill_sink(
                state_dir, out_dir, key, ts_col, value_col, unit,
                tiebreak,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_gap_fill_output(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """Union of every COMMITTED emitted partition — the accumulated
    dense grid (``_SUCCESS``-gated, same reader discipline as
    `read_cdc_snapshot`; a crashed partial emission is invisible).
    Returns None when nothing is committed yet. One flat multi-path
    read (identical schemas) — a per-batch Union loop would grow the
    plan tree linearly with stream lifetime (r8 advice)."""
    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    return spark.read.parquet(
        *[f"{out_dir}/snapshot={b}" for b in snaps]
    )


def read_gap_fill_rejected(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(key, bucket, value) observations each batch dropped at or
    below a key's frontier — contract-violation evidence (a grid
    bucket straddled two micro-batches) or genuinely late data.
    Empty ⇒ the emitted union is bit-identical to batch `gap_fill`
    over the delivered history."""
    snaps = list_cdc_snapshots(spark, f"{out_dir}/rejected")
    if not snaps:
        return None
    return spark.read.parquet(
        *[f"{out_dir}/rejected/snapshot={b}" for b in snaps]
    )
