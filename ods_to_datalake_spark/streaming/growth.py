"""Streaming growth curve: maintain e14's running-distinct-keys-by-day
table (`operators/sequence.running_distinct`) from a micro-batched
event stream — the training-data ingest dashboard's "how many new
users/documents/sources did today add" query, kept current on ingest
instead of recomputed over ever-growing history.

State is the per-key FIRST-SEEN DAY — (key, day), one row per distinct
key ever observed (the same append-only seen-corpus shape as
incremental dedup's hash tables; bounded by key cardinality, never
history length) — under the same ``snapshot=<batch_id>`` layout and
idempotence/crash contract as `cdc_ingest`/`streaming.timeseries`
(prior = newest committed snapshot strictly below the current batch
id; a dir without ``_SUCCESS`` is invisible). Each micro-batch:

1. reduces its events to per-key min day (map-side partial — the e14
   first-seen reduction applied to the batch);
2. anti-joins the prior state: keys already seen are NOT new — their
   first-seen day is immutable, exactly as an already-published growth
   row is (the gap-fill frontier rule; re-appearances on later days
   are correct data and drop here by design);
3. emits (day, new_keys, cumulative_keys) for the batch's new keys —
   cumulative = the prior state's key count (one aggregated row,
   broadcast via crossJoin — never collected) + the in-batch running
   sum over the calendar-sized daily frame;
4. writes the emitted rows to ``out_dir/snapshot=<batch_id>`` and the
   grown state (prior ∪ new) to ``state_dir/snapshot=<batch_id>``.

Contract (the gap_fill_sink discipline, one level coarser): the stream
is event-time ordered and a DAY never straddles two batches — e.g. a
file-source replay of day-partitioned files. Under it the union of all
emitted partitions is bit-identical to batch `running_distinct` over
the full delivered history (tested). Out-of-contract evidence is
OBSERVABLE, not silent: a batch whose events land on a day at or
before the newest already-emitted day writes those keys to
``out_dir/rejected/snapshot=<batch_id>`` (the r8-advice pattern —
`read_growth_rejected` surfaces them).

Scale: the batch pays one key-keyed partial agg + one anti-join
against the state (key-keyed shuffle; at real scale bucket the state
dir by key so the join co-locates), the emitted frame is days-sized,
and the only window orders the batch's ~days rows. The admission
frame feeds the emission AND the state write, so it is materialized
once with an eager localCheckpoint (the CLAUDE.md
persist-across-two-writes sink rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
    read_cdc_snapshot,
)


def running_distinct_sink(state_dir: str, out_dir: str, key: str, ts_col: str):
    """foreachBatch sink maintaining the growth curve — see the module
    docstring for the layout/idempotence/day-alignment contract."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        firsts = (
            batch_df.filter(
                F.col(key).isNotNull() & F.col(ts_col).isNotNull()
            )
            .groupBy(key)
            .agg(
                F.min(
                    F.to_date(F.date_trunc("day", F.col(ts_col)))
                ).alias("day")
            )
        )
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:
            prior = firsts.limit(0)
        # first-seen is immutable: keys already in the state are not
        # new, whatever day this batch saw them on. The anti-join is
        # NOT checkpointed here — the late-tagged frame built from it
        # just below is, and nothing else reads this intermediate (a
        # second eager checkpoint would materialize the same
        # batch-key-sized frame twice per batch).
        new = firsts.join(prior, key, "left_anti")
        # day-alignment contract violations are observable: a new key
        # first seen at or before the newest already-emitted day means
        # some earlier emission undercounted that day (its row is
        # immutable) — side-output the evidence instead of silently
        # appending a second row for the day (the gap-fill
        # rejected-rows pattern)
        frontier = prior.agg(F.max("day").alias("__mxd"))
        new = (
            new.crossJoin(F.broadcast(frontier))
            .withColumn(
                "__late",
                F.col("__mxd").isNotNull()
                & (F.col("day") <= F.col("__mxd")),
            )
            .drop("__mxd")
            .localCheckpoint()
        )
        rejected = new.filter(F.col("__late")).drop("__late")
        fresh = new.filter(~F.col("__late")).drop("__late")
        # cumulative = every key the state has seen (truthful even
        # when violations occurred: a rejected key IS seen — it just
        # has no daily row, which is exactly what the rejected
        # artifact documents; under the contract the two notions
        # coincide and the output ≡ batch running_distinct)
        base = prior.agg(
            F.count(F.lit(1)).cast("long").alias("__base")
        )
        daily = fresh.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("new_keys")
        )
        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, 0
        )
        emit = daily.crossJoin(F.broadcast(base)).select(
            "day",
            "new_keys",
            (
                F.col("__base") + F.sum("new_keys").over(w)
            ).cast("long").alias("cumulative_keys"),
        )
        emit.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )
        rejected.write.mode("overwrite").parquet(
            f"{out_dir}/rejected/snapshot={batch_id}"
        )
        # seen is seen: rejected keys join the state too (a later
        # re-appearance must not read as new), they just carry no
        # emitted row — `new` was checkpointed above, so this read
        # cannot recompute against the dir being written
        prior.unionByName(new.drop("__late")).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/snapshot={batch_id}")

    return sink


def maintain_running_distinct(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    ts_col: str,
):
    """Attach the growth-curve sink to an event stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            running_distinct_sink(state_dir, out_dir, key, ts_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _read_committed(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """Flat multi-path read of every committed snapshot (identical
    schemas — ONE spark.read call, so plan depth stays constant over
    the stream's lifetime instead of growing a per-batch Union tree)."""
    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    return spark.read.parquet(
        *[f"{out_dir}/snapshot={b}" for b in snaps]
    )


def read_growth_output(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """Union of every COMMITTED emitted partition — the accumulated
    growth curve (``_SUCCESS``-gated; a crashed partial emission is
    invisible). None when nothing is committed yet."""
    return _read_committed(spark, out_dir)


def read_growth_rejected(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(key, day) evidence of day-alignment contract violations —
    first-seen keys whose day was already emitted (their day's
    published row undercounts them). Empty ⇒ the stream honored the
    contract and the output is bit-identical to batch
    `running_distinct`."""
    return _read_committed(spark, f"{out_dir}/rejected")
