"""Streaming Markov transition matrix: maintain e12's first-order
transition counts (`operators/sequence.transition_matrix`) from a
micro-batched event stream — the next-event model kept current on
ingest (journey simulation / anomaly scoring reads a fresh matrix
instead of recomputing over ever-growing history).

Two pieces of state, both under the ``snapshot=<batch_id>``
idempotence/crash layout of `cdc_ingest` (prior = newest committed
snapshot strictly below the batch id; replays re-read the same prior
and overwrite their own partitions):

- ``state_dir``: the per-key FRONTIER — (key, ts, tiebreak, state) of
  each key's LAST event ever seen (one row per key: bounded by key
  cardinality, exactly the gap-fill frontier shape). Needed because a
  transition SPANS the batch boundary: the prior batch's last event
  pairs with this batch's first.
- ``out_dir``: per-batch transition-count partitions
  (prev_state, state, n) — counts are ADDITIVE, so the corpus matrix
  is the read-time SUM-fold of all committed partitions
  (`read_transition_matrix`), the same mergeable-artifact design as
  the streaming HLL/CMS sketches; n is exact BIGINT, and the
  row-normalized probability is computed ONCE at read time from the
  folded integers — bit-identical to batch `transition_matrix` over
  the delivered history (tested).

Each micro-batch: drop NULL state/ts rows (unplaceable — the e12
rule); drop and SIDE-OUTPUT events at or before their key's frontier
(``out_dir/rejected/snapshot=<id>`` — the frontier never rewinds; on
an in-order stream a rejected row means the per-key event-time-order
contract was violated); pair the kept events per key in (ts,
tiebreak) order (one batch-sized keyed window); add the BOUNDARY pair
(frontier state → batch's first state) for keys with history; write
the batch's (prev_state, state, n) counts, and advance the frontier
(max struct per key over prior ∪ batch).

Contract: per-key event-time ordered batches (a file-source replay of
time-ordered files). Under it the folded counts equal the batch
operator's exactly; violations are observable, never silent.

Scale: the batch pays one keyed window over ITS OWN rows + one
key-keyed join against the frontier state; emitted partitions are
|states|²-sized; the frontier is keys-sized. The admission frame
feeds pairing AND the frontier update, so it is materialized once
(the persist-across-two-writes rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
    read_cdc_snapshot,
)


def transition_counts_sink(
    state_dir: str,
    out_dir: str,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak: str,
):
    """foreachBatch sink maintaining the transition-count artifact —
    see the module docstring for the layout/ordering contract."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ev = batch_df.select(
            F.col(key).alias("__k"),
            F.col(ts_col).alias("__ts"),
            F.col(tiebreak).alias("__tb"),
            F.col(state_col).alias("__st"),
        ).filter(
            F.col("__st").isNotNull() & F.col("__ts").isNotNull()
        )
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:
            prior = ev.limit(0)
        # frontier never rewinds: an event at or before its key's
        # frontier would re-write history (its pairs were already
        # counted) — drop + side-output (the gap-fill rejected rule).
        # One materialization feeds the rejected split, the pairing,
        # and the frontier update.
        tagged = ev.join(
            prior.select(
                F.col("__k"),
                F.col("__ts").alias("__fts"),
                F.col("__tb").alias("__ftb"),
            ),
            "__k",
            "left",
        ).withColumn(
            "__late",
            F.col("__fts").isNotNull()
            & (
                F.struct("__ts", "__tb")
                <= F.struct(
                    F.col("__fts").alias("__ts"),
                    F.col("__ftb").alias("__tb"),
                )
            ),
        ).localCheckpoint()
        rejected = tagged.filter(F.col("__late")).select(
            F.col("__k").alias(key),
            F.col("__ts").alias(ts_col),
            F.col("__tb").alias(tiebreak),
            F.col("__st").alias(state_col),
        )
        kept = tagged.filter(~F.col("__late")).select(
            "__k", "__ts", "__tb", "__st"
        )
        # in-batch pairs: one keyed window over the batch's own rows
        w = Window.partitionBy("__k").orderBy("__ts", "__tb")
        pairs = kept.select(
            F.lag("__st").over(w).alias("prev_state"),
            F.col("__st").alias("state"),
        ).filter(F.col("prev_state").isNotNull())
        # boundary pairs: frontier state -> the batch's first kept
        # event per key (min struct — never a second window)
        firsts = kept.groupBy("__k").agg(
            F.min(
                F.struct("__ts", "__tb", F.col("__st").alias("__s"))
            ).alias("__f")
        )
        boundary = firsts.join(
            prior.select("__k", F.col("__st").alias("prev_state")),
            "__k",
        ).select("prev_state", F.col("__f.__s").alias("state"))
        counts = (
            pairs.unionByName(boundary)
            .groupBy("prev_state", "state")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        counts.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )
        rejected.write.mode("overwrite").parquet(
            f"{out_dir}/rejected/snapshot={batch_id}"
        )
        # advanced frontier: per-key max struct over prior ∪ batch
        # (silent keys carry; kept was checkpointed above)
        state = (
            kept.unionByName(prior)
            .groupBy("__k")
            .agg(
                F.max(
                    F.struct(
                        "__ts", "__tb", F.col("__st").alias("__s")
                    )
                ).alias("__t")
            )
            .select(
                "__k",
                F.col("__t.__ts").alias("__ts"),
                F.col("__t.__tb").alias("__tb"),
                F.col("__t.__s").alias("__st"),
            )
        )
        state.write.mode("overwrite").parquet(
            f"{state_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_transition_matrix(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak: str,
):
    """Attach the transition-count sink to an event stream and start."""
    return (
        stream.writeStream.foreachBatch(
            transition_counts_sink(
                state_dir, out_dir, key, state_col, ts_col, tiebreak
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_transition_matrix(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(prev_state, state, n_transitions, p): the corpus transition
    matrix — SUM-fold of every committed per-batch count partition
    (one flat multi-path read), row-normalized ONCE from the folded
    exact integers, so it is bit-identical to batch
    `transition_matrix` over the delivered history (the additive-
    artifact read, like `read_cms_sketch`). None before any commit."""
    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    counts = (
        spark.read.parquet(
            *[f"{out_dir}/snapshot={b}" for b in snaps]
        )
        .groupBy("prev_state", "state")
        .agg(F.sum("n").cast("long").alias("n_transitions"))
    )
    total = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(total).cast("double")
        ).alias("p"),
    )


def read_transition_rejected(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """Events dropped at or before their key's frontier — per-key
    ordering-contract evidence. Empty ⇒ the folded matrix is
    bit-identical to the batch operator."""
    snaps = list_cdc_snapshots(spark, f"{out_dir}/rejected")
    if not snaps:
        return None
    return spark.read.parquet(
        *[f"{out_dir}/rejected/snapshot={b}" for b in snaps]
    )
