"""Streaming inter-arrival/burstiness profile: maintain e17's per-user
gap statistics (`operators/sequence.interarrival_stats`) from a
micro-batched event stream — the live "is this key a metronome or a
burst" panel behind bot/scheduler detection.

State is four mergeable sums per key ever seen:

    (key, last_t, n_events, n_gaps, sum_gap_s, __sq)

— key-cardinality-sized, never history-sized, under the same
``snapshot=<batch_id>`` layout and idempotence/crash contract as the
streaks/growth/markov sinks (prior = newest committed snapshot
strictly below the current batch id; no ``_SUCCESS`` → invisible).
The gap MULTISET depends only on each key's sorted timestamps, so the
statistics fold exactly: a batch contributes its in-batch gaps plus
ONE boundary gap (batch min − state ``last_t``), and every sum is
integer/decimal-exact. Each micro-batch:

1. computes per-key in-batch gap sums via one lag window over
   BATCH-sized rows (ties order arbitrarily — the gap multiset is
   tie-invariant);
2. joins the state once (key-keyed; bucket the state dir by key at
   real scale) and adds the boundary gap where a prior exists;
3. writes updated keys' derived stats to ``out_dir`` (the change
   feed) and the full grown state to ``state_dir`` — serving reads
   (`read_burstiness`) derive μ/σ/B from the newest state through the
   SAME arithmetic the batch operator uses
   (`sequence.gap_stats_from_sums`), bit-identical to batch
   `interarrival_stats` over the delivered history under the contract.

Contract (the growth-sink discipline, per KEY): each key's new events
arrive at-or-after its ``last_t`` (timestamps, not files, define
order — equal timestamps are fine, the multiset absorbs them).
Out-of-contract evidence is observable, not silent: batch events
strictly before the key's ``last_t`` go to
``out_dir/rejected/snapshot=<batch_id>`` (`read_burstiness_rejected`)
and are excluded — inserting into the MIDDLE of a gap sequence would
need the full history, which the state deliberately does not keep.
NULL keys are dropped on ingest (the streaks rule: a NULL key can't
equi-join its own state row); NULL timestamps are dropped like the
batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    read_cdc_snapshot,
)

_D38 = "decimal(38,0)"


def _empty_state(spark: SparkSession, key: str) -> DataFrame:
    return spark.createDataFrame(
        [],
        f"{key} long, last_t long, n_events long, n_gaps long, "
        "sum_gap_s long, __sq decimal(38,0)",
    )


def burstiness_sink(
    state_dir: str, out_dir: str, key: str, ts_col: str
):
    """foreachBatch sink maintaining the per-key gap sums — see the
    module docstring for layout/contract."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ev = batch_df.filter(
            F.col(key).isNotNull() & F.col(ts_col).isNotNull()
        ).select(
            key, F.unix_timestamp(F.col(ts_col)).alias("__t")
        )
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:
            prior = _empty_state(spark, key)
        tagged = ev.join(
            prior.select(key, "last_t"), key, "left"
        ).withColumn(
            "__late",
            F.col("last_t").isNotNull()
            & (F.col("__t") < F.col("last_t")),
        ).localCheckpoint()  # feeds the rejected write AND the fold
        rejected = tagged.filter(F.col("__late")).select(
            key, F.col("__t").alias("t")
        )
        fresh = tagged.filter(~F.col("__late")).select(key, "__t")
        w = Window.partitionBy(key).orderBy("__t")
        gaps = fresh.withColumn(
            "__gap", F.col("__t") - F.lag("__t").over(w)
        )
        per_key = gaps.groupBy(key).agg(
            F.count(F.lit(1)).cast("long").alias("__bn"),
            F.count("__gap").cast("long").alias("__bgaps"),
            F.coalesce(F.sum("__gap"), F.lit(0))
            .cast("long")
            .alias("__bsum"),
            F.coalesce(
                F.sum(
                    F.col("__gap").cast(_D38)
                    * F.col("__gap").cast(_D38)
                ),
                F.lit(0).cast(_D38),
            ).alias("__bsq"),
            F.min("__t").alias("__mn"),
            F.max("__t").alias("__mx"),
        )
        joined = per_key.join(prior, key, "full_outer")
        has_prior = F.col("last_t").isNotNull()
        has_batch = F.col("__bn").isNotNull()
        bg = F.when(
            has_prior & has_batch, F.col("__mn") - F.col("last_t")
        ).otherwise(F.lit(0).cast("long"))
        n_bg = F.when(has_prior & has_batch, F.lit(1)).otherwise(
            F.lit(0)
        )
        new_state = joined.select(
            key,
            F.when(has_batch, F.col("__mx"))
            .otherwise(F.col("last_t"))
            .alias("last_t"),
            (
                F.coalesce("n_events", F.lit(0))
                + F.coalesce("__bn", F.lit(0))
            ).cast("long").alias("n_events"),
            (
                F.coalesce("n_gaps", F.lit(0))
                + F.coalesce("__bgaps", F.lit(0))
                + n_bg
            ).cast("long").alias("n_gaps"),
            (
                F.coalesce("sum_gap_s", F.lit(0))
                + F.coalesce("__bsum", F.lit(0))
                + bg
            ).cast("long").alias("sum_gap_s"),
            (
                F.coalesce(F.col("__sq"), F.lit(0).cast(_D38))
                + F.coalesce("__bsq", F.lit(0).cast(_D38))
                + (bg.cast(_D38) * bg.cast(_D38))
            ).cast(_D38).alias("__sq"),
            has_batch.alias("__updated"),
        ).localCheckpoint()  # feeds the out AND state writes (the
        # foreachBatch two-write materialization rule)
        from ods_to_datalake_spark.operators.sequence import (
            gap_stats_from_sums,
        )

        out = gap_stats_from_sums(
            new_state.filter(F.col("__updated")).drop(
                "last_t", "__updated"
            ),
            key,
        )
        out.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )
        rejected.write.mode("overwrite").parquet(
            f"{out_dir}/rejected/snapshot={batch_id}"
        )
        new_state.drop("__updated").write.mode("overwrite").parquet(
            f"{state_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_burstiness(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    ts_col: str,
):
    """Attach the burstiness sink to an event stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            burstiness_sink(state_dir, out_dir, key, ts_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_burstiness(
    spark: SparkSession, state_dir: str, key: str = "user_id"
) -> DataFrame | None:
    """The serving table: every seen key's (n_events, n_gaps,
    sum_gap_s, mean_gap_s, std_gap_s, burstiness) from the newest
    committed state, derived through the batch operator's own
    arithmetic — bit-identical to `interarrival_stats` over the
    delivered history under the contract. None before a commit."""
    from ods_to_datalake_spark.operators.sequence import (
        gap_stats_from_sums,
    )

    state = read_cdc_snapshot(spark, state_dir)
    if state is None:
        return None
    return gap_stats_from_sums(state.drop("last_t"), key)


def read_burstiness_rejected(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(key, t) evidence of contract violations — events strictly
    before their key's then-current ``last_t``, excluded from the
    state. Empty ⇒ `read_burstiness` is exact. None before a
    commit."""
    from ods_to_datalake_spark.streaming.cdc_ingest import (
        list_cdc_snapshots,
    )

    root = f"{out_dir}/rejected"
    snaps = list_cdc_snapshots(spark, root)
    if not snaps:
        return None
    return spark.read.parquet(
        *[f"{root}/snapshot={b}" for b in snaps]
    )
