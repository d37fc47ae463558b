"""Streaming activity streaks: maintain e13's
longest-consecutive-day-streak-per-user table
(`operators/sequence.longest_daily_streak`) from a micro-batched event
stream — the engagement dashboard's "current and best streak" panel,
kept current on ingest instead of recomputed over ever-growing
history.

State is per-user run bookkeeping — one row per user ever seen:

    (user, cur_start, cur_end, best_len, best_start, best_end)

``cur_*`` is the run the user's newest active day belongs to, ``best``
the longest run so far with the batch operator's (length DESC, start
ASC) tiebreak — user-cardinality-sized, never history-sized, under the
same ``snapshot=<batch_id>`` layout and idempotence/crash contract as
`cdc_ingest`/`streaming.growth` (prior = newest committed snapshot
strictly below the current batch id; a dir without ``_SUCCESS`` is
invisible). Each micro-batch:

1. reduces the batch to distinct (user, active day) and islands them
   (the e13 gaps-and-islands identity — a window over BATCH-sized
   rows, never history);
2. merges each user's FIRST batch island with the state's current run
   when it starts exactly one day after ``cur_end`` (under the
   alignment contract nothing else can connect);
3. the user's new current run is their LAST island (merged form when
   the batch has exactly one); best = max of (state best, merged
   first island, best non-first island) under the batch tiebreak;
4. writes the updated users' best rows to ``out_dir`` and the full
   grown state (absent users' rows carried unchanged) to
   ``state_dir`` — serving reads come from the newest state snapshot
   (`read_streaks`), so the emitted per-batch partitions are the
   change FEED, not the table.

One deliberate divergence from batch `longest_daily_streak`: NULL
keys are dropped on ingest (the batch operator keeps a NULL group per
SQL GROUP BY, but a NULL key cannot be equi-joined to its own state
row — tracking it would need a null-safe join on every batch for an
entity that isn't one). Pinned in tests.

Contract (the growth-sink discipline, per USER): each user's new days
arrive strictly after every day of theirs already in the state —
e.g. a day-partitioned file replay. Under it `read_streaks` is
bit-identical to batch `longest_daily_streak` over the full delivered
history (tested). Out-of-contract evidence is observable, not silent:
batch days at or before the user's ``cur_end`` (re-deliveries,
out-of-order days) go to ``out_dir/rejected/snapshot=<batch_id>``
(`read_streaks_rejected`) and are excluded — a day at cur_end + could
otherwise double-extend a run it is already part of.

Scale: one batch-sized distinct + island window (user-keyed), one
user-keyed join against the state (bucket the state dir by user at
real scale), per-user constant-width arithmetic — no history rescans
anywhere. The merged frame feeds the output AND the state write, so
it is materialized with an eager localCheckpoint (the CLAUDE.md
persist-across-two-writes sink rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    read_cdc_snapshot,
)

def _empty_state(spark: SparkSession, key: str) -> DataFrame:
    return spark.createDataFrame(
        [],
        f"{key} long, cur_start date, cur_end date, "
        "best_len long, best_start date, best_end date",
    )


def streaks_sink(state_dir: str, out_dir: str, key: str, ts_col: str):
    """foreachBatch sink maintaining per-user streak state — see the
    module docstring for the layout/contract."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        days = (
            batch_df.filter(
                F.col(key).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                key,
                F.to_date(
                    F.date_trunc("day", F.col(ts_col))
                ).alias("__day"),
            )
            .distinct()
        )
        prior = read_cdc_snapshot(spark, state_dir, before=batch_id)
        if prior is None:
            prior = _empty_state(spark, key)
        # split out contract violations per user BEFORE islanding: a
        # day at or before the user's current-run end is re-delivered
        # or out-of-order evidence (observable, the growth/gap-fill
        # rejected-rows pattern) — and a duplicate of cur_end + 1 - 1
        # would double-extend the run it already belongs to
        tagged = days.join(
            prior.select(key, "cur_end"), key, "left"
        ).withColumn(
            "__late",
            F.col("cur_end").isNotNull()
            & (F.col("__day") <= F.col("cur_end")),
        ).localCheckpoint()  # feeds the rejected write AND the
        # fresh/state branch — unmaterialized, each leg re-runs the
        # batch distinct + state join (the x25 rule, as the sibling
        # markov/growth sinks do)
        rejected = tagged.filter(F.col("__late")).select(
            key, F.col("__day").alias("day")
        )
        fresh = tagged.filter(~F.col("__late")).select(key, "__day")
        # e13's gaps-and-islands over the BATCH days only
        w = Window.partitionBy(key).orderBy("__day")
        runs = (
            fresh.withColumn(
                "__island",
                F.date_sub(
                    F.col("__day"),
                    F.row_number().over(w).cast("int"),
                ),
            )
            .groupBy(key, "__island")
            .agg(
                F.min("__day").alias("__s"),
                F.max("__day").alias("__e"),
            )
        )
        # best NON-first island: the first may merge with the state's
        # current run (its length changes), later islands cannot —
        # min-struct under (len DESC, start ASC); the first-island
        # start comes from a window (a window can't nest inside the
        # aggregate), over the batch's islands only
        runs = runs.withColumn(
            "__fs", F.min("__s").over(Window.partitionBy(key))
        )
        per_user = runs.groupBy(key).agg(
            F.min(
                F.struct(F.col("__s"), F.col("__e"))
            ).alias("__first"),
            F.max(
                F.struct(F.col("__s"), F.col("__e"))
            ).alias("__last"),
            F.min(
                F.when(
                    F.col("__s") > F.col("__fs"),
                    F.struct(
                        (
                            -(
                                F.datediff("__e", "__s")
                                + F.lit(1)
                            ).cast("long")
                        ).alias("__nl"),
                        F.col("__s").alias("__bs"),
                        F.col("__e").alias("__be"),
                    ),
                )
            ).alias("__midbest"),
            F.count(F.lit(1)).alias("__n_islands"),
        )
        joined = per_user.join(prior, key, "full_outer")
        merged_start = F.when(
            F.col("cur_end").isNotNull()
            & (
                F.col("__first.__s")
                == F.date_add(F.col("cur_end"), 1)
            ),
            F.col("cur_start"),
        ).otherwise(F.col("__first.__s"))
        # candidate runs for 'best': the state's best, the (possibly
        # merged) first island, and the best later island — each as a
        # (-len, start, end) struct so MIN is the batch tiebreak
        def _cand(ln, s, e):
            return F.struct(
                (-ln).cast("long").alias("__nl"),
                s.alias("__bs"),
                e.alias("__be"),
            )

        first_cand = _cand(
            F.datediff(F.col("__first.__e"), merged_start) + 1,
            merged_start,
            F.col("__first.__e"),
        )
        state_cand = F.when(
            F.col("best_len").isNotNull(),
            _cand(
                F.col("best_len"),
                F.col("best_start"),
                F.col("best_end"),
            ),
        )
        best = F.least(
            *[
                c
                for c in (
                    F.when(
                        F.col("__first").isNotNull(), first_cand
                    ),
                    F.col("__midbest"),
                    state_cand,
                )
            ]
        )
        new_state = joined.select(
            key,
            F.when(
                F.col("__last").isNotNull(),
                F.when(
                    F.col("__n_islands") == 1, merged_start
                ).otherwise(F.col("__last.__s")),
            )
            .otherwise(F.col("cur_start"))
            .alias("cur_start"),
            F.coalesce(F.col("__last.__e"), F.col("cur_end")).alias(
                "cur_end"
            ),
            (-best["__nl"]).cast("long").alias("best_len"),
            best["__bs"].alias("best_start"),
            best["__be"].alias("best_end"),
            F.col("__last").isNotNull().alias("__updated"),
        ).localCheckpoint()
        out = new_state.filter(F.col("__updated")).select(
            key,
            F.col("best_len").alias("streak_days"),
            F.col("best_start").alias("streak_start"),
            F.col("best_end").alias("streak_end"),
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


def maintain_streaks(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str,
    ts_col: str,
):
    """Attach the streak sink to an event stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            streaks_sink(state_dir, out_dir, key, ts_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_streaks(
    spark: SparkSession, state_dir: str, key: str = "user_id"
) -> DataFrame | None:
    """The serving table: each seen user's BEST streak so far, from the
    newest committed state snapshot — bit-identical to batch
    `longest_daily_streak` over the delivered history when the stream
    honored the alignment contract. None before the first commit."""
    state = read_cdc_snapshot(spark, state_dir)
    if state is None:
        return None
    return state.select(
        key,
        F.col("best_len").alias("streak_days"),
        F.col("best_start").alias("streak_start"),
        F.col("best_end").alias("streak_end"),
    )


def read_streaks_rejected(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(user, day) evidence of alignment-contract violations — days at
    or before the user's then-current run end (re-deliveries /
    out-of-order days, excluded from the state). Empty ⇒ `read_streaks`
    is exact. None before the first commit."""
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
