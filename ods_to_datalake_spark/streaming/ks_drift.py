"""Streaming distribution-drift gate: maintain u21's exact two-sample
Kolmogorov–Smirnov statistic (`operators/profile.ks_two_sample`)
between a FROZEN baseline sample and everything ingested so far — the
live "did today's distribution move" check behind release gates and
data-contract monitors: a variance doubling with equal means is
invisible to mean/η² panels and maximal here.

Contract-free like the Zipf/concentration/correlation faces: the
maintained artifact is per-VALUE counts of the ingest side, which are
ADDITIVE — no frontier state, no alignment contract, no rejected side
output; late, out-of-order, and replayed rows are all correct data.
The KS statistic itself does NOT merge (sup of a difference is not a
semigroup over batches: two batches can each match the baseline
exactly while their union does not — pinned by the fixture), which is
exactly why the sink stores counts and derives D at READ time through
the SAME `profile.ks_from_value_counts` arithmetic as batch — bit-
identical to `ks_two_sample` over baseline ∪ delivered history,
unconditionally.

Scale: each batch pays one value-keyed partial count over its own
rows (map-side combinable); the baseline's counts are domain-sized
and computed once per read (freeze them to parquet for a standing
gate); the read folds committed partitions once and runs the
domain-sized cumulative window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def value_counts_sink(out_dir: str, value: Column):
    """foreachBatch sink appending per-batch (v, n) partial counts of
    the monitored INTEGER-valued expression — additive artifact, no
    state dir. NULL values are excluded (no distribution membership,
    the batch operator's rule)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = (
            batch_df.select(value.cast("long").alias("v"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        counts.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_ks_counts(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    value: Column,
):
    """Attach the value-count sink to a stream and start it."""
    return (
        stream.writeStream.foreachBatch(value_counts_sink(out_dir, value))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_ks_drift(
    spark: SparkSession,
    out_dir: str,
    baseline: DataFrame,
    baseline_value: Column,
) -> DataFrame | None:
    """(n_a, n_b, ks_d, at_value) with side a = the frozen baseline
    sample and side b = the delivered ingest history: the sum-fold of
    every committed count partition full-outer-merged with the
    baseline's own per-value counts, derived through the batch
    operator's `ks_from_value_counts` — bit-identical to
    `ks_two_sample` over baseline ∪ history. None before any commit.
    Reject at α=.05 when ks_d > 1.358·√((n_a+n_b)/(n_a·n_b))."""
    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    from ods_to_datalake_spark.operators.profile import (
        ks_from_value_counts,
    )

    ingest = (
        spark.read.parquet(*[f"{out_dir}/snapshot={b}" for b in snaps])
        .groupBy("v")
        .agg(F.sum("n").cast("long").alias("__nb"))
    )
    base = (
        baseline.select(baseline_value.cast("long").alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("__na"))
    )
    merged = base.join(ingest, "v", "full_outer").select(
        F.col("v").alias("__v"),
        F.coalesce(F.col("__na"), F.lit(0)).cast("long").alias("__na"),
        F.coalesce(F.col("__nb"), F.lit(0)).cast("long").alias("__nb"),
    )
    return ks_from_value_counts(merged)


def read_gini(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(n_rows, total_value, gini) — u25's exact Gini coefficient
    derived from the SAME per-value count artifact the KS gate folds
    (the shared-sink pattern: one value-count ingest, two read-time
    derivations — KS asks "did the distribution MOVE", this asks "how
    UNEQUAL is it now", the live whale/concentration gate): sum-fold
    the committed count partitions, apply the batch operator's domain
    rule (negative values excluded — Gini is defined on a
    non-negative measure; the sink already excluded NULLs), then
    derive through `profile.gini_from_value_counts` — bit-identical
    to batch `gini_coefficient` over the delivered history because
    the closed-form tied-block rank sum needs only (value, count).
    None before any commit."""
    from ods_to_datalake_spark.operators.profile import (
        gini_from_value_counts,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    per_v = (
        spark.read.parquet(*[f"{out_dir}/snapshot={b}" for b in snaps])
        .where(F.col("v") >= 0)
        .groupBy(F.col("v").alias("__v"))
        .agg(F.sum("n").cast("long").alias("__c"))
    )
    return gini_from_value_counts(per_v)
