"""Streaming Pearson correlation panel: maintain u19's
feature-redundancy profile (`operators/profile.correlation_profile`)
from a micro-batched fact stream — the "did two measures suddenly
start moving together" monitor (a new upstream bug often shows up as
a correlation flip before it shows up as a bad total).

Same contract-free design as the zipf/dup-spectrum faces: the
maintained artifact is each pair's SUFFICIENT STATISTICS
(n, Σx, Σy, Σxy, Σx², Σy² over pairwise-complete rows), which are
plain sums and therefore ADDITIVE — late, out-of-order, and replayed
batches are all correct data; no frontier state, no rejected side
output. Each batch writes its own per-pair statistics row (exact
DECIMAL(38,0) integers) under the ``snapshot=<batch_id>`` idempotence
layout; the correlation is derived at READ time from the column-wise
sum-fold of every committed partition through the SAME arithmetic the
batch operator uses (`profile.correlation_finalize`) — bit-identical
to batch `correlation_profile` over the delivered history,
unconditionally, regardless of delivery order. (Correlations
themselves do NOT average across batches — deriving per-batch r and
merging would be wrong; the statistics are the only mergeable form,
which is exactly why the operator is split.)

Scale: each batch pays ONE map-side-combinable wide aggregate over
its own rows (6 sums × K(K−1)/2 pairs, a 1-row write); the read folds
pairs × batches rows — compact periodically like any additive lake
artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def correlation_stats_sink(
    out_dir: str, cols: list[tuple[str, Column]]
):
    """foreachBatch sink appending per-batch per-pair sufficient
    statistics — additive artifact, so no state dir (module
    docstring)."""
    from ods_to_datalake_spark.operators.profile import (
        correlation_pair_stats,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        correlation_pair_stats(batch_df, cols).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/snapshot={batch_id}")

    return sink


def maintain_correlation_profile(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cols: list[tuple[str, Column]],
):
    """Attach the statistics sink to a fact stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            correlation_stats_sink(out_dir, cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_correlation_profile(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(col_x, col_y, n_pairs, corr) over the delivered history:
    column-wise sum-fold of every committed statistics partition (one
    flat multi-path read), then the batch operator's own derivation
    (`profile.correlation_finalize`) over the folded exact integers —
    bit-identical to batch `correlation_profile` with no ordering
    contract at all. None before any commit."""
    from ods_to_datalake_spark.operators.profile import (
        correlation_finalize,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    folded = (
        spark.read.parquet(
            *[f"{out_dir}/snapshot={b}" for b in snaps]
        )
        .groupBy("col_x", "col_y")
        .agg(
            F.sum("n").cast("long").alias("n"),
            *[
                F.sum(c).cast("decimal(38,0)").alias(c)
                for c in ("sx", "sy", "sxy", "sxx", "syy")
            ],
        )
    )
    return correlation_finalize(folded)
