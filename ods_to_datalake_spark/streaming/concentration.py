"""Streaming value-concentration profile: maintain u18's per-column
Gini/hot-key diagnostic (`operators/profile.concentration_profile`)
from a micro-batched stream — the live "did a column collapse to a
constant / did a hot key appear" panel that catches a broken upstream
join or a skew bomb ON INGEST, before the batch job that would hit it.

Same contract-free design as the Zipf/seasonal/CUSUM faces: the
maintained artifact is per-(column, value) COUNTS, which are ADDITIVE
— no frontier state, no alignment contract, no rejected side output;
late, out-of-order, and replayed rows are all correct data. Each batch
writes its own long (column_name, v, n) partial counts under the
``snapshot=<batch_id>`` idempotence layout; the profile is derived at
READ time from the sum-fold of every committed partition through the
SAME arithmetic the batch operator uses
(`profile.concentration_from_counts`) — bit-identical to batch
`concentration_profile` over the delivered history, unconditionally.

Scale: each batch pays one melt + one (column, value)-keyed partial
agg over its own rows (map-side combinable; state is Σ per-column
cardinalities, the vocabulary shape); the read folds that once.
Compact the count partitions periodically like any additive artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def value_counts_sink(out_dir: str, cols: list[str]):
    """foreachBatch sink appending per-batch long (column_name, v, n)
    partial counts — additive artifact, no state dir."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        melted = batch_df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            F.coalesce(
                                F.col(c).cast("string"), F.lit("NULL")
                            ).alias("v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("m")
        ).select("m.*")
        counts = melted.groupBy("column_name", "v").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        counts.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_concentration(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cols: list[str],
):
    """Attach the value-count sink to a stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            value_counts_sink(out_dir, cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_concentration(
    spark: SparkSession, out_dir: str, cols: list[str]
) -> DataFrame | None:
    """The u18 report over the delivered history: sum-fold of every
    committed count partition, then the batch operator's own
    derivation (`profile.concentration_from_counts`) — bit-identical
    to batch `concentration_profile`. None before any commit."""
    from ods_to_datalake_spark.operators.profile import (
        concentration_from_counts,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    counts = (
        spark.read.parquet(
            *[f"{out_dir}/snapshot={b}" for b in snaps]
        )
        .groupBy("column_name", "v")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return concentration_from_counts(spark, counts, cols)
