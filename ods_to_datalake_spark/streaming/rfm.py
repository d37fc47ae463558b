"""Streaming RFM segmentation: maintain u27's lifecycle grid
(`operators/features.rfm_segments`) from a micro-batched order stream
— the live champions/at-risk/hibernating panel.

Same state algebra as the OHLC face (the repo's second mergeable-
SEMIGROUP member): a customer's Recency/Frequency/Monetary state is
(max order date, order count, cents sum) — max and sums are semigroup
folds, so per-batch partials merge EXACTLY to the single-pass state.
Late, out-of-order, and replayed orders are all correct data: a late
order that improves a customer's recency simply wins the next
max-merge — no frontier contract, no rejected side output. Note the
grid itself does NOT merge (NTILE bins are global ranks: two batches'
grids say nothing about the union's grid — the KS-statistic argument)
— which is exactly why the sink stores per-customer partials and
derives the grid at READ time through the SAME `rfm_finalize` as
batch; the recency anchor (max order date over the delivered history)
moves forward as data arrives, re-binning everyone, as it should.

Scale: each batch pays one customer-keyed partial agg over its own
rows (map-side combinable); the read folds customers × batches rows
and runs the dimension-sized NTILE derivation. Compact periodically —
`rfm_merge`'s output is itself a valid partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def rfm_partials_sink(
    out_dir: str, customer_col: str, date_col: str, amount_col
):
    """foreachBatch sink appending per-batch per-customer RFM
    partials — mergeable artifact, so no state dir."""
    from ods_to_datalake_spark.operators.features import rfm_partials

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rfm_partials(
            batch_df, customer_col, date_col, amount_col
        ).write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_rfm(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    customer_col: str,
    date_col: str,
    amount_col,
):
    """Attach the RFM-partials sink to a stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            rfm_partials_sink(
                out_dir, customer_col, date_col, amount_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_rfm_segments(
    spark: SparkSession, out_dir: str, n_bins: int = 4
) -> DataFrame | None:
    """(r_bin, f_bin, m_bin, n_customers, total_cents) — the current
    lifecycle grid: semigroup fold of every committed partial via
    `rfm_merge`, then batch `rfm_finalize`'s own anchor/NTILE/grid
    derivation — bit-identical to batch `rfm_segments` over the
    delivered history. None before any commit."""
    from ods_to_datalake_spark.operators.features import (
        rfm_finalize,
        rfm_merge,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    partials = spark.read.parquet(
        *[f"{out_dir}/snapshot={b}" for b in snaps]
    )
    return rfm_finalize(rfm_merge(partials), n_bins=n_bins)
