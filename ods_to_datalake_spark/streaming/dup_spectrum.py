"""Streaming exact-dup multiplicity spectrum: maintain x84's
"how duplicated is today's crawl, and how" panel
(`operators/dedup.dup_multiplicity_histogram`) from a micro-batched
document stream — the ingest-dashboard twin of the concentration
profile (VERDICT r10 ask #6). A crawl whose multiplicity-1 share sags
batch over batch is re-fetching; a fattening multiplicity tail is
boilerplate arriving faster than content.

Same contract-free design as the zipf face (`streaming/zipf.py`): the
maintained artifact is per-content-hash COUNTS, which are ADDITIVE —
copies of a document arriving in different batches MUST fold into one
group, so per-batch histograms cannot be merged (two batches each
seeing 1 copy is multiplicity 2, not two multiplicity-1 rows), but
per-hash counts merge exactly. No frontier state, no alignment
contract, no rejected side output: late, out-of-order, and replayed
documents are all correct data. Each batch writes its own (h, n)
partial counts under the ``snapshot=<batch_id>`` idempotence layout (a
replayed batch overwrites its own partition); the spectrum is derived
at READ time from the sum-fold of every committed partition through
the SAME arithmetic the batch operator uses
(`dedup.dup_spectrum_from_group_sizes`) — bit-identical to batch
`dup_multiplicity_histogram` over the delivered history,
unconditionally, regardless of delivery order.

Scale: each batch pays one md5 + hash-keyed partial agg over its own
rows (map-side combinable, output bounded by the batch's distinct
contents); the read folds distinct-hash × batches rows — compact the
count partitions periodically like any additive lake artifact. NULL
text hashes to one NULL-hash group in every engine and every batch (a
corpus of missing text IS duplicated missingness — x84's rule), so the
fold keys NULL like any other group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def content_hash_counts_sink(out_dir: str, text_col: str):
    """foreachBatch sink appending per-batch (h, n) content-hash
    partial counts — additive artifact, so no state dir (module
    docstring)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = (
            batch_df.select(F.md5(F.col(text_col)).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        counts.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_dup_spectrum(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str,
):
    """Attach the content-hash count sink to a document stream and
    start it."""
    return (
        stream.writeStream.foreachBatch(
            content_hash_counts_sink(out_dir, text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_dup_spectrum(
    spark: SparkSession, out_dir: str
) -> DataFrame | None:
    """(multiplicity, n_groups, n_docs, doc_share) over the delivered
    history: sum-fold of every committed count partition (one flat
    multi-path read, NULL-safe hash grouping), then the batch
    operator's own histogram arithmetic
    (`dedup.dup_spectrum_from_group_sizes`) over the folded exact
    integers — bit-identical to batch `dup_multiplicity_histogram`
    with no ordering contract at all. None before any commit."""
    from ods_to_datalake_spark.operators.dedup import (
        dup_spectrum_from_group_sizes,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    groups = (
        spark.read.parquet(
            *[f"{out_dir}/snapshot={b}" for b in snaps]
        )
        .groupBy("h")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return dup_spectrum_from_group_sizes(groups, "n")
