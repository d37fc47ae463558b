"""Streaming corpus rank-frequency (Zipf/Heaps) profile: maintain
x79's corpus-health diagnostic (`operators/quality.zipf_profile`) from
a micro-batched document stream — the "is today's crawl still Zipfian"
panel a training-data ingest pipeline watches daily (a spiking head is
boilerplate, a fattening tail is OCR/tokenizer noise, a MISSING tail
breaks prefix-filter joins — CLAUDE.md's own stress corpus).

Same contract-free design as the seasonal face (`streaming/seasonal.py`
— VERDICT r9 ask #8): the maintained artifact is per-token COUNTS,
which are ADDITIVE, so there is no frontier state, no alignment
contract, no rejected side output — late or replayed documents are just
correct data. Each batch writes its own (tok, n) partial counts under
the ``snapshot=<batch_id>`` idempotence layout (a replayed batch
overwrites its own partition); the profile is derived at READ time from
the sum-fold of every committed partition through the SAME arithmetic
the batch operator uses (`quality.zipf_from_counts`) — bit-identical to
batch `zipf_profile` over the delivered history, unconditionally,
regardless of delivery order (tested, including an adversarially
shuffled order).

Scale: each batch pays one token explode + token-keyed partial agg over
its own rows (map-side combinable, vocabulary-sized output); the read
folds vocabulary × batches rows. Compact the count partitions
periodically like any additive lake artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)


def token_counts_sink(out_dir: str, text_col: str):
    """foreachBatch sink appending per-batch (tok, n) partial counts —
    additive artifact, so no state dir (module docstring)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = (
            batch_df.select(
                F.explode(X.tokens(text_col)).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        counts.write.mode("overwrite").parquet(
            f"{out_dir}/snapshot={batch_id}"
        )

    return sink


def maintain_zipf_profile(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str,
):
    """Attach the token-count sink to a document stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            token_counts_sink(out_dir, text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_zipf_profile(
    spark: SparkSession, out_dir: str, k: int = 100
) -> DataFrame | None:
    """(rank, token, n_occurrences, cum_share, n_total_tokens, n_types)
    over the delivered history: sum-fold of every committed count
    partition (one flat multi-path read), then the batch operator's own
    rank/share arithmetic (`quality.zipf_from_counts`) over the folded
    exact integers — bit-identical to batch `zipf_profile` with no
    ordering contract at all. None before any commit."""
    from ods_to_datalake_spark.operators.quality import (
        zipf_from_counts,
    )

    snaps = list_cdc_snapshots(spark, out_dir)
    if not snaps:
        return None
    counts = (
        spark.read.parquet(
            *[f"{out_dir}/snapshot={b}" for b in snaps]
        )
        .groupBy("tok")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return zipf_from_counts(counts, k=k)
