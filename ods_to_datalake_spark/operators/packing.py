"""Sequence packing: assign documents to fixed-size token windows.

The pretraining batch-prep step: a corpus is concatenated into a token
stream and cut every `target_len` tokens; each document's training
position is (sequence index, offset) of where its tokens start. This
operator computes that assignment relationally — no token
materialization, just token *counts* and a running sum.

Scale design: a single global concatenation order would need a
one-partition window (non-distributed). Real packers shard first and
pack within shards, which is what `pack_sequences` does: shard =
stable md5 bucket of the id (same convention as
`sampling.hash_bucket`, so membership is engine- and
partitioning-independent), then ONE shuffle on the shard key and an
in-shard ordered window. Shard count bounds per-task state; at 100 TB
raise `n_shards` so each shard's doc list fits a task comfortably —
packing quality is unaffected because sequences never span shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    target_len: int,
    n_shards: int = 32,
) -> DataFrame:
    """Contiguous-fill packing: (id, shard, n_tokens, seq_idx, offset).

    Within each shard documents are concatenated in `id_col` order;
    `seq_idx` is the fixed-size window the document STARTS in and
    `offset` its start position there (documents may straddle window
    boundaries — the concat-and-cut semantics GPT-style pretraining
    uses; a doc spans windows seq_idx .. (cum+n_tokens-1)/target_len).
    """
    shard = hash_bucket(id_col, n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col),
            shard.alias("shard"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "cum_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long")),
        )
        .select(
            id_col,
            "shard",
            "n_tokens",
            # integer division, not float-divide-then-truncate: cumsum
            # magnitudes at corpus scale would hit double rounding
            F.expr(f"cum_before div {int(target_len)}").alias("seq_idx"),
            (F.col("cum_before") % target_len).cast("long").alias("offset"),
        )
    )
