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


def packing_report(
    packed: DataFrame, target_len: int
) -> DataFrame:
    """(shard, n_docs, total_tokens, n_windows, utilization,
    n_straddlers, straddler_share) — the efficiency audit of a
    `pack_sequences` layout, per shard: how many fixed-size training
    windows the shard cuts into, how full they are, and how many
    documents STRADDLE a window boundary — the three numbers that
    price a packing run (windows = step count, utilization = padding
    waste, straddlers = documents whose attention span a cut splits;
    concat-and-cut wastes tokens ONLY in each shard's final partial
    window, so utilization here isolates exactly that tail).

    Exactness: all counts exact BIGINTs off the packed frame itself
    (never recomputed from text); n_windows = ceil(total/target) as
    integer arithmetic ((total + target − 1) div target); a document
    straddles iff offset + n_tokens > target_len (zero-token documents
    never straddle); utilization = total/(windows·target) and
    straddler_share are ONE IEEE division each, CASE-guarded when a
    shard holds only zero-token docs (0 windows is no evidence).

    Scale: one shard-keyed partial agg over the packed table (which
    already paid its shard shuffle — composing keeps the partitioning);
    output is shard-count-sized."""
    t = int(target_len)
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("long")
            .alias("total_tokens"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("offset") + F.col("n_tokens") > t, 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_straddlers"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.expr(f"(total_tokens + {t - 1}) div {t}").alias(
                "n_windows"
            ),
            F.when(
                F.col("total_tokens") > 0,
                F.col("total_tokens").cast("double")
                / (
                    F.expr(f"(total_tokens + {t - 1}) div {t}")
                    * t
                ).cast("double"),
            ).alias("utilization"),
            "n_straddlers",
            (
                F.col("n_straddlers").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("straddler_share"),
        )
    )
