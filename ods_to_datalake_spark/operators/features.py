"""ML featurization: smoothed target encoding — the standard
category→number transform for high-cardinality categoricals
(Micci-Barreca, SIGKDD Explorations 2001): encode each category as a
shrinkage blend of its own target rate and the global prior,

    enc(c) = (hits_c + m · global_rate) / (n_c + m)

so rare categories pull toward the prior instead of memorizing noise
(the m=0 case is a plain per-category mean; large m is the prior).

Exactness: the blend is computed as ONE division of two exact
integers cross-multiplied through the global denominator —
``(hits_c·N + m·H) / ((n_c + m)·N)`` with H/N the global hit/row
counts — in DECIMAL(38,0) (products of two corpus-scale BIGINTs
overflow int64 at ~10^10 rows; decimal keeps them exact in both
engines), then one correctly-rounded cast to DOUBLE and one IEEE
division — bit-identical cross-engine (the q02 raw-quotient rule; the
oracle casts its HUGEINT operands through VARCHAR per the
DECIMAL(38)→DOUBLE 1-ulp note in CLAUDE.md).

Scale: one partial-aggregated groupBy over the labeled stream plus a
1-row global aggregate broadcast back — the encoder table is
category-cardinality-sized, a mergeable lake artifact like the DSIR /
LM model tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encoding(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: int = 10,
) -> DataFrame:
    """(category, n, hits, enc) — smoothed target rate per category.
    ``target_col`` must be an integer 0/1 label (cast upstream); NULL
    categories form their own group (an encoder must map unseen/NULL
    at apply time); NULL labels count as 0 toward hits but stay in
    ``n`` (they are rows the category was seen in)."""
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0: {smoothing}")
    label = F.coalesce(
        F.col(target_col).cast("long"), F.lit(0)
    )
    per_cat = df.groupBy(
        F.col(category_col).alias("category")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(label).cast("long").alias("hits"),
    )
    glob = df.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__gn"),
        F.sum(label).cast("decimal(38,0)").alias("__gh"),
    )
    j = per_cat.crossJoin(F.broadcast(glob))
    num = (
        F.col("hits").cast("decimal(38,0)") * F.col("__gn")
        + F.lit(smoothing) * F.col("__gh")
    )
    den = (
        F.col("n").cast("decimal(38,0)") + F.lit(smoothing)
    ) * F.col("__gn")
    return j.select(
        "category",
        "n",
        "hits",
        (num.cast("double") / den.cast("double")).alias("enc"),
    )
