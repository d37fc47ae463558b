"""Market-basket co-occurrence: item pairs appearing in the same
basket — the recommendation / association-mining primitive ("customers
who bought X also bought Y") and the edge-builder for item graphs
(`graph.triangle_count` closes the loop).

Plan shape: distinct (basket, item) pairs, a basket-keyed self-join
emitting C(|basket|, 2) ordered pairs per basket, a partial-aggregated
pair count. Work is Σ |basket|² — bounded by BASKET width, not corpus
size (retail baskets are tens of items; a degenerate mega-basket — a
crawler session, a bot cart — is the skew hazard, so ``max_basket``
drops oversized baskets before the self-join and `oversized_baskets`
reports them: the dedup.cap_bucket_width contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_items(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    return (
        df.select(
            F.col(basket_col).alias("__basket"),
            F.col(item_col).alias("__item"),
        )
        .where(
            F.col("__basket").isNotNull()
            & F.col("__item").isNotNull()
        )
        .distinct()
    )


def cooccurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_baskets) for distinct item pairs sharing a
    basket (item_a < item_b), ``n_baskets`` = how many baskets contain
    both, filtered to >= ``min_count``."""
    items = _basket_items(df, basket_col, item_col)
    if max_basket is not None:
        widths = items.groupBy("__basket").agg(
            F.count(F.lit(1)).alias("__w")
        )
        items = items.join(
            widths.filter(F.col("__w") <= max_basket).drop("__w"),
            "__basket",
        )
    a = items.select("__basket", F.col("__item").alias("item_a"))
    b = items.select("__basket", F.col("__item").alias("item_b"))
    return (
        a.join(b, "__basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
        .where(F.col("n_baskets") >= F.lit(min_count))
    )


def oversized_baskets(
    df: DataFrame, basket_col: str, item_col: str, max_basket: int
) -> DataFrame:
    """(basket, n_items) for baskets wider than ``max_basket`` — what
    `cooccurrence(max_basket=...)` would drop (B items emit B² pairs;
    a capped pipeline reports its spills, never reads as complete)."""
    return (
        _basket_items(df, basket_col, item_col)
        .groupBy(F.col("__basket").alias("basket"))
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") > max_basket)
    )
