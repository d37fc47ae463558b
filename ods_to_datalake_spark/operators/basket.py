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
    items: DataFrame | None = None,
) -> DataFrame:
    """(item_a, item_b, n_baskets) for distinct item pairs sharing a
    basket (item_a < item_b), ``n_baskets`` = how many baskets contain
    both, filtered to >= ``min_count``. ``items`` lets a caller that
    already materialized the deduplicated (__basket, __item) table
    (association_rules feeds it to FOUR plan legs) pass it in instead
    of re-deriving it per leg."""
    if items is None:
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


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Association-rule statistics for every co-occurring ordered pair
    (item_a < item_b): member counts, pair count, and the Apriori
    trio — support = n_ab/N, confidence(a→b) = n_ab/n_a, and
    lift = (n_ab·N)/(n_a·n_b) (>1 ⇔ positively associated).

    Exactness: every ratio is ONE IEEE division of exact integers
    (the q02 raw-quotient rule). The lift operands are products of
    two corpus-scale counts — computed in DECIMAL(38,0) (they
    overflow int64 at ~10^10 baskets, the x68 rule), then one
    correctly-rounded cast each to DOUBLE. support/confidence
    operands are bare BIGINTs (< 2^53 — exact in DOUBLE directly).

    Plan: the pair table (basket-width-bounded self-join), an
    item-cardinality count table joined back on each side, and a
    1-row basket total broadcast via crossJoin — no window, no
    driver state; the rule table is a mergeable lake artifact like
    the co-occurrence edges it extends. The deduplicated item table
    feeds FOUR legs (pair join ×2, item counts, basket total), so it
    is localCheckpoint-materialized (the x25/g03 rule)."""
    items = _basket_items(df, basket_col, item_col).localCheckpoint()
    pairs = cooccurrence(
        df, basket_col, item_col, min_count, items=items
    )
    item_counts = items.groupBy(
        F.col("__item").alias("item")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    total = items.select("__basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__N")
    )
    j = (
        pairs.join(
            item_counts.select(
                F.col("item").alias("item_a"),
                F.col("n_item").alias("n_a"),
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("item").alias("item_b"),
                F.col("n_item").alias("n_b"),
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
    )
    dec = "decimal(38,0)"
    lift_num = (
        F.col("n_baskets").cast(dec) * F.col("__N").cast(dec)
    ).cast("double")
    lift_den = (
        F.col("n_a").cast(dec) * F.col("n_b").cast(dec)
    ).cast("double")
    return j.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_baskets",
        (
            F.col("n_baskets").cast("double")
            / F.col("__N").cast("double")
        ).alias("support"),
        (
            F.col("n_baskets").cast("double")
            / F.col("n_a").cast("double")
        ).alias("confidence"),
        (lift_num / lift_den).alias("lift"),
    )


def also_bought_topk(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_count: int = 1,
) -> DataFrame:
    """(item, neighbor, n_baskets, rank) — each item's top-``k``
    co-purchased neighbors by (n_baskets DESC, neighbor ASC), the
    serving table behind every "customers also bought" panel. The
    symmetric closure of the pair table feeds a per-item rank window
    that Spark executes as WindowGroupLimit (the x59 shape): each
    partition keeps a k-heap BEFORE the one exchange, so a blockbuster
    item moves k rows per input partition, never its full neighbor
    list. The pair table feeds both closure legs, so it is
    localCheckpoint-materialized (the x25/g03 rule)."""
    pairs = cooccurrence(
        df, basket_col, item_col, min_count
    ).localCheckpoint()
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "n_baskets",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "n_baskets",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("item").orderBy(
        F.desc("n_baskets"), F.asc("neighbor")
    )
    return (
        sym.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= k)
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
