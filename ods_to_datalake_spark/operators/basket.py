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

from pyspark import StorageLevel as _SL

# corpus-scale checkpoints (the deduplicated item table, the pair
# table) store DISK_ONLY — the graph.py rule: memory-resident
# checkpoint blocks are never freed across stress cells/reps and
# OOMed the 8g heap at 30x on the same-scale edge tables
_DISK_ONLY = _SL.DISK_ONLY


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


def _pair_stats(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int,
) -> DataFrame:
    """Shared rule-table scaffold: the co-occurrence pairs joined to
    each side's item cardinality and the 1-row basket total —
    (item_a, item_b, n_a, n_b, n_baskets, __N). The deduplicated item
    table feeds FOUR plan legs (pair join ×2, item counts, basket
    total), so it is localCheckpoint-materialized (the x25/g03
    rule)."""
    items = _basket_items(df, basket_col, item_col).localCheckpoint(
        eager=True, storageLevel=_DISK_ONLY
    )
    pairs = cooccurrence(
        df, basket_col, item_col, min_count, items=items
    )
    item_counts = items.groupBy(
        F.col("__item").alias("item")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    total = items.select("__basket").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__N")
    )
    return (
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
    the co-occurrence edges it extends (`_pair_stats`)."""
    j = _pair_stats(df, basket_col, item_col, min_count)
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


def rule_information_scores(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Information-theoretic association scores for every co-occurring
    pair (item_a < item_b): PMI and Dunning's log-likelihood ratio —
    the two scores that separate "frequent because both items are
    popular" from "genuinely associated" (lift's log-scale and
    significance-weighted forms).

        pmi = ln( n_ab·N / (n_a·n_b) ) = ln(lift)
        llr = 2 · Σ_ij k_ij · ln( k_ij·N / (R_i·C_j) )

    over the 2×2 contingency table k11=n_ab, k12=n_a−n_ab,
    k21=n_b−n_ab, k22=N−n_a−n_b+n_ab with row/col totals R/C
    (Dunning 1993, "Accurate Methods for the Statistics of Surprise
    and Coincidence"). Zero cells contribute 0 (the x·ln x → 0
    limit), CASE-guarded so the ln never evaluates on them — an
    unguarded zero cell is an ANSI ln(0)/divide-by-zero crash, and a
    zero cell with a zero marginal (n_a = N) would divide 0/0.

    Cross-engine exactness (the x38/x52 transcendental discipline):
    every ln INPUT is one IEEE division of two correctly-rounded
    count products (DECIMAL(38,0) products cast to DOUBLE — the
    oracle round-trips DuckDB's HUGEINT products through VARCHAR,
    whose parse is correctly rounded at every magnitude), so both
    engines feed ln identical doubles; ln itself diverges by 1 ulp on
    ~6% of integer-ratio inputs, so each ln is quantized to
    DECIMAL(18,6) BEFORE any multiplication/summation, the k_ij
    weights multiply in exact decimal, the 4-term sum and the ×2 stay
    decimal, and the final decimal→double cast happens once per
    output column (finalize_output / the double_cols VARCHAR
    round-trip). Plan shape: identical to `association_rules` —
    `_pair_stats` + row-local arithmetic, nothing new shuffles."""
    j = _pair_stats(df, basket_col, item_col, min_count)
    n_ab, n_a, n_b, nn = (
        F.col("n_baskets"),
        F.col("n_a"),
        F.col("n_b"),
        F.col("__N"),
    )
    d38 = "decimal(38,0)"

    def ratio(num_l, num_r, den_l, den_r):
        return (num_l.cast(d38) * num_r.cast(d38)).cast("double") / (
            den_l.cast(d38) * den_r.cast(d38)
        ).cast("double")

    def term(k, row_total, col_total):
        q = F.log(ratio(k, nn, row_total, col_total)).cast(
            "decimal(18,6)"
        )
        return (
            F.when(k == 0, F.lit(0).cast("decimal(30,6)"))
            .otherwise(
                (k.cast("decimal(18,0)") * q).cast("decimal(30,6)")
            )
        )

    k11, k12 = n_ab, n_a - n_ab
    k21, k22 = n_b - n_ab, nn - n_a - n_b + n_ab
    llr = (
        term(k11, n_a, n_b)
        + term(k12, n_a, nn - n_b)
        + term(k21, nn - n_a, n_b)
        + term(k22, nn - n_a, nn - n_b)
    ) * F.lit(2)
    pmi = F.log(ratio(n_ab, nn, n_a, n_b)).cast("decimal(18,6)")
    return j.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_baskets",
        pmi.alias("pmi"),
        llr.alias("llr"),
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Item-item set similarity over basket memberships — the
    memory-based collaborative-filtering neighborhood (Sarwar et al.
    2001, item-based CF): for every co-occurring pair (item_a <
    item_b), Jaccard = n_ab/(n_a+n_b−n_ab) and binary cosine =
    n_ab/√(n_a·n_b) of the two items' basket SETS. Where x70's
    lift/x72's PMI measure statistical association, these are the
    bounded [0,1] neighborhood weights a recommender actually serves.

    Exactness WITHOUT quantization: counts are exact BIGINTs
    (< 2^53 — exact in DOUBLE); the cosine denominator product rides
    DECIMAL(38,0) then one correctly-rounded cast (oracle mirrors via
    HUGEINT→VARCHAR→DOUBLE, the x70 rule), and sqrt is IEEE
    CORRECTLY ROUNDED — bit-stable cross-engine (the e10 z-score
    precedent), unlike ln. Each score is then a single IEEE division
    of identical doubles. Plan: `_pair_stats` + row-local arithmetic
    (same as x70/x72)."""
    j = _pair_stats(df, basket_col, item_col, min_count)
    n_ab, n_a, n_b = (
        F.col("n_baskets").cast("double"),
        F.col("n_a"),
        F.col("n_b"),
    )
    d38 = "decimal(38,0)"
    denom = F.sqrt(
        (n_a.cast(d38) * n_b.cast(d38)).cast("double")
    )
    return j.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_baskets",
        (
            n_ab
            / (n_a + n_b - F.col("n_baskets")).cast("double")
        ).alias("jaccard"),
        (n_ab / denom).alias("cosine"),
    )


def also_bought_topk(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_count: int = 1,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(item, neighbor, n_baskets, rank) — each item's top-``k``
    co-purchased neighbors by (n_baskets DESC, neighbor ASC), the
    serving table behind every "customers also bought" panel. The
    symmetric closure of the pair table feeds a per-item rank window
    that Spark executes as WindowGroupLimit (the x59 shape): each
    partition keeps a k-heap BEFORE the one exchange, so a blockbuster
    item moves k rows per input partition, never its full neighbor
    list. The pair table feeds both closure legs, so it is
    localCheckpoint-materialized (the x25/g03 rule). ``pairs`` lets a
    caller that already materialized the co-occurrence table (x75
    shares it between the rec and truth legs) pass it in — it must
    already be checkpointed/persisted."""
    if pairs is None:
        pairs = cooccurrence(
            df, basket_col, item_col, min_count
        ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
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


def dcg_gain_table(k: int) -> list[tuple[int, object, object]]:
    """(rank, gain, idcg) for ranks 1..k with gain = 1/log2(rank+1)
    quantized per the x38/g07 transcendental discipline and idcg the
    exact-decimal prefix sum — computed ONCE in Python so both the
    Spark plan and the SQL oracle share the IDENTICAL literals (no
    cross-engine log2 at all: bit-stability by construction)."""
    import decimal as _d
    import math as _m

    rows: list[tuple[int, object, object]] = []
    acc = _d.Decimal(0)
    for r in range(1, k + 1):
        q = _d.Decimal(_m.log2(r + 1)).quantize(
            _d.Decimal("0.000001")
        )
        gain = _d.Decimal(1.0 / float(q)).quantize(
            _d.Decimal("0.000000000001")
        )
        acc += gain
        rows.append((r, gain, acc))
    return rows


def ranking_metrics(
    recs: DataFrame,
    truth: DataFrame,
    k: int,
) -> DataFrame:
    """(qid, n_rec, n_rel, hits, precision_at_k, recall_at_k, ndcg_at_k)
    — offline ranking evaluation of a recommendation/retrieval run
    against a relevance set (the eval loop behind every recommender /
    search / RAG-retrieval pipeline): ``recs`` is (qid, item, rank)
    with rank 1-based and unique per qid, ``truth`` is (qid, item)
    relevant pairs. Only ranks <= ``k`` count.

        precision@k = hits / k          (a query that served fewer
                                         than k rows is penalized for
                                         the gap — the standard @k
                                         convention)
        recall@k    = hits / |truth|
        ndcg@k      = DCG / IDCG,  DCG = Σ_hits 1/log2(rank+1),
                      IDCG = Σ_{i=1..min(k,|truth|)} 1/log2(i+1)

    Truth-only qids appear with all-miss zeros (that is what aggregate
    metrics are made of); rec-only qids appear with n_rel = 0 and NULL
    recall/ndcg — no relevance set to score against, and emitting 0
    would conflate "nothing relevant exists" with "missed everything"
    (CASE-guarded identically in both engines).

    Malformed input is scored AS-IS, deterministically (pinned by
    test): a well-formed producer emits unique ranks and unique items
    per qid, but if it doesn't, every (qid, item, rank <= k) row
    scores independently — n_rec counts rows, a truth item served
    twice hits twice, each row adds its rank's gain — so duplicate
    serving INFLATES precision/ndcg (possibly past 1.0), which is the
    honest reading: the list really did spend two of its k slots on
    one item. No ordering dependence, no validation scan on the hot
    path (an eager uniqueness check would cost a corpus-scale count
    per call; callers who need the guarantee dedupe upstream).
    ``truth`` duplicates are deduped (a relevance SET).

    Determinism: counts are exact BIGINTs; precision/recall are ONE
    IEEE division each (the q02 rule). The DCG gains are a
    TRANSCENDENTAL, so they are computed ONCE in driver Python
    (`dcg_gain_table` — quantized DECIMAL(18,12) literals shared
    verbatim with the SQL oracle: no cross-engine log2 anywhere), the
    per-qid DCG is an exact decimal SUM (order-free), IDCG is the
    exact-decimal prefix sum joined from the same k-row literal, and
    ndcg is one IEEE division of two identically-derived doubles (the
    oracle round-trips its decimals through VARCHAR per the
    DECIMAL(38)→DOUBLE 1-ulp note).

    Scale shape: one (qid, item) equi-join (the hit test) + qid-keyed
    partial aggs; the gain/idcg tables are k-row broadcast literals;
    metric tables are query-set sized — nothing corpus-scale survives
    the first join."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    spark = recs.sparkSession
    table = dcg_gain_table(k)
    gains = spark.createDataFrame(
        [(r, g) for r, g, _ in table],
        "rank long, gain decimal(18,12)",
    )
    idcg = spark.createDataFrame(
        [(r, i) for r, _, i in table],
        "rank long, idcg decimal(28,12)",
    )
    r = (
        recs.select(
            F.col(recs.columns[0]).alias("qid"),
            F.col(recs.columns[1]).alias("item"),
            F.col(recs.columns[2]).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= k)
        .join(F.broadcast(gains), "rank")
    )
    t = truth.select(
        F.col(truth.columns[0]).alias("qid"),
        F.col(truth.columns[1]).alias("item"),
    ).distinct()
    per_rec = r.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_rec")
    )
    per_truth = t.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    hits = r.join(t, ["qid", "item"]).groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("hits"),
        F.sum("gain").alias("__dcg"),
    )
    out = (
        per_truth.join(per_rec, "qid", "full_outer")
        .join(hits, "qid", "left")
        .withColumn(
            "__clamped",
            F.least(F.coalesce("n_rel", F.lit(0)), F.lit(k)),
        )
        .join(
            F.broadcast(idcg),
            F.col("__clamped") == F.col("rank"),
            "left",
        )
    )
    return out.select(
        "qid",
        F.coalesce("n_rec", F.lit(0)).alias("n_rec"),
        F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
        F.coalesce("hits", F.lit(0)).alias("hits"),
        (
            F.coalesce("hits", F.lit(0)).cast("double") / F.lit(k)
        ).alias("precision_at_k"),
        F.when(
            F.coalesce("n_rel", F.lit(0)) > 0,
            F.coalesce("hits", F.lit(0)).cast("double")
            / F.col("n_rel").cast("double"),
        ).alias("recall_at_k"),
        F.when(
            F.coalesce("n_rel", F.lit(0)) > 0,
            F.coalesce(
                F.col("__dcg"), F.lit(0).cast("decimal(28,12)")
            ).cast("double")
            / F.col("idcg").cast("double"),
        ).alias("ndcg_at_k"),
    )
