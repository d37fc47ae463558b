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
    # The per-category table feeds two plan legs (its own output AND
    # the global fold below); without a barrier Catalyst plans the
    # aggregation subtree twice and the input is scanned twice — the
    # x25 shared-frame rule. per_cat is category-cardinality-sized,
    # so an eager localCheckpoint is cheap and makes the input
    # genuinely read once (guide §2.4; runs one Spark job at
    # DataFrame-construction time, like the graph operators).
    per_cat = (
        df.groupBy(F.col(category_col).alias("category"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(label).cast("long").alias("hits"),
        )
        .localCheckpoint(eager=True)
    )
    # Global totals are the exact integer sums of the per-category
    # partials — fold them from `per_cat` instead of re-aggregating
    # `df`. Integer sums are associative, so __gn and __gh are
    # value-identical to a direct global aggregate.
    glob = per_cat.agg(
        F.sum("n").cast("decimal(38,0)").alias("__gn"),
        F.sum("hits").cast("decimal(38,0)").alias("__gh"),
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


def feature_hash(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, bucket, value) — the hashing trick (Weinberger et al.
    2009): each token hashes to one of ``n_buckets`` feature indices
    plus an independent ±1 sign, and the feature value is the signed
    token count — the fixed-width, vocabulary-free featurizer that
    turns unbounded text into model input with NO trained state (no
    vocab table to build, ship, or keep consistent across corpus
    versions; collisions cancel in expectation because of the sign).

    Determinism: md5 is the one hash both engines share (CLAUDE.md),
    so bucket = first 8 md5 hex chars of ``'fh:'+token`` mod
    n_buckets and sign = +1 iff the 9th hex char's high bit is clear
    ('0'-'7') — all integer arithmetic on non-negative operands.
    Zero-sum buckets (a +1 and a −1 colliding) stay in the output:
    they are computed values, and dropping them would make the frame
    depend on collision luck instead of the corpus.

    Scale: explode to the token stream (whitespace tokens of
    lowercased text — the corpus-wide tokenization every text
    operator here shares), one (id, bucket) partial-aggregated
    groupBy — output is at most min(doc tokens, n_buckets) rows per
    document, map-side combinable, and needs no join at apply time
    (the whole point vs a vocab featurizer like x41's)."""
    from ods_to_datalake_spark.functions import text as X

    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(X.tokens(text_col)).alias("__tok"),
    )
    digest = F.md5(F.concat(F.lit("fh:"), F.col("__tok")))
    bucket = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )
    sign = F.when(
        F.substring(digest, 9, 1).isin(
            "0", "1", "2", "3", "4", "5", "6", "7"
        ),
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tok.select("id", bucket.alias("bucket"), sign.alias("__s"))
        .groupBy("id", "bucket")
        .agg(F.sum("__s").cast("long").alias("value"))
    )


def calibration_report(
    df: DataFrame,
    pred_num,
    pred_den,
    label,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, n_pos, mean_pred, frac_pos, abs_gap, ece) — reliability
    diagram + Expected Calibration Error (Naeini et al. 2015; Guo et
    al. 2017) of a [0,1] score used as a probability: bin rows by
    predicted score, compare each bin's mean prediction with its
    realized positive rate, and weight the absolute gaps into one ECE
    number (repeated on every row of the bin-count-sized report). The
    eval that decides whether a quality/relevance score's VALUE is
    trustworthy as a probability, or only its ranking (x75 evaluates
    ranking; this evaluates the scale).

    Exactness contract: the prediction enters as an INTEGER rational
    ``pred_num / pred_den`` (scores in real pipelines are ratios of
    counts; a float column has no engine-stable bin assignment at bin
    boundaries). Binning is the all-integer comparison
    ``least(n_bins−1, (n_bins·num) div den)`` — the x42 boundary rule,
    exact at every edge. Rows with ``pred_den <= 0`` (empty docs) have
    no defined score and are excluded; ``label`` must be 0/1.
    Per-bin mean_pred: each row's IEEE quotient (deterministic,
    correctly rounded) is quantized to DECIMAL(18,12) BEFORE the sum
    (float sums are partition-order-dependent; decimal sums are
    order-free), then ONE cast + ONE division; frac_pos is one IEEE
    division of exact BIGINTs; ECE folds the per-bin |gap|·n terms
    through DECIMAL(28,12) the same way (10 doubles summed in
    partition order would already be unstable).

    Scale: one bin-keyed partial agg over the scored stream (map-side
    combinable, n_bins groups), then 1-row totals crossJoined back —
    nothing after the first agg exceeds n_bins rows."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    num = pred_num.cast("long")
    den = pred_den.cast("long")
    base = df.select(
        num.alias("__num"), den.alias("__den"), label.alias("__y")
    ).where(F.col("__den") > 0)
    binned = base.select(
        F.least(
            F.lit(n_bins - 1).cast("long"),
            F.expr(f"(CAST({n_bins} AS BIGINT) * __num) div __den"),
        ).alias("bin"),
        (F.col("__num").cast("double") / F.col("__den").cast("double"))
        .cast("decimal(18,12)")
        .alias("__p"),
        F.col("__y").cast("long").alias("__y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum("__p").alias("__sp"),
    )
    scored = per_bin.select(
        "bin",
        "n",
        "n_pos",
        (F.col("__sp").cast("double") / F.col("n").cast("double"))
        .alias("mean_pred"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double"))
        .alias("frac_pos"),
    ).withColumn(
        "abs_gap", F.abs(F.col("mean_pred") - F.col("frac_pos"))
    ).localCheckpoint()  # n_bins rows; feeds the report AND the ECE agg
    tot = scored.agg(
        F.sum(
            (F.col("abs_gap") * F.col("n").cast("double")).cast(
                "decimal(28,12)"
            )
        ).alias("__gsum"),
        F.sum("n").cast("long").alias("__N"),
    )
    return scored.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        "mean_pred",
        "frac_pos",
        "abs_gap",
        (
            F.col("__gsum").cast("double") / F.col("__N").cast("double")
        ).alias("ece"),
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str,
    date_col: str,
    amount_col,
    n_bins: int = 4,
) -> DataFrame:
    """(r_bin, f_bin, m_bin, n_customers, total_cents) — the classic
    RFM segmentation grid (Hughes 1994): per customer, Recency (days
    since last order, measured from the dataset's own max order date
    — data-derived, so the result is reproducible), Frequency (order
    count) and Monetary (total cents) are each cut into ``n_bins``
    NTILE bins with bin 1 = BEST (most recent / most frequent /
    highest spend), and the output is the occupancy grid — the
    at-a-glance "champions vs at-risk vs hibernating" panel CRM and
    lifecycle targeting reads first, and the canonical multi-metric
    binning member of the profile family (u16/u23 cut ONE metric).

    Determinism: NTILE over a total order — every ORDER BY carries
    the unique customer key as tiebreak (the repo-wide top-k rule),
    so tied metrics split identically in both engines (NTILE's
    earlier-buckets-get-the-extra-row rule is shared SQL semantics);
    recency is an exact integer day difference of midnight dates;
    monetary sums cents (Decimal(18,2)·100). NULL customers are
    excluded; NULL dates/amounts simply don't contribute to their
    customer's aggregates, and a customer with no non-NULL date has
    no recency — excluded, counted nowhere (no-evidence rule).

    Scale: ONE customer-keyed shuffle to the per-customer RFM frame,
    then three NTILE windows over the CUSTOMER-sized frame — a
    dimension, not a fact, but still the u16 single-partition-window
    regime: at 1e9+ customers swap the NTILE for the value-table
    rank arithmetic (u23/u25's shape) per metric; the grid agg is
    n_bins³-bounded."""
    return rfm_finalize(
        rfm_partials(orders, customer_col, date_col, amount_col),
        n_bins=n_bins,
    )


def rfm_partials(
    orders: DataFrame,
    customer_col: str,
    date_col: str,
    amount_col,
) -> DataFrame:
    """(__cust, __last, __freq, __cents) — the per-customer MERGEABLE
    RFM state behind `rfm_segments`: max-date / count / cents-sum are
    all semigroup folds, so partials from different batches merge to
    exactly the single-pass state (the ohlc_partials algebra — a late
    order that improves a customer's recency simply wins the next
    max-merge; the streaming face's per-batch sink payload). A
    customer whose orders so far all have NULL dates carries a NULL
    __last — excluded by the finalize, resurrected the moment a real
    date arrives."""
    return (
        orders.where(F.col(customer_col).isNotNull())
        .groupBy(F.col(customer_col).alias("__cust"))
        .agg(
            F.max(F.col(date_col)).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("__freq"),
            F.coalesce(
                F.sum(
                    (amount_col.cast("decimal(18,2)") * 100).cast(
                        "long"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("__cents"),
        )
    )


def rfm_merge(partials: DataFrame) -> DataFrame:
    """Fold a union of `rfm_partials` frames back into one state row
    per customer — max of maxes, sums of counts/cents: bit-identical
    to a single-pass `rfm_partials` over the concatenated orders."""
    return partials.groupBy("__cust").agg(
        F.max("__last").alias("__last"),
        F.sum("__freq").cast("long").alias("__freq"),
        F.sum("__cents").cast("long").alias("__cents"),
    )


def rfm_finalize(
    per_cust_all: DataFrame, n_bins: int = 4
) -> DataFrame:
    """Project the mergeable per-customer state to the public
    (r_bin, f_bin, m_bin, n_customers, total_cents) grid — shared by
    batch `rfm_segments` and the streaming face so the two cannot
    drift (the ohlc_finalize contract)."""
    from pyspark.sql import Window

    per_cust = per_cust_all.where(F.col("__last").isNotNull())
    asof = per_cust.agg(F.max("__last").alias("__asof"))
    rfm = per_cust.crossJoin(F.broadcast(asof)).select(
        "__cust",
        F.datediff(F.col("__asof"), F.col("__last"))
        .cast("long")
        .alias("__rec"),
        "__freq",
        "__cents",
    )
    wr = Window.orderBy(F.col("__rec").asc(), F.col("__cust").asc())
    wf = Window.orderBy(F.col("__freq").desc(), F.col("__cust").asc())
    wm = Window.orderBy(
        F.col("__cents").desc(), F.col("__cust").asc()
    )
    binned = rfm.select(
        F.ntile(n_bins).over(wr).cast("long").alias("r_bin"),
        F.ntile(n_bins).over(wf).cast("long").alias("f_bin"),
        F.ntile(n_bins).over(wm).cast("long").alias("m_bin"),
        "__cents",
    )
    return binned.groupBy("r_bin", "f_bin", "m_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("__cents").cast("long").alias("total_cents"),
    )


def lift_table(
    df: DataFrame,
    score,
    label,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n_rows, n_pos, cum_rows, cum_pos, capture_rate,
    cum_lift) — the cumulative-gains / decile-lift table of a score
    against a 0/1 label: sort by score DESCENDING (highest scored
    targeted first), cut into ``n_bins`` equal-population bins, and
    report per bin how much of the positive class the top-k bins
    capture and the lift over random targeting — the third member of
    the score-eval family (x95 asks CAN the score separate at all,
    x81 whether its value is a probability; this asks the operational
    question: "if I act on the top 20%, what fraction of the
    positives do I get"). cum_lift of bin b = capture through b ÷
    population share through b; random targeting reads 1.0.

    Exactness: ``score`` must be INTEGER-valued, ``label`` 0/1; rows
    with a NULL in either are excluded. Binning is all-integer (the
    x42 boundary rule): a tied-score block whose first row sits at
    descending position `cum_before` lands WHOLE in bin
    ``(n_bins·cum_before) div n`` — ties never split across bins (a
    split would need an arbitrary intra-tie order), so a dominant
    tied block may leave later bins empty (absent rows, not
    fabricated zeros) and own more than 1/n_bins of the mass; all
    counts fold as exact BIGINTs and capture/lift are single IEEE
    divisions of exact integer cross-products. No positives →
    NULL capture/lift (CASE-guarded).

    Scale: ONE score-keyed pre-agg shuffle to the per-distinct-value
    frame, a cumulative window over the DOMAIN-sized value frame
    (u23/u25's shape — never a per-row rank over the corpus), an
    n_bins-bounded agg and an n_bins-bounded cumulative window."""
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    rows = df.select(
        score.cast("long").alias("__s"),
        label.cast("long").alias("__y"),
    ).where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per_v = rows.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum("__y").cast("long").alias("__p"),
    )
    w_cum = (
        Window.orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    cum = per_v.select(
        "__c",
        "__p",
        (F.sum("__c").over(w_cum) - F.col("__c"))
        .cast("long")
        .alias("__cb"),
        F.sum("__c").over(w_all).cast("long").alias("__n"),
        F.sum("__p").over(w_all).cast("long").alias("__np"),
    )
    binned = cum.select(
        F.expr(f"(CAST({n_bins} AS BIGINT) * __cb) div __n")
        .cast("long")
        .alias("bin"),
        "__c",
        "__p",
        "__n",
        "__np",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum("__p").cast("long").alias("n_pos"),
        F.max("__n").cast("long").alias("__n"),
        F.max("__np").cast("long").alias("__np"),
    )
    w_bins = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = per_bin.select(
        "bin",
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(w_bins).cast("long").alias("cum_rows"),
        F.sum("n_pos").over(w_bins).cast("long").alias("cum_pos"),
        "__n",
        "__np",
    )
    d38 = "decimal(38,0)"
    return staged.select(
        "bin",
        "n_rows",
        "n_pos",
        "cum_rows",
        "cum_pos",
        F.when(
            F.col("__np") > 0,
            F.col("cum_pos").cast("double")
            / F.col("__np").cast("double"),
        ).alias("capture_rate"),
        F.when(
            (F.col("__np") > 0) & (F.col("cum_rows") > 0),
            (F.col("cum_pos").cast(d38) * F.col("__n").cast(d38))
            .cast("double")
            / (F.col("cum_rows").cast(d38) * F.col("__np").cast(d38))
            .cast("double"),
        ).alias("cum_lift"),
    )
