"""Deterministic corpus sampling (training-data curation).

Random `df.sample()` is reproducible only per partitioning (the seed is
applied per-partition), which breaks the reproducibility contract a
training-data pipeline needs: the SAME document set must come out
regardless of cluster size, file splits, or engine. These operators
sample by content hash instead — a pure function of the row key — so
results are stable across runs, partitionings, and engines (md5 is the
one hash DuckDB shares with Spark; see plans/suite.py determinism
rules).

Scale: hash sampling is a stateless map — no shuffle, fully pushed into
the scan stage; the rate lookup is a literal CASE decode (no join).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(id_col: str | Column, buckets: int = HASH_BUCKETS) -> Column:
    """Stable per-row bucket in [0, buckets): first 8 md5 hex chars of
    the stringified key (32 bits — safely inside int64, cf. the 14-hex
    rule for the MinHash digest halves)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def deterministic_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """(id, shard, shard_pos): reproducible global training order — the
    distributed equivalent of "shuffle the dataset once, then shard
    it", as a pure function of the row keys. Shard membership is the
    content-stable `hash_bucket`; the position within a shard orders
    by (md5(id), id) — a deterministic pseudo-random permutation, so
    feeding shards round-robin replays the identical example order
    across runs, partitionings, cluster sizes, and engines (rand()
    and df.sample() are only seed-stable per partitioning).

    Scale: one shuffle on the shard key; the per-shard row_number
    window parallelizes across shards — pick n_shards ≥ executor
    cores (thousands at 100 TB) and every reducer partition stays
    bounded at corpus/n_shards. There is deliberately NO global
    row_number (a single-partition window) anywhere.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy("shard").orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        df.select(F.col(id_col))
        .withColumn("shard", hash_bucket(id_col, n_shards))
        .withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    keep_per_10k: Mapping[str, int],
    default_per_10k: int = HASH_BUCKETS,
) -> DataFrame:
    """Downsample over-represented strata to integer per-10k rates.

    `keep_per_10k` maps stratum value → rows kept per 10 000 (e.g.
    {"web": 3000} keeps 30%). Integer thresholds avoid float-rate
    boundary ambiguity across engines. Rows whose stratum is absent
    from the map keep `default_per_10k`.
    """
    rate: Column = F.lit(default_per_10k)
    for value, keep in keep_per_10k.items():
        rate = F.when(F.col(strata_col) == value, F.lit(keep)).otherwise(
            rate
        )
    return df.filter(hash_bucket(id_col) < rate)


# 20-bit fractional-sampling bucket: small enough that every integer
# product below stays far inside int64 (see temperature_mixture).
FRAC_BITS = 20
FRAC_BUCKETS = 1 << FRAC_BITS


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weight_col: str,
    target_total: int | None = None,
) -> DataFrame:
    """Temperature-smoothed mixture resampling (the XLM-R / multilingual
    pretraining α-sampling shape, α = 0.5): re-draw the corpus so each
    stratum's share of the output follows sqrt of its *mass* (the sum
    of ``weight_col``, e.g. characters or tokens) instead of its raw
    share — flattening dominant sources and boosting the tail. Strata
    whose target exceeds their row count are UP-sampled by
    deterministic replication (output gains a ``replica`` index);
    over-target strata are down-sampled by content hash.

    Everything is integer arithmetic so membership is exact and
    engine-independent (no float rate boundaries; cf. SURVEY
    determinism rules):

    - per-stratum mass ``c_s`` and rows ``n_s`` (one small agg);
    - weight ``w_s = floor(sqrt(c_s))`` — sqrt is IEEE-exact in every
      engine, floor pins the integer;
    - target rows ``k_s = (T * w_s) div sum(w_s)`` where ``T`` is
      ``target_total`` (default: the input row count — rebalance at
      constant size);
    - each row gets ``k_s div n_s`` copies plus one more iff its
      20-bit md5 bucket ``B`` satisfies ``B * n_s < (k_s mod n_s) *
      2^20`` — expected per-stratum output exactly ``k_s``.

    Scale: the stats table has one row per stratum (broadcast join);
    the rest is a stateless map + explode — no corpus shuffle at all.
    Integer products stay in int64 for ``n_s`` up to ~8e12 rows per
    stratum; beyond that widen the two comparison products to
    DECIMAL(38,0). Empty or weightless strata (NULL/zero mass) drop
    out with a guarded denominator rather than dividing by zero.
    """
    w_s = F.floor(F.sqrt(F.col("__c_s"))).cast("long")
    stats = (
        df.groupBy(F.col(strata_col).alias("__stratum"))
        .agg(
            F.count(F.lit(1)).alias("__n_s"),
            F.sum(F.col(weight_col)).alias("__c_s"),
        )
        .withColumn("__w_s", w_s)
    )
    tot = stats.agg(
        F.sum("__w_s").alias("__den"), F.sum("__n_s").alias("__t")
    )
    t_expr = (
        str(int(target_total)) if target_total is not None else "__t"
    )
    rates = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "__k_s",
            F.expr(
                # `div` is exact integral division (long / on longs is
                # DOUBLE division in Spark — a silent precision trap)
                "CASE WHEN __den > 0"
                f" THEN ({t_expr} * __w_s) div __den"
                " ELSE CAST(0 AS BIGINT) END"
            ).cast("long"),
        )
        .select("__stratum", "__n_s", "__k_s")
    )
    bkt = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 5), 16, 10)
        .cast("long")
        .alias("__bkt")
    )
    copies = (
        F.expr("__k_s div __n_s")
        + F.when(
            F.col("__bkt") * F.col("__n_s")
            < (F.col("__k_s") % F.col("__n_s")) * F.lit(FRAC_BUCKETS),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("long")
    return (
        df.join(
            F.broadcast(rates), df[strata_col] == F.col("__stratum"), "inner"
        )
        .withColumn("__bkt", bkt)
        .withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            "replica",
            # sequence(long, long) yields long elements; a generator
            # cannot be nested inside a cast expression
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("__copies") - 1)
            ),
        )
        .drop("__stratum", "__n_s", "__k_s", "__bkt", "__copies")
    )


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Bottom-k-by-hash sample: the k rows with the smallest
    md5(id) per group — (by..., rank, id, sample hash prefix).

    Three properties rate-based sampling (`stratified_sample`) lacks:
    EXACT k rows per group regardless of group size (a 10-row source
    and a 10^9-row source both yield k), deterministic (same rows in
    any engine, any partitioning — ties cannot occur because the
    unique id breaks them), and MERGEABLE: the bottom-k of a union is
    the bottom-k of the per-part bottom-k's, so per-corpus sample
    tables combine without re-scanning (the KMV sketch construction —
    the k-th smallest hash also estimates the group's distinct count
    as (k-1)·2^32/h_k if a caller wants it).

    Scale shape: rank<=k windows rewrite to WindowGroupLimit — a
    per-partition top-k heap BEFORE the shuffle, so a skewed group
    moves k rows per input partition, never the group
    (plan-asserted in the operator test).

    NULL ids are excluded (the family-wide sketch rule — they would
    rank nulls-first into every sample, tie with each other, and the
    SQL mirror's hex cast would crash on them).
    """
    from pyspark.sql.window import Window

    from ods_to_datalake_spark.operators.sketch import _hex_long

    keys = list(by or [])
    hashed = df.where(F.col(id_col).isNotNull()).select(
        *keys,
        F.col(id_col),
        _hex_long(F.md5(F.col(id_col).cast("string")), 1, 8).alias(
            "sample_h"
        ),
    )
    w = Window.partitionBy(*keys).orderBy("sample_h", id_col)
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rank", id_col, "sample_h")
    )


def leakage_free_split(
    labeled: DataFrame,
    label_col: str,
    boundaries: list[tuple[int, str]] = [
        (80, "train"),
        (90, "val"),
        (100, "test"),
    ],
) -> DataFrame:
    """Train/val/test assignment hashed on a GROUP label instead of
    the row id: every row sharing ``label_col`` (a near-dup cluster
    id, a source domain, a user id) lands in the SAME split — the
    leakage-safe version of `x19`'s per-document hash split (splitting
    near-duplicate documents across train and test silently leaks
    training data into evaluation; splitting by cluster can't).
    ``boundaries`` are cumulative integer percents over the md5
    bucket — all-integer membership, the suite-wide sampling rule.
    Pure map-side expression over the labeled frame: the only cost is
    whatever join produced the labels.

    NULL labels hash to NULL, which would assign split=NULL and
    silently vanish from every split filter — they are routed to the
    explicit 'unlabeled' split instead (coalesce labels upstream, as
    x66 does, if NULL should mean "its own singleton")."""
    bucket = hash_bucket(label_col, 100)
    assignment = None
    for hi, name in boundaries:
        cond = bucket < F.lit(hi)
        assignment = (
            F.when(cond, name)
            if assignment is None
            else assignment.when(cond, name)
        )
    return labeled.withColumn(
        "split", assignment.otherwise(F.lit("unlabeled"))
    )


def stratified_exact_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    k: int,
) -> DataFrame:
    """Draw EXACTLY ``k`` rows with per-stratum quotas allocated by the
    largest-remainder method (Hamilton apportionment): stratum s gets
    floor(n_s·k/N) rows plus one of the k − Σfloor leftovers, awarded
    by (remainder DESC, stratum ASC) — the proportional allocation
    with zero rounding drift that `stratified_sample`'s per-10k rates
    can't promise (rate-based sampling is Binomial per stratum; this
    is the fixed-budget eval-set / annotation-batch draw). With
    k <= N the draw is exactly k rows; k > N degrades gracefully to
    every row (each quota clamps at its population — checking would
    cost an extra action).

    Within a stratum, rows are the bottom-quota by (md5(id), id) —
    the x59 deterministic-sample rule: content-blind, seedless,
    reproducible, and md5 is the hash both engines share. All
    arithmetic is integer (n_s·k div N / mod N — never a float rate,
    the sampling-boundary rule); remainder ranking is a window over
    the STRATA-sized frame; row selection is a per-stratum rank the
    engine executes as WindowGroupLimit, so a huge stratum moves
    quota-ish rows per partition, never its population.

    Output: the sampled rows as (stratum, id, quota). NULL strata
    form their own stratum (SQL GROUP BY — the quota join is
    NULL-SAFE, a plain equi-join would silently drop the whole NULL
    stratum); NULL ids are excluded (no deterministic hash
    position)."""
    if k < 0:
        raise ValueError(f"k must be >= 0: {k}")
    rows = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(id_col).alias("id"),
    ).where(F.col(id_col).isNotNull())
    per = rows.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    from pyspark.sql import Window

    # total via a whole-frame window over the STRATA-sized frame (a
    # crossJoin with an agg of the same lineage trips Spark's
    # ambiguous-attribute resolution), named __tot NOT __N: Spark
    # column resolution is case-INSENSITIVE by default, so __N and
    # __n are the SAME name and the window silently replaced the
    # per-stratum count (caught by the x77 oracle)
    wall = Window.partitionBy()
    alloc = per.withColumn(
        "__tot", F.sum("__n").over(wall)
    ).select(
        "stratum",
        "__n",
        "__tot",
        F.expr(f"(__n * {k}) div __tot").alias("__base"),
        F.expr(f"(__n * {k}) % __tot").alias("__rem"),
    )
    wrank = Window.orderBy(
        F.desc("__rem"), F.asc_nulls_first("stratum")
    )
    alloc = alloc.withColumn(
        "__extras", F.lit(k) - F.sum("__base").over(wall)
    ).withColumn("__rk", F.row_number().over(wrank))
    quotas = alloc.select(
        "stratum",
        (
            F.col("__base")
            + F.when(F.col("__rk") <= F.col("__extras"), 1).otherwise(0)
        ).cast("long").alias("quota"),
    )
    w = Window.partitionBy("stratum").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    # rank <= LITERAL k first: no quota exceeds k (base = k only in
    # the single-stratum case, where extras = 0), and only a literal
    # bound lets InferWindowGroupLimit rewrite the window so each
    # partition keeps a k-heap BEFORE the exchange — filtered against
    # the join-derived quota column alone, a huge stratum would sort
    # its whole population (plan-asserted in tests). The exact
    # per-stratum quota filter then runs on <= k rows per stratum.
    ranked = rows.withColumn("__p", F.row_number().over(w)).where(
        F.col("__p") <= F.lit(k)
    )
    q = quotas.select(
        F.col("stratum").alias("__qs"), "quota"
    )
    return (
        ranked.join(
            F.broadcast(q),
            ranked["stratum"].eqNullSafe(q["__qs"]),
        )
        .where(F.col("__p") <= F.col("quota"))
        .select("stratum", "id", "quota")
    )


def weighted_exact_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Weight-proportional EXACT-k sample without replacement
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): each row enters an exponential race with rate = its
    weight — race_key r_i = −ln(u_i)/w_i with u_i a deterministic
    hash-uniform — and the k SMALLEST race keys win, which draws
    exactly the successive weighted-sampling-without-replacement
    distribution. The fixed-budget draw the sampling family lacked:
    x24/x42 are rate-based (Binomial counts), x59/x77 are exact-k but
    weight-BLIND — this one makes a 10×-weight row 10× as likely to
    claim a seat, the shape of quality-weighted eval draws and
    importance-weighted annotation batches.

    Cross-engine determinism (the charter discipline for the float
    u^(1/w) key): u_i = (md5-prefix(id) + 1)/2^32+1 is an identical
    double in both engines (integer hash, one literal division);
    −ln(u) is a TRANSCENDENTAL on a data-dependent domain, so it is
    quantized per-term to DECIMAL(18,12) — oracle via the VARCHAR hop
    (the u17 rule) — before ONE IEEE division by the weight; identical
    operands + identical ops → bit-identical race keys, and the
    unique id breaks any residual tie. Deterministic means
    REPRODUCIBLE, not rerollable: re-running draws the same sample
    (the x59/x19 membership-stability property); vary the id→hash
    salt upstream for a fresh draw.

    Weights must be positive integers (cents — the u23 rule);
    non-positive/NULL weights and NULL ids are excluded (a zero-rate
    racer never finishes; NULL has no hash position).

    Scale: map-only key computation; rank<=k per group rewrites to
    WindowGroupLimit — a per-partition k-heap BEFORE the shuffle
    (plan-asserted), so a skewed stratum moves k rows per input
    partition, never its population. Mergeable like bottom-k: the
    winners of a union are the winners of the per-part winners, so
    per-shard samples fold without re-scanning."""
    from pyspark.sql import Window

    from ods_to_datalake_spark.operators.sketch import _hex_long

    keys = list(by or [])
    base = (
        df.where(F.col(id_col).isNotNull())
        .select(*keys, F.col(id_col), weight.cast("long").alias("weight"))
        .where(F.col("weight") > 0)
    )
    h = _hex_long(F.md5(F.col(id_col).cast("string")), 1, 8)
    u = (h + F.lit(1)).cast("double") / F.lit(4294967297.0)
    lnq = (-F.log(u)).cast("decimal(18,12)")
    keyed = base.withColumn(
        "race_key", lnq.cast("double") / F.col("weight").cast("double")
    )
    w = Window.partitionBy(*keys).orderBy("race_key", id_col)
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rank", id_col, "weight", "race_key")
    )
