"""Table profiling and declarative data-quality checks.

The lake-side counterpart of the reference's manual "verify the synced
table" step (ibs_ordinary_payment_utilities.py reads the written
parquet back and eyeballs counts — sources/reader.read_back_verify
mechanizes the count; this module mechanizes the rest): per-column
statistics an engine would keep in its catalog, and a constraint audit
that turns "the sync is correct" into declared, counted expectations
(the Deequ/expectations pattern, relationally).

Scale notes:

- `table_profile` is ONE wide aggregate over the table — min/max/null
  counts combine map-side; the exact distinct counts ride Spark's
  Expand (one shuffle per aggregate distinct-set, AQE-coalesced). For
  100-TB profiling swap `exact_distinct=False` to reuse the
  HLL-sketch estimate (`operators/sketch`) per column instead; the
  audit queries keep exact counts because the oracle must match
  bit-for-bit.
- Each constraint is a count-only aggregate (partial-aggregated) or a
  key anti-join (broadcast when the parent side is a dimension); the
  report is a union of 1-row frames — constraint count, not data
  size, bounds the plan.
- min/max are emitted as strings so one long-format report covers
  heterogeneous columns; only string-stable types (integers, DECIMAL,
  VARCHAR, DATE) should be profiled cross-engine — a raw DOUBLE's
  shortest-repr rendering is NOT engine-stable (CLAUDE.md), cast it
  to DECIMAL first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format per-column profile: one row per column with the
    table row count, null count, (approx or exact) distinct count of
    non-null values, and lexicographic-native min/max rendered as
    strings. One aggregate job regardless of column count."""
    cols = cols or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.count(F.when(col.isNull(), 1)).alias(f"__nn_{c}")
        )
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__nd_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("__n_rows").alias("n_rows"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """Violations = rows where ``col`` IS NULL."""
    return df.agg(
        F.lit(f"not_null({col})").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_checked"),
        F.count(F.when(F.col(col).isNull(), 1)).alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (NULL-keyed rows
    count as ordinary values, matching SQL GROUP BY semantics). Two
    partial-aggregated shuffles on the key, never a window."""
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.lit(f"unique({','.join(cols)})").alias("constraint_name"),
        # COALESCE: SUM over the empty key table is NULL, not 0
        F.coalesce(F.sum("__n"), F.lit(0)).alias("n_checked"),
        (
            F.coalesce(F.sum("__n"), F.lit(0)) - F.count(F.lit(1))
        ).alias("n_violations"),
    )


def check_in_set(df: DataFrame, col: str, values: list) -> DataFrame:
    """Violations = non-null values outside the allowed set (NULLs are
    `check_not_null`'s job — a membership test that also policed NULL
    would double-count against both constraints)."""
    rendered = ",".join(str(v) for v in values)
    return df.agg(
        F.lit(f"in_set({col}:{rendered})").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_checked"),
        F.count(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(values), 1
            )
        ).alias("n_violations"),
    )


def check_satisfies(
    df: DataFrame, name: str, condition: Column
) -> DataFrame:
    """Violations = rows where ``condition`` is not TRUE (FALSE *or*
    NULL — an unevaluable row is evidence against the constraint, the
    conservative audit reading)."""
    return df.agg(
        F.lit(f"satisfies({name})").alias("constraint_name"),
        F.count(F.lit(1)).alias("n_checked"),
        F.count(F.when(~condition.eqNullSafe(F.lit(True)), 1)).alias(
            "n_violations"
        ),
    )


def check_functional_dependency(
    df: DataFrame, determinant: list[str], dependent: str
) -> DataFrame:
    """Violations = determinant groups mapping to MORE THAN ONE
    dependent value — the functional-dependency audit (``lhs → rhs``)
    behind schema normalization checks, denormalized-copy drift
    detection, and key discovery (an FD whose determinant is every
    other column's determinant is a candidate key; `check_unique`
    covers that case directly).

    Semantics pinned cross-engine: determinant NULLs group together
    (SQL GROUP BY in both engines); the dependent's distinct count
    treats NULL as ONE extra value (COUNT(DISTINCT x) skips NULLs in
    both engines, so a MAX(is-null flag) adds it back) — a group
    mapping to {5, NULL} IS a violation, the conservative audit
    reading. ``n_checked`` counts determinant GROUPS (the unit the
    constraint quantifies over), like `check_unique` counts rows.

    Scale: two partial-aggregated shuffles on the determinant — the
    distinct-dependent count rides Spark's Expand exactly like
    `table_profile`'s distinct counts; never a window, never a
    self-join."""
    name = f"fd({','.join(determinant)}->{dependent})"
    dep = F.col(dependent)
    per_group = df.groupBy(*determinant).agg(
        (
            F.count_distinct(dep)
            + F.max(F.when(dep.isNull(), 1).otherwise(0))
        ).alias("__nd")
    )
    return per_group.agg(
        F.lit(name).alias("constraint_name"),
        F.count(F.lit(1)).alias("n_checked"),
        F.count(F.when(F.col("__nd") > 1, 1)).alias("n_violations"),
    )


def check_foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Violations = non-null child keys with no parent row (orphans;
    NULL FKs are legal per SQL). One anti-join — broadcast when the
    parent is dimension-sized, shuffle-keyed otherwise."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    fk = child.filter(F.col(child_col).isNotNull())
    orphans = fk.join(keys, child_col, "left_anti")
    n_checked = fk.agg(F.count(F.lit(1)).alias("n")).select("n")
    n_bad = orphans.agg(F.count(F.lit(1)).alias("b")).select("b")
    return n_checked.crossJoin(n_bad).select(
        F.lit(f"foreign_key({child_col})").alias("constraint_name"),
        F.col("n").alias("n_checked"),
        F.col("b").alias("n_violations"),
    )


def constraint_report(checks: list[DataFrame]) -> DataFrame:
    """Union the per-constraint 1-row frames into the audit report,
    with a pass flag. Row order is not meaningful (the constraint name
    is the key)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn(
        "passed", F.col("n_violations") == F.lit(0)
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column drift report between two snapshots of the same
    table — the monitoring face of `table_profile`: one row per
    column with both snapshots' row/null/distinct counts, the
    null-RATE delta, and whether the min/max moved (null-safe string
    compare, matching the profile's lexicographic-native rendering).

    Exactness: counts are exact BIGINTs; ``null_rate_delta`` is two
    raw BIGINT/BIGINT divisions and one subtract, replayed in the
    same order by both engines (the e10 z-score rule), CASE-guarded
    to NULL when either snapshot is empty.

    Scale: each snapshot pays ONE wide aggregate (the table_profile
    shape — at 100 TB swap ``exact_distinct=False`` for HLL
    registers); the drift join moves column-count rows. Profiles are
    the monitoring artifact a lake stores per snapshot, so in steady
    state this is a join of two persisted tiny tables, not two scans
    — `build_profile` persists them, `profile_drift_tables` diffs two
    stored profiles without touching the facts."""
    return profile_drift_tables(
        table_profile(old, cols, exact_distinct),
        table_profile(new, cols, exact_distinct),
    )


def build_profile(
    df: DataFrame,
    path: str,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> None:
    """Persist `table_profile` as a per-snapshot lake artifact (one
    tiny parquet, column-count rows) — the steady-state face of
    `profile_drift`: profile each snapshot ONCE when it lands, then
    every later drift check joins two stored tables and never rescans
    the facts (the build_lm/build_dsir train-once/apply-forever
    split). Counts and string-rendered extrema are exact/deterministic,
    so a rebuild over unchanged data is bit-identical
    (replay-idempotent, tested)."""
    table_profile(df, cols, exact_distinct).write.mode(
        "overwrite"
    ).parquet(path)


def read_profile(spark, path: str) -> DataFrame:
    """Read a `build_profile` artifact back."""
    return spark.read.parquet(path)


def profile_drift_tables(po: DataFrame, pn: DataFrame) -> DataFrame:
    """`profile_drift` over two ALREADY-COMPUTED profiles (live
    `table_profile` frames or `read_profile` artifacts) — the
    column-name join + delta arithmetic alone, moving column-count
    rows; diffing two persisted snapshots costs no fact scan at
    all."""
    o = po.select(
        "column_name",
        F.col("n_rows").alias("old_rows"),
        F.col("n_nulls").alias("old_nulls"),
        F.col("n_distinct").alias("old_distinct"),
        F.col("min_value").alias("__omn"),
        F.col("max_value").alias("__omx"),
    )
    n = pn.select(
        "column_name",
        F.col("n_rows").alias("new_rows"),
        F.col("n_nulls").alias("new_nulls"),
        F.col("n_distinct").alias("new_distinct"),
        F.col("min_value").alias("__nmn"),
        F.col("max_value").alias("__nmx"),
    )
    j = o.join(n, "column_name")
    rate = lambda nulls, rows: F.col(nulls).cast("double") / F.col(
        rows
    ).cast("double")
    delta = F.when(
        (F.col("old_rows") > 0) & (F.col("new_rows") > 0),
        rate("new_nulls", "new_rows") - rate("old_nulls", "old_rows"),
    )
    return j.select(
        "column_name",
        "old_rows",
        "new_rows",
        "old_nulls",
        "new_nulls",
        "old_distinct",
        "new_distinct",
        delta.alias("null_rate_delta"),
        (~F.col("__omn").eqNullSafe(F.col("__nmn"))).alias(
            "min_changed"
        ),
        (~F.col("__omx").eqNullSafe(F.col("__nmx"))).alias(
            "max_changed"
        ),
    )


def robust_outlier_report(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    k: int = 3,
) -> DataFrame:
    """(group…, n, n_null, median_v, mad_v, n_outliers) — per-group
    robust outlier audit on an INTEGER-valued measure: exact median,
    exact MAD (median absolute deviation), and the count of rows with
    |x − median| > k·MAD — the Hampel/3-MAD filter that a mean±stddev
    audit gets wrong on the exact data it exists for (one extreme
    order drags the mean AND inflates the stddev, masking itself;
    the median and MAD have 50% breakdown — Hampel 1974, Leys 2013).

    Exactness contract: ``value`` must be integer-valued (money goes
    in as CENTS — the Decimal(18,2)·100 rule). The median is defined
    as the LOWER-middle ORDER STATISTIC (row_number (n+1) div 2 over
    value ASC), not the two-middle interpolation — the result is an
    ELEMENT of the data, everything downstream (deviations, MAD, the
    k·MAD comparison) stays in exact BIGINT arithmetic, and both
    engines compute the identical value with no float anywhere.
    NULLs are excluded from the order statistics and counted in
    ``n_null``; a group with ZERO non-NULL values has no order
    statistics at all and is absent from the report (check_not_null /
    u12 is the audit for those). Degenerate groups are well-defined: a single row has
    MAD 0 and is never its own outlier (strict >); an all-equal group
    with one stray flags exactly the strays when the majority value
    dominates (MAD 0 → any nonzero deviation flags — the documented
    MAD-filter behavior on constant data).

    Scale: ONE hash shuffle on the group key, then two in-partition
    sorts (the value ranks, then the deviation ranks — one Exchange
    reused by every window and the final aggregate; the median/MAD
    order statistics spread to their partitions as conditional window
    maxes, never a join back). Exact per-group order statistics at
    100 TB cost exactly this sort — for the approximate tier use the
    GK-sketch quantiles (`operators/agg.gk_bins`, u03) instead."""
    from pyspark.sql import Window

    g = [F.col(c) for c in group_cols]
    base = df.select(*g, value.cast("long").alias("__v"))
    vals = base.filter(F.col("__v").isNotNull())
    nulls = base.filter(F.col("__v").isNull()).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_null")
    )
    # ONE window chain on ONE grouping — the median and the MAD are
    # conditional window maxes (the (n+1) div 2-ranked element spread
    # to its whole partition), never a join back: a med/mad-frame join
    # would recompute the ranked chain per leg (measured: 5 Exchanges
    # in the join form vs 2 here)
    w_grp = Window.partitionBy(*group_cols)
    w_val = Window.partitionBy(*group_cols).orderBy("__v")
    w_dev = Window.partitionBy(*group_cols).orderBy("__d")
    scored = (
        vals.withColumn("__rn", F.row_number().over(w_val))
        .withColumn("__n", F.count(F.lit(1)).over(w_grp))
        .withColumn(
            "median_v",
            F.max(
                F.when(
                    F.col("__rn") == F.expr("(__n + 1) div 2"),
                    F.col("__v"),
                )
            ).over(w_grp),
        )
        .withColumn("__d", F.abs(F.col("__v") - F.col("median_v")))
        .withColumn("__drn", F.row_number().over(w_dev))
        .withColumn(
            "mad_v",
            F.max(
                F.when(
                    F.col("__drn") == F.expr("(__n + 1) div 2"),
                    F.col("__d"),
                )
            ).over(w_grp),
        )
    )
    flagged = scored.groupBy(*group_cols).agg(
        F.max("__n").cast("long").alias("n"),
        F.max("median_v").alias("median_v"),
        F.max("mad_v").alias("mad_v"),
        F.sum(
            F.when(
                F.col("__d") > F.lit(k) * F.col("mad_v"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )
    return flagged.join(F.broadcast(nulls), group_cols, "left").select(
        *group_cols,
        "n",
        F.coalesce("n_null", F.lit(0)).cast("long").alias("n_null"),
        "median_v",
        "mad_v",
        "n_outliers",
    )


def benford_table() -> list[tuple[int, str]]:
    """The nine Benford first-digit probabilities p_d = log10(1+1/d)
    as 12-decimal STRING literals, computed ONCE in driver Python and
    shared VERBATIM by the Spark plan and the SQL oracle — the x75
    enumerable-domain rule: a transcendental whose input domain is 9
    values never crosses engines at all (JVM log10 and libm log10
    diverge by 1 ulp on some inputs; two identical literals cannot)."""
    import math

    return [
        (d, f"{math.log10(1.0 + 1.0 / d):.12f}") for d in range(1, 10)
    ]


def benford_audit(df: DataFrame, value: Column) -> DataFrame:
    """(digit, n_obs, obs_share, expected_share, chi2_term, n_total,
    chi2) — first-digit frequency of a positive integer measure vs
    Benford's law (Newcomb 1881; Benford 1938), with the χ² statistic
    — the fraud/fabrication screen for financial and count data
    (invented amounts are uniform-ish in the leading digit; organic
    multiplicative data is logarithmic). Money enters as CENTS: a
    ×100 scaling appends zeros and never changes the leading digit.

    Exactness: the leading digit is the first character of the
    BIGINT's decimal rendering (integer→string is identical in both
    engines — no float log10 digit extraction); NULL and ≤ 0 values
    are excluded (Benford is defined on positive magnitudes). The
    expected shares are driver-literal decimals (`benford_table`), so
    the only floats are per-digit IEEE ops on identical operands; the
    9 χ² terms are quantized DECIMAL(28,12) before the order-free
    total (the ECE fold rule — even 9 doubles sum in partition
    order). All 9 digits always appear (a digit with ZERO
    observations is evidence, not absence — its χ² term is N·p_d);
    an empty input emits the 9-row spine with zero counts and NULL
    shares/χ² (CASE-guarded divisions).

    Scale: one partial-aggregated groupBy over the measure (9
    groups), a 9-row literal spine join, everything after is
    9-row arithmetic."""
    from decimal import Decimal

    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(d, Decimal(p)) for d, p in benford_table()],
        "digit long, expected_share decimal(18,12)",
    )
    counts = (
        df.select(value.cast("long").alias("__v"))
        .where(F.col("__v") > 0)
        .select(
            F.substring(F.col("__v").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = counts.agg(
        F.coalesce(F.sum("n_obs"), F.lit(0))
        .cast("long")
        .alias("n_total")
    )
    per = (
        spine.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            "expected_share",
            "n_total",
        )
        .withColumn(
            "obs_share",
            F.when(
                F.col("n_total") > 0,
                F.col("n_obs").cast("double")
                / F.col("n_total").cast("double"),
            ),
        )
        .withColumn(
            "__exp_n",
            F.col("expected_share").cast("double")
            * F.col("n_total").cast("double"),
        )
        .withColumn(
            "chi2_term",
            F.when(
                F.col("n_total") > 0,
                (F.col("n_obs").cast("double") - F.col("__exp_n"))
                * (F.col("n_obs").cast("double") - F.col("__exp_n"))
                / F.col("__exp_n"),
            ),
        )
        .localCheckpoint()  # 9 rows; feeds the report AND the χ² fold
    )
    chi = per.agg(
        F.sum(F.col("chi2_term").cast("decimal(28,12)")).alias("__c")
    )
    return per.crossJoin(F.broadcast(chi)).select(
        "digit",
        "n_obs",
        F.col("obs_share"),
        F.col("expected_share").cast("double").alias("expected_share"),
        "chi2_term",
        "n_total",
        F.col("__c").cast("double").alias("chi2"),
    )


def concentration_profile(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """(column_name, n_rows, n_distinct, top_value, top_count,
    top_share, gini_impurity) — per-column value-concentration
    profile: the Gini impurity 1 − Σ(nᵢ/N)² and the modal value's
    share — the "is this column a key, a category, or a constant"
    diagnostic that row/null counts (u11) don't answer: impurity ≈ 1
    with distinct ≈ N is key-like, impurity ≈ 0 is near-constant
    (a candidate for dictionary encoding, partition pruning, or a
    broken upstream join), and a high top_share flags the hot key
    every skew mitigation (operators/skew) wants named BEFORE the
    shuffle that hits it.

    Exactness: Gini = (N² − Σnᵢ²) / N² — all-integer numerator and
    denominator over DECIMAL(38,0) (Σnᵢ² crosses int64 when one value
    dominates ~3e9 rows), ONE IEEE division per column (operands
    VARCHAR-hopped in the oracle — u17's cast rule); top value by
    (count DESC, value ASC — deterministic at ties) rendered as a
    string (only string-stable types, the u11 rule — cast DOUBLE
    columns to DECIMAL first); NULL is a value here (profiled as the
    literal string 'NULL'), because a 99%-NULL column IS concentrated
    — that is the finding.

    Scale: the columns MELT into one long (column_name, value) stream
    first, so ALL columns share ONE value-count shuffle + one
    column-keyed rollup (k× fewer exchanges than per-column chains —
    measured 8 → 2 on four columns); every profiled column always
    appears (empty table → zero counts, NULL ratios), via the
    column-name spine."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.coalesce(
                            F.col(c).cast("string"), F.lit("NULL")
                        ).alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.*")
    counts = melted.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return concentration_from_counts(
        df.sparkSession, counts, cols
    )


def concentration_from_counts(
    spark, counts: DataFrame, cols: list[str]
) -> DataFrame:
    """`concentration_profile`'s derivation over a pre-built long
    (column_name, v, n) count table — split out so the STREAMING face
    (which folds per-batch additive value counts from the lake)
    derives the profile through the SAME expressions and stays
    bit-identical by construction (the zipf_from_counts pattern;
    value counts are additive). The column-name spine keeps every
    profiled column present on empty input."""
    d38 = "decimal(38,0)"
    per_col = counts.groupBy("column_name").agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.min(
            F.struct(
                (-F.col("n")).alias("__nc"),
                F.col("v").alias("__val"),
            )
        ).alias("__top"),
        F.coalesce(
            F.sum(F.col("n").cast(d38) * F.col("n").cast(d38)),
            F.lit(0).cast(d38),
        ).alias("__sq"),
    )
    spine = spark.createDataFrame(
        [(c,) for c in cols], "column_name string"
    )
    return (
        F.broadcast(spine)
        .join(per_col, "column_name", "left")
        .select(
            "column_name",
            F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce("n_distinct", F.lit(0))
            .cast("long")
            .alias("n_distinct"),
            F.col("__top.__val").alias("top_value"),
            (-F.col("__top.__nc")).cast("long").alias("top_count"),
            F.when(
                F.col("n_rows") > 0,
                (-F.col("__top.__nc")).cast("double")
                / F.col("n_rows").cast("double"),
            ).alias("top_share"),
            F.when(
                F.col("n_rows") > 0,
                (
                    F.col("n_rows").cast(d38)
                    * F.col("n_rows").cast(d38)
                    - F.col("__sq")
                ).cast("double")
                / (
                    F.col("n_rows").cast(d38)
                    * F.col("n_rows").cast(d38)
                ).cast("double"),
            ).alias("gini_impurity"),
        )
    )


def correlation_pair_stats(
    df: DataFrame, cols: list[tuple[str, Column]]
) -> DataFrame:
    """(col_x, col_y, n, sx, sy, sxy, sxx, syy) — one row per unordered
    column pair holding the exact Pearson sufficient statistics over
    the PAIRWISE-complete rows. These are ADDITIVE (plain sums), which
    is what makes the correlation panel streamable: per-batch rows
    sum-fold across batches and `correlation_finalize` derives r from
    the folded exact integers. See `correlation_profile` (the batch
    composition) for the full exactness contract; the plan here is
    the ONE map-side-combinable wide aggregate + 1-row explode.

    Arithmetic path (measured at 30x/18M rows): the DOMINANT cost was
    never the arithmetic choice but expression inlining - see the
    pre-projection note in the body. Products multiply in
    DECIMAL(18,0) deliberately: a long-multiply path (sum(CAST(x*y AS
    DECIMAL(20,0)))) measured 2.75x cheaper on the sums but bounds
    VALUES at |x| < ~3e9 - and the adversarial relational tier's
    1e15-cent rows THREW on it (ANSI-loud, caught by
    test_relational_edge_parity before it shipped); a hi/lo long
    split was 5.5x but bounds ROWS at ~2e9. The decimal-multiply form
    keeps the operand domain at 1e18 with no row ceiling below
    decimal(38)'s - the only form that survives both axes at 100 TB;
    with pre-projection it is within ~2x of the unsafe fast path."""
    d18 = "decimal(18,0)"
    d38 = "decimal(38,0)"
    # Pre-project the integer casts ONCE under aliases so every one of
    # the 6·K(K-1)/2 aggregate expressions references a plain column:
    # with the cast chain inlined at each aggregate use site, codegen
    # re-evaluated it per reference (measured on the registered u19 at
    # 30x/18M rows: 21.7s inlined -> 3.7s pre-projected, a 5.9x win
    # worth more than any arithmetic choice below).
    base = df.select(
        *[
            expr.cast("long").cast(d18).alias(f"__v{i}")
            for i, (_, expr) in enumerate(cols)
        ]
    )
    named = [
        (name, F.col(f"__v{i}"))
        for i, (name, _) in enumerate(cols)
    ]
    aggs = []
    pairs = []
    for i in range(len(named)):
        for j in range(i + 1, len(named)):
            nx, x = named[i]
            ny, y = named[j]
            both = x.isNotNull() & y.isNotNull()
            tag = f"__{i}_{j}"
            aggs += [
                F.coalesce(
                    F.sum(F.when(both, 1)), F.lit(0)
                ).cast("long").alias(f"n{tag}"),
                F.coalesce(F.sum(F.when(both, x)), F.lit(0))
                .cast(d38)
                .alias(f"sx{tag}"),
                F.coalesce(F.sum(F.when(both, y)), F.lit(0))
                .cast(d38)
                .alias(f"sy{tag}"),
                F.coalesce(F.sum(F.when(both, x * y)), F.lit(0))
                .cast(d38)
                .alias(f"sxy{tag}"),
                F.coalesce(F.sum(F.when(both, x * x)), F.lit(0))
                .cast(d38)
                .alias(f"sxx{tag}"),
                F.coalesce(F.sum(F.when(both, y * y)), F.lit(0))
                .cast(d38)
                .alias(f"syy{tag}"),
            ]
            pairs.append((i, j, nx, ny, tag))
    wide = base.agg(*aggs)

    def pair_struct(i, j, nx, ny, tag):
        return F.struct(
            F.lit(nx).alias("col_x"),
            F.lit(ny).alias("col_y"),
            F.col(f"n{tag}").alias("n"),
            F.col(f"sx{tag}").alias("sx"),
            F.col(f"sy{tag}").alias("sy"),
            F.col(f"sxy{tag}").alias("sxy"),
            F.col(f"sxx{tag}").alias("sxx"),
            F.col(f"syy{tag}").alias("syy"),
        )

    return wide.select(
        F.explode(
            F.array(*[pair_struct(*p) for p in pairs])
        ).alias("r")
    ).select("r.*")


def correlation_finalize(stats: DataFrame) -> DataFrame:
    """(col_x, col_y, n_pairs, corr) from a (col_x, col_y, n, sx, sy,
    sxy, sxx, syy) sufficient-statistics frame — split from
    `correlation_pair_stats` so the STREAMING face (which sum-folds
    per-batch additive statistics from the lake) derives the
    correlation through the SAME expressions and stays bit-identical
    to batch by construction (the zipf_from_counts contract)."""
    d38 = "decimal(38,0)"
    n = F.col("n").cast(d38)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return stats.select(
        "col_x",
        "col_y",
        F.col("n").cast("long").alias("n_pairs"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / (
                F.sqrt(dx.cast("double"))
                * F.sqrt(dy.cast("double"))
            ),
        ).alias("corr"),
    )


def correlation_profile(
    df: DataFrame, cols: list[tuple[str, Column]]
) -> DataFrame:
    """(col_x, col_y, n_pairs, corr) — exact-arithmetic Pearson
    correlation for every unordered column pair: the feature-redundancy
    / leakage panel a training pipeline reads before fitting anything
    (|r| ≈ 1 means one column is the other in disguise — drop it or
    leak it), and the multicollinearity screen a profiler (u11/u18)
    doesn't answer. One row per pair in input order.

    Exactness contract: every ``cols`` expression must be
    INTEGER-valued (money as cents — the Decimal(18,2)·100 rule). Per
    pair, the six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    fold over the PAIRWISE-complete rows (both sides non-NULL) as
    exact DECIMAL sums — order-free, partition-invariant; then
        r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    with the three operands exact DECIMAL(38,0) integers cast ONCE to
    double (the oracle VARCHAR-hops its HUGEINT casts — the u17
    rule; both engines' √/·// are correctly-rounded IEEE on identical
    operands, so the result is bit-identical with NO transcendental
    quantization — sqrt is exact by IEEE-754, unlike ln). A constant
    column (zero variance) has no correlation: CASE-guarded NULL, not
    0. DECIMAL(38,0) headroom: n·Σxy caps at ~rows²·x̄² — at 1e12
    rows of 1e7-cent values rescale the unit, the same ceiling every
    DECIMAL money fold in this repo documents.

    Scale: ONE map-side-combinable global aggregate computes all
    K(K−1)/2 pairs' statistics in a single pass (6 conditional sums
    per pair — the rich_club wide-agg shape), then a 1-row explode;
    NO shuffle beyond the single-row agg exchange, no per-pair scans,
    no corr() UDAF (Spark's covar/corr are float-summed and
    partition-order-dependent — unusable for the cross-engine
    contract). Composition of `correlation_pair_stats` (the additive
    artifact — also the streaming face's per-batch sink payload) and
    `correlation_finalize` (the shared derivation)."""
    return correlation_finalize(correlation_pair_stats(df, cols))


def referential_audit(
    fks: list[tuple[str, DataFrame, str, DataFrame, str]]
) -> DataFrame:
    """(fk_name, n_rows, n_null_keys, n_orphan_keys, n_orphan_rows,
    orphan_share) — cross-table referential-integrity audit: for each
    declared FK edge (name, child, child_key, parent, parent_key),
    how many child rows point at a parent key that does not exist —
    the lake-health check u12's single-table constraints cannot
    answer, and the FIRST question after any partial load, GDPR
    delete, or compaction ('did we just orphan the fact table?').
    `check_foreign_key` above is the pass/fail CONSTRAINT face of one
    edge (for constraint_report gates); this is the multi-edge REPORT
    face — key-level and row-level orphan counts plus the share, the
    numbers a triage actually reads.
    Joins silently DROP orphans, which is exactly why they go
    unnoticed until a revenue number is short.

    Semantics: NULL child keys are counted separately (n_null_keys —
    a null FK is a modeling fact, not an orphan); an orphan key is a
    NON-NULL child key absent from the parent's key set;
    orphan_share = orphan_rows / non-null rows, CASE-guarded NULL
    when the child has no non-null keys. Counts exact BIGINTs; one
    IEEE division per edge.

    Scale: per edge, the child aggregates to its DISTINCT key counts
    first (vocabulary-sized — the corpus never reaches the join),
    then ONE anti-join against the parent's distinct keys (broadcast
    when the parent is a dim); output is one row per edge. The audit
    composes: run it after every ingest batch and diff."""
    if not fks:
        raise ValueError("fks must be non-empty")
    outs = []
    for name, child, ckey, parent, pkey in fks:
        ck = (
            child.where(F.col(ckey).isNotNull())
            .groupBy(F.col(ckey).alias("__k"))
            .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        )
        orphans = ck.join(
            parent.where(F.col(pkey).isNotNull())
            .select(F.col(pkey).alias("__k"))
            .distinct(),
            "__k",
            "left_anti",
        )
        totals = child.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col(ckey).isNull(), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_null_keys"),
        )
        o = orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_orphan_keys"),
            F.coalesce(F.sum("__n"), F.lit(0))
            .cast("long")
            .alias("n_orphan_rows"),
        )
        outs.append(
            totals.crossJoin(o).select(
                F.lit(name).alias("fk_name"),
                "n_rows",
                "n_null_keys",
                "n_orphan_keys",
                "n_orphan_rows",
                F.when(
                    F.col("n_rows") - F.col("n_null_keys") > 0,
                    F.col("n_orphan_rows").cast("double")
                    / (
                        F.col("n_rows") - F.col("n_null_keys")
                    ).cast("double"),
                ).alias("orphan_share"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def ks_two_sample(
    df: DataFrame,
    group: Column,
    value: Column,
) -> DataFrame:
    """(n_a, n_b, ks_d, at_value) — exact two-sample Kolmogorov–
    Smirnov statistic D = sup_x |F_a(x) − F_b(x)| between the value
    distributions of group TRUE (a) and group FALSE (b): the
    distribution-drift test behind "did this release change the SHAPE
    of the metric, not just its mean" (u14 diffs summary stats; e21
    tests one proportion; KS sees every quantile at once — a variance
    doubling with equal means is invisible to both and maximal here).
    Reject at α=.05 when D > 1.358·√((n_a+n_b)/(n_a·n_b)).

    Exactness: ``value`` must be INTEGER-valued (cents). D is found
    WITHOUT float CDFs: at every distinct value,
    |F_a − F_b| = |c_a·n_b − c_b·n_a| / (n_a·n_b) with the numerator
    an exact DECIMAL(38,0) integer (c·n crosses int64 at ~3e9 rows),
    so the argmax is an exact integer comparison — no accumulated
    float error can move it — and ks_d is ONE IEEE division at the
    end (oracle VARCHAR-hops its casts, the u17 rule). ``at_value``
    is the smallest value attaining the sup (deterministic at ties).
    NULL values and NULL group rows are excluded (no distribution
    membership); an empty side → NULL D (no evidence).

    Scale: one conditional-count agg per DISTINCT VALUE (partial,
    map-side), then cumulative windows over the distinct-VALUE frame
    — whose size is bounded by the value DOMAIN (cents of a bounded
    measure), not the row count, which is what makes the
    single-partition cumulative window survive 100 TB (the e16
    calendar-frame argument, domain-sized instead of calendar-sized);
    a 1-row argmax ends it.

    Split stats/finalize like u19's correlation: the per-value (na,
    nb) counts are the ADDITIVE artifact (`ks_from_value_counts` is
    the shared derivation), which is what gives the statistic a
    contract-free streaming face (`streaming/ks_drift.py` — frozen
    baseline vs folded ingest counts through this same arithmetic)."""
    rows = df.select(
        group.alias("__g"), value.cast("long").alias("__v")
    ).where(F.col("__v").isNotNull() & F.col("__g").isNotNull())
    per_v = rows.groupBy("__v").agg(
        F.coalesce(
            F.sum(F.when(F.col("__g"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("__na"),
        F.coalesce(
            F.sum(F.when(~F.col("__g"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("__nb"),
    )
    return ks_from_value_counts(per_v)


def ks_from_value_counts(per_v: DataFrame) -> DataFrame:
    """`ks_two_sample`'s derivation from the per-distinct-value count
    frame (__v long, __na long, __nb long) — the additive artifact a
    streaming ingest maintains (counts sum across batches; the
    statistic itself does NOT merge). One definition, so stream and
    batch cannot drift (the zipf_from_counts contract)."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    per_v = per_v.localCheckpoint()
    # domain-sized; feeds totals AND the window (the x25 rule)
    tot = per_v.agg(
        F.coalesce(F.sum("__na"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("__nb"), F.lit(0)).cast("long").alias("n_b"),
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "__v",
        F.sum("__na").over(w).cast("long").alias("__ca"),
        F.sum("__nb").over(w).cast("long").alias("__cb"),
    ).crossJoin(F.broadcast(tot))
    gap = cum.select(
        "n_a",
        "n_b",
        "__v",
        F.abs(
            F.col("__ca").cast(d38) * F.col("n_b").cast(d38)
            - F.col("__cb").cast(d38) * F.col("n_a").cast(d38)
        ).alias("__num"),
    )
    top = gap.orderBy(
        F.col("__num").desc(), F.col("__v").asc()
    ).limit(1)
    return top.select(
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("__num").cast("double")
            / (
                F.col("n_a").cast(d38) * F.col("n_b").cast(d38)
            ).cast("double"),
        ).alias("ks_d"),
        F.col("__v").alias("at_value"),
    )


def cramers_v(
    df: DataFrame, col_a: Column, col_b: Column
) -> DataFrame:
    """(n_rows, n_levels_a, n_levels_b, chi2, cramers_v) — χ²-based
    Cramér's V association between two CATEGORICAL columns: the
    "are these two labels entangled" panel that completes u19 (which
    answers it for numeric pairs) — V ∈ [0, 1], 0 independent, 1 one
    column determines the other; the pre-fit screen for redundant
    categorical features and the drift test for a (segment × outcome)
    table.

        χ² = Σ_cells (o·N − r·c)² / (N·r·c),   V = √(χ² / (N·k)),
        k = min(levels_a, levels_b) − 1

    Exactness (the u17 Benford-χ² pattern): observed o, row/col
    totals r/c, and N are exact BIGINTs; each cell's deviation
    (o·N − r·c) is computed in DECIMAL(38,0) (o·N crosses int64 at
    ~3e9 rows) and cast ONCE to double, the per-cell term
    dev²/(N·r·c) is a fixed IEEE chain on identical operands, each
    term is quantized to DECIMAL(28,12) BEFORE the fold (a double sum
    is partition-order-dependent; the oracle VARCHAR-hops its casts),
    and χ²/V are one division + one exact IEEE √ at the end. Rows
    with a NULL on either side are excluded (a NULL level belongs to
    check_not_null, not the association); single-level columns have
    k = 0 → NULL V (no evidence). Empty input → zero counts, NULL
    stats.

    Scale: one (a, b) cell-count shuffle over the table; row/col
    totals and level counts are WINDOWS over the cell frame (levels²
    rows — tiny), the grand total a 1-row broadcast; everything after
    the first agg is contingency-table-sized."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    cells = (
        df.select(col_a.alias("__a"), col_b.alias("__b"))
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        .localCheckpoint()  # contingency-sized; feeds the 1-row total
        # AND the windowed term plan (the x25 rule)
    )
    tot = cells.agg(
        F.coalesce(F.sum("__o"), F.lit(0)).cast("long").alias("__n"),
        F.count_distinct(F.col("__a")).cast("long").alias("__la"),
        F.count_distinct(F.col("__b")).cast("long").alias("__lb"),
    )
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    terms = cells.select(
        "__o",
        F.sum("__o").over(wa).cast("long").alias("__r"),
        F.sum("__o").over(wb).cast("long").alias("__c"),
    ).crossJoin(F.broadcast(tot))
    dev = (
        F.col("__o").cast(d38) * F.col("__n").cast(d38)
        - F.col("__r").cast(d38) * F.col("__c").cast(d38)
    ).cast("double")
    den = (
        F.col("__n").cast(d38)
        * F.col("__r").cast(d38)
        * F.col("__c").cast(d38)
    ).cast("double")
    q = ((dev * dev) / den).cast("decimal(28,12)")
    agg = terms.agg(F.sum(q).alias("__chi")).crossJoin(
        F.broadcast(tot)
    )
    k = F.least(F.col("__la"), F.col("__lb")) - 1
    chi2 = F.col("__chi").cast("double")
    return agg.select(
        F.col("__n").alias("n_rows"),
        F.col("__la").alias("n_levels_a"),
        F.col("__lb").alias("n_levels_b"),
        F.when(F.col("__n") > 0, chi2).alias("chi2"),
        F.when(
            (F.col("__n") > 0) & (k > 0),
            F.sqrt(
                chi2
                / (F.col("__n").cast("double") * k.cast("double"))
            ),
        ).alias("cramers_v"),
    )


def mutual_information(
    df: DataFrame, col_a: Column, col_b: Column
) -> DataFrame:
    """(n_rows, n_levels_a, n_levels_b, h_a, h_b, mi_nats, nmi) —
    Shannon mutual information (nats) between two CATEGORICAL columns
    plus both marginal entropies and the min-normalized NMI ∈ [0, 1]:
    u22's Cramér's V answers "are these entangled" on the χ² scale;
    MI answers it on the COMPRESSION scale — how many nats of one
    label the other explains — which is the quantity feature-selection
    ranks by (information gain IS MI with the class) and the one that
    composes with the entropy family (x85 token entropy, x87 KL:
    MI(a,b) = KL(joint ‖ product-of-marginals), the same Dunning
    contingency geometry as x72 read as information).

        MI  = Σ_cells (o/N)·ln(o·N/(r·c))
        H_x = Σ_levels (m/N)·ln(N/m),   NMI = MI / min(H_a, H_b)

    Exactness (the x72/u22 contingency discipline): o, marginals r/c
    /m, and N are exact BIGINTs; each ln ratio's numerator o·N and
    denominator r·c are exact DECIMAL(38,0) products cast once to
    double (oracle VARCHAR-hops those casts — 1e24 magnitudes sit in
    DuckDB's 1-ulp direct-cast territory), ONE IEEE division, ln
    quantized to DECIMAL(18,6) PER TERM via the VARCHAR hop (the u17
    rule) BEFORE the integer multiply (the x72 multiply-after rule),
    per-term products o·lnq folded as exact decimals, and each final
    statistic is one decimal→double read-back + one division by N.
    Only observed cells contribute (o ≥ 1 — no ln(0) guard needed by
    construction, unlike x72's zero-cell CASE). NULL levels excluded;
    single-level columns have H = 0 → NULL nmi (no evidence); empty
    input → zero counts, NULL stats.

    Scale: ONE (a, b) cell-count shuffle over the table (map-side
    combinable); marginals are windows/re-aggregations of the
    contingency-sized cell frame (checkpointed — it feeds the MI
    terms, both entropy legs, AND the totals; the x25 rule);
    everything after the first agg is levels²-sized."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    cells = (
        df.select(col_a.alias("__a"), col_b.alias("__b"))
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        .localCheckpoint()
    )
    tot = cells.agg(
        F.coalesce(F.sum("__o"), F.lit(0)).cast("long").alias("__n"),
        F.count_distinct(F.col("__a")).cast("long").alias("__la"),
        F.count_distinct(F.col("__b")).cast("long").alias("__lb"),
    )
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    joint = cells.select(
        "__o",
        F.sum("__o").over(wa).cast("long").alias("__r"),
        F.sum("__o").over(wb).cast("long").alias("__c"),
    ).crossJoin(F.broadcast(tot.select("__n")))
    num = (F.col("__o").cast(d38) * F.col("__n").cast(d38)).cast(
        "double"
    )
    den = (F.col("__r").cast(d38) * F.col("__c").cast(d38)).cast(
        "double"
    )
    lnq = F.log(num / den).cast("decimal(18,6)")
    mi_agg = joint.agg(
        F.sum(F.col("__o").cast("decimal(18,0)") * lnq).alias("__mi")
    )

    def _entropy(margin: str, out: str) -> DataFrame:
        m = (
            cells.groupBy(margin)
            .agg(F.sum("__o").cast("long").alias("__m"))
            .crossJoin(F.broadcast(tot.select("__n")))
        )
        lq = F.log(
            F.col("__n").cast("double") / F.col("__m").cast("double")
        ).cast("decimal(18,6)")
        return m.agg(
            F.sum(F.col("__m").cast("decimal(18,0)") * lq).alias(out)
        )

    out = (
        tot.crossJoin(F.broadcast(mi_agg))
        .crossJoin(F.broadcast(_entropy("__a", "__ha")))
        .crossJoin(F.broadcast(_entropy("__b", "__hb")))
    )
    n_d = F.col("__n").cast("double")
    h_a = F.col("__ha").cast("double") / n_d
    h_b = F.col("__hb").cast("double") / n_d
    mi = F.col("__mi").cast("double") / n_d
    return out.select(
        F.col("__n").alias("n_rows"),
        F.col("__la").alias("n_levels_a"),
        F.col("__lb").alias("n_levels_b"),
        F.when(F.col("__n") > 0, h_a).alias("h_a"),
        F.when(F.col("__n") > 0, h_b).alias("h_b"),
        F.when(F.col("__n") > 0, mi).alias("mi_nats"),
        F.when(
            (F.col("__n") > 0) & (F.least(h_a, h_b) > 0),
            mi / F.least(h_a, h_b),
        ).alias("nmi"),
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    weight: Column,
) -> DataFrame:
    """(group…, total_weight, weighted_median) — exact lower weighted
    median per group: the smallest value v with
    2·(cumulative weight through v) ≥ total weight — "the price at
    which half the UNITS (not half the ORDERS) trade", the
    volume-weighted center a plain median mis-states whenever line
    sizes vary (u16's median treats a 1-unit and a 10000-unit line
    identically). With all weights 1 this IS u16's lower-middle order
    statistic (property the tests pin).

    Exactness: ``value`` and ``weight`` must be integer-valued (cents
    / units); the pick condition 2·cumw ≥ totw is ALL-integer (never
    a float quantile fraction — the x42 boundary rule); ties on value
    merge into one cumulative step (summed weight per distinct value
    first), so the result is a value FROM the data, deterministic
    under any partitioning. NULL values and NULL/non-positive weights
    are excluded; a group with zero total weight has no median and is
    absent (the u16 no-evidence rule).

    Scale: ONE group-keyed shuffle shared by the per-(group, value)
    pre-aggregation, the cumulative window, and the pick — the same
    single-exchange shape as u16; the window runs over DISTINCT
    values per group, bounded by the value domain."""
    from pyspark.sql import Window

    rows = df.select(
        *group_cols,
        value.cast("long").alias("__v"),
        weight.cast("long").alias("__w"),
    ).where(
        F.col("__v").isNotNull()
        & F.col("__w").isNotNull()
        & (F.col("__w") > 0)
    )
    per_v = rows.groupBy(*group_cols, "__v").agg(
        F.sum("__w").cast("long").alias("__wv")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = per_v.select(
        *group_cols,
        "__v",
        F.sum("__wv").over(w_cum).cast("long").alias("__cum"),
        F.sum("__wv").over(w_all).cast("long").alias("__tot"),
    )
    picked = cum.where(
        F.lit(2) * F.col("__cum") >= F.col("__tot")
    )
    return (
        picked.groupBy(*group_cols)
        .agg(
            F.max("__tot").cast("long").alias("total_weight"),
            F.min("__v").cast("long").alias("weighted_median"),
        )
    )


def gini_coefficient(
    df: DataFrame, group_cols: list[str], value: Column
) -> DataFrame:
    """(group…, n_rows, total_value, gini) — exact Gini inequality
    coefficient of a non-negative integer measure per group (cents):
    0 = perfectly equal, →1 = one row holds everything. u18's
    concentration profile reads CATEGORY dominance (top-share /
    impurity of a label column); this reads MAGNITUDE dominance of a
    measure — "does 1% of the orders carry 60% of the revenue" — the
    whale-detection panel behind pricing, abuse, and sampling-bias
    review (a corpus whose token mass is Gini-0.9 over sources is one
    scrape away from a single-domain model).

    Exactness: computed WITHOUT sorting rows — from the per-distinct-
    value count frame, G = (2T − (n+1)·S) / (n·S) with
    2T = Σ_v v·(2·c_v·cum_before + c_v·(c_v+1)) (the rank-sum of a
    tied block in closed form — note 2T directly, so no halving and
    no fractional intermediate), all in DECIMAL(38,0) (v·n² crosses
    int64 by ~1e13 rows·cents); ONE IEEE division at the end (oracle
    VARCHAR-hops the decimal→double read-backs). Tie-permutation
    invariant by construction (tied values contribute a closed-form
    block sum, not an arbitrary rank order). NULL and NEGATIVE values
    are excluded (Gini is defined on a non-negative measure; a
    refunds-included audit should split sign first); zero-total
    groups → NULL gini (no evidence).

    Scale: ONE group-keyed shuffle to per-(group, value) counts, a
    cumulative window over DISTINCT values (domain-bounded, the
    u23/u16 argument — never a per-row rank over the corpus), one
    group-sized agg."""
    rows = df.select(
        *group_cols, value.cast("long").alias("__v")
    ).where(F.col("__v").isNotNull() & (F.col("__v") >= 0))
    per_v = rows.groupBy(*group_cols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    return gini_from_value_counts(per_v, group_cols)


def gini_from_value_counts(
    per_v: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """`gini_coefficient`'s derivation over a pre-built
    (group…, __v, __c) per-distinct-value count frame — split out
    (the ks_from_value_counts pattern) so the STREAMING face, whose
    maintained artifact is exactly these ADDITIVE per-value counts,
    derives the coefficient through the SAME expressions and stays
    bit-identical to batch by construction. Callers must have
    applied the batch operator's domain rules already (NULLs and
    negatives excluded)."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    d38 = "decimal(38,0)"
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        *group_cols,
        "__v",
        "__c",
        (F.sum("__c").over(w_cum) - F.col("__c"))
        .cast("long")
        .alias("__cb"),
    )
    t2_term = F.col("__v").cast(d38) * (
        F.lit(2).cast(d38) * F.col("__c").cast(d38) * F.col("__cb").cast(d38)
        + F.col("__c").cast(d38) * (F.col("__c").cast(d38) + F.lit(1).cast(d38))
    )
    agg = cum.groupBy(*group_cols).agg(
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum(F.col("__v").cast(d38) * F.col("__c").cast(d38)).alias(
            "__s"
        ),
        F.sum(t2_term).alias("__t2"),
    )
    num = (
        F.col("__t2")
        - (F.col("n_rows").cast(d38) + F.lit(1).cast(d38)) * F.col("__s")
    ).cast("double")
    den = (F.col("n_rows").cast(d38) * F.col("__s")).cast("double")
    return agg.select(
        *group_cols,
        "n_rows",
        F.col("__s").cast("long").alias("total_value"),
        F.when(
            (F.col("n_rows") > 0) & (F.col("__s") > 0), num / den
        ).alias("gini"),
    )


def spearman_correlation(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """(group…, n_pairs, rho) — exact tie-aware Spearman rank
    correlation per group: Pearson r computed on AVERAGE ranks — the
    monotonic-association twin of u19's linear panel (a perfect
    y = x³ relationship reads ρ = 1 here but r < 1 there), and the
    robust screen for ordinal / heavy-tailed columns where a single
    outlier row dominates the raw-value moments.

    Exactness contract: ``x`` and ``y`` must be INTEGER-valued (cents
    — the Decimal(18,2)·100 rule; ranks only need ORDER, so the ×100
    never changes ρ). Tie-aware average ranks are kept integral via
    the 2·rank trick: a tie block with min ascending rank m and c
    members has average rank m + (c−1)/2, so
        R2 = 2·avg_rank = rank_asc + (n_g − rank_desc + 1)
    (min asc rank + max asc rank, both plain RANK() windows) is an
    exact BIGINT, and Pearson is affine-invariant so r(R2x, R2y) =
    r(Rx, Ry). The six sufficient statistics then fold as exact
    DECIMAL(38,0) sums and the u19 formula finishes: operands cast
    ONCE to double (oracle VARCHAR-hops — the u17 rule), IEEE sqrt /
    division — bit-identical cross-engine with NO transcendental
    quantization. All-tied (zero rank variance) → NULL, not 0; rows
    with a NULL on either side are excluded BEFORE ranking (pairwise
    complete — a NULL has no rank). Headroom: n·ΣR2xR2y ≤ 4n⁴ —
    DECIMAL(38,0) holds to n ≈ 1.7e9 rows per group; shard larger
    groups by a salt and merge via the streaming-correlation
    sufficient-stats fold if ever needed.

    Scale: ONE group-keyed shuffle shared by all five rank windows
    (rank asc/desc over x, rank asc/desc over y, group count — every
    window partitions by exactly ``group_cols``, so Spark plans one
    Exchange and sorts within partitions) and the final group agg;
    per the u19 pre-projection rule the R2 columns are materialized
    in a select() BEFORE the wide agg so each aggregate references a
    plain column."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    rows = df.select(
        *group_cols,
        x.cast("long").alias("__x"),
        y.cast("long").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    wg = Window.partitionBy(*group_cols)
    wxa = wg.orderBy(F.col("__x").asc())
    wxd = wg.orderBy(F.col("__x").desc())
    wya = wg.orderBy(F.col("__y").asc())
    wyd = wg.orderBy(F.col("__y").desc())
    n_g = F.count(F.lit(1)).over(wg)
    # u19 pre-projection rule: R2 under an alias BEFORE the agg
    ranked = rows.select(
        *group_cols,
        (F.rank().over(wxa) + n_g - F.rank().over(wxd) + F.lit(1))
        .cast(d38)
        .alias("__rx"),
        (F.rank().over(wya) + n_g - F.rank().over(wyd) + F.lit(1))
        .cast(d38)
        .alias("__ry"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
    )
    n = F.col("n_pairs").cast(d38)
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        *group_cols,
        "n_pairs",
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
        ).alias("rho"),
    )


def mann_whitney_auc(
    df: DataFrame,
    group_cols: list[str],
    score: Column,
    label: Column,
) -> DataFrame:
    """(group…, n_pos, n_neg, auc) — exact tie-aware ROC AUC per
    group via the Mann–Whitney rank-sum identity
    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻): the standard
    separability eval for any scoring model — x75 evaluates a
    retrieval RANKING, x81 evaluates a score's SCALE (calibration),
    this evaluates its DISCRIMINATION (would thresholding the score
    separate the classes at all, at any threshold).

    Exactness: ``score`` must be INTEGER-valued (AUC is
    rank-invariant, so cents/counts encodings never change it);
    ``label`` is 0/1. With the 2·rank trick (R2 = 2·cum_before + c + 1
    per tied score value), ΣR2 over positives is an exact integer and
        AUC = (ΣR2⁺ − n⁺·(n⁺+1)) / (2·n⁺·n⁻)
    — a single IEEE division of two exact DECIMAL(38,0) integers
    (oracle VARCHAR-hops the casts — the u17 rule). A group missing
    either class has no defined AUC: CASE-guarded NULL. NULL scores /
    labels are excluded (no rank). Ties are handled EXACTLY — the ½
    lives in the integer arithmetic, never a float.

    Scale: the rank sum needs NO row-level rank join — per distinct
    (group, score) value the tied block contributes
    p·(2·cum_before + c + 1) where p = positive count, c = total
    count, cum_before = running count of smaller values: ONE
    (group, score)-keyed pre-agg shuffle, a cumulative window over
    the DOMAIN-sized value frame (the u23/u25 shape), and a final
    group agg that reuses the group partitioning."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    rows = df.select(
        *group_cols,
        score.cast("long").alias("__s"),
        label.cast("long").alias("__y"),
    ).where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    per_v = rows.groupBy(*group_cols, "__s").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum("__y").cast("long").alias("__p"),
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        *group_cols,
        "__c",
        "__p",
        (F.sum("__c").over(w_cum) - F.col("__c"))
        .cast("long")
        .alias("__cb"),
    )
    r2_term = F.col("__p").cast(d38) * (
        F.lit(2).cast(d38) * F.col("__cb").cast(d38)
        + F.col("__c").cast(d38)
        + F.lit(1).cast(d38)
    )
    agg = cum.groupBy(*group_cols).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__c") - F.sum("__p")).cast("long").alias("n_neg"),
        F.sum(r2_term).alias("__sr2"),
    )
    npos = F.col("n_pos").cast(d38)
    nneg = F.col("n_neg").cast(d38)
    num = F.col("__sr2") - npos * (npos + F.lit(1).cast(d38))
    den = F.lit(2).cast(d38) * npos * nneg
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            num.cast("double") / den.cast("double"),
        ).alias("auc"),
    )


def trend_fit(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """(group…, n_rows, slope, intercept, r2) — exact-arithmetic
    ordinary-least-squares line fit per group: the trend panel behind
    "is revenue per priority rising and how fast" — u19 answers
    whether two measures MOVE TOGETHER (unitless r); this fits the
    LINE (slope in y-units per x-unit + level + fit quality), the
    number a forecast or an SLO burn-rate check actually consumes.

    Exactness contract: ``x`` and ``y`` INTEGER-valued (days /
    cents); the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) fold as exact DECIMAL(38,0) sums (order-free), then
        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n          [at x = 0]
        r² = (nΣxy − ΣxΣy)² / ((nΣx²−(Σx)²)·(nΣy²−(Σy)²))
    with every operand cast ONCE to double (oracle VARCHAR-hops —
    the u17 rule) and the rest a fixed IEEE chain — bit-identical
    cross-engine, no transcendentals. Zero x-variance (one distinct
    x) → NULL slope/intercept/r²; zero y-variance with spread x →
    slope/intercept exact 0-slope line, r² NULL (0/0 has no fit
    quality). Pairwise-complete rows only. Headroom: nΣxy ~
    rows²·x̄·ȳ — center/rescale x (e.g. days since the window
    start, not epoch) to stay inside DECIMAL(38,0), the u19 ceiling
    rule; slope is shift-invariant so centering is free.

    Scale: ONE map-side-combinable group aggregate over the stream —
    the u19 shape; nothing after it exceeds the group count."""
    d38 = "decimal(38,0)"
    rows = df.select(
        *group_cols,
        x.cast("long").cast(d38).alias("__x"),
        y.cast("long").cast(d38).alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    agg = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n_rows").cast(d38)
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = num.cast("double") / dx.cast("double")
    return agg.select(
        *group_cols,
        "n_rows",
        F.when(dx > 0, slope).alias("slope"),
        F.when(
            dx > 0,
            (
                F.col("__sy").cast("double")
                - slope * F.col("__sx").cast("double")
            )
            / F.col("n_rows").cast("double"),
        ).alias("intercept"),
        F.when(
            (dx > 0) & (dy > 0),
            (num.cast("double") * num.cast("double"))
            / (dx.cast("double") * dy.cast("double")),
        ).alias("r2"),
    )
