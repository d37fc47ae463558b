"""Aggregation operators (SURVEY §2.4 A3/A4 + generalized agg surface).

A3 — conditional sum ("pivot by hand"): ``sum(when(cond, col).otherwise(0))``
(pyspark_sum_function:25-41). A4 — real pivot with value whitelist + na.fill
(all_from_gemini.txt:560-570). Both compile to a single hash-aggregate with
map-side partials — the right shape at 100 TB.

The engine also exposes the generalized group-by surface the reference
omits (distinct counts, grouping sets/rollup/cube, approx quantiles) as
thin declarative wrappers so every SQL-oracle query has a named operator.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONEY = T.DecimalType(18, 2)


def _cols(cols: Seq[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def conditional_sum(
    value: Column | str,
    cond: Column,
    dtype: T.DataType = MONEY,
    zero_when_false: bool = True,
) -> Column:
    """`sum(when(cond, value).otherwise(0))` — A3 semantics.

    Cast to exact decimal BEFORE summing so results are deterministic
    (float summation order varies across partitions; decimal does not).
    """
    v = (F.col(value) if isinstance(value, str) else value).cast(dtype)
    branch = F.when(cond, v)
    if zero_when_false:
        branch = branch.otherwise(F.lit(0).cast(dtype))
    return F.sum(branch)


def pivot_sum(
    df: DataFrame,
    group_by: Seq[Column | str],
    pivot_col: str,
    pivot_values: Seq[str],
    value: Column | str,
    dtype: T.DataType = MONEY,
    fill: object = 0,
) -> DataFrame:
    """`groupBy(keys).pivot(col, values).sum(value).na.fill(0)` — A4.

    Passing ``pivot_values`` explicitly avoids the extra distinct-values
    job AND pins the output schema — both required at scale.
    """
    v = (F.col(value) if isinstance(value, str) else value).cast(dtype)
    out = (
        df.groupBy(*_cols(group_by))
        .pivot(pivot_col, list(pivot_values))
        .agg(F.sum(v))
    )
    if fill is not None:
        out = out.na.fill(fill)
    return out


def grouped(
    df: DataFrame,
    group_by: Seq[Column | str],
    aggs: Seq[Column],
    mode: str = "groupby",
) -> DataFrame:
    """Group-by with grouping-set variants: 'groupby' | 'rollup' | 'cube'."""
    keys = _cols(group_by)
    if mode == "groupby":
        g = df.groupBy(*keys)
    elif mode == "rollup":
        g = df.rollup(*keys)
    elif mode == "cube":
        g = df.cube(*keys)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return g.agg(*aggs)


def approx_profile(
    df: DataFrame,
    group_by: Seq[Column | str],
    distinct_col: str,
    percentile_col: str,
    percentiles: Seq[float] = (0.5, 0.95),
    rsd: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based aggregate profile: HyperLogLog distinct count +
    t-digest percentiles in ONE pass.

    The 100-TB form of a07/a09: both sketches are mergeable, so partial
    aggregation happens map-side and the shuffle carries fixed-size
    sketch state instead of values — exact distinct/percentile both
    need the full value set per group. Error: ±rsd relative for the
    count, rank error ~1/accuracy for percentiles.
    """
    return df.groupBy(*_cols(group_by)).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias(
            f"approx_distinct_{distinct_col}"
        ),
        F.percentile_approx(
            percentile_col, list(percentiles), accuracy
        ).alias(f"approx_percentiles_{percentile_col}"),
    )


def top_k(
    df: DataFrame,
    order_by: Seq[Column | str],
    k: int,
) -> DataFrame:
    """Deterministic global top-k.

    `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject: each
    partition keeps its local top-k, the driver merges — no global sort,
    no single-task bottleneck. Order keys must include a unique tiebreaker
    for cross-engine determinism.
    """
    return df.orderBy(*_cols(order_by)).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Seq[Column | str],
    order_by: Seq[Column | str],
    k: int,
) -> DataFrame:
    """Top-k within each group via rank-1..k window filter.

    Spark ≥3.5 rewrites this into WindowGroupLimit (per-partition
    heap, map-side limit before the shuffle) — the scalable form.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str = "bin",
    relative_error: float = 0.0001,
) -> DataFrame:
    """Equal-frequency binning at scale: the distributed form of
    NTILE(n) OVER (ORDER BY col).

    A global NTILE window sorts the entire dataset into ONE partition —
    a non-starter at 100 TB. This computes approximate quantile
    cutpoints in a single aggregate pass (`approxQuantile`,
    Greenwald-Khanna sketch, mergeable across partitions), then assigns
    bins with a stateless O(log n_bins) comparison — no global sort, no
    shuffle beyond the sketch's tree aggregation. Bin populations are
    equal to within `relative_error`; `w07_ntile_quartiles` (exact
    NTILE) is the small-data oracle this validates against in tests.
    """
    cuts = df.approxQuantile(
        col, [i / n_bins for i in range(1, n_bins)], relative_error
    )
    expr = F.lit(n_bins)
    # descending CASE chain: first cutpoint the value is <= wins
    for i in range(n_bins - 2, -1, -1):
        expr = F.when(F.col(col) <= F.lit(cuts[i]), i + 1).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))
