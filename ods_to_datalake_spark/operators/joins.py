"""Join operators (SURVEY §2.3) plus the generalized joins the engine adds.

The reference uses: inner equi-join projected back to the left side — an
accidental semi-join (J1/P2, ibs_ordinary_payment_utilities.py:37-42,
50-55); left outer joins to pre-aggregated children (J2, :103-107) and to
small dimensions (J3, :255-261). We name them, fix the semi-join to the
real `left_semi` (no right-side duplication risk, smaller shuffle), and add
the missing generalized joins (anti, as-of, range) that the SQL surface
needs.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of `left` with a match in `right` (J1+P2 done right).

    The reference's inner-join + `.select(left['*'])` keeps duplicate
    matches; `left_semi` has the set semantics the workflow intends and
    lets Spark skip materializing right-side columns.
    """
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of `left` with NO match in `right` (the NOT-IN workflow,
    ibs_ordinary_payment_utilities.py:46, as a join)."""
    return left.join(right, on, "left_anti")


def left_attach(
    left: DataFrame, right: DataFrame, on, broadcast: bool = False
) -> DataFrame:
    """Left outer attach of a pre-aggregated child or dimension (J2/J3)."""
    r = F.broadcast(right) if broadcast else right
    return left.join(r, on, "left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: Column | str,
    right_lo: Column | str,
    right_hi: Column | str,
    extra_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: `right_lo <= left_point < right_hi`.

    With an equi-key in ``extra_on`` Spark plans an equi-join with the range
    as a post-filter (cheap). Without one it is a broadcast-nested-loop —
    only acceptable when `right` is small (calendar/dim intervals).
    """
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    lo = right[right_lo] if isinstance(right_lo, str) else right_lo
    hi = right[right_hi] if isinstance(right_hi, str) else right_hi
    cond = (lp >= lo) & (lp < hi)
    if extra_on is not None:
        cond = extra_on & cond
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Seq[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    right_cols: Seq[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row at-or-before
    (``backward``) / earliest at-or-after (``forward``) its timestamp,
    per equi-key.

    Spark-first implementation: union-tag + window (single shuffle on the
    key, no per-row range scan), instead of a naive theta-join which would
    explode. Equivalent to pandas `merge_asof` semantics on the keys.

    At scale: one shuffle on ``on`` + window sort — the same cost as any
    keyed join of the two inputs; no skew beyond the key distribution.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in set(on) and c != right_time
    ]
    clash = sorted(set(rcols) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join output would duplicate column(s) {clash}: rename "
            "them on the right side or pass right_cols explicitly"
        )
    key = list(on)

    lt = F.col(left_time)
    l_tag = left.select(
        *key,
        lt.alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
    )
    r_tag = right.select(
        *key,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left rows at equal time → <= semantics
        w = Window.partitionBy(*key).orderBy(
            F.col("__t").asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        agg = F.last
    else:
        w = Window.partitionBy(*key).orderBy(
            F.col("__t").asc(), F.col("__is_left").desc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        agg = F.first

    matched = unioned.select(
        "*",
        *[
            agg(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rcols
        ],
    ).filter(F.col("__is_left") == 1)

    return matched.select(
        F.col("__lrow.*"),
        *[F.col(f"__m_{c}").alias(c) for c in rcols],
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    on: Column,
    fact_ts: Column | str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal) join of facts against an SCD-2 history
    (`windows.scd2_apply` output): each fact row attaches the dimension
    version whose half-open validity interval ``[valid_from, valid_to)``
    contains the fact timestamp; the open version (NULL ``valid_to``)
    matches everything from its start. Because SCD-2 intervals
    partition each key's timeline, every fact matches EXACTLY one
    version — the as-of-the-transaction dimension lookup every
    temporally-correct fact table needs (training-data equivalent:
    joining samples to the label/taxonomy version in force when they
    were collected, instead of leaking today's labels backwards).

    Plan shape: ``on`` must carry the equi-key — Spark then plans an
    equi-join with the interval predicate as a post-filter (one keyed
    shuffle; broadcast when the history is a dimension). The date-typed
    bounds are cast to timestamp explicitly so both engines compare in
    the same domain.
    """
    ts = F.col(fact_ts) if isinstance(fact_ts, str) else fact_ts
    lo = dim_history[valid_from].cast("timestamp")
    hi = dim_history[valid_to].cast("timestamp")
    cond = on & (ts >= lo) & (hi.isNull() | (ts < hi))
    return facts.join(dim_history, cond, how)
