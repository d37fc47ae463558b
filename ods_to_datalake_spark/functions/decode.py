"""Declarative CASE decodes and dimension-table decodes (SURVEY §2.3 J3, §2.7 F8).

Two decode patterns in the reference:

1. **CASE decode table** — the payment-channel mapping
   (ibs_ordinary_payment_utilities.py:221-241): a hand-written
   ``when(...).when(...).otherwise('99')`` chain over (method, channel)
   pairs. Here it's data-driven: a list of (predicate, value) rules.

2. **Dimension decode join** — one generic ref table filtered by ``md_name``
   into virtual dimensions, trimmed, renamed, then left-joined
   (ibs_ordinary_payment_utilities.py:126-141, 255-261). Dimension slices
   are small ⇒ always broadcast (explicit, not threshold-dependent —
   SURVEY §4 broadcast row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def case_decode(
    rules: Sequence[tuple[Column, object]],
    default: object = None,
) -> Column:
    """Build a CASE expression from ordered (predicate, value) rules."""
    if not rules:
        return F.lit(default)
    expr = F.when(rules[0][0], F.lit(rules[0][1]))
    for pred, value in rules[1:]:
        expr = expr.when(pred, F.lit(value))
    return expr.otherwise(F.lit(default))


def value_map_decode(
    col: Column | str,
    mapping: dict[str, object],
    default: object = None,
    trim: bool = True,
) -> Column:
    """Decode a single column through a literal value map."""
    c = F.col(col) if isinstance(col, str) else col
    if trim:
        c = F.trim(c)
    rules = [(c == F.lit(k), v) for k, v in mapping.items()]
    return case_decode(rules, default=default)


def dim_slice(
    ref: DataFrame,
    slice_col: str,
    slice_value: str,
    key_col: str,
    renames: dict[str, str],
) -> DataFrame:
    """Carve a virtual dimension out of a generic reference table.

    Mirrors ibs_ordinary_payment_utilities.py:126-141: filter
    ``trim(slice_col) == slice_value`` and non-empty key, then rename
    columns so multiple slices can join side-by-side without collisions.
    """
    out = ref.filter(
        (F.trim(F.col(slice_col)) == slice_value)
        & (F.trim(F.col(key_col)) != "")
    )
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def decode_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: Column | str,
    dim_key: Column | str,
    how: str = "left",
) -> DataFrame:
    """Left join a (small) dimension with an explicit broadcast hint.

    The reference relies on the auto-broadcast threshold
    (ibs_ordinary_payment_utilities.py:255-261); at 100 TB the fact side
    must never be shuffled for a dimension decode, so the hint is explicit.
    """
    fk = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    dk = dim[dim_key] if isinstance(dim_key, str) else dim_key
    return fact.join(F.broadcast(dim), fk == dk, how)
