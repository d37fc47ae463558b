"""Document-schema nullability policy (SURVEY §1.2 null-sentinel scheme).

The reference pins a per-field-class default for *required* fields and real
nulls for optional ones (ibs_ordinary_payment_utilities.py:71-78):

    REQ_NULL_STR = ''      NON_REQ_NULL_STR = None
    REQ_NULL_INT = 0       NON_REQ_NULL_INT = None
    REQ_NULL_DEC = 0.00    NON_REQ_NULL_DEC = None
    REQ_NULL_DATE = None

and applies it with ``when(col.isNotNull(), cast).otherwise(sentinel)``
chains throughout the output struct build (:158-220). Here that policy is
table-driven instead of copy-pasted per field.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONEY = T.DecimalType(18, 2)

# sentinel values for *required* document fields, by field class;
# every castable kind MUST appear here (req() rejects unknown kinds)
REQUIRED_SENTINELS: dict[str, object] = {
    "str": "",
    "int": 0,
    "long": 0,
    "dec": Decimal("0.00"),
    "date": None,  # required dates still null when absent (reference :78)
}

_CAST_TYPES: dict[str, T.DataType] = {
    "str": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "dec": MONEY,
    "date": T.DateType(),
}


def req(col: Column | str, kind: str) -> Column:
    """Required-field cast: null → class sentinel, else pinned cast."""
    c = F.col(col) if isinstance(col, str) else col
    dtype = _CAST_TYPES[kind]
    sentinel = REQUIRED_SENTINELS[kind]  # unknown kind → loud KeyError
    if sentinel is None:  # the intentional dates-stay-null policy
        return c.cast(dtype)
    return F.when(c.isNotNull(), c.cast(dtype)).otherwise(
        F.lit(sentinel).cast(dtype)
    )


def opt(col: Column | str, kind: str) -> Column:
    """Optional-field cast: nulls pass through, non-nulls pinned."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_CAST_TYPES[kind])


def null_safe_add(*cols: Column | str, dtype: T.DataType = MONEY) -> Column:
    """Null-guarded sum of N columns.

    Reference builds ``when(a.isNotNull() & b.isNotNull(), a+b).when(...)``
    3-way chains (ibs_ordinary_payment_utilities.py:180-187); the idiomatic
    form — identical semantics when at least one side is non-null, total
    null only when all are — is coalesce-per-operand. If every operand is
    null the reference yields 0 via its required-field fallback; we return
    null and let `req()` apply the policy at the boundary.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    any_nonnull = cs[0].isNotNull()
    for c in cs[1:]:
        any_nonnull = any_nonnull | c.isNotNull()
    total = F.coalesce(cs[0].cast(dtype), F.lit(0).cast(dtype))
    for c in cs[1:]:
        total = total + F.coalesce(c.cast(dtype), F.lit(0).cast(dtype))
    return F.when(any_nonnull, total.cast(dtype))


def guarded_int(col: Column | str) -> Column:
    """Trim + cast-to-int that yields null on empty/whitespace strings.

    Mirrors the guarded casts at ibs_ordinary_payment_utilities.py:274-287
    (trim, empty-check, cast).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t != "", t.cast(T.IntegerType()))
