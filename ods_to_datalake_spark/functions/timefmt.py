"""Date/timestamp normalization (SURVEY §2.7 F1-F5, §1.2 timestamp-as-string).

The reference's ODS dates arrive as strings; it parses with
``to_date(col, fmt)`` and renders with ``date_format`` (both formats
``yyyy-MM-dd`` and ``yyyyMMdd``: ibs_ordinary_payment_utilities.py:27,
pyspark_add_index_on_s3.py:35-38). Output timestamps are intentionally
*ISO-8601 strings with a fixed offset* built by concatenation
(`F.concat(trx_dt, lit('T00:00:00+07:00'))`, :191-210) — NOT TimestampType.
We keep that behavior for parity and offer the idiomatic TimestampType
variant beside it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_DATE = "yyyy-MM-dd"
COMPACT_DATE = "yyyyMMdd"
DEFAULT_UTC_OFFSET = "+07:00"  # reference hard-codes Asia/Bangkok wall time


def clean_date(col: Column | str, fmt: str = ISO_DATE) -> Column:
    """Normalize a permissive string/int date column to `yyyy-MM-dd` string.

    Mirrors the `date_cleaned` derivation (ibs_ordinary_payment_utilities.py:27)
    and the permissive int-or-string cast (pyspark_add_index_on_s3.py:36).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.to_date(c.cast(T.StringType()), fmt), ISO_DATE)


def iso_ts_string(
    date_col: Column | str,
    fallback: Column | str | None = None,
    offset: str = DEFAULT_UTC_OFFSET,
) -> Column:
    """Wall-clock midnight ISO-8601 *string* with fixed offset.

    Parity with ibs_ordinary_payment_utilities.py:191-210, including the
    null-fallback chain (next_due_dt falls back to trx_dt at :196-200).
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    if fallback is not None:
        fb = F.col(fallback) if isinstance(fallback, str) else fallback
        c = F.coalesce(c, fb)
    return F.when(
        c.isNotNull(), F.concat(c, F.lit(f"T00:00:00{offset}"))
    ).cast(T.StringType())


def iso_ts(
    date_col: Column | str,
    fallback: Column | str | None = None,
) -> Column:
    """Idiomatic variant: a real TimestampType midnight timestamp."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    if fallback is not None:
        fb = F.col(fallback) if isinstance(fallback, str) else fallback
        c = F.coalesce(c, fb)
    return F.to_timestamp(c, ISO_DATE)


def run_index_key(
    date_col: Column | str,
    run_index: int | Column,
    in_fmt: str = COMPACT_DATE,
) -> Column:
    """Derived run-indexed partition key `<yyyy-MM-dd>_<run_index>`.

    Mirrors pyspark_add_index_on_s3.py:31-41 (`format_string('%s_%s', ...)`
    over a permissive-cast parsed date). Reruns write a NEW partition value
    instead of overwriting (O5 semantics, all_from_gemini.txt:243-255).
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    idx = F.lit(run_index) if isinstance(run_index, int) else run_index
    parsed = F.date_format(
        F.to_date(c.cast(T.StringType()), in_fmt), ISO_DATE
    )
    return F.format_string("%s_%s", parsed, idx.cast(T.StringType()))
