"""Window-based sequencing (SURVEY §2.5 W1-W3).

The reference uses `row_number` windows for three jobs: per-group sequence
numbers (W1: ibs_ordinary_payment_utilities.py:84-94), multi-key period
sequencing (W2: :110-122), and surrogate-key suffixes (W3: :262-266).
`sequence` generalizes all three.

Scale note: WindowExec shuffles on the partition keys. At 100 TB the
partition key must be high-cardinality (it is here — per-payment /
per-policy); never call `sequence` with an empty partition list, which
would funnel everything through one task — use `global_sequence` (zipWithIndex
-free, two-pass) if a global ordering is truly required.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Seq[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def sequence(
    df: DataFrame,
    partition_by: Seq[Column | str],
    order_by: Seq[Column | str],
    out_col: str = "row_num",
) -> DataFrame:
    """Add a 1-based `row_number` sequence per partition.

    Order keys should include a unique tiebreaker for determinism (the
    reference orders W2 by six keys ending in receipt_no for this reason).
    """
    if not partition_by:
        raise ValueError(
            "empty partition_by funnels all rows into one task; "
            "use global_sequence for a global ordering"
        )
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    return df.withColumn(out_col, F.row_number().over(w))


def surrogate_key(
    df: DataFrame,
    prefix: str,
    partition_by: Seq[Column | str],
    order_by: Seq[Column | str],
    out_col: str,
    sep: str = "_",
) -> DataFrame:
    """Business/surrogate key `<prefix><sep><partition-val><sep><row_number>`.

    Generalizes `pmt_refer_code_of_company = concat('PMT_KAL_', pmt_seq, '_',
    row_number().over(...))` (ibs_ordinary_payment_utilities.py:262-266).
    """
    seq_col = f"__{out_col}_seq"
    out = sequence(df, partition_by, order_by, out_col=seq_col)
    parts: list[Column] = [F.lit(prefix)]
    for c in _cols(partition_by):
        parts += [c.cast("string"), F.lit(sep)]
    parts.append(F.col(seq_col).cast("string"))
    return out.withColumn(out_col, F.concat(*parts)).drop(seq_col)


def upsert_snapshot(
    current: DataFrame,
    updates: DataFrame,
    keys: Seq[str],
    order_by: Seq[Column | str],
) -> DataFrame:
    """SCD-1 snapshot upsert without a transactional table format:
    union current + updates, keep the winning row per key under
    ``order_by`` (descending recency first, with tiebreakers).

    The ODS→lakehouse refresh primitive: write the result as a NEW
    run-indexed partition (sources/writer.write_run_indexed) and read
    back via read_latest_run — append-only storage, snapshot semantics,
    no overwrite window. One shuffle on the keys; WindowGroupLimit
    applies the rank-1 filter map-side.
    """
    combined = current.unionByName(updates)
    return dedup_keep_first(combined, list(keys), list(order_by))


def dedup_keep_first(
    df: DataFrame,
    keys: Seq[Column | str],
    order_by: Seq[Column | str],
) -> DataFrame:
    """Keep the first row per key under an explicit ordering.

    The reference uses windows as its dedup substitute (SURVEY §2.5 note);
    this is that pattern named: row_number + filter rank 1. Spark rewrites
    rank-1 filters into a specialized WindowGroupLimit at scale.
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective_date: str,
    open_date: str = "1900-01-01",
) -> DataFrame:
    """SCD type-2 merge: full-history dimension versioning.

    ``current`` holds one open row per key; ``updates`` (same schema)
    carries new attribute values for a subset of keys. Changed keys get
    their old row closed at ``effective_date`` plus a new open row
    (version 2); unchanged keys pass through open. Complements
    `upsert_snapshot` (SCD-1, last-write-wins) when history must be
    queryable — the lakehouse pattern for dimension audit trails.

    Plan shape: one semi-join + one anti-join on the key (both reuse
    the same shuffle; broadcast when updates are small) + a union —
    no window, no full-table rewrite of unchanged history.
    """
    eff = F.lit(effective_date).cast("date")
    opened = F.lit(open_date).cast("date")
    null_date = F.lit(None).cast("date")
    upd_keys = updates.select(F.col(key).alias("__k"))
    closed_old = (
        current.join(upd_keys, current[key] == F.col("__k"), "left_semi")
        .withColumn("version", F.lit(1))
        .withColumn("valid_from", opened)
        .withColumn("valid_to", eff)
    )
    unchanged = (
        current.join(upd_keys, current[key] == F.col("__k"), "left_anti")
        .withColumn("version", F.lit(1))
        .withColumn("valid_from", opened)
        .withColumn("valid_to", null_date)
    )
    new_open = (
        updates.withColumn("version", F.lit(2))
        .withColumn("valid_from", eff)
        .withColumn("valid_to", null_date)
    )
    return closed_old.unionByName(unchanged).unionByName(new_open)
