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


SCD2_COLS = ("version", "valid_from", "valid_to")


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    effective_date: str,
    open_date: str = "1900-01-01",
) -> DataFrame:
    """SCD type-2 merge: full-history dimension versioning, idempotent
    across repeated merges.

    ``history`` is either a bare snapshot (no `version`/`valid_from`/
    `valid_to` columns — they are bootstrapped as version 1 open since
    ``open_date``) or the output of a previous `scd2_apply` call.
    ``updates`` carries attribute values per key (bare schema: key +
    attributes). Semantics per key:

    - already-closed history rows pass through untouched;
    - an open row whose update carries DIFFERENT attribute values (any
      null-safe inequality) is closed at ``effective_date`` and a new
      open row with version+1 is appended;
    - an open row whose update is value-identical is a no-op (no
      spurious version);
    - an update for an unseen key inserts version 1 open at
      ``effective_date``.

    Complements `upsert_snapshot` (SCD-1, last-write-wins) when history
    must be queryable — the lakehouse dimension audit pattern. Plan
    shape: one outer join of open rows vs updates on the key (broadcast
    when updates are small) + a union with the untouched closed rows —
    unchanged history is never rewritten.
    """
    eff = F.lit(effective_date).cast("date")
    null_date = F.lit(None).cast("date")
    if "valid_to" not in history.columns:
        history = (
            history.withColumn("version", F.lit(1))
            .withColumn("valid_from", F.lit(open_date).cast("date"))
            .withColumn("valid_to", null_date)
        )
    attrs = [c for c in updates.columns if c != key]
    closed = history.filter(F.col("valid_to").isNotNull())
    open_rows = history.filter(F.col("valid_to").isNull()).alias("cur")
    upd = updates.alias("upd")
    joined = open_rows.join(
        upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer"
    )
    differs = F.lit(False)
    for c in attrs:
        differs = differs | ~F.col(f"cur.{c}").eqNullSafe(
            F.col(f"upd.{c}")
        )
    has_cur = F.col(f"cur.{key}").isNotNull()
    has_upd = F.col(f"upd.{key}").isNotNull()
    # surviving open/closed forms of the current open row
    kept_open = joined.filter(
        has_cur & (~has_upd | ~differs)
    ).select("cur.*")
    closed_now = joined.filter(has_cur & has_upd & differs).select(
        *[F.col(f"cur.{c}") for c in history.columns if c != "valid_to"],
        eff.alias("valid_to"),
    )
    new_versions = joined.filter(has_upd & (~has_cur | differs)).select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{c}").alias(c) for c in attrs],
        F.when(has_cur, F.col("cur.version") + 1)
        .otherwise(F.lit(1))
        .alias("version"),
        eff.alias("valid_from"),
        null_date.alias("valid_to"),
    )
    return (
        closed.unionByName(kept_open)
        .unionByName(closed_now)
        .unionByName(new_versions)
    )


def rising_runs(
    df: DataFrame,
    key: str,
    order_cols: Seq[Column | str],
    value: Column,
    min_run: int = 3,
) -> DataFrame:
    """(key, n_rows, longest_rising_run, n_runs_at_min) — maximal
    strictly-increasing runs of ``value`` per key in ``order_cols``
    order: the ordered-pattern primitive (SQL:2016 MATCH_RECOGNIZE's
    bread-and-butter case) behind "3 green days", escalating-spend
    alerts, and monotone-drift detection, built from plain windows —
    no per-row state machine.

    Derivation is the gaps-and-islands parity trick's monotone
    cousin: flag each row that RISES above its predecessor, then a
    run id = row_number − running count of risers (constant exactly
    while consecutive rows rise), then per-run lengths. A maximal
    run's LENGTH counts rows (a run of r rises spans r+1 rows);
    ``longest_rising_run`` is 1 for a single-row key (a row is a
    trivial run) and ``n_runs_at_min`` counts maximal runs spanning
    at least ``min_run`` rows.

    Determinism: the caller's ``order_cols`` must be a total order
    per key (include a unique tiebreaker — the w01/topk rule);
    comparisons on DECIMAL/integer values are exact. NULL values
    never rise and are never risen above (SQL comparison semantics:
    the flag is TRUE only when both sides are non-NULL and greater) —
    a NULL breaks any run, pinned by test.

    Scale: ONE key shuffle; the flag lag, the two running windows,
    and the final per-key aggregate all reuse the same
    partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(*_cols(order_cols))
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = df.withColumn("__v", value).withColumn(
        "__rise",
        F.when(
            F.col("__v").isNotNull()
            & F.lag("__v").over(w).isNotNull()
            & (F.col("__v") > F.lag("__v").over(w)),
            1,
        ).otherwise(0),
    )
    runs = (
        flagged.withColumn("__rn", F.row_number().over(w))
        .withColumn("__rsum", F.sum("__rise").over(wrun))
        .withColumn("__run", F.col("__rn") - F.col("__rsum"))
        .groupBy(key, "__run")
        .agg(F.count(F.lit(1)).cast("long").alias("__len"))
    )
    return runs.groupBy(key).agg(
        F.sum("__len").cast("long").alias("n_rows"),
        F.max("__len").cast("long").alias("longest_rising_run"),
        F.sum(
            F.when(F.col("__len") >= min_run, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_runs_at_min"),
    )
