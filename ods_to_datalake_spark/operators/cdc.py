"""CDC change application — the heart of an ODS→datalake sync: apply a
batch of captured changes (insert / update / delete ops, possibly
several versions per key) to a base snapshot, keeping each key's
latest change.

Scale shape: keep-latest is a groupBy(keys).agg(max_by(struct)) —
map-side partial, skew-safe (one struct per key survives the
exchange, however many versions arrived); the base is touched by ONE
anti-join on the affected keys plus a union. No window over the
change stream, no per-key loop. The reference applies changes by
full-table rewrite (ibs_ordinary_payment_utilities.py's
overwrite-partition flow); this is the row-level form the same lake
needs when the change batch is small relative to the snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPS = ("I", "U", "D")


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    data_cols: list[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """Keep each key's highest-version change (the version-less form
    passes through): a partial-aggregated max-struct per key, never a
    window over the change stream — one struct per key survives the
    exchange however many versions arrived. Shared by `cdc_apply` and
    `incremental.cdc_maintain_agg` so both resolve the same winner."""
    if version_col is None:
        return changes
    latest = changes.groupBy(*keys).agg(
        F.max(
            F.struct(F.col(version_col), F.col(op_col), *[
                F.col(c) for c in data_cols if c not in keys
            ])
        ).alias("__m")
    )
    return latest.select(
        *keys,
        F.col(f"__m.{op_col}").alias(op_col),
        *[
            F.col(f"__m.{c}").alias(c)
            for c in data_cols
            if c not in keys
        ],
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """Apply a CDC batch to ``base`` and return the new snapshot.

    ``changes`` carries the base columns plus ``op_col`` ('I' insert,
    'U' update, 'D' delete) and optionally ``version_col`` — when
    given, only each key's highest-version change applies (ties are
    ill-defined upstream; the struct comparison breaks them by the op
    letter, 'U' > 'I' > 'D' reversed-alphabetical not guaranteed —
    give unique versions). Semantics: delete wins for keys whose
    latest op is 'D'; latest 'I'/'U' rows replace (or add) their key;
    untouched base rows pass through.
    """
    data_cols = base.columns
    ch = latest_changes(changes, keys, data_cols, op_col, version_col)
    touched = ch.select(*keys).distinct()
    kept = base.join(touched, keys, "left_anti")
    upserts = ch.filter(F.col(op_col).isin("I", "U")).select(*data_cols)
    return kept.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """The CAPTURE side of `cdc_apply`: diff two snapshots into the
    change batch that transforms ``old`` into ``new`` — one row per
    differing key with the NEW row's values and op 'I' (key only in
    new), 'U' (both, any non-key column differing null-safely), 'D'
    (key only in old; value columns carry the old row so the delete
    is self-describing). Unchanged keys emit nothing.

    Round-trip identity (property-tested): cdc_apply(old,
    snapshot_diff(old, new), keys) == new — so a lake without a real
    change feed can synthesize one from consecutive ODS snapshots.
    Key columns must be non-null (they are keys): `cdc_apply`'s
    touched-keys anti-join — like the SQL oracles — is NOT null-safe,
    so a NULL-keyed row's delete/update can never be applied and the
    round trip is undefined for it.

    One shuffle-join on the key (null-safe per-column comparison, no
    row hashing — hashing would need bit-identical cross-engine string
    rendering of doubles/timestamps, which does not exist); at scale
    both sides are bucketed by key and the join co-locates.
    """
    data_cols = [c for c in old.columns if c not in keys]
    if [c for c in new.columns if c not in keys] != data_cols:
        raise ValueError("snapshot_diff: old/new schemas differ")
    if op_col in old.columns:
        raise ValueError(
            f"snapshot_diff: snapshot already has a {op_col!r} column "
            "— pass a different op_col (the output would silently "
            "overwrite the data column)"
        )
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(*new.columns, F.lit(True).alias("__in_new"))
    cond = None
    for kcol in keys:
        term = F.col(f"__o_{kcol}").eqNullSafe(F.col(kcol))
        cond = term if cond is None else cond & term
    joined = o.join(n, cond, "full_outer")
    # key-only snapshots are a legitimate membership diff: nothing can
    # ever be 'U', only 'I'/'D'
    changed = F.lit(False)
    for c in data_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(c))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
        .otherwise(F.lit(None))
    )
    out_key = [
        F.coalesce(F.col(kcol), F.col(f"__o_{kcol}")).alias(kcol)
        for kcol in keys
    ]
    out_val = [
        F.when(F.col(op_col) == "D", F.col(f"__o_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in data_cols
    ]
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(*out_key, *out_val, op_col)
    )
