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
