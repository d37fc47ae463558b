"""Incremental aggregate maintenance (incremental view maintenance):
refresh a materialized aggregate from a CDC batch WITHOUT
re-aggregating the fact table.

`cdc.cdc_apply` keeps the row-level snapshot current; the analytical
tables a lake actually serves are aggregates over it (per-customer
order counts, per-source token mass, ...), and recomputing one from a
100-TB fact table because a 10k-row change batch arrived is the
classic waste IVM removes. Count and sum are self-maintainable
aggregates: every change contributes an additive delta —

    delete / before-image of an update:  (-1, -value)
    insert / after-image of an update:   (+1, +value)

— so the refreshed aggregate is old_agg ⊕ delta, touching only
|changed keys| fact rows (one semi-join for the before-images) and
|touched groups| + |agg| aggregate rows. Min/max are deliberately NOT
offered: they are not self-maintainable under deletes (a retracted
maximum needs the runner-up, i.e. the base), which is exactly the line
between this operator and a recompute.

Money sums ride DECIMAL(18,2) (the suite-wide rule: exact,
order-independent, and retraction is exact subtraction — a float sum
would drift away from the recomputed oracle one batch at a time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.cdc import latest_changes

MONEY = "decimal(18,2)"
# sum(MONEY) widens to this; the merge keeps one fixed type
MONEY_SUM = "decimal(28,2)"


def agg_snapshot(
    rows: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """The materialized-aggregate shape `cdc_maintain_agg` maintains:
    (group_cols..., n_rows, nn_<c>, sum_<c>...) with DECIMAL-exact
    sums. ``nn_<c>`` (the non-null measure count) is what makes SUM
    self-maintainable at the NULL boundary: an all-NULL group must
    report SUM = NULL exactly like a recompute would, and only the
    maintained non-null count can distinguish that from a group whose
    values cancel to 0. Build it ONCE from the initial snapshot;
    afterwards every refresh is a delta merge."""
    return rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            e
            for c in sum_cols
            for e in (
                F.count(F.col(c)).cast("long").alias(f"nn_{c}"),
                F.sum(F.col(c).cast(MONEY)).cast(MONEY_SUM).alias(
                    f"sum_{c}"
                ),
            )
        ],
    )


def cdc_maintain_agg(
    old_agg: DataFrame,
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """Refresh ``old_agg`` (an `agg_snapshot` over ``base``) to the
    aggregate of ``cdc_apply(base, changes)`` — incrementally.

    ``base`` is read ONLY to fetch the before-images of the touched
    keys (one semi-join on the change batch's key set — a key lookup,
    co-located when the lake is bucketed by key, never a scan-and-
    re-aggregate); the delta then merges into ``old_agg`` with a
    NULL-SAFE full outer join on the group key (group columns are
    arbitrary dimensions — a NULL group must merge with itself, not
    pass through as a phantom stale row). Groups whose refreshed count
    reaches 0 drop out; groups born in this batch appear.

    Correctness contract (oracle-checked by u07): for any base /
    change batch, ``cdc_maintain_agg(agg_snapshot(base), base, ch) ==
    agg_snapshot(cdc_apply(base, ch))`` — with DECIMAL sums the
    equality is exact, not approximate, because retraction is exact
    subtraction.
    """
    data_cols = base.columns
    ch = latest_changes(changes, key_cols, data_cols, op_col, version_col)
    touched = ch.select(*key_cols).distinct()
    before = base.join(touched, key_cols, "left_semi")

    def signed(rows: DataFrame, sign: int) -> DataFrame:
        return rows.select(
            *group_cols,
            F.lit(sign).cast("long").alias("__dn"),
            *[
                e
                for c in sum_cols
                for e in (
                    (
                        F.lit(sign)
                        * F.col(c).isNotNull().cast("long")
                    ).alias(f"__dnn_{c}"),
                    (F.lit(sign) * F.col(c).cast(MONEY)).alias(
                        f"__d_{c}"
                    ),
                )
            ],
        )

    after = ch.filter(F.col(op_col).isin("I", "U"))
    delta = (
        signed(before, -1)
        .unionByName(signed(after, +1))
        .groupBy(*group_cols)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[
                e
                for c in sum_cols
                for e in (
                    F.sum(f"__dnn_{c}").alias(f"__dnn_{c}"),
                    F.sum(f"__d_{c}").cast(MONEY_SUM).alias(f"__d_{c}"),
                )
            ],
        )
    )
    # null-safe equality on every group column: a plain USING join
    # never matches NULL = NULL, which would leave the old NULL-group
    # row stale AND filter the delta-only side — a silent divergence
    # from the recompute (review finding, round 6)
    d = delta.select(
        *[F.col(g).alias(f"__g_{g}") for g in group_cols],
        *[c for c in delta.columns if c not in group_cols],
    )
    cond = None
    for g in group_cols:
        term = old_agg[g].eqNullSafe(d[f"__g_{g}"])
        cond = term if cond is None else cond & term
    merged = old_agg.join(d, cond, "full_outer")
    zero = F.lit(0).cast(MONEY_SUM)
    out_cols = [
        *[
            F.coalesce(old_agg[g], d[f"__g_{g}"]).alias(g)
            for g in group_cols
        ],
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias("n_rows"),
    ]
    for c in sum_cols:
        nn = F.coalesce(F.col(f"nn_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"__dnn_{c}"), F.lit(0)
        )
        total = (
            F.coalesce(F.col(f"sum_{c}"), zero)
            + F.coalesce(F.col(f"__d_{c}"), zero)
        ).cast(MONEY_SUM)
        out_cols.append(nn.alias(f"nn_{c}"))
        # SUM over zero non-null values is NULL, exactly as a
        # recompute reports it — 0 would be indistinguishable from
        # values that cancel
        out_cols.append(
            F.when(nn == 0, F.lit(None).cast(MONEY_SUM))
            .otherwise(total)
            .alias(f"sum_{c}")
        )
    return merged.select(*out_cols).where(F.col("n_rows") > 0)


def cdc_maintain_join(
    old_join: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    dim: DataFrame,
    dim_keys: list[str],
    op_col: str = "op",
    version_col: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Incremental maintenance of a materialized fact ⋈ dim join under
    a fact-side CDC batch: the join-IVM identity

        Δ(F ⋈ D) = (−touched rows) ∪ (latest I/U after-images ⋈ D)

    so the refreshed join is ``old_join`` minus its touched-key rows
    (ONE anti-join — a key lookup, not a scan) plus the change batch
    joined to the dimension. The 100-TB materialized join is never
    re-joined: fact-side work is |touched keys|, dim-side work is the
    change batch against a (usually broadcastable) dimension.

    ``changes`` carries the fact columns + op/version (u06's batch
    shape); each key's latest change wins via the same max-struct
    `latest_changes` the row-level apply uses, so apply-then-join and
    maintain-the-join provably resolve the same winners. The dimension
    is assumed static across the batch — a dim-side change means
    touched DIM keys' rows retract instead (run the mirror call with
    fact/dim swapped); min/max-style non-self-maintainable aggregates
    have no analogue here because a join is row-linear.
    """
    fact_cols = [
        c for c in changes.columns if c not in (op_col, version_col)
    ]
    ch = latest_changes(changes, key_cols, fact_cols, op_col, version_col)
    touched = ch.select(*key_cols).distinct()
    kept = old_join.join(touched, key_cols, "left_anti")
    upserts = ch.filter(F.col(op_col).isin("I", "U")).select(*fact_cols)
    d = F.broadcast(dim) if broadcast_dim else dim
    delta = upserts.join(d, dim_keys)
    return kept.unionByName(delta.select(*old_join.columns))
