"""Document-fold operators (SURVEY §2.4 A1/A2/A5): relational-in, document-out.

The defining operator of the reference workload: group rows and fold them
into a deterministic array-of-struct column —
``groupBy(keys).agg(sort_array(collect_list(struct(fields))))``
(ibs_ordinary_payment_utilities.py:99-101 for riders, :144-253 for the
20-field payment-period struct).

Determinism: ``collect_list`` order is shuffle-dependent; ``sort_array``
restores a stable order by lexicographic struct comparison — the FIRST
struct field is the effective sort key, and string keys sort as strings
(`_1, _10, _11, ..., _2` in the golden doc, PMT_KAL_5776815_1.json:34-112).
Callers must put the intended order key first in ``struct_fields``.

Scale notes (SURVEY §7.3d): collect_list runs on ObjectHashAggregate, which
holds per-group arrays in executor memory. Mitigations baked in here:
- partial (map-side) aggregation is automatic for collect_list;
- pre-fold child tables *before* joining to the parent (the reference folds
  riders before the wide group, :99-107) — `fold_to_array` on the child,
  then a normal join — so no group ever holds the cross-product;
- group keys are high-cardinality business keys, so groups stay small and
  AQE can split skewed partitions.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(cols: Seq[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def fold_to_array(
    df: DataFrame,
    group_by: Seq[Column | str],
    struct_fields: Seq[Column | str],
    out_col: str,
    sort: bool = True,
    extra_aggs: Seq[Column] = (),
) -> DataFrame:
    """Group and fold rows into an array-of-struct column.

    ``struct_fields``: columns (or aliased expressions) composing each
    element; the first field is the array's sort key when ``sort``.
    ``extra_aggs``: additional aggregate expressions computed in the same
    pass (so a fold plus scalar aggregates is ONE shuffle, not two).
    """
    arr = F.collect_list(F.struct(*_cols(struct_fields)))
    if sort:
        arr = F.sort_array(arr)
    aggs = [arr.alias(out_col), *extra_aggs]
    return df.groupBy(*_cols(group_by)).agg(*aggs)


def fold_to_sorted_strings(
    df: DataFrame,
    group_by: Seq[Column | str],
    value: Column,
    out_col: str,
    sep: str = "|",
) -> DataFrame:
    """Fold a string expression per group into one sorted, delimited string.

    The hash-stable flattening of a document fold — used by the oracle
    harness to compare nested folds against ANSI-SQL ``string_agg`` exactly.
    """
    return df.groupBy(*_cols(group_by)).agg(
        F.array_join(F.sort_array(F.collect_list(value)), sep).alias(out_col)
    )


def unnest_array(
    df: DataFrame,
    array_col: str,
    keep: Seq[Column | str] = (),
    with_position: bool = False,
) -> DataFrame:
    """Inverse of `fold_to_array`: explode an array-of-struct column back
    to one row per element with the struct fields as top-level columns.

    The lake-side read pattern — documents come OUT of the lake as
    relational rows for analytics. `with_position` adds the 0-based
    element index (the fold's sort order). Map-side only; no shuffle.
    """
    keep_cols = _cols(keep) if keep else [
        F.col(c) for c in df.columns if c != array_col
    ]
    if with_position:
        exploded = df.select(
            *keep_cols, F.posexplode(array_col).alias("pos", "__elem")
        )
        return exploded.select(*[c for c in keep_cols], "pos", "__elem.*")
    exploded = df.select(*keep_cols, F.explode(array_col).alias("__elem"))
    return exploded.select(*[c for c in keep_cols], "__elem.*")


def doc_id(*cols: Column | str, bits: int = 256) -> Column:
    """Content-hash document id (SURVEY §2.1 S6).

    The revised golden doc carries a hash `id` field
    (PMT_KAL_5776815_1_New.json:346); we derive it as sha2 over the
    canonical JSON of the given columns.
    """
    cs = _cols(cols)
    return F.sha2(F.to_json(F.struct(*cs)), bits)
