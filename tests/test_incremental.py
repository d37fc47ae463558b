"""Incremental aggregate maintenance: the delta merge must equal a
recompute over cdc_apply's output for every change shape — group-move
updates, whole-group deletes, new-group inserts, all-NULL measures,
multi-version batches. The sf-data identity is oracle-checked (u07);
these tests pin the semantics on surgical corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.cdc import cdc_apply
from ods_to_datalake_spark.operators.incremental import (
    agg_snapshot,
    cdc_maintain_agg,
)

BASE_SCHEMA = "id bigint, grp string, val double"
CH_SCHEMA = BASE_SCHEMA + ", op string, ver int"

BASE = [
    (1, "a", 10.0),
    (2, "a", 20.0),
    (3, "b", 5.0),
    (4, "b", None),  # NULL measure in a surviving group
    (5, "c", 7.0),
    (6, "d", None),  # group whose ONLY value is NULL → sum NULL
]

CHANGES = [
    # group-move: row 1 leaves a for b (retract a, add b)
    (1, "b", 11.0, "U", 1),
    # two versions for row 2: only ver=2 applies
    (2, "a", 99.0, "U", 1),
    (2, "a", 25.0, "U", 2),
    # delete the whole of group c
    (5, "c", 7.0, "D", 1),
    # insert a brand-new group
    (7, "e", 3.0, "I", 1),
    # value becomes NULL (update d's row: still NULL)
    (6, "d", None, "U", 1),
]


def _frames(spark):
    base = spark.createDataFrame(BASE, BASE_SCHEMA)
    ch = spark.createDataFrame(CHANGES, CH_SCHEMA)
    return base, ch


def _rows(df):
    return sorted(
        (
            (r.grp, r.n_rows, r.nn_val, None if r.sum_val is None
             else float(r.sum_val))
            for r in df.collect()
        ),
        key=repr,  # NULL group keys sort without str/None TypeError
    )


def test_maintained_agg_equals_recompute(spark):
    base, ch = _frames(spark)
    old = agg_snapshot(base, ["grp"], ["val"])
    maintained = cdc_maintain_agg(
        old, base, ch, ["id"], ["grp"], ["val"],
        op_col="op", version_col="ver",
    )
    applied = cdc_apply(base, ch, ["id"], op_col="op", version_col="ver")
    recomputed = agg_snapshot(applied, ["grp"], ["val"])
    assert _rows(maintained) == _rows(recomputed)


def test_maintained_agg_semantics(spark):
    base, ch = _frames(spark)
    old = agg_snapshot(base, ["grp"], ["val"])
    rows = {
        r.grp: r
        for r in cdc_maintain_agg(
            old, base, ch, ["id"], ["grp"], ["val"],
            op_col="op", version_col="ver",
        ).collect()
    }
    assert "c" not in rows  # whole group deleted → dropped, not 0-row
    assert rows["e"].n_rows == 1  # born this batch
    assert float(rows["e"].sum_val) == 3.0
    # a lost row 1 (moved to b) and had row 2 updated to 25
    assert rows["a"].n_rows == 1
    assert float(rows["a"].sum_val) == 25.0
    # b gained the moved row (11.0): 5 + NULL + 11 over 3 rows, 2 non-null
    assert rows["b"].n_rows == 3
    assert rows["b"].nn_val == 2
    assert float(rows["b"].sum_val) == 16.0
    # d's only value is NULL → SUM is NULL (not 0), like a recompute
    assert rows["d"].n_rows == 1
    assert rows["d"].nn_val == 0
    assert rows["d"].sum_val is None


def test_maintained_agg_empty_change_batch_is_identity(spark):
    base, _ = _frames(spark)
    ch = spark.createDataFrame([], CH_SCHEMA)
    old = agg_snapshot(base, ["grp"], ["val"])
    maintained = cdc_maintain_agg(
        old, base, ch, ["id"], ["grp"], ["val"],
        op_col="op", version_col="ver",
    )
    assert _rows(maintained) == _rows(old)


def test_maintained_agg_two_batches_compose(spark):
    """Applying batch 2 to the MAINTAINED aggregate of batch 1 equals
    a recompute over both applications — the property that lets the
    artifact live forever without a rebuild."""
    base, ch1 = _frames(spark)
    ch2 = spark.createDataFrame(
        [
            (7, "e", 4.5, "U", 1),   # update the batch-1 insert
            (3, "b", 5.0, "D", 1),   # shrink b
            (8, "a", 1.25, "I", 1),  # grow a
        ],
        CH_SCHEMA,
    )
    snap1 = cdc_apply(base, ch1, ["id"], op_col="op", version_col="ver")
    agg1 = cdc_maintain_agg(
        agg_snapshot(base, ["grp"], ["val"]), base, ch1,
        ["id"], ["grp"], ["val"], op_col="op", version_col="ver",
    )
    agg2 = cdc_maintain_agg(
        agg1, snap1, ch2, ["id"], ["grp"], ["val"],
        op_col="op", version_col="ver",
    )
    snap2 = cdc_apply(snap1, ch2, ["id"], op_col="op", version_col="ver")
    assert _rows(agg2) == _rows(agg_snapshot(snap2, ["grp"], ["val"]))


# ---------------------------------------------------------------------------
# randomized IVM identity: maintained == recompute for arbitrary batches
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_GRPS = ["a", "b", "c", None]
_VALS = [None, -5.25, 0.0, 17.5, 123456.78]


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_maintained_agg_matches_recompute_fuzz(spark, data):
    """For arbitrary base tables and change batches (any op mix, any
    group moves, multi-version keys with unique versions), the delta
    merge equals a recompute over cdc_apply's output."""
    base_rows = [
        (i, data.draw(st.sampled_from(_GRPS)),
         data.draw(st.sampled_from(_VALS)))
        for i in range(data.draw(st.integers(0, 10)))
    ]
    n_ch = data.draw(st.integers(0, 14))
    ch_rows = [
        (
            data.draw(st.integers(0, 13)),
            data.draw(st.sampled_from(_GRPS)),
            data.draw(st.sampled_from(_VALS)),
            data.draw(st.sampled_from(["I", "U", "D"])),
            ver,  # globally unique → unique per key, as the contract asks
        )
        for ver in range(n_ch)
    ]
    base = spark.createDataFrame(base_rows, BASE_SCHEMA)
    ch = spark.createDataFrame(ch_rows, CH_SCHEMA)
    maintained = cdc_maintain_agg(
        agg_snapshot(base, ["grp"], ["val"]), base, ch,
        ["id"], ["grp"], ["val"], op_col="op", version_col="ver",
    )
    applied = cdc_apply(base, ch, ["id"], op_col="op", version_col="ver")
    assert _rows(maintained) == _rows(
        agg_snapshot(applied, ["grp"], ["val"])
    )


def test_maintained_agg_null_group_key(spark):
    """NULL group keys must merge null-safely — a plain USING join
    leaves the old NULL-group row stale forever (review finding,
    round 6)."""
    base = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 4.0), (3, "a", 1.0)], BASE_SCHEMA
    )
    ch = spark.createDataFrame(
        [
            (1, None, 10.0, "D", 1),   # shrink the NULL group
            (4, None, 2.5, "I", 1),    # and grow it back
        ],
        CH_SCHEMA,
    )
    maintained = cdc_maintain_agg(
        agg_snapshot(base, ["grp"], ["val"]), base, ch,
        ["id"], ["grp"], ["val"], op_col="op", version_col="ver",
    )
    applied = cdc_apply(base, ch, ["id"], op_col="op", version_col="ver")
    assert _rows(maintained) == _rows(agg_snapshot(applied, ["grp"], ["val"]))
    null_row = next(
        r for r in maintained.collect() if r.grp is None
    )
    assert null_row.n_rows == 2
    assert float(null_row.sum_val) == 6.5


def test_snapshot_diff_roundtrip_and_ops(spark):
    """snapshot_diff is cdc_apply's inverse: applying the diff to the
    old snapshot reproduces the new one exactly, ops classify
    correctly, and unchanged keys emit nothing — including NULL-valued
    columns compared null-safely."""
    from ods_to_datalake_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        BASE_SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),    # unchanged → no row
            (2, "b", 2.0),    # NULL -> value: 'U' (null-safe compare)
            (3, "c", None),   # value -> NULL: 'U'
            (5, "e", 5.0),    # added: 'I'
        ],                    # 4 removed: 'D'
        BASE_SCHEMA,
    )
    diff = snapshot_diff(old, new, ["id"])
    ops = {r.id: r.op for r in diff.collect()}
    assert ops == {2: "U", 3: "U", 4: "D", 5: "I"}
    dels = {r.id: r.val for r in diff.collect() if r.op == "D"}
    assert dels == {4: 4.0}  # deletes carry the OLD row
    applied = cdc_apply(old, diff, ["id"], op_col="op")
    got = sorted(map(tuple, applied.collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_snapshot_diff_roundtrip_fuzz(spark, data):
    """cdc_apply(old, snapshot_diff(old, new)) == new for arbitrary
    snapshot pairs (overlapping keys, NULL values, duplicate-free by
    key as snapshots are)."""
    from ods_to_datalake_spark.operators.cdc import snapshot_diff

    def snap():
        ids = data.draw(
            st.lists(st.integers(0, 12), unique=True, max_size=10)
        )
        return spark.createDataFrame(
            [
                (i, data.draw(st.sampled_from(["a", "b"])),
                 data.draw(st.sampled_from(_VALS)))
                for i in ids
            ],
            BASE_SCHEMA,
        )

    old, new = snap(), snap()
    applied = cdc_apply(
        old, snapshot_diff(old, new, ["id"]), ["id"], op_col="op"
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff_key_only_and_collision_guard(spark):
    """A key-only snapshot pair is a pure membership diff (I/D, never
    'U' — and never an AssertionError from an empty comparison); a
    data column colliding with op_col raises instead of silently
    overwriting values (review findings, round 6)."""
    import pytest as _pytest

    from ods_to_datalake_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "id bigint")
    new = spark.createDataFrame([(2,), (3,)], "id bigint")
    ops = {r.id: r.op for r in snapshot_diff(old, new, ["id"]).collect()}
    assert ops == {1: "D", 3: "I"}

    with_op = spark.createDataFrame([(1, "x")], "id bigint, op string")
    with _pytest.raises(ValueError, match="op_col"):
        snapshot_diff(with_op, with_op, ["id"])
