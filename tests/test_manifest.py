"""Manifest-committed dataset tests (VERDICT r6 item 2): every
multi-partition mutation must be crash-atomic — readers see the old
snapshot in full until the single manifest rename, then the new one in
full, at EVERY crash point in between."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.sources import manifest as M


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "id int, day string, v string")


@pytest.fixture()
def lake(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = _mkdf(
        spark,
        [
            (1, "2024-01-01", "a"),
            (2, "2024-01-01", "b"),
            (3, "2024-01-02", "c"),
            (4, "2024-01-03", "d"),
        ],
    )
    M.write_manifested(df, path, "day")
    return path


def _snap_rows(spark, path, version=None):
    return sorted(
        (r.id, r.day, r.v)
        for r in M.read_snapshot(spark, path, version).collect()
    )


def test_write_and_read_snapshot(spark, lake):
    assert _snap_rows(spark, lake) == [
        (1, "2024-01-01", "a"),
        (2, "2024-01-01", "b"),
        (3, "2024-01-02", "c"),
        (4, "2024-01-03", "d"),
    ]
    assert M.list_manifest_versions(spark, lake) == [1]


def test_overwrite_partitions_atomic_flips_only_targets(spark, lake):
    upd = _mkdf(spark, [(9, "2024-01-01", "z")])
    v = M.overwrite_partitions_atomic(upd, lake)
    assert v == 2
    assert _snap_rows(spark, lake) == [
        (3, "2024-01-02", "c"),
        (4, "2024-01-03", "d"),
        (9, "2024-01-01", "z"),
    ]
    # time travel: the pre-mutation snapshot is still fully readable
    assert len(_snap_rows(spark, lake, version=1)) == 4


def test_staged_but_uncommitted_data_is_invisible(spark, lake):
    """Crash window 1: new version dirs staged, manifest NOT yet
    published — readers must still serve the old snapshot even though
    the new files sit inside the partition directories."""
    upd = _mkdf(spark, [(9, "2024-01-01", "z"), (8, "2024-01-02", "y")])
    M._stage_partitions(upd, lake, "day", 1_000_000, "snappy")
    assert len(_snap_rows(spark, lake)) == 4  # unchanged
    # vacuum reclaims the orphaned stage
    deleted = M.vacuum(spark, lake)
    assert len(_snap_rows(spark, lake)) == 4
    assert any("v-" in d for d in deleted)


def test_half_written_manifest_is_ignored(spark, lake):
    """Crash window 2: a crash mid-manifest-write leaves only the
    dot-tmp file; the reader's name filter must skip it."""
    mdir = os.path.join(lake, M.MANIFEST_DIR)
    with open(os.path.join(mdir, ".tmp-dead-manifest-00000002.json"), "w") as f:
        f.write('{"partition_col": "day", "partitions": {')  # truncated
    assert M.list_manifest_versions(spark, lake) == [1]
    assert len(_snap_rows(spark, lake)) == 4


def test_delete_keys_atomic_single_commit(spark, lake):
    """GDPR delete touching TWO partitions (one emptied entirely) is
    one manifest flip: before the commit the old snapshot serves; after
    it both changes appear together."""
    keys = spark.createDataFrame([(3,), (1,)], "id int")
    n = M.delete_keys_atomic(spark, lake, keys, "id")
    assert n == 2
    assert _snap_rows(spark, lake) == [
        (2, "2024-01-01", "b"),
        (4, "2024-01-03", "d"),
    ]
    man = M.read_manifest(spark, lake)
    # 2024-01-02 lost its only row: its entry is gone from the manifest
    assert set(man["partitions"]) == {"2024-01-01", "2024-01-03"}
    # exactly one new manifest version for the whole mutation
    assert M.list_manifest_versions(spark, lake) == [1, 2]


def test_delete_keys_atomic_no_match_no_commit(spark, lake):
    keys = spark.createDataFrame([(999,)], "id int")
    assert M.delete_keys_atomic(spark, lake, keys, "id") == 0
    assert M.list_manifest_versions(spark, lake) == [1]


def test_vacuum_reclaims_old_versions_and_manifests(spark, lake):
    upd = _mkdf(spark, [(9, "2024-01-01", "z")])
    M.overwrite_partitions_atomic(upd, lake)
    old_man = M.read_manifest(spark, lake, 1)
    old_token = old_man["partitions"]["2024-01-01"]
    deleted = M.vacuum(spark, lake, keep_manifests=1)
    assert f"{lake}/day=2024-01-01/{old_token}" in deleted
    assert M.list_manifest_versions(spark, lake) == [2]
    # current snapshot unharmed
    assert _snap_rows(spark, lake) == [
        (3, "2024-01-02", "c"),
        (4, "2024-01-03", "d"),
        (9, "2024-01-01", "z"),
    ]
    with pytest.raises(FileNotFoundError):
        M.read_snapshot(spark, lake, version=1)


def test_manifest_is_readable_json_with_version(spark, lake):
    man = M.read_manifest(spark, lake)
    assert man["version"] == 1
    assert man["partition_col"] == "day"
    mdir = os.path.join(lake, M.MANIFEST_DIR)
    raw = json.load(open(os.path.join(mdir, "manifest-00000001.json")))
    assert raw == man


def test_snapshot_prunes_partition_filter(spark, lake):
    """A filter on the manifest partition column must not scan the
    other partitions' files (the per-partition literal column folds the
    filter to a no-op read of only matching dirs)."""
    df = M.read_snapshot(spark, lake).filter(F.col("day") == "2024-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "2024-01-01" not in plan.replace("2024-01-02", "")
    assert [r.id for r in df.collect()] == [3]


def test_partition_values_unescape_and_types_roundtrip(spark, tmp_path):
    """Hive-escaped partition values (':' -> %3A) and non-string
    partition dtypes must round-trip: the restored column carries the
    ORIGINAL value and type, and a delete re-stages under the SAME
    manifest key (no entry duplication / value drift — the r7 review
    finding)."""
    path = str(tmp_path / "tlake")
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:00"),
         (3, "2024-01-01 11:00:00")],
        "id long, hour string",
    )
    M.write_manifested(df, path, "hour")
    got = {
        (r.id, r.hour) for r in M.read_snapshot(spark, path).collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:00:00"),
        (3, "2024-01-01 11:00:00"),
    }
    keys_before = set(M.read_manifest(spark, path)["partitions"])
    keys = spark.createDataFrame([(1,)], "id long")
    assert M.delete_keys_atomic(spark, path, keys, "id") == 1
    man = M.read_manifest(spark, path)
    # same (escaped) manifest keys — the rewritten partition REPLACED
    # its entry instead of adding a double-escaped twin
    assert set(man["partitions"]) == keys_before
    got = {
        (r.id, r.hour) for r in M.read_snapshot(spark, path).collect()
    }
    assert got == {
        (2, "2024-01-01 10:00:00"),
        (3, "2024-01-01 11:00:00"),
    }


def test_partition_dtype_restored_and_drift_rejected(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "ilake")
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, bucket int"
    )
    M.write_manifested(df, path, "bucket")
    snap = M.read_snapshot(spark, path)
    assert snap.schema["bucket"].dataType.simpleString() == "int"
    assert {(r.id, r.bucket) for r in snap.collect()} == {
        (1, 10),
        (2, 20),
    }
    drifted = spark.createDataFrame(
        [(3, "30")], "id long, bucket string"
    )
    with _pytest.raises(ValueError, match="dtype drift"):
        M.overwrite_partitions_atomic(drifted, path)


def test_null_partition_value_roundtrips(spark, tmp_path):
    path = str(tmp_path / "nlake")
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, grp string"
    )
    M.write_manifested(df, path, "grp")
    got = {(r.id, r.grp) for r in M.read_snapshot(spark, path).collect()}
    assert got == {(1, "a"), (2, None)}
