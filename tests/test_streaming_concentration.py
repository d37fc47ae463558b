"""Streaming concentration profile (u18's streaming face): the
read-time report must equal batch `concentration_profile` over the
delivered history after EVERY batch with NO ordering contract (value
counts are additive), replays must be no-ops, and the end-to-end file
stream must match the batch operator bit-for-bit — including the
(count DESC, value ASC) modal tiebreak as counts shift across
batches."""

from __future__ import annotations

import os
import time

from ods_to_datalake_spark.operators.profile import (
    concentration_profile,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.concentration import (
    maintain_concentration,
    read_concentration,
    value_counts_sink,
)

SCHEMA = "k string, status string"
COLS = ["k", "status"]

# batch 2 flips the modal value of `status` (tiebreak exercised at the
# crossover) and brings NULLs (a profiled value, not an absence)
BATCH0 = [("a", "O"), ("a", "O"), ("b", "F")]
BATCH1 = [("a", "F"), ("c", "F"), ("c", None)]
BATCH2 = [("a", "O"), (None, "F"), ("d", "F")]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _prof(df):
    if df is None:
        return []
    return sorted(
        (
            r.column_name,
            r.n_rows,
            r.n_distinct,
            r.top_value,
            r.top_count,
            r.top_share,
            r.gini_impurity,
        )
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return concentration_profile(
        _mk(spark, [r for b in batches for r in b]), COLS
    )


def test_streamed_profile_equals_batch_after_every_batch(
    spark, tmp_path
):
    sink = value_counts_sink(str(tmp_path / "out"), COLS)
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _prof(
            read_concentration(spark, str(tmp_path / "out"), COLS)
        )
        assert got == _prof(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = value_counts_sink(str(tmp_path / "out"), COLS)
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _prof(
        read_concentration(spark, str(tmp_path / "out"), COLS)
    )
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _prof(read_concentration(spark, str(tmp_path / "out"), COLS))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "out")) == [0, 1]


def test_real_stream_matches_batch_profile(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(ALL):
        f = os.path.join(src, f"b{i}.parquet")
        _mk(spark, rows).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    q = maintain_concentration(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), COLS
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _prof(
        read_concentration(spark, str(tmp_path / "out"), COLS)
    )
    assert got == _prof(_batch_reference(spark, ALL))
