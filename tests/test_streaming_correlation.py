"""Streaming correlation panel (u19's streaming face): the read-time
profile must equal batch `correlation_profile` over the delivered
history after EVERY batch with NO ordering contract — the sufficient
statistics are plain sums, and r is derived at read time (per-batch
correlations can NOT be merged: two batches individually perfectly
correlated can be jointly anti-correlated, the case the cross-batch
fixture pins). Replays must be no-ops; the end-to-end file stream
must match batch bit-for-bit."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.profile import (
    correlation_profile,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.correlation import (
    correlation_stats_sink,
    maintain_correlation_profile,
    read_correlation_profile,
)

SCHEMA = "id long, x long, y long, z long"


def _cols():
    # F.col needs an active session under classic PySpark - build the
    # expression list lazily inside each test, never at import time
    return [(c, F.col(c)) for c in ("x", "y", "z")]

# Within batch 0, (x, y) is perfectly POSITIVELY correlated; within
# batch 1 too — but the two clouds sit on opposite sides, so jointly
# r(x, y) flips well away from either batch's +1: the fixture that
# kills any merge-the-correlations design. Batch 2 brings NULLs
# (pairwise-complete counting) and a constant z segment.
BATCH0 = [(1, 1, 10, 5), (2, 2, 11, 5), (3, 3, 12, 5)]
BATCH1 = [(4, 101, -40, 5), (5, 102, -39, 5), (6, 103, -38, 5)]
BATCH2 = [(7, 4, None, 5), (8, None, 13, 6), (9, 5, 14, None)]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _prof(df):
    if df is None:
        return []
    return sorted(
        (r.col_x, r.col_y, r.n_pairs, r.corr) for r in df.collect()
    )


def _batch_reference(spark, batches):
    return correlation_profile(
        _mk(spark, [r for b in batches for r in b]), _cols()
    )


def test_streamed_profile_equals_batch_after_every_batch(
    spark, tmp_path
):
    sink = correlation_stats_sink(str(tmp_path / "out"), _cols())
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _prof(
            read_correlation_profile(spark, str(tmp_path / "out"))
        )
        assert got == _prof(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_per_batch_correlations_do_not_merge(spark, tmp_path):
    """Each batch alone reads r(x,y) = +1 (collinear within batch);
    the fold must read the JOINT correlation, which is strongly
    negative — the statistics are the mergeable object, never r."""
    sink = correlation_stats_sink(str(tmp_path / "out"), _cols())
    per_batch = []
    for i, rows in enumerate((BATCH0, BATCH1)):
        only = {
            (r.col_x, r.col_y): r.corr
            for r in correlation_profile(_mk(spark, rows), _cols()).collect()
        }
        per_batch.append(only[("x", "y")])
        sink(_mk(spark, rows), i)
    assert all(abs(r - 1.0) <= 3e-16 for r in per_batch)
    folded = {
        (r.col_x, r.col_y): r.corr
        for r in read_correlation_profile(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert folded[("x", "y")] < 0


def test_delivery_order_is_irrelevant(spark, tmp_path):
    sink = correlation_stats_sink(str(tmp_path / "out"), _cols())
    for i, rows in zip((0, 1, 2), (BATCH2, BATCH0, BATCH1)):
        sink(_mk(spark, rows), i)
    got = _prof(read_correlation_profile(spark, str(tmp_path / "out")))
    assert got == _prof(_batch_reference(spark, ALL))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = correlation_stats_sink(str(tmp_path / "out"), _cols())
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _prof(
        read_correlation_profile(spark, str(tmp_path / "out"))
    )
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _prof(read_correlation_profile(spark, str(tmp_path / "out")))
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
    q = maintain_correlation_profile(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), _cols()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _prof(read_correlation_profile(spark, str(tmp_path / "out")))
    assert got == _prof(_batch_reference(spark, ALL))
