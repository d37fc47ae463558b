"""Streaming RFM grid (u27's streaming face): the read-time grid must
equal batch `rfm_segments` over the delivered history after EVERY
batch with NO ordering contract — per-customer (max-date, count,
cents) state is a mergeable semigroup (the OHLC algebra), so a late
order that improves a customer's recency wins the next max-merge and
the moving anchor re-bins everyone at read time. The grid itself does
NOT merge (NTILE bins are global ranks) — pinned by a fixture —
which is why the artifact is per-customer partials."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.features import rfm_segments
from ods_to_datalake_spark.streaming.rfm import (
    maintain_rfm,
    read_rfm_segments,
    rfm_partials_sink,
)

SCHEMA = "cust long, dt string, amt double"

# batch 1 delivers c1's EARLIER order late (recency unaffected — max
# merge), and c3's LATEST order late (recency improves across the
# merge, and the global anchor moves); batch 2 brings NULL customer
# (excluded) and a NULL-date order for a NEW customer c5 (present in
# frequency/monetary state but binless until a dated order arrives —
# the finalize exclusion)
BATCH0 = [
    (1, "2024-01-08", 100.0),
    (2, "2024-01-01", 50.0),
    (3, "2024-01-03", 60.0),
]
BATCH1 = [
    (1, "2024-01-02", 40.0),
    (3, "2024-01-09", 40.0),
    (4, "2024-01-06", 5.0),
]
BATCH2 = [
    (None, "2024-01-09", 999.0),
    (5, None, 999.0),
    (2, "2024-01-10", 10.0),
]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).selectExpr(
        "cust", "CAST(dt AS TIMESTAMP) AS dt", "amt"
    )


def _grid(df):
    if df is None:
        return None
    return sorted(
        (r.r_bin, r.f_bin, r.m_bin, r.n_customers, r.total_cents)
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return rfm_segments(
        _mk(spark, [r for b in batches for r in b]),
        "cust",
        "dt",
        F.col("amt"),
        n_bins=2,
    )


def test_streamed_grid_equals_batch_after_every_batch(spark, tmp_path):
    sink = rfm_partials_sink(
        str(tmp_path / "out"), "cust", "dt", F.col("amt")
    )
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _grid(
            read_rfm_segments(spark, str(tmp_path / "out"), n_bins=2)
        )
        assert got == _grid(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = rfm_partials_sink(
        str(tmp_path / "out"), "cust", "dt", F.col("amt")
    )
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
    before = _grid(
        read_rfm_segments(spark, str(tmp_path / "out"), n_bins=2)
    )
    sink(_mk(spark, BATCH1), 1)  # replay overwrites its own snapshot
    assert (
        _grid(read_rfm_segments(spark, str(tmp_path / "out"), n_bins=2))
        == before
    )


def test_grid_itself_does_not_merge(spark, tmp_path):
    """WHY the artifact is per-customer partials: each batch's OWN
    grid puts its customers in bins relative to that batch only — no
    fold of the two 1-customer grids can produce the union's
    2-customer split (both read bin (1,1,1) alone; together they must
    separate)."""
    b0 = [(1, "2024-01-09", 100.0)]
    b1 = [(2, "2024-01-01", 5.0)]
    g0 = _grid(_batch_reference(spark, [b0]))
    g1 = _grid(_batch_reference(spark, [b1]))
    assert g0 == [(1, 1, 1, 1, 10000)]
    assert g1 == [(1, 1, 1, 1, 500)]
    union = _grid(_batch_reference(spark, [b0, b1]))
    assert union == [(1, 1, 1, 1, 10000), (2, 2, 2, 1, 500)]


def test_real_stream_matches_batch_grid(spark, tmp_path):
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
        spark.readStream.schema("cust long, dt timestamp, amt double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    q = maintain_rfm(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        "cust",
        "dt",
        F.col("amt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _grid(read_rfm_segments(spark, str(tmp_path / "out"), n_bins=2))
    assert got == _grid(_batch_reference(spark, ALL))
