"""Streaming KS drift gate (u21's streaming face): the read-time
statistic must equal batch `ks_two_sample` over baseline ∪ delivered
history after EVERY batch with NO ordering contract (per-value counts
are additive), replays must be no-ops, the end-to-end file stream must
match batch bit-for-bit, and the non-mergeability fixture pins WHY the
artifact is counts, not D."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.profile import ks_two_sample
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.ks_drift import (
    maintain_ks_counts,
    read_ks_drift,
    value_counts_sink,
)

SCHEMA = "v long"
BASELINE = [(1,), (2,), (2,), (3,), (4,), (5,), (5,), (6,)]

# batch 1 matches the baseline's shape, batch 2 shifts the mass up
# (drift the gate exists to catch), batch 3 brings a NULL (excluded)
BATCH0 = [(1,), (2,), (3,)]
BATCH1 = [(2,), (4,), (5,)]
BATCH2 = [(7,), (8,), (None,), (8,)]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _baseline(spark):
    return _mk(spark, BASELINE)


def _row(df):
    if df is None:
        return None
    (r,) = df.collect()
    return (r.n_a, r.n_b, r.ks_d, r.at_value)


def _batch_reference(spark, batches):
    union = _baseline(spark).withColumn("g", F.lit(True)).unionByName(
        _mk(spark, [r for b in batches for r in b]).withColumn(
            "g", F.lit(False)
        )
    )
    return ks_two_sample(union, F.col("g"), F.col("v"))


def test_streamed_ks_equals_batch_after_every_batch(spark, tmp_path):
    sink = value_counts_sink(str(tmp_path / "out"), F.col("v"))
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _row(
            read_ks_drift(
                spark, str(tmp_path / "out"), _baseline(spark),
                F.col("v"),
            )
        )
        assert got == _row(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_ks_statistic_does_not_merge(spark, tmp_path):
    """WHY the artifact is counts: two batches each identical to the
    baseline read D = 0 alone, and their union still reads 0 — but a
    low-half batch and a high-half batch EACH read a large D while
    their union reads 0. sup|F_a − F_b| over a union is not any fold
    of the per-batch sups."""
    lo = [(1,), (2,), (2,), (3,)]
    hi = [(4,), (5,), (5,), (6,)]

    def d_of(batches):
        union = _baseline(spark).withColumn(
            "g", F.lit(True)
        ).unionByName(
            _mk(spark, [r for b in batches for r in b]).withColumn(
                "g", F.lit(False)
            )
        )
        (r,) = ks_two_sample(union, F.col("g"), F.col("v")).collect()
        return r.ks_d

    d_lo, d_hi, d_union = d_of([lo]), d_of([hi]), d_of([lo, hi])
    assert d_union == 0.0
    assert d_lo == 0.5 and d_hi == 0.5  # each half alone reads drift
    # no fold of (0.5, 0.5) yields 0 — counts are the only mergeable
    # object, which is what the sink stores


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = value_counts_sink(str(tmp_path / "out"), F.col("v"))
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _row(
        read_ks_drift(
            spark, str(tmp_path / "out"), _baseline(spark), F.col("v")
        )
    )
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _row(
            read_ks_drift(
                spark, str(tmp_path / "out"), _baseline(spark),
                F.col("v"),
            )
        )
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "out")) == [0, 1]


def test_shuffled_delivery_order_is_invariant(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    for out, order in ((a, [0, 1, 2]), (b, [2, 0, 1])):
        sink = value_counts_sink(out, F.col("v"))
        for i in order:
            sink(_mk(spark, ALL[i]), i)
    assert _row(
        read_ks_drift(spark, a, _baseline(spark), F.col("v"))
    ) == _row(read_ks_drift(spark, b, _baseline(spark), F.col("v")))


def test_read_before_any_commit_is_none(spark, tmp_path):
    assert (
        read_ks_drift(
            spark, str(tmp_path / "empty"), _baseline(spark),
            F.col("v"),
        )
        is None
    )


def test_real_stream_matches_batch_ks(spark, tmp_path):
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
    q = maintain_ks_counts(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        F.col("v"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _row(
        read_ks_drift(
            spark, str(tmp_path / "out"), _baseline(spark), F.col("v")
        )
    )
    assert got == _row(_batch_reference(spark, ALL))


def test_gini_derives_from_the_same_artifact(spark, tmp_path):
    """Second read-time derivation of the value-count artifact (u25's
    streaming face): the Gini read must equal batch gini_coefficient
    over the delivered history after every batch — the closed-form
    tied-block rank sum needs only (value, count), which is exactly
    what the KS sink maintains. Negative values are excluded at READ
    time (the batch operator's non-negative-measure rule); the NULL
    in batch 2 was already excluded by the sink."""
    from ods_to_datalake_spark.operators.profile import (
        gini_coefficient,
    )
    from ods_to_datalake_spark.streaming.ks_drift import read_gini

    batches = [BATCH0, BATCH1, BATCH2 + [(-5,)]]
    sink = value_counts_sink(str(tmp_path / "out"), F.col("v"))
    for i, rows in enumerate(batches):
        sink(_mk(spark, rows), i)
        (g,) = read_gini(spark, str(tmp_path / "out")).collect()
        (ref,) = gini_coefficient(
            _mk(spark, [r for b in batches[: i + 1] for r in b]),
            [],
            F.col("v"),
        ).collect()
        assert (g.n_rows, g.total_value, g.gini) == (
            ref.n_rows,
            ref.total_value,
            ref.gini,
        ), f"divergence after batch {i}"
