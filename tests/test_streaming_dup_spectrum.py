"""Streaming dup-multiplicity spectrum (x84's streaming face): the
read-time histogram must equal batch `dup_multiplicity_histogram` over
the delivered history after EVERY batch with NO ordering contract —
per-hash counts are additive, and the spectrum is derived at read time
(per-batch histograms can NOT be merged: one copy in each of two
batches is multiplicity 2, not two multiplicity-1 rows — the case the
cross-batch fixture pins). Replays must be no-ops, and the end-to-end
file stream must match the batch operator bit-for-bit including the
doc_share divisions."""

from __future__ import annotations

import os
import time

from ods_to_datalake_spark.operators.dedup import (
    dup_multiplicity_histogram,
)
from ods_to_datalake_spark.streaming.cdc_ingest import (
    list_cdc_snapshots,
)
from ods_to_datalake_spark.streaming.dup_spectrum import (
    content_hash_counts_sink,
    maintain_dup_spectrum,
    read_dup_spectrum,
)

SCHEMA = "doc_id long, text string"

# Contract-free on purpose: "dup a" appears in batches 0 AND 1 (the
# copies must FOLD into one multiplicity-3 group — the merge per-batch
# histograms would get wrong), batch 1 duplicates within itself,
# batch 2 brings NULL text twice (one NULL-hash group of 2) and a
# fresh unique doc.
BATCH0 = [(1, "dup a"), (2, "unique one"), (3, "dup a")]
BATCH1 = [(4, "dup a"), (5, "pair"), (6, "pair")]
BATCH2 = [(7, None), (8, None), (9, "unique two")]
ALL = [BATCH0, BATCH1, BATCH2]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _spec(df):
    if df is None:
        return []
    return sorted(
        (r.multiplicity, r.n_groups, r.n_docs, r.doc_share)
        for r in df.collect()
    )


def _batch_reference(spark, batches):
    return dup_multiplicity_histogram(
        _mk(spark, [r for b in batches for r in b]), "doc_id", "text"
    )


def test_streamed_spectrum_equals_batch_after_every_batch(
    spark, tmp_path
):
    sink = content_hash_counts_sink(str(tmp_path / "out"), "text")
    for i, rows in enumerate(ALL):
        sink(_mk(spark, rows), i)
        got = _spec(read_dup_spectrum(spark, str(tmp_path / "out")))
        assert got == _spec(
            _batch_reference(spark, ALL[: i + 1])
        ), f"divergence after batch {i}"


def test_cross_batch_copies_fold_into_one_group(spark, tmp_path):
    """The reason the artifact is hash counts, not histograms: 'dup a'
    arrives twice in batch 0 and once in batch 1 — the folded spectrum
    must read ONE multiplicity-3 group."""
    sink = content_hash_counts_sink(str(tmp_path / "out"), "text")
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    rows = {
        r.multiplicity: r
        for r in read_dup_spectrum(
            spark, str(tmp_path / "out")
        ).collect()
    }
    assert rows[3].n_groups == 1 and rows[3].n_docs == 3
    assert rows[2].n_groups == 1  # the within-batch 'pair'
    assert rows[1].n_groups == 1  # 'unique one'
    assert rows[3].doc_share == 3.0 / 6.0


def test_delivery_order_is_irrelevant(spark, tmp_path):
    sink = content_hash_counts_sink(str(tmp_path / "out"), "text")
    for i, rows in zip((0, 1, 2), (BATCH2, BATCH0, BATCH1)):
        sink(_mk(spark, rows), i)
    got = _spec(read_dup_spectrum(spark, str(tmp_path / "out")))
    assert got == _spec(_batch_reference(spark, ALL))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = content_hash_counts_sink(str(tmp_path / "out"), "text")
    sink(_mk(spark, BATCH0), 0)
    sink(_mk(spark, BATCH1), 1)
    before = _spec(read_dup_spectrum(spark, str(tmp_path / "out")))
    sink(_mk(spark, BATCH1), 1)  # foreachBatch redelivery
    assert (
        _spec(read_dup_spectrum(spark, str(tmp_path / "out")))
        == before
    )
    assert list_cdc_snapshots(spark, str(tmp_path / "out")) == [0, 1]


def test_real_stream_matches_batch_spectrum(spark, tmp_path):
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
    q = maintain_dup_spectrum(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"), "text"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _spec(read_dup_spectrum(spark, str(tmp_path / "out")))
    assert got == _spec(_batch_reference(spark, ALL))
