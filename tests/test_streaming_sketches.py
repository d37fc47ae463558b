"""Streaming sketch maintenance: the read-time fold over per-batch
sketch partitions must equal the single-shot batch sketch (the merge
property), and a crash-replayed batch must be a no-op (the overwrite
layout)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.sketch import (
    bloom_bits,
    hll_estimate,
    hll_registers,
)
from ods_to_datalake_spark.streaming.sketches import (
    compact_sketch_state,
    maintain_corpus_sketches,
    read_bloom_bits,
    read_vocab_estimate,
    sketch_sink,
)

SCHEMA = "doc_id long, source string, text string"

BATCH0 = [
    (1, "s1", "alpha beta gamma delta epsilon"),
    (2, "s1", "alpha zeta eta theta"),
    (3, "s2", "one two three four five"),
]
BATCH1 = [
    (4, "s1", "iota kappa lamda alpha"),
    (5, "s2", "six seven eight one two"),
    (6, "s2", None),  # NULL text: no tokens, hash of ''
]


def _full_corpus(spark):
    return spark.createDataFrame(BATCH0 + BATCH1, SCHEMA)


def _write_file_batches(spark, src_dir):
    os.makedirs(src_dir)
    for i, rows in enumerate([BATCH0, BATCH1]):
        f = os.path.join(src_dir, f"part-{i}.parquet")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))


def test_streamed_sketches_equal_batch_sketches(spark, tmp_path):
    """Two micro-batches → read-time fold ≡ one-shot sketch over the
    union, bit for bit (max/union merge property)."""
    src = str(tmp_path / "src")
    _write_file_batches(spark, src)
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src + "/*")
    )
    q = maintain_corpus_sketches(
        stream, state, str(tmp_path / "ckpt"), by=["source"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    corpus = _full_corpus(spark)
    toks = corpus.select(
        "source", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    direct_est = {
        (r.source, r.used_buckets, r.sum_term, r.hll_estimate_raw)
        for r in hll_estimate(
            hll_registers(toks, "token", by=["source"]), by=["source"]
        ).collect()
    }
    streamed_est = {
        (r.source, r.used_buckets, r.sum_term, r.hll_estimate_raw)
        for r in read_vocab_estimate(spark, state, by=["source"]).collect()
    }
    assert streamed_est == direct_est

    direct_bits = {
        r.bloom_bit
        for r in bloom_bits(
            corpus.select(
                F.md5(F.coalesce("text", F.lit(""))).alias("content_hash")
            ),
            "content_hash",
        ).collect()
    }
    streamed_bits = {
        r.bloom_bit for r in read_bloom_bits(spark, state).collect()
    }
    assert streamed_bits == direct_bits

    # compaction folds to one partition and preserves both folds
    compact_sketch_state(spark, state)
    assert {
        (r.source, r.used_buckets, r.sum_term, r.hll_estimate_raw)
        for r in read_vocab_estimate(spark, state, by=["source"]).collect()
    } == direct_est
    assert {
        r.bloom_bit for r in read_bloom_bits(spark, state).collect()
    } == direct_bits


def test_sketch_sink_replay_is_idempotent(spark, tmp_path):
    """The same batch_id redelivered (crash between the two writes)
    overwrites its own partitions; the read-time folds are unchanged."""
    state = str(tmp_path / "state")
    sink = sketch_sink(state, by=["source"])
    b0 = spark.createDataFrame(BATCH0, SCHEMA)
    sink(b0, 0)

    def snapshot():
        est = sorted(
            (r.source, r.used_buckets, r.sum_term)
            for r in read_vocab_estimate(
                spark, state, by=["source"]
            ).collect()
        )
        bits = sorted(
            r.bloom_bit for r in read_bloom_bits(spark, state).collect()
        )
        return est, bits

    first = snapshot()
    sink(b0, 0)  # crash-replay
    assert snapshot() == first
    # a genuinely new batch DOES grow the folds
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)
    est, bits = snapshot()
    assert est != first[0]
    assert set(bits) >= set(first[1])


def test_compaction_preserves_concurrent_and_later_batches(spark, tmp_path):
    """compact_sketch_state writes the compact partition BEFORE
    deleting the captured originals (crash windows leave duplicates,
    never losses — the fold is idempotent), re-compaction is a no-op,
    and a batch committed after compaction still grows the fold."""
    state = str(tmp_path / "state")
    sink = sketch_sink(state, by=["source"])
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)
    compact_sketch_state(spark, state)
    first = sorted(
        (r.source, r.used_buckets, r.sum_term)
        for r in read_vocab_estimate(spark, state, by=["source"]).collect()
    )
    compact_sketch_state(spark, state)  # re-compaction: idempotent
    assert sorted(
        (r.source, r.used_buckets, r.sum_term)
        for r in read_vocab_estimate(spark, state, by=["source"]).collect()
    ) == first
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)  # post-compaction batch
    grown = sorted(
        (r.source, r.used_buckets, r.sum_term)
        for r in read_vocab_estimate(spark, state, by=["source"]).collect()
    )
    assert grown != first
    # and equals the one-shot fold over everything
    corpus = _full_corpus(spark)
    toks = corpus.select(
        "source",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    direct = sorted(
        (r.source, r.used_buckets, r.sum_term)
        for r in hll_estimate(
            hll_registers(toks, "token", by=["source"]), by=["source"]
        ).collect()
    )
    assert grown == direct


def test_streamed_cms_equals_batch_cms(spark, tmp_path):
    """The summed count-min cells across batch partitions equal the
    one-shot grid over the union (+-merge property), before and after
    compaction."""
    from ods_to_datalake_spark.operators.sketch import cms_sketch
    from ods_to_datalake_spark.streaming.sketches import read_cms_sketch

    state = str(tmp_path / "state")
    sink = sketch_sink(state, by=["source"])
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)

    corpus = _full_corpus(spark)
    toks = corpus.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    direct = sorted(
        (r.cms_row, r.cms_bucket, r.cnt)
        for r in cms_sketch(toks, "token").collect()
    )

    def streamed():
        return sorted(
            (r.cms_row, r.cms_bucket, r.cnt)
            for r in read_cms_sketch(spark, state).collect()
        )

    assert streamed() == direct
    compact_sketch_state(spark, state)
    assert streamed() == direct


def test_cms_compaction_generations_and_crash_windows(spark, tmp_path):
    """compact_cms_state (VERDICT r6 item 3): the + -merged grid folds
    into transactional compact GENERATIONS — post-compaction the fold
    still equals the one-shot grid, a replayed already-folded batch id
    is excluded (never double-counted), a crashed staging dir is
    invisible and reclaimed, and a second compaction absorbs the first
    generation plus later batches."""
    import os

    from ods_to_datalake_spark.operators.sketch import cms_sketch
    from ods_to_datalake_spark.streaming.sketches import (
        CMS_SUBDIR,
        compact_cms_state,
        read_cms_sketch,
    )

    state = str(tmp_path / "state")
    base = os.path.join(state, CMS_SUBDIR)
    sink = sketch_sink(state, by=["source"])
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)

    def direct(rows):
        corpus = spark.createDataFrame(rows, SCHEMA)
        toks = corpus.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
                "token"
            )
        ).where(F.col("token") != "")
        return sorted(
            (r.cms_row, r.cms_bucket, r.cnt)
            for r in cms_sketch(toks, "token").collect()
        )

    def streamed():
        return sorted(
            (r.cms_row, r.cms_bucket, r.cnt)
            for r in read_cms_sketch(spark, state).collect()
        )

    compact_cms_state(spark, state)
    assert streamed() == direct(BATCH0)
    assert os.path.isdir(os.path.join(base, "ingest_batch=compact-1"))
    assert not os.path.isdir(os.path.join(base, "ingest_batch=0"))

    # crash window: checkpoint REPLAY of the folded batch id 0 recreates
    # its partition — the generation manifest excludes it from the fold
    sink(spark.createDataFrame(BATCH0, SCHEMA), 0)
    assert os.path.isdir(os.path.join(base, "ingest_batch=0"))
    assert streamed() == direct(BATCH0)

    # crash window: a staged-but-unrenamed generation is invisible
    staged = os.path.join(base, "_compact-staging-2")
    os.makedirs(staged)
    open(os.path.join(staged, "garbage"), "w").write("x")
    assert streamed() == direct(BATCH0)

    # second compaction: absorbs gen 1 + the stale duplicate + batch 1,
    # reclaims the crashed staging dir and the old generation
    sink(spark.createDataFrame(BATCH1, SCHEMA), 1)
    compact_cms_state(spark, state)
    assert streamed() == direct(BATCH0 + BATCH1)
    assert os.path.isdir(os.path.join(base, "ingest_batch=compact-2"))
    assert not os.path.isdir(os.path.join(base, "ingest_batch=compact-1"))
    assert not os.path.isdir(os.path.join(base, "ingest_batch=0"))
    assert not os.path.isdir(os.path.join(base, "ingest_batch=1"))
    assert not os.path.isdir(staged)

    # idempotent when there is nothing to fold
    compact_cms_state(spark, state)
    assert streamed() == direct(BATCH0 + BATCH1)
