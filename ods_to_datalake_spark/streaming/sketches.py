"""Streaming maintenance of mergeable corpus sketches (HLL + Bloom +
count-min).

Batch faces: `operators/sketch.py` (x52/x54). The register/bit tables
merge by max/union, which makes streaming maintenance trivially
incremental — each micro-batch writes its OWN sketch partition under
the replay-idempotent ``ingest_batch=<id>`` overwrite layout
(`streaming/ingest._batch_overwrite`, VERDICT r5 item 3), and readers
fold partitions at read time:

- no read-modify-write: the sink never reads the state it appends to,
  so the eager-checkpoint hazard of the admission sinks (CLAUDE.md)
  cannot arise here by construction;
- no compaction service: a day of 5-minute batches is 288 partitions
  of ≤ 2^p rows each — the read-side merge is one groupBy-max over
  ~73k rows at p=8; when that ever matters, `compact_sketch_state`
  folds history into one partition with the same merge;
- crash/replay safe: foreachBatch redelivers the same batch_id, the
  partition is overwritten, the fold is idempotent (max/union are).

Upgrade note: a state dir created before an artifact family existed
accumulates that family only from the upgrade point (checkpointed
streams never replay old batch ids) — rebuild the missing history
offline from the corpus if it matters; `compact_sketch_state` skips
absent subdirs rather than failing.

Why maintain sketches on the stream at all: the ingest observability
queries (per-source vocabulary growth, "have we seen this content
before" prefilters) must not re-scan the grown corpus on every ask —
the sketch state dir answers them from O(2^p + m) rows per batch no
matter how many TB the batches carried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions.text import tokens
from ods_to_datalake_spark.operators.sketch import (
    BLOOM_K,
    BLOOM_M,
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_P,
    bloom_bits,
    cms_sketch,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from ods_to_datalake_spark.streaming.ingest import (
    BATCH_COL,
    _batch_overwrite,
)

HLL_SUBDIR = "hll_registers"
BLOOM_SUBDIR = "bloom_bits"
CMS_SUBDIR = "cms_cells"


def sketch_sink(
    state_dir: str,
    text_col: str = "text",
    by: list[str] | None = None,
    p: int = HLL_P,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
):
    """foreachBatch sink maintaining three sketch artifacts under
    ``state_dir``: per-group HLL token registers
    (``hll_registers/ingest_batch=<id>``), the Bloom bit set of
    content hashes (``bloom_bits/ingest_batch=<id>``), and the
    count-min token-frequency grid (``cms_cells/ingest_batch=<id>``,
    merged at read time by summing cell counts).

    Each partition holds only the BATCH's sketch — the corpus-level
    sketch is the read-time fold (`read_vocab_estimate`,
    `read_bloom_bits`, `read_cms_sketch`), so a replayed batch_id
    overwrites exactly its own contribution and the fold is unchanged.
    Both the batch frame AND the tokenized stream are persisted across
    the three writes (three actions over one micro-batch plan, same
    rule as the admission sinks — without the token persist the
    explode ran once for the registers and again for the grid).
    """
    keys = list(by or [])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        toks = batch_df.select(
            *keys, F.explode(tokens(text_col)).alias("token")
        ).where(F.col("token") != "")
        toks.persist()
        try:
            _batch_overwrite(
                hll_registers(toks, "token", p=p, by=keys),
                f"{state_dir}/{HLL_SUBDIR}",
                batch_id,
            )
            hashes = batch_df.select(
                F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(
                    "content_hash"
                )
            )
            _batch_overwrite(
                bloom_bits(hashes, "content_hash", k=k, m=m),
                f"{state_dir}/{BLOOM_SUBDIR}",
                batch_id,
            )
            _batch_overwrite(
                cms_sketch(
                    toks.select("token"),
                    "token",
                    depth=CMS_DEPTH,
                    width=CMS_WIDTH,
                ),
                f"{state_dir}/{CMS_SUBDIR}",
                batch_id,
            )
        finally:
            toks.unpersist()
            batch_df.unpersist()

    return sink


def maintain_corpus_sketches(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    by: list[str] | None = None,
    p: int = HLL_P,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
):
    """Attach the sketch sink to a document stream and start it."""
    return (
        stream.writeStream.foreachBatch(
            sketch_sink(state_dir, text_col, by, p=p, k=k, m=m)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_vocab_estimate(
    spark: SparkSession,
    state_dir: str,
    by: list[str] | None = None,
    p: int = HLL_P,
) -> DataFrame:
    """Corpus-level HLL estimate from the maintained state: fold every
    batch partition by per-bucket max, then estimate — identical (bit
    for bit) to a single-shot `hll_registers` over the full corpus, by
    the merge property `test_hll_merge_equals_union` pins."""
    regs = spark.read.parquet(f"{state_dir}/{HLL_SUBDIR}").drop(BATCH_COL)
    return hll_estimate(hll_merge([regs], by=by), p=p, by=by)


def read_bloom_bits(spark: SparkSession, state_dir: str) -> DataFrame:
    """Corpus-level Bloom bit set from the maintained state (union =
    distinct over batch partitions); feed to
    `operators.sketch.bloom_maybe_contains` as a membership
    prefilter."""
    return (
        spark.read.parquet(f"{state_dir}/{BLOOM_SUBDIR}")
        .drop(BATCH_COL)
        .distinct()
    )


def read_cms_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Corpus-level count-min grid from the maintained state (merge =
    summing cell counts across batch partitions); feed to
    `operators.sketch.cms_estimate` for frequency upper bounds."""
    return (
        spark.read.parquet(f"{state_dir}/{CMS_SUBDIR}")
        .drop(BATCH_COL)
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _committed_batch_partitions(spark, base: str) -> list[str]:
    """Batch partition paths under ``base`` carrying a ``_SUCCESS``
    marker (a partition the sink is writing RIGHT NOW has none yet),
    excluding the compact partition."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith(f"{BATCH_COL}=")
            and name != f"{BATCH_COL}=compact"
            and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            )
        ):
            out.append(str(st.getPath()))
    return out


def compact_sketch_state(spark: SparkSession, state_dir: str) -> None:
    """Fold the committed batch partitions of the IDEMPOTENT-merge
    artifacts (HLL max, Bloom union) into a single
    ``ingest_batch=compact`` partition, then drop exactly those
    originals — an optional maintenance job for long-lived streams;
    the read-side fold is already correct without it.

    Crash-safe ordering: the committed-partition list is captured
    FIRST (only ``_SUCCESS``-marked partitions — one mid-write by the
    live sink is skipped), the fold reads EXACTLY those paths plus any
    existing compact partition and is eagerly materialized
    (localCheckpoint), the compact partition is written, and only the
    captured originals are deleted LAST. Every crash window leaves a
    correct read: originals intact before the write completes,
    duplicates-plus-compact after it — and a leftover duplicate never
    changes a max/union fold. A micro-batch committed concurrently is
    not in the captured list, is not folded, and is not deleted.

    The count-min grid is deliberately NOT live-compacted: its merge
    is ``+``, which is not idempotent — a crash between the compact
    write and the deletes would double-count every folded batch, and
    no directory layout fixes that without a transactional commit.
    Its state grows a bounded depth·width rows per batch; rebuild it
    offline (stream stopped: read, sum, rewrite) if the partition
    count ever matters.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for sub in (HLL_SUBDIR, BLOOM_SUBDIR):
        base = f"{state_dir}/{sub}"
        jpath = jvm.org.apache.hadoop.fs.Path(base)
        fs = jpath.getFileSystem(conf)
        if not fs.exists(jpath):  # pre-upgrade state dir: nothing here
            continue
        originals = _committed_batch_partitions(spark, base)
        if not originals:
            continue
        compact_path = f"{base}/{BATCH_COL}=compact"
        sources = list(originals)
        if fs.exists(jvm.org.apache.hadoop.fs.Path(compact_path)):
            sources.append(compact_path)
        folded = spark.read.parquet(*sources)
        if sub == HLL_SUBDIR:
            keys = [
                c
                for c in folded.columns
                if c not in ("hll_bucket", "register")
            ]
            folded = hll_merge([folded], by=keys)
        else:
            folded = folded.distinct()
        folded = folded.localCheckpoint()
        folded.write.mode("overwrite").parquet(compact_path)
        for p in originals:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
