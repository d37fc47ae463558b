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


_CMS_COMPACT_PREFIX = "compact-"
_CMS_FOLDED_FILE = "_folded.json"


def _cms_generations(spark, base: str) -> list[int]:
    """Committed compact generation numbers under ``base``, ascending
    (a staged-but-unrenamed generation is invisible: it still lives in
    an underscore-prefixed temp dir)."""
    import re

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(jpath):
        m = re.fullmatch(
            rf"{BATCH_COL}={_CMS_COMPACT_PREFIX}(\d+)",
            st.getPath().getName(),
        )
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _cms_folded_ids(spark, base: str, gen: int) -> set[str]:
    """Batch ids absorbed into compact generation ``gen`` (its
    transaction manifest)."""
    import json

    from ods_to_datalake_spark.sources.manifest import _read_file

    path = (
        f"{base}/{BATCH_COL}={_CMS_COMPACT_PREFIX}{gen}/{_CMS_FOLDED_FILE}"
    )
    return set(json.loads(_read_file(spark, path))["folded"])


def read_cms_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Corpus-level count-min grid from the maintained state (merge =
    summing cell counts across batch partitions); feed to
    `operators.sketch.cms_estimate` for frequency upper bounds.

    Compaction-aware: if compact generations exist, only the NEWEST one
    counts, and the batch ids its ``_folded.json`` manifest lists are
    excluded even if their partitions still exist — a crash (or a
    checkpoint replay of a folded batch id) between the compact publish
    and the cleanup leaves duplicate partitions on disk, but never a
    double count in the fold."""
    base = f"{state_dir}/{CMS_SUBDIR}"
    cells = spark.read.parquet(base).withColumn(
        BATCH_COL, F.col(BATCH_COL).cast("string")
    )
    gens = _cms_generations(spark, base)
    if gens:
        newest = gens[-1]
        excluded = _cms_folded_ids(spark, base, newest) | {
            f"{_CMS_COMPACT_PREFIX}{g}" for g in gens[:-1]
        }
        cells = cells.where(~F.col(BATCH_COL).isin(sorted(excluded)))
    return (
        cells.drop(BATCH_COL)
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_cms_state(spark: SparkSession, state_dir: str) -> None:
    """Fold committed count-min batch partitions into the next compact
    GENERATION — the transactional commit the ``+`` (non-idempotent)
    merge needs, built from the same primitives as
    `sources.manifest` (VERDICT r6 item 3):

    1. capture the committed (``_SUCCESS``-marked) batch partitions and
       the current newest generation's manifest;
    2. sum those cells plus the current generation's into a staged
       underscore-prefixed temp dir, alongside a ``_folded.json``
       manifest naming every batch id ever absorbed;
    3. publish with ONE rename to ``ingest_batch=compact-<n+1>``;
    4. clean up: delete absorbed batch partitions and older
       generations.

    Every crash window reads correctly: before the rename the staged
    dir is invisible; after it, `read_cms_sketch` uses only the newest
    generation and skips manifest-listed batch ids, so leftover
    originals (or a checkpoint REPLAY of a folded batch id) are
    excluded rather than double-counted. Step 4 is pure cleanup and
    re-runs on the next compaction. Safe against a live sink: a batch
    mid-write has no ``_SUCCESS`` and is neither folded nor deleted."""
    import json

    from ods_to_datalake_spark.sources.manifest import _write_file_atomic

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    base = f"{state_dir}/{CMS_SUBDIR}"
    jbase = jvm.org.apache.hadoop.fs.Path(base)
    fs = jbase.getFileSystem(conf)
    if not fs.exists(jbase):  # pre-upgrade state dir: nothing here
        return
    gens = _cms_generations(spark, base)
    prev_folded = _cms_folded_ids(spark, base, gens[-1]) if gens else set()
    committed = _committed_batch_partitions(spark, base)
    originals = [
        p for p in committed if p.rsplit("=", 1)[1] not in prev_folded
    ]
    stale_dups = [  # replayed-after-fold partitions: cleanup only
        p for p in committed if p.rsplit("=", 1)[1] in prev_folded
    ]
    if not originals and not stale_dups and len(gens) <= 1:
        return
    next_gen = (gens[-1] + 1) if gens else 1
    sources = list(originals)
    if gens:
        sources.append(f"{base}/{BATCH_COL}={_CMS_COMPACT_PREFIX}{gens[-1]}")
    folded = sorted(
        prev_folded | {p.rsplit("=", 1)[1] for p in originals}
    )
    tmp = f"{base}/_{_CMS_COMPACT_PREFIX}staging-{next_gen}"
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)  # crashed rerun
    (
        spark.read.parquet(*sources)
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _write_file_atomic(
        spark, tmp, _CMS_FOLDED_FILE, json.dumps({"folded": folded})
    )
    dst = f"{base}/{BATCH_COL}={_CMS_COMPACT_PREFIX}{next_gen}"
    if not fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp), jvm.org.apache.hadoop.fs.Path(dst)
    ):
        raise OSError(f"cms compact commit rename failed: {tmp} -> {dst}")
    for p in originals + stale_dups:
        fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
    for g in gens:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                f"{base}/{BATCH_COL}={_CMS_COMPACT_PREFIX}{g}"
            ),
            True,
        )


def _committed_batch_partitions(spark, base: str) -> list[str]:
    """Batch partition paths under ``base`` carrying a ``_SUCCESS``
    marker (a partition the sink is writing RIGHT NOW has none yet),
    excluding compact partitions (both the idempotent-merge
    ``=compact`` and the CMS ``=compact-<n>`` generations)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith(f"{BATCH_COL}=")
            and not name.startswith(f"{BATCH_COL}=compact")
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

    The count-min grid cannot use this overwrite-in-place scheme (its
    merge is ``+``, not idempotent — a leftover duplicate WOULD double
    count); it gets the transactional generation commit of
    `compact_cms_state` instead, invoked here so one maintenance call
    compacts all three artifacts.
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
    compact_cms_state(spark, state_dir)
