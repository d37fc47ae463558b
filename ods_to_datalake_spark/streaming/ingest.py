"""Streaming face of incremental ingestion (charter LLM-pipeline
extension; batch face: operators/dedup.incremental_dedup).

A continuously-collected corpus arrives as a document stream; admission
against the already-ingested corpus must happen before anything lands
in the lake. Tier 1 (exact content) maps cleanly onto Structured
Streaming: an in-stream duplicate drop plus a stream-static anti-join
against the seen corpus's distinct hash set. The LSH near-dup tier
needs a multi-stage aggregation Structured Streaming can't express in
append mode — run it per micro-batch via ``foreachBatch`` with the
batch operator on the admitted rows.

Scale: the seen-hash side is a static (or periodically refreshed)
broadcast-or-shuffle join input; in-stream dedup state is bounded by
the watermark horizon when an event-time column is provided, exactly
like streaming/events.dedup_events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_HASH_COL = "__content_hash"

# partition column carrying write provenance in every ingest-managed
# directory (state, out, reject): `ingest_batch=seed` for the seeded
# state, `ingest_batch=<micro-batch id>` for each foreachBatch commit.
# Batch subdirectories are OVERWRITTEN, never appended — a micro-batch
# replayed after a crash rewrites exactly its own partition, so replay
# is idempotent without any ledger (see `_batch_overwrite`).
BATCH_COL = "ingest_batch"


def _seed_state_if_absent(seed_df: DataFrame, state_dir: str) -> None:
    """Write the admission state seed unless a COMMITTED one exists.

    The seed lands in ``<state_dir>/ingest_batch=seed`` (the same
    per-writer partition layout the micro-batch commits use).
    "Committed" = the ``_SUCCESS`` marker is present in that partition
    (a crashed or partial seed write leaves files but no marker —
    reseeding with overwrite self-heals it; a bare driver-side
    exists() check would permanently disable seeding after such a
    crash and then fail or silently under-reject). Checked through the
    Hadoop FileSystem API, so HDFS/S3 state dirs work the same as
    local paths. After the first commit the state belongs to the
    stream (batch partitions grow it); a restart resumes it instead of
    wiping it back to the seed. The state dir is bound to ONE seed
    corpus — if the seen snapshot changes, point the job at a fresh
    state dir so tier-1 hashes and tier-2 state can't desynchronize.
    """
    spark = seed_df.sparkSession
    jvm = spark._jvm
    seed_path = f"{state_dir}/{BATCH_COL}=seed"
    jpath = jvm.org.apache.hadoop.fs.Path(seed_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jvm.org.apache.hadoop.fs.Path(jpath, "_SUCCESS")):
        return
    seed_df.write.mode("overwrite").parquet(seed_path)


def _batch_overwrite(df: DataFrame, base_dir: str, batch_id: int) -> None:
    """Commit a micro-batch's rows idempotently:
    ``<base_dir>/ingest_batch=<batch_id>`` is OVERWRITTEN, so a batch
    replayed after a crash (foreachBatch redelivers the same batch_id)
    rewrites its own partition instead of re-appending duplicate rows
    — the transactionality parquet append lacks, recovered from the
    directory layout alone (VERDICT r5 item 3)."""
    df.write.mode("overwrite").parquet(f"{base_dir}/{BATCH_COL}={batch_id}")


def _state_excluding_batch(spark, state_dir: str, batch_id: int) -> DataFrame:
    """Read the admission state as it stood BEFORE ``batch_id``: the
    current batch's own partition is excluded (partition-pruned, its
    files are never opened), so a replay whose previous attempt
    partially or fully committed state recomputes the SAME admission
    decision it made the first time — against the pre-crash state."""
    return (
        spark.read.parquet(state_dir)
        .filter(F.col(BATCH_COL).cast("string") != str(batch_id))
        .drop(BATCH_COL)
    )


def seen_content_hashes(
    seen_df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distinct content-hash set of the ingested corpus — the side
    artifact a production pipeline materializes and appends to after
    each admitted batch."""
    return seen_df.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(
            CONTENT_HASH_COL
        )
    ).distinct()


def admit_new_stream(
    new_stream: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Admit stream rows whose content duplicates neither the seen
    corpus nor an earlier row of the stream itself.

    ``seen_hashes`` is the static frame from `seen_content_hashes`.
    With ``ts_col`` the in-stream dedup state is bounded by the
    watermark horizon (dropDuplicatesWithinWatermark); without it the
    state holds one hash per distinct content ever seen — fine for
    backfills, unbounded for true 24/7 streams. Works identically on a
    batch frame (the lambda-architecture symmetry every operator in
    streaming/ keeps).
    """
    hashed = new_stream.withColumn(
        CONTENT_HASH_COL,
        F.md5(F.coalesce(F.col(text_col), F.lit(""))),
    )
    if new_stream.isStreaming and ts_col is not None:
        deduped = hashed.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark([CONTENT_HASH_COL])
    else:
        deduped = hashed.dropDuplicates([CONTENT_HASH_COL])
    return deduped.join(
        seen_hashes, CONTENT_HASH_COL, "left_anti"
    ).drop(CONTENT_HASH_COL)


def ingest_with_near_dup_tier(
    new_stream: DataFrame,
    seen_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "2 hours",
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
) -> "StreamingQuery":
    """Both admission tiers end-to-end: tier 1 (exact content) runs
    in-stream via `admit_new_stream`; tier 2 (LSH near-dup) runs per
    micro-batch via ``foreachBatch`` — the multi-stage band aggregation
    Structured Streaming can't express in append mode, exactly as the
    module docstring prescribes.

    State is the seen corpus's band table, seeded into ``state_dir``
    only when no COMMITTED table exists there (``_seed_state_if_absent``
    — a crashed partial seed self-heals, a finished one is never
    overwritten) and APPENDED with each admitted batch's bands — so a
    near-dup of a document admitted three batches ago is rejected too
    (incremental across the stream, not just against the initial
    corpus), and a RESTART from the checkpoint resumes with the grown
    state instead of wiping it back to the seed (the checkpoint skips
    replaying the batches that grew it). Admitted
    rows append to ``out_dir``. Within one batch the semantics match
    `dedup.incremental_dedup`: rejection is against the seen side only;
    intra-batch near-dup pairs are the batch dedup suite's job on the
    admitted set.

    Scale: both per-batch joins shuffle on the band key only; the state
    table grows by one (id, band_idx, band_key) partition per batch —
    the same artifact the batch face materializes incrementally.
    Replay-safe: each batch commits into its own ``ingest_batch=<id>``
    partition with overwrite, and the admission read excludes the
    current batch's partition — a batch replayed after a crash between
    the two writes recomputes the identical decision and rewrites its
    own partitions, never duplicating state or output rows
    (`_batch_overwrite` / `_state_excluding_batch`).
    """
    from ods_to_datalake_spark.operators.dedup import lsh_banded

    def banded(df: DataFrame) -> DataFrame:
        return lsh_banded(df, id_col, text_col, shingle_n, k, bands, rows)

    _seed_state_if_absent(banded(seen_df), state_dir)
    tier1 = admit_new_stream(
        new_stream,
        seen_content_hashes(seen_df, text_col),
        text_col,
        ts_col,
        watermark,
    )
    sink = _near_dup_sink(banded, out_dir, state_dir, id_col)
    return (
        tier1.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def _near_dup_sink(banded, out_dir: str, state_dir: str, id_col: str):
    """foreachBatch body of `ingest_with_near_dup_tier`, module-level
    so the replay-idempotence test can redeliver a batch_id directly."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        near_ids = (
            banded(batch_df)
            .join(
                _state_excluding_batch(spark, state_dir, batch_id),
                ["band_idx", "band_key"],
                "left_semi",
            )
            .select(id_col)
            .distinct()
        )
        # EAGER barrier (localCheckpoint, not lazy persist): `admitted`
        # feeds two writes, and its plan READS the state table this
        # sink WRITES to — a lazily-cached partition that misses cache
        # during the second write would recompute against the state as
        # it exists mid-commit (see ingest_with_quality_gate, where the
        # third write made this fire). Materialize the admission
        # decision once, against the pre-batch state.
        admitted = batch_df.join(near_ids, id_col, "left_anti").localCheckpoint()
        _batch_overwrite(admitted, out_dir, batch_id)
        _batch_overwrite(banded(admitted), state_dir, batch_id)

    return sink


def ingest_embeddings_stream(
    new_stream: DataFrame,
    seen_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    threshold: float = 0.35,
) -> "StreamingQuery":
    """Embedding face of streaming admission — the stream counterpart
    of `similarity.incremental_embedding_dedup`, completing the
    text/embedding × batch/stream matrix.

    Per micro-batch (foreachBatch — bucket + verify is a multi-stage
    join Structured Streaming can't express in append mode): new
    vectors hyperplane-bucket map-side, candidates form only against
    seen vectors sharing a bucket, the exact rounded cosine verifies,
    and admitted vectors append BOTH to ``out_dir`` and to the
    ``state_dir`` (id, bucket, vector) table — so a vector semantically
    duplicating one admitted two batches ago is rejected too, and the
    state table is seeded only when no committed one exists (a
    checkpoint restart resumes with the grown state, it does not wipe
    it — see `_seed_state_if_absent`). Exact
    duplicates project to the same bucket at cosine 1.0, so no separate
    hash tier is needed (same argument as the batch face). Joins
    shuffle on the bucket key only — the stream is never cross-joined
    against the corpus. Replay-safe via the same per-batch
    ``ingest_batch=<id>`` overwrite layout as
    `ingest_with_near_dup_tier`.
    """
    from ods_to_datalake_spark.functions import vectors as V
    from ods_to_datalake_spark.operators.similarity import (
        _tag_hyperplane_buckets,
    )

    def tagged(df: DataFrame) -> DataFrame:
        return _tag_hyperplane_buckets(df, id_col, vec_col, dim, n_planes)

    # The state dir persists (id, __v, __bucket) ONLY — never the
    # derived __vn norm column. A pre-r12 state dir lacks __vn, and a
    # mixed-schema read would surface it as NULL (silently admitting
    # near-dups of old state); deriving it at state-read time is a
    # cheap per-row map and keeps every state-dir vintage readable.
    _seed_state_if_absent(tagged(seen_df).drop("__vn"), state_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        seen_t = (
            _state_excluding_batch(spark, state_dir, batch_id)
            .drop("__vn")  # tolerate r12-vintage dirs that stored it
            .withColumn("__vn", V.norm(F.col("__v")))
        )
        new_t = tagged(batch_df)
        near_ids = (
            new_t.alias("n")
            .join(
                seen_t.alias("s"),
                F.col("n.__bucket") == F.col("s.__bucket"),
            )
            .filter(
                V.cosine_rounded_prenorm(
                    F.col("n.__v"),
                    F.col("s.__v"),
                    F.col("n.__vn"),
                    F.col("s.__vn"),
                )
                >= threshold
            )
            .select(F.col(f"n.{id_col}").alias(id_col))
            .distinct()
        )
        # eager barrier — same rationale as the text face: the plan
        # reads the state table the second write commits to
        admitted = batch_df.join(near_ids, id_col, "left_anti").localCheckpoint()
        _batch_overwrite(admitted, out_dir, batch_id)
        _batch_overwrite(tagged(admitted).drop("__vn"), state_dir, batch_id)

    return (
        new_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def ingest_with_quality_gate(
    new_stream: DataFrame,
    seen_df: DataFrame,
    lm_path: str,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "2 hours",
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
    min_tokens: int = 0,
    xent_band: tuple[float, float] | None = None,
    dsir_path: str | None = None,
    dsir_min: float = 0.0,
    c4_rules: bool = False,
    gopher_rules: bool = False,
    reject_dir: str | None = None,
    report_dir: str | None = None,
) -> "StreamingQuery":
    """The full streaming curation face: `ingest_with_near_dup_tier`'s
    two dedup tiers PLUS the quality gates of `curate.curate_corpus`,
    applied per micro-batch against FROZEN lake artifacts — the
    quality bar must not drift with each batch, so models are read,
    never retrained in-stream (refreshing one is an offline rebuild +
    new path, like IVF centroids).

    Per batch: LSH near-dup rejection against the growing band state →
    token-count gate → LM cross-entropy band via `score_with_lm`
    (stream-side bigrams join the static model tables — shuffles on
    n-gram keys only) → optional DSIR target-likeness gate via
    `score_with_dsir` against a `build_dsir` artifact (``dsir_path``;
    the n_buckets-row Δ-log-weight table broadcasts, so this gate
    costs the batch one map-side join; docs scoring below ``dsir_min``
    — or unscorable, < 2 tokens — are rejected). Admitted rows append
    to ``out_dir`` and grow the band state; when ``reject_dir`` is
    given, rejected rows land there with a ``reject_reason`` column
    (c4 / gopher / near_dup / min_tokens / lm_xent / dsir) — curation
    at scale must account for what it removed, not silently shrink
    the corpus.

    ``c4_rules`` / ``gopher_rules`` mirror `curate_corpus` tier 0:
    per-row codegen gates evaluated FIRST (cheapest, and attributed
    before dedup in the reject reasons). C4 REWRITES surviving docs to
    their kept lines before banding, so the near-dup state is built on
    cleaned text — same composition as the batch pipeline; rejected
    rows keep their original text for auditability. Exact-hash
    admission (tier 1) still sees raw text: the stream-side state join
    can't run a per-batch rewrite, and a raw-exact duplicate is a
    cleaned-exact duplicate anyway (the rewrite is deterministic).

    ``report_dir`` appends one summary row per (batch, outcome) —
    ``(ingest_batch, outcome, n)`` with outcome 'admitted' or the
    reject reason — the per-batch admission funnel an operator
    watches instead of re-scanning out/reject dirs; written with the
    same batch-partition overwrite as every other sink, so replays
    rewrite their own report rows.
    """
    from ods_to_datalake_spark.operators.dedup import lsh_banded
    from ods_to_datalake_spark.operators.lm import (
        score_with_dsir,
        score_with_lm,
    )

    def banded(df: DataFrame) -> DataFrame:
        return lsh_banded(df, id_col, text_col, shingle_n, k, bands, rows)

    _seed_state_if_absent(banded(seen_df), state_dir)
    tier1 = admit_new_stream(
        new_stream,
        seen_content_hashes(seen_df, text_col),
        text_col,
        ts_col,
        watermark,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ods_to_datalake_spark.functions import text as X

        spark = batch_df.sparkSession
        data_cols = batch_df.columns
        if c4_rules:
            s = X.c4_stats(text_col)
            batch_df = batch_df.withColumn(
                "__c4_keep", s["keep"]
            ).withColumn(
                text_col,
                F.when(
                    s["keep"] == F.lit(1), s["cleaned_text"]
                ).otherwise(F.col(text_col)),
            )
            c4_ok = F.col("__c4_keep") == 1
        else:
            c4_ok = F.lit(True)
        if gopher_rules:
            batch_df = batch_df.withColumn(
                "__gopher_ok",
                X.gopher_passes(X.gopher_stats(text_col)),
            )
            gopher_ok = F.col("__gopher_ok") == 1
        else:
            gopher_ok = F.lit(True)
        near_ids = (
            banded(batch_df)
            .join(
                _state_excluding_batch(spark, state_dir, batch_id),
                ["band_idx", "band_key"],
                "left_semi",
            )
            .select(id_col)
            .distinct()
        )
        staged = batch_df.join(
            near_ids.withColumn("__near", F.lit(True)), id_col, "left"
        ).withColumn(
            "__n_tokens", F.size(X.tokens(text_col))
        )
        if xent_band is not None:
            scores = score_with_lm(
                spark, lm_path, batch_df, id_col, text_col
            ).select(id_col, "xent")
            staged = staged.join(scores, id_col, "left")
            lo, hi = xent_band
            xent_ok = (
                F.col("xent").isNotNull()
                & (F.col("xent") >= lo)
                & (F.col("xent") <= hi)
            )
        else:
            xent_ok = F.lit(True)
        if dsir_path is not None:
            feats = spark.read.parquet(dsir_path)
            dsir = score_with_dsir(
                feats, batch_df, id_col, text_col
            ).select(id_col, "dsir_logratio")
            staged = staged.join(dsir, id_col, "left")
            dsir_ok = F.col("dsir_logratio").isNotNull() & (
                F.col("dsir_logratio") >= dsir_min
            )
        else:
            dsir_ok = F.lit(True)
        reason = (
            F.when(~c4_ok, F.lit("c4"))
            .when(~gopher_ok, F.lit("gopher"))
            .when(F.col("__near"), F.lit("near_dup"))
            .when(
                F.col("__n_tokens") < min_tokens, F.lit("min_tokens")
            )
            .when(~xent_ok, F.lit("lm_xent"))
            .when(~dsir_ok, F.lit("dsir"))
        )
        # EAGER materialization barrier, not a lazy persist: the staged
        # plan reads the state table, and the state commit below would
        # poison any later recomputation (a lazily-persisted partition
        # that misses cache re-reads the grown state and re-flags the
        # batch's own admitted docs as near-dups — observed: a doc
        # admitted AND quarantined in the same batch). localCheckpoint
        # computes the decisions against the pre-batch state once,
        # before any write.
        staged = staged.withColumn("reject_reason", reason).localCheckpoint()
        admitted = staged.filter(
            F.col("reject_reason").isNull()
        ).select(*data_cols)
        _batch_overwrite(admitted, out_dir, batch_id)
        _batch_overwrite(banded(admitted), state_dir, batch_id)
        if reject_dir is not None:
            _batch_overwrite(
                staged.filter(F.col("reject_reason").isNotNull()).select(
                    *data_cols, "reject_reason"
                ),
                reject_dir,
                batch_id,
            )
        if report_dir is not None:
            _batch_overwrite(
                staged.groupBy(
                    F.coalesce(
                        F.col("reject_reason"), F.lit("admitted")
                    ).alias("outcome")
                ).agg(F.count(F.lit(1)).alias("n")),
                report_dir,
                batch_id,
            )

    return (
        tier1.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
