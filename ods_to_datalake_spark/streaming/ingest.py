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
