"""End-to-end corpus curation pipeline — the composition a user of the
training-data operators actually runs: cheap tiers first, every
expensive comparison bounded by a candidate generator, every removal
accounted for.

Tier order (the standard funnel, cheapest first):

0. rule filters       — optional C4 line cleaning (Raffel et al.
                        2020; rewrites text to the kept lines),
                        Gopher quality rules (Rae et al. 2021) —
                        zero-shuffle map stages — and the Gopher
                        REPETITION rules (doc-local relational aggs),
                        so obviously-bad docs never pay a dedup
                        exchange or bloat an LSH bucket
1. exact dedup        — keep the lowest id per content hash
2. near-dup dedup     — MinHash/LSH candidates → exact Jaccard verify
                        ≥ tau → drop the higher id of each pair
3. quality gates      — minimum token count; optional corpus-LM
                        cross-entropy band (too low = boilerplate/
                        repetition, too high = garbage)
4. block rewrite      — optional corpus-wide keep-first block dedup
                        (drops docs whose every block was seen before)
5. DSIR selection     — optional target-likeness gate: keep docs whose
                        hashed-bigram log importance weight vs a
                        target corpus clears a threshold
6. mixture resample   — optional temperature-smoothed per-stratum
                        up/down-sampling (adds a `replica` column;
                        runs last because it changes row multiplicity)

This operator is a pipeline DRIVER: it runs one Spark action per tier
(the survivor count) over a lazily-materialized (`localCheckpoint
(eager=False)`) intermediate, because each tier's output feeds both
the report and the next tier — without materialization every tier
would recompute the whole funnel above it. At 100 TB the same shape
persists each tier to the lake instead (swap the checkpoint for a
parquet write); the join/shuffle structure is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X
from ods_to_datalake_spark.operators.dedup import (
    block_dedup,
    cluster_canonical,
    connected_components,
    jaccard_pairs,
    minhash_lsh_candidates,
)


@dataclass
class CurationStage:
    stage: str
    docs_in: int
    docs_out: int

    @property
    def removed(self) -> int:
        return self.docs_in - self.docs_out


def curate_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    c4_rules: bool = False,
    gopher_rules: bool = False,
    repetition_rules: bool = False,
    shingle_n: int = 3,
    minhash_k: int = 8,
    bands: int = 4,
    rows: int = 2,
    max_bucket: int | None = None,
    jaccard_tau: float = 0.5,
    near_dup_keep: str = "lowest_id",
    min_tokens: int = 0,
    xent_band: tuple[float, float] | None = None,
    block_tokens: int | None = None,
    dsir_target: DataFrame | None = None,
    dsir_min: float = 0.0,
    mixture_strata: str | None = None,
    mixture_weight: str | None = None,
) -> tuple[DataFrame, list[CurationStage]]:
    """(curated docs, per-tier report). See module docstring.

    Near-dup policy (``near_dup_keep``):

    - ``"lowest_id"`` (default) matches `similarity.semantic_dedup`: a
      document is dropped when a LOWER-id document verifies as its
      near-duplicate — deterministic, order-free, one anti-join. On a
      chain A~B, B~C it keeps only A (pairwise dropping over-deletes).
    - ``"best_quality"`` clusters the verified pairs (connected
      components) and keeps the highest-token-count member per cluster
      (min id on ties) — the CCNet/RefinedWeb keep-best convention,
      built on `dedup.connected_components` + `dedup.cluster_canonical`
      (both skew-safe; the argmax travels as one struct per cluster).
      Requires a NUMERIC id column (the min-id tie-break rides the
      argmax struct as a negated id); the default policy accepts any
      orderable id type.

    The LM band (when given) trains the bigram model on the docs that
    survived dedup — scoring against duplicates would skew the model
    toward exactly the text the earlier tiers removed.
    """
    report: list[CurationStage] = []
    cur = docs
    n_in = cur.count()

    def advance(stage: str, nxt: DataFrame, n_before: int) -> int:
        nonlocal cur
        cur = nxt.localCheckpoint(eager=False)
        n_after = cur.count()
        report.append(CurationStage(stage, n_before, n_after))
        return n_after

    # 0. rule filters — per-row codegen expressions, no shuffle. C4
    # runs first because it REWRITES text (drops non-content lines);
    # Gopher then judges the cleaned text, as the published pipelines
    # compose them.
    if c4_rules:
        s = X.c4_stats(text_col)
        cleaned = (
            cur.withColumn("__c4_keep", s["keep"])
            .withColumn("__c4_text", s["cleaned_text"])
            .filter(F.col("__c4_keep") == 1)
            .withColumn(text_col, F.col("__c4_text"))
            .drop("__c4_keep", "__c4_text")
        )
        n_in = advance("c4_rules", cleaned, n_in)
    if gopher_rules:
        survivors = cur.filter(
            X.gopher_passes(X.gopher_stats(text_col)) == 1
        )
        n_in = advance("gopher_rules", survivors, n_in)
    # repetition rules are doc-local but RELATIONAL (explode +
    # per-doc aggs) — still cheaper than any cross-doc dedup tier,
    # and boilerplate-heavy docs removed here never enter the LSH
    # bucket space they would otherwise bloat
    if repetition_rules:
        from ods_to_datalake_spark.operators.quality import (
            gopher_repetition,
        )

        keep = (
            gopher_repetition(cur, id_col, text_col)
            .filter(F.col("passes") == 1)
            .select(id_col)
        )
        n_in = advance(
            "repetition_rules",
            cur.join(keep, id_col, "left_semi"),
            n_in,
        )

    # 1. exact dedup (keep lowest id per content hash). Skew-safe:
    # groupBy(hash).agg(min(id)) partially aggregates map-side — a
    # corpus-wide boilerplate document collapses before the exchange —
    # and ids are unique, so a semi-join on id alone (uniform key)
    # recovers the kept rows. A row_number window over md5(text) would
    # put every copy of a hot document in one unsplittable reducer
    # partition (VERDICT r5 item 2).
    keep_ids = cur.groupBy(F.md5(F.col(text_col)).alias("__h")).agg(
        F.min(id_col).alias(id_col)
    )
    exact = cur.join(keep_ids.select(id_col), id_col, "left_semi")
    n_in = advance("exact_dedup", exact, n_in)

    # 2. near-dup dedup (LSH candidates → Jaccard verify → drop id_b)
    cands = minhash_lsh_candidates(
        cur, id_col, text_col, shingle_n, minhash_k, bands, rows,
        max_bucket=max_bucket,
    )
    verified = jaccard_pairs(
        cur, cands, id_col, text_col, shingle_n, threshold=jaccard_tau
    )
    if near_dup_keep not in ("lowest_id", "best_quality"):
        raise ValueError(
            f"near_dup_keep must be 'lowest_id' or 'best_quality', "
            f"got {near_dup_keep!r}"
        )
    if near_dup_keep == "best_quality":
        cc = connected_components(verified, "id_a", "id_b")
        meta = cur.select(
            F.col(id_col),
            F.size(X.tokens(text_col)).alias("__q"),
        )
        canon = cluster_canonical(cc, meta, id_col, "__q")
        dropped = cc.select(F.col("id").alias(id_col)).join(
            canon.select(
                F.col("canonical_doc_id").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
    else:
        dropped = verified.select(F.col("id_b").alias(id_col)).distinct()
    n_in = advance(
        "near_dup_dedup", cur.join(dropped, id_col, "left_anti"), n_in
    )

    # 3. quality gates
    if min_tokens > 0:
        survivors = cur.filter(
            F.size(X.tokens(text_col)) >= min_tokens
        )
        n_in = advance("min_tokens", survivors, n_in)
    if xent_band is not None:
        from ods_to_datalake_spark.operators.lm import bigram_lm_scores

        lo, hi = xent_band
        scores = bigram_lm_scores(cur, id_col, text_col)
        keep = scores.filter(
            F.col("xent").isNotNull()
            & (F.col("xent") >= lo)
            & (F.col("xent") <= hi)
        ).select(id_col)
        n_in = advance("lm_xent_band", cur.join(keep, id_col, "left_semi"), n_in)

    # 4. optional corpus-wide keep-first block rewrite
    if block_tokens is not None:
        rewritten = (
            block_dedup(cur, id_col, text_col, block_tokens)
            .filter(F.col("n_kept") > 0)
            .select(
                F.col(id_col), F.col("clean_text").alias(text_col)
            )
        )
        other_cols = [c for c in cur.columns if c not in (id_col, text_col)]
        if other_cols:
            rewritten = rewritten.join(
                cur.select(id_col, *other_cols), id_col
            )
        n_in = advance("block_rewrite", rewritten, n_in)

    # 5. optional DSIR target-likeness selection (Xie et al. 2023):
    # keep docs whose hashed-bigram log importance weight against the
    # caller's target corpus clears `dsir_min` — the "looks like the
    # data I want" gate, run after dedup so duplicated boilerplate
    # can't dominate the source model
    if dsir_target is not None:
        from ods_to_datalake_spark.operators.lm import dsir_logratio

        weights = dsir_logratio(
            dsir_target, cur, cur, id_col, text_col
        )
        # unscored docs (no bigrams → NULL weight) fail the gate
        # explicitly, not via three-valued-logic accident
        keep = weights.filter(
            F.col("dsir_logratio").isNotNull()
            & (F.col("dsir_logratio") >= dsir_min)
        ).select(id_col)
        n_in = advance(
            "dsir_select", cur.join(keep, id_col, "left_semi"), n_in
        )

    # 6. optional temperature-smoothed mixture resampling — the LAST
    # stage because it changes row multiplicity: the output gains a
    # `replica` column and a doc may appear 0 or several times
    # (deterministic integer up/down-sampling per stratum). Its report
    # entry counts ROWS, not documents — docs_out exceeds docs_in
    # under net up-sampling and `removed` is meaningless for this one
    # stage (every earlier tier removes; this one redistributes)
    if mixture_strata is not None:
        from ods_to_datalake_spark.operators.sampling import (
            temperature_mixture,
        )

        resampled = temperature_mixture(
            cur, id_col, mixture_strata, mixture_weight or "n_chars"
        )
        n_in = advance("mixture_resample", resampled, n_in)

    return cur, report


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+[0-9]{8,15}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, clean_text, n_emails, n_phones, n_ips) — rule-based PII
    redaction, the compliance pass every shared training corpus runs
    before release: e-mail addresses, international-format phone
    numbers (+ and 8-15 digits), and dotted-quad IPs are replaced by
    typed placeholder tags, with per-document match counts kept as the
    audit trail (a scrub that doesn't count what it removed can't be
    reviewed).

    Patterns are deliberately restricted to the regex subset Java
    (Spark) and RE2 (DuckDB) interpret identically — character
    classes, bounded repetition, word boundaries; no lookaround, no
    backreferences — so the oracle runs the SAME expressions.
    Replacement order is fixed (email → phone → IP: an email can
    contain dots and digits, so it must leave the text before the IP
    pass); counts are measured on the ORIGINAL text, non-overlapping
    matches in both engines. NOTE: the counts are per-rule matches on
    the RAW text, NOT placeholder insertions — a phone or IP nested
    inside an email (``1.2.3.4@host.com``) is counted by its own rule
    even though the email pass removes it first, so counts can exceed
    replacements made (test-pinned; do not read them as a redaction
    tally). NULL text stays NULL with zero counts.

    Scale: pure map-side string work — zero shuffles, whole-stage
    codegen, no UDFs; the scrubbed column replaces the original in
    the write path, the counts feed the u12-style audit report."""
    txt = F.col(text_col)
    counts = [
        F.coalesce(
            F.regexp_count(txt, F.lit(p)), F.lit(0)
        ).cast("long").alias(a)
        for p, a in (
            (PII_EMAIL, "n_emails"),
            (PII_PHONE, "n_phones"),
            (PII_IPV4, "n_ips"),
        )
    ]
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IPV4,
        "<IP>",
    )
    return docs.select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        *counts,
    )
