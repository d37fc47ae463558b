"""Document-quality operators that need RELATIONAL computation (explode
+ groupBy per document) rather than per-row expressions — the
repetition half of Gopher's quality table (Rae et al. 2021, appendix
A1.1), complementing the per-row rule filters in `functions.text`
(`gopher_stats` / `c4_stats`).

Scale notes: every aggregation here groups on (doc_id, content) or
doc_id — uniform keys, map-side partials; the duplicate-5-gram
coverage join is a left_semi on (doc_id, gram) bounded by the doc's
own shingles. Nothing joins across documents, so the whole operator
is embarrassingly doc-parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X

# Gopher repetition thresholds (Rae et al. 2021 A1.1), integer-scaled
# num/den so every rule is a pure integer comparison:
REP_DUP_LINE_NUM, REP_DUP_LINE_DEN = 3, 10  # dup-line frac <= 0.30
REP_DUP_LINE_CHAR_NUM, REP_DUP_LINE_CHAR_DEN = 2, 10  # <= 0.20
REP_TOP2_CHAR_NUM, REP_TOP2_CHAR_DEN = 2, 10  # top-2gram chars <= 0.20
REP_DUP5_NUM, REP_DUP5_DEN = 15, 100  # dup-5gram positions <= 0.15
REP_5GRAM_N = 5


def gopher_repetition(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document Gopher REPETITION signals + pass flag:

    - duplicate-line fraction and duplicate-line character fraction
      (lines occurring more than once within the document),
    - top-2-gram character fraction (most frequent word bigram's
      character mass; ties broken to the lexicographically largest
      bigram — max(struct(count, gram)) here, ROW_NUMBER ... ORDER BY
      c DESC, g DESC in the oracle, identical under binary collation),
    - duplicate-5-gram coverage: the fraction of token POSITIONS
      covered by any 5-token window that occurs >= 2 times within the
      document (token-position form of the paper's character
      fraction — exact, overlap-correct, and relational).

    All outputs are BIGINT counts (numerator/denominator pairs), no
    division anywhere; `passes` applies the A1.1 thresholds as
    integer-scaled comparisons and is 0 for empty/NULL documents.
    Documents with no lines/ngrams coalesce to 0 counts.
    """
    toks = X.tokens(text_col)
    base = docs.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("word_chars"),
        F.split(F.col(text_col), r"\r?\n").alias("__lines"),
        X.shingles(toks, 2).alias("__g2"),
        X.shingles(toks, REP_5GRAM_N).alias("__g5"),
    )

    per_line = (
        base.select(id_col, F.explode("__lines").alias("__l"))
        .groupBy(id_col, "__l")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_lines"),
        F.sum(
            F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0))
        ).cast("long").alias("n_dup_lines"),
        F.sum(F.col("__c") * F.length("__l")).cast("long").alias(
            "total_line_chars"
        ),
        F.sum(
            F.when(
                F.col("__c") > 1, F.col("__c") * F.length("__l")
            ).otherwise(F.lit(0))
        ).cast("long").alias("dup_line_chars"),
    )

    per_g2 = (
        base.select(id_col, F.explode("__g2").alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    top2 = per_g2.groupBy(id_col).agg(
        F.max(F.struct(F.col("__c"), F.col("__g"))).alias("__m")
    ).select(
        id_col,
        F.col("__m.__c").cast("long").alias("top2_count"),
        (F.col("__m.__c") * F.length(F.col("__m.__g"))).cast(
            "long"
        ).alias("top2_chars"),
    )

    # NOTE: grouping/joining this stream on seeded-xxhash64 long pairs
    # (the span_stats/block_dedup key trick) was measured at 100x and
    # did NOT move the median (21.3s string keys vs 23.3s hashed) —
    # unlike x34, the group key here is already partial-aggregated
    # relational state, not a window key, so the string shuffle isn't
    # the bottleneck; keep the simpler string form.
    g5 = base.select(
        id_col, F.posexplode("__g5").alias("__p", "__g")
    )
    dup_grams = (
        g5.groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select(id_col, "__g")
    )
    # Covered-position count = |union of the intervals [p, p+4]| over
    # duplicated-gram start positions p. The union of FIXED-LENGTH
    # intervals folds exactly with one ordered lag pass: each interval
    # contributes min(5, p - p_prev) new positions (5 for the first).
    # The explode(sequence)+distinct form this replaces materialized up
    # to 5x the gram stream into a hash-distinct — the aggregate's
    # fallback-and-spill under that volume was the 100x stress cell's
    # superlinear term (5.8s@30x -> 33s@100x, partition-insensitive).
    from pyspark.sql import Window

    dup_pos = g5.join(dup_grams, [id_col, "__g"], "left_semi").select(
        id_col, "__p"
    )
    w_pos = Window.partitionBy(id_col).orderBy("__p")
    contrib = F.least(
        F.lit(REP_5GRAM_N),
        F.col("__p") - F.lag("__p", 1).over(w_pos),
    )
    dup5 = (
        dup_pos.withColumn(
            "__new",
            F.coalesce(contrib, F.lit(REP_5GRAM_N)).cast("long"),
        )
        .groupBy(id_col)
        .agg(F.sum("__new").alias("dup5_positions"))
    )

    out = (
        base.select(id_col, "n_tokens", "word_chars")
        .join(line_stats, id_col, "left")
        .join(top2, id_col, "left")
        .join(dup5, id_col, "left")
    )
    z = F.lit(0).cast("long")
    counts = {
        c: F.coalesce(F.col(c), z).alias(c)
        for c in (
            "n_lines", "n_dup_lines", "dup_line_chars",
            "total_line_chars", "top2_count", "top2_chars",
            "dup5_positions",
        )
    }
    nt = F.coalesce(F.col("n_tokens"), z)
    wc = F.coalesce(F.col("word_chars"), z)
    # build the conjunction from the coalesced columns directly
    cn = {k: F.coalesce(F.col(k), z) for k in counts}
    ok = (
        (nt >= 1)
        & (REP_DUP_LINE_DEN * cn["n_dup_lines"]
           <= REP_DUP_LINE_NUM * cn["n_lines"])
        & (REP_DUP_LINE_CHAR_DEN * cn["dup_line_chars"]
           <= REP_DUP_LINE_CHAR_NUM * cn["total_line_chars"])
        & (REP_TOP2_CHAR_DEN * cn["top2_chars"]
           <= REP_TOP2_CHAR_NUM * wc)
        & (REP_DUP5_DEN * cn["dup5_positions"]
           <= REP_DUP5_NUM * nt)
    )
    return out.select(
        id_col,
        "n_tokens",
        "word_chars",
        *counts.values(),
        F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("long").alias(
            "passes"
        ),
    )


def zipf_profile(
    docs: DataFrame, id_col: str, text_col: str, k: int = 100
) -> DataFrame:
    """(rank, token, n_occurrences, cum_share, n_total_tokens,
    n_types) — the corpus rank-frequency profile: the top-``k`` tokens
    by (count DESC, token ASC — deterministic at every tie), each
    with its cumulative share of all token occurrences, plus the
    corpus totals (token instances and distinct types, the two Heaps-
    law coordinates). The corpus-health diagnostic read before any
    text pipeline decision: a natural corpus is Zipfian (top-100
    covering ~40-50%); boilerplate-dominated crawls spike the head,
    OCR noise and tokenizer bugs fatten the tail — and this repo's
    own stress work hit exactly that (the synthetic 31-word corpus's
    missing Zipf tail is PPJoin's documented worst case, CLAUDE.md),
    so the profile is also the check that a corpus is fit for
    prefix-filter joins at all.

    Determinism: counts are exact BIGINTs; cum_share is ONE IEEE
    division per row of the exact cumulative BIGINT by the exact
    total (identical operands both engines — the q02 rule).

    Scale: one corpus token shuffle (the count groupBy, map-side
    partial); top-k is orderBy+limit — Spark plans
    TakeOrderedAndProject (a k-heap per partition, never a global
    sort); the cum-share window orders K rows; the totals ride the
    SAME vocabulary-sized count table (one extra agg over it, no
    second corpus pass) and broadcast as a 1-row crossJoin."""
    tok = docs.select(
        F.explode(X.tokens(text_col)).alias("tok")
    )
    counts = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return zipf_from_counts(counts, k=k)


def zipf_from_counts(counts: DataFrame, k: int = 100) -> DataFrame:
    """`zipf_profile`'s rank/share arithmetic over a pre-built
    (tok, n) vocabulary count table — split out so the STREAMING face
    (which folds per-batch additive partial counts from the lake) and
    the batch operator derive the profile through the SAME expressions
    and stay bit-identical by construction."""
    from pyspark.sql import Window

    counts = counts.localCheckpoint()  # feeds top-k AND the totals
    # (x25 rule) — vocabulary-sized
    totals = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0))
        .cast("long")
        .alias("n_total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("tok"))
            ).cast("long"),
        )
        .withColumn(
            "__cum",
            F.sum("n").over(
                Window.orderBy(F.desc("n"), F.asc("tok")).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "rank",
        F.col("tok").alias("token"),
        F.col("n").alias("n_occurrences"),
        (
            F.col("__cum").cast("double")
            / F.col("n_total_tokens").cast("double")
        ).alias("cum_share"),
        "n_total_tokens",
        "n_types",
    )


def token_entropy(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_tokens, n_types, entropy_bits) — per-document Shannon
    entropy of the within-doc token distribution, in bits: the
    canonical repetitiveness feature (a doc that repeats one token
    reads 0; a doc of n distinct tokens reads log2 n) that the
    Gopher-style ratio rules (x22/x51) approximate piecewise —
    low-entropy docs are templates, keyword stuffing, or decode loops,
    and entropy is the single knob quality pipelines threshold on.

    Identity used: H = log2(n) − (Σ_i c_i·log2(c_i)) / n over the
    token counts c_i — only log2 of INTEGER counts ever crosses
    engines, never a per-token probability. Each transcendental term
    is quantized DECIMAL(18,6) BEFORE the multiply/sum (the x38/x72
    rule: JVM log and libm diverge by 1 ulp; quantizing first bounds
    the flip odds per term) and the oracle mirrors the quantization
    through a VARCHAR hop (the u17 rule: Spark's double→DECIMAL cast
    rounds the shortest repr, DuckDB the exact binary). log2(n) is
    quantized the same way; the final H is IEEE ops on
    identically-derived operands — emitted raw (the q02 rule, never
    re-rounded). Singleton counts contribute log2(1) = 0 exactly.
    NULL/empty docs have no distribution → NULL entropy (not 0 —
    a one-token doc reads 0; no tokens reads nothing).

    Scale: one (doc, token) partial-agg groupBy + one doc-keyed
    rollup — doc-parallel, no cross-document anything."""
    from ods_to_datalake_spark.functions import text as X

    counts = (
        docs.select(
            F.col(id_col), F.explode(X.tokens(text_col)).alias("__t")
        )
        .where(F.col("__t") != "")  # the doc_token_sets rule: an
        # empty/whitespace doc has NO distribution, not one '' token
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(
            F.col("__c").cast("decimal(18,6)")
            * F.log2(F.col("__c")).cast("decimal(18,6)")
        ).alias("__clog"),
    )
    ent = (
        F.log2(F.col("n_tokens")).cast("decimal(18,6)").cast("double")
        - F.col("__clog").cast("double")
        / F.col("n_tokens").cast("double")
    )
    return docs.select(F.col(id_col)).join(
        per_doc, id_col, "left"
    ).select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_types", F.lit(0)).cast("long").alias("n_types"),
        F.when(F.col("n_tokens") > 0, ent).alias("entropy_bits"),
    )


def source_kl_divergence(
    docs: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    """(source, n_tokens, n_types, kl_nats) — KL divergence of each
    source's unigram token distribution from the WHOLE-corpus
    distribution, KL(p_source ‖ p_corpus) = Σ_t p_s(t)·ln(p_s(t)/p_c(t))
    — the domain-mixture panel behind data-mixing decisions (DSIR/
    DoReMi-style): a source at ≈0 nats is redundant with the corpus
    mix, a high-KL source is the distinct material a re-weighting run
    would up- or down-sample, and a KL that jumps release-over-release
    means the source changed under you. x47 scores DOCUMENTS against
    two fixed models; this scores SOURCES against the corpus.

    Well-defined by construction: every source token is a corpus token
    (support inclusion), so the ratio argument is never 0/0 or ln(0) —
    no CASE guards needed, and KL ≥ 0 with equality iff the source
    matches the mix. NULL/whitespace-only texts contribute no tokens;
    a source with zero tokens has no distribution and is absent (the
    u16 rule). NULL source is a real group (a 99%-NULL source column
    is a mixture fact).

    Cross-engine arithmetic (the x38/x72 per-term rule + the u17
    VARCHAR hop for new quantizations): the ratio
    p_s/p_c = (n_st·N_c)/(N_s·n_ct) is computed in IEEE doubles from
    exact BIGINTs (identical casts/ops both engines; products stay OFF
    the integer path — n_st·N_c overflows int64 at corpus scale), each
    ln() is quantized to DECIMAL(18,6) BEFORE the weighted sum (JVM
    and libm ln diverge 1 ulp on ~6% of integer-ratio inputs), the sum
    Σ n_st·q_t folds exactly in DECIMAL, and kl_nats is ONE final raw
    double division by N_s. Scale: one (source, token) partial-agg
    shuffle over the corpus, then token- and source-keyed windows plus
    one source rollup over the VOCABULARY-sized count table —
    everything after the first agg is vocabulary-sized, and that count
    table is the mergeable artifact an incremental ingest maintains
    (counts are additive)."""
    from ods_to_datalake_spark.functions import text as X

    toks = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(X.tokens(text_col)).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_st")
    ).localCheckpoint(eager=True)  # feeds the 1-row corpus total AND
    # the windowed term plan — 2 legs over corpus-scale lineage (the
    # x25 rule; the frame itself is vocabulary-sized)
    # per-token corpus counts and per-source totals via WINDOWS over
    # the vocabulary-sized count table, not equi-joins: a window
    # partition key treats NULL as a real group (the NULL-source
    # contract above) where an equi-join key silently drops it
    from pyspark.sql import Window

    nc = st.agg(F.sum("n_st").cast("long").alias("n_c"))
    terms = st.select(
        "source",
        "n_st",
        F.sum("n_st")
        .over(Window.partitionBy("tok"))
        .cast("long")
        .alias("n_ct"),
        F.sum("n_st")
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n_s"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n_types"),
    ).crossJoin(F.broadcast(nc))
    q = (
        F.log(
            (
                F.col("n_st").cast("double")
                * F.col("n_c").cast("double")
            )
            / (
                F.col("n_s").cast("double")
                * F.col("n_ct").cast("double")
            )
        )
    ).cast("decimal(18,6)")
    return (
        terms.select(
            "source",
            "n_s",
            "n_types",
            (F.col("n_st").cast("decimal(18,0)") * q).alias("__term"),
        )
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.max("n_types").alias("n_types"),
            F.sum("__term").alias("__num"),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            (
                F.col("__num").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("kl_nats"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """(lang, n_docs, n_tokens, n_chars, chars_per_token,
    tokens_per_doc) — tokenizer fertility panel per language (or any
    grouping): characters per BPE-ish token, the multilingual-corpus
    cost metric (a language at 2× the chars/token pays 2× the context
    window for the same text — fertility is how tokenizer and
    data-mixture papers report it) and the budget number behind
    per-language sampling rates. Uses x02's BPE-ish segmentation
    (letter runs / digit runs / single punctuation — pure JVM regexp)
    so the two queries count the same tokens.

    Exactness: counts exact BIGINTs; NULL text contributes no chars
    and no tokens in BOTH engines (size/LEN of NULL is NULL, SUM
    skips) but the document still counts toward n_docs; NULL group is
    a real group (groupBy keeps it). The two ratios are raw
    BIGINT/BIGINT IEEE divisions, CASE-guarded on zero denominators.

    Scale: one group-keyed partial agg — the per-row regexp token
    count is map-side, the shuffle carries language-count rows."""
    toks = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)),
            F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"),
            0,
        )
    ).cast("long")
    chars = F.length(F.col(text_col)).cast("long")
    return (
        docs.groupBy(F.col(group_col).alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum(toks), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            F.coalesce(F.sum(chars), F.lit(0))
            .cast("long")
            .alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_chars").cast("double")
                / F.col("n_tokens").cast("double"),
            ).alias("chars_per_token"),
            F.when(
                F.col("n_docs") > 0,
                F.col("n_tokens").cast("double")
                / F.col("n_docs").cast("double"),
            ).alias("tokens_per_doc"),
        )
    )


def term_burstiness(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 5,
    k: int = 20,
) -> DataFrame:
    """(token, cf, df, burstiness) — the top-k most BURSTY terms:
    burstiness = collection frequency / document frequency, the mean
    occurrences per CONTAINING document (Church & Gale 1995; Katz
    1996): function words spread thinly (ratio ≈ 1 however common),
    content/topical words recur within the documents that use them at
    all — the corpus-statistics screen behind stopword-list
    induction, keyword extraction, and the x51-style repetition
    review at TERM rather than document granularity (a term whose
    burstiness explodes between snapshots is usually boilerplate or
    template residue entering the corpus).

    Exactness: cf and df are exact BIGINTs over x02's token
    segmentation (one definition corpus-wide); burstiness is ONE
    IEEE division — identical operands, identical double, so the
    top-k ordering (burstiness DESC, token ASC — the unique-tiebreak
    rule; equal ratios order identically cross-engine because the
    doubles are bit-equal) agrees. ``min_df`` floors out rare-term
    noise (a hapax is trivially "bursty"); NULL/empty tokens never
    exist post-segmentation.

    Scale: ONE term-keyed aggregate over the token stream (cf is
    map-side combinable; exact df rides the distinct expand),
    vocabulary-bounded output, then a global top-k limit — the t01
    shape, never a full sort of the corpus."""
    from ods_to_datalake_spark.functions import text as X

    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(X.tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    stats = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.count_distinct("__doc").cast("long").alias("df"),
    )
    return (
        stats.where(F.col("df") >= min_df)
        .select(
            "token",
            "cf",
            "df",
            (F.col("cf").cast("double") / F.col("df").cast("double"))
            .alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), F.col("token").asc())
        .limit(k)
    )
