"""Set-similarity and fuzzy-string joins — the LSH-free exact leg of
the near-dup stack.

MinHash/LSH (`operators/dedup.py`) trades recall for candidate count;
this module adds the EXACT counterparts from the similarity-join
literature, both candidate-bounded without any probabilistic loss:

- prefix-filtered set-similarity join (Chaudhuri et al. ICDE'06,
  Xiao et al. WWW'08 "PPJoin"): order every document's token set by a
  GLOBAL rarest-first ranking; any pair with Jaccard >= t must share a
  token within each other's first ``|d| - ceil(t*|d|) + 1`` tokens, so
  equi-joining on PREFIX tokens finds every qualifying pair while the
  join buckets stay small by construction — a prefix token is by
  definition one of a document's rarest, so its bucket is bounded by
  that token's corpus document frequency. The skew profile is the
  OPPOSITE of LSH banding: stop-words never enter prefixes, and the
  residual worst case (a corpus of near-identical docs) only pairs
  documents that truly qualify.
- blocked fuzzy-string join (classic entity-resolution blocking):
  candidate pairs from cheap deterministic block keys (2-char prefix
  and 2-char suffix passes, unioned — multi-pass blocking recovers
  pairs a single key misses), verified by edit distance. Levenshtein
  runs JVM-side (`F.levenshtein`), only on candidate pairs.

All integer threshold math is cross-multiplied (never ``fraction *
count`` — see CLAUDE.md on float literals at exact boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X


def doc_token_sets(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """DISTINCT (``_doc``, token) pairs — set semantics, non-empty
    whitespace tokens (the same tokenizer every text operator uses)."""
    return (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(X.tokens(text_col)).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )


def _prefix_table(
    toks: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """The PPJoin prefix frame (_doc, token, sz) — each document's
    sz − ceil(t·sz) + 1 globally-rarest tokens by (df, token) rank.
    ONE definition shared by `set_similarity_join` and
    `oversized_prefix_tokens`: the report's whole contract is that
    its prefix is computed EXACTLY as the join computes it, and two
    copies would desync silently on any future change (the review
    catch this helper exists for). df via groupBy + join-back, NOT a
    window over the token partition — a universal token would funnel
    its occurrence list through one unsplittable task (r7 verdict);
    the sz/rn windows stay: their partition key is the doc id,
    bounded by document length."""
    dfreq = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("_df")
    )
    ranked = (
        toks.join(dfreq, "token")
        .withColumn(
            "sz",
            F.count(F.lit(1))
            .over(Window.partitionBy("_doc"))
            .cast("long"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                # global rarest-first order; token breaks df ties so
                # the rank is total
                Window.partitionBy("_doc").orderBy("_df", "token")
            ),
        )
    )
    # prefix length = sz - ceil(t*sz) + 1, all-integer:
    # ceil(a/b) = (a + b - 1) div b for non-negative a
    prefix_len = (
        F.col("sz")
        - F.expr(f"({t_num} * sz + {t_den} - 1) div {t_den}")
        + F.lit(1)
    )
    return ranked.where(F.col("rn") <= prefix_len).select(
        "_doc", "token", "sz"
    )


def set_similarity_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int,
    t_den: int,
    max_prefix_bucket: int | None = None,
    token_sets: DataFrame | None = None,
) -> DataFrame:
    """All document pairs with token-set Jaccard >= t_num/t_den:
    (doc_a, doc_b, overlap, size_a, size_b, jaccard), doc_a < doc_b.

    ``token_sets`` swaps the default whitespace tokenization for a
    caller-built (id, element) frame — the exact join is
    set-representation-agnostic (x78 audits the LSH layer against
    exact SHINGLE-set Jaccard, the quantity MinHash estimates;
    deduplicated here, so duplicates are harmless).

    Exact — no LSH recall loss. Plan shape: one (doc, token) distinct,
    a vocabulary-sized df count, a rank join, the prefix self-join
    (small buckets — see module docstring), then a candidate-bounded
    overlap count. Every shuffle is keyed by token or doc id with
    map-side partials; nothing is all-pairs.

    ``max_prefix_bucket`` is the cap_bucket_width/max_basket contract
    applied to the prefix join's candidate stream: prefix tokens whose
    bucket holds more than this many documents are dropped BEFORE the
    self-join (a width-B bucket emits ~B²/2 candidates — a single
    corpus-common prefix token turns the stream quadratic, which is
    exactly what exhausted this VM's scratch at the 60× stress cell).
    CAPPED SEMANTICS ARE A LOWER BOUND on recall: a qualifying pair
    whose every shared prefix token was oversized is missed, so a
    capped pipeline must read `oversized_prefix_tokens` and
    alert/widen rather than report full recall (the
    oversized_baskets/oversized_blocks rule). The registered x60 runs
    uncapped; the guarded form is the 100-TB operating mode.
    """
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    # the token-set table feeds FIVE plan legs (df rank, sizes, prefix
    # ×2, verify ×2) — materialize it once (the x25 funnel-truncation
    # pattern; in a lake pipeline this is the persisted artifact, like
    # x05's shingle tables)
    if token_sets is None:
        toks = doc_token_sets(docs, id_col, text_col)
    else:
        toks = token_sets.select(
            F.col(token_sets.columns[0]).alias("_doc"),
            F.col(token_sets.columns[1]).alias("token"),
        ).where(
            F.col("_doc").isNotNull() & F.col("token").isNotNull()
        ).distinct()
    toks = toks.localCheckpoint()
    prefix = _prefix_table(toks, t_num, t_den)
    if max_prefix_bucket is not None:
        widths = prefix.groupBy("token").agg(
            F.count(F.lit(1)).alias("__w")
        )
        prefix = prefix.join(
            widths.filter(F.col("__w") <= max_prefix_bucket).drop(
                "__w"
            ),
            "token",
        )
    pa = prefix.select(
        F.col("_doc").alias("doc_a"), "token", F.col("sz").alias("size_a")
    )
    pb = prefix.select(
        F.col("_doc").alias("doc_b"), "token", F.col("sz").alias("size_b")
    )
    # sizes ride the candidate rows (functionally dependent on the
    # ids), so the verify step needs no size join-back
    cand = (
        pa.join(pb, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "size_a", "size_b")
        .distinct()
    )
    ta = toks.select(F.col("_doc").alias("doc_a"), "token")
    tb = toks.select(F.col("_doc").alias("doc_b"), "token")
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
        # J = o/(sa+sb-o) >= n/d  <=>  o*(d+n) >= n*(sa+sb), all-integer
        .where(
            F.col("overlap") * F.lit(t_den + t_num)
            >= F.lit(t_num) * (F.col("size_a") + F.col("size_b"))
        )
    )
    jaccard = F.col("overlap").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("overlap")
    ).cast("double")
    return verified.select(
        "doc_a", "doc_b", "overlap", "size_a", "size_b",
        jaccard.alias("jaccard"),
    )


def oversized_prefix_tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int,
    t_den: int,
    max_prefix_bucket: int,
) -> DataFrame:
    """(token, n_docs) for prefix-filter tokens whose bucket exceeds
    ``max_prefix_bucket`` — what `set_similarity_join(...,
    max_prefix_bucket=...)` would drop, with the df-rank prefix
    computed exactly as the join computes it. The skew report that
    accompanies the capped form: a width-B prefix bucket emits ~B²/2
    candidate pairs, and a capped pipeline that doesn't surface this
    report silently reads as full recall (the oversized_baskets /
    oversized_blocks contract)."""
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    return (
        _prefix_table(
            doc_token_sets(docs, id_col, text_col), t_num, t_den
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > max_prefix_bucket)
    )


def oversized_blocks(
    words: DataFrame,
    word_col: str,
    max_block: int,
    block_fns=None,
) -> DataFrame:
    """(pass_idx, block, n_words) for every blocking-pass key wider
    than ``max_block`` — the skew report that accompanies
    ``blocked_fuzzy_join(..., max_block=...)``, same contract as
    `dedup.oversized_buckets`: a block with B members emits B²
    candidate pairs, so a common 2-char prefix in a natural-language
    vocabulary ("th", "co" — easily 10⁵ words) turns the bounded
    blocked join quadratic. A capped pipeline logs/alerts on this
    report instead of silently reading as full recall."""
    w, fns = _dedup_words(words, word_col, block_fns)
    out = None
    for i, fn in enumerate(fns):
        counts = (
            w.withColumn("_blk", fn(F.col("w")))
            .groupBy("_blk")
            .agg(F.count(F.lit(1)).alias("n_words"))
            .filter(F.col("n_words") > max_block)
            .select(
                F.lit(i).alias("pass_idx"),
                F.col("_blk").alias("block"),
                "n_words",
            )
        )
        out = counts if out is None else out.unionByName(counts)
    return out


def _dedup_words(words: DataFrame, word_col: str, block_fns):
    """Shared prep: deduplicated non-null word column named ``w`` and
    the resolved blocking passes (default 2-char prefix + suffix)."""
    w = words.select(F.col(word_col).alias("w")).where(
        F.col("w").isNotNull()
    ).distinct()
    if block_fns is None:
        block_fns = [
            lambda c: F.substring(c, 1, 2),
            lambda c: F.expr("right(w, 2)"),
        ]
    elif not block_fns:
        # an explicit empty pass list would make the callers fold over
        # nothing and return None — crashing far from the cause (r8
        # advice); zero blocking passes is a contract error, not an
        # empty result
        raise ValueError("block_fns must be non-empty")
    return w, block_fns


def blocked_fuzzy_join(
    words: DataFrame,
    word_col: str,
    max_dist: int = 2,
    block_fns=None,
    max_block: int | None = None,
) -> DataFrame:
    """Fuzzy vocabulary self-join: (w1, w2, dist) for distinct word
    pairs within ``max_dist`` edits, w1 < w2, found by deterministic
    blocking passes — default 2-char prefix then 2-char suffix (a pair
    escaping both would need edits at both ends), overridable via
    ``block_fns`` (callables Column→Column over the deduplicated word
    column, named ``w``) for domain keys like a deletion neighborhood.
    Multi-pass blocking is the standard recall lever: each extra pass
    unions more candidates, and the recall bound is explicit instead
    of probabilistic.

    Levenshtein is evaluated only on blocked candidates: |block|²
    pairs per key instead of |vocab|², and block keys distribute far
    better than an all-pairs cross join. Words are deduplicated first,
    so a billion-token corpus contributes its VOCABULARY (millions) to
    the join, not its token stream.

    ``max_block`` (opt-in, the `dedup.cap_bucket_width` pattern):
    blocks wider than the cap are dropped BEFORE the self-join,
    bounding any pass's output at max_block² per key — pairs found by
    ANOTHER pass still survive (multi-pass recall is the point), and
    `oversized_blocks` reports what was spilled. The registered x61
    stays uncapped (its oracle matches exactly).
    """
    w, block_fns = _dedup_words(words, word_col, block_fns)
    out = None
    for fn in block_fns:
        blocked = w.withColumn("_blk", fn(F.col("w")))
        if max_block is not None:
            counts = blocked.groupBy("_blk").agg(
                F.count(F.lit(1)).alias("__n")
            )
            blocked = blocked.join(
                counts.filter(F.col("__n") <= max_block).drop("__n"),
                "_blk",
            )
        a = blocked.select(F.col("w").alias("w1"), "_blk")
        b = blocked.select(F.col("w").alias("w2"), "_blk")
        pairs = a.join(b, "_blk").where(F.col("w1") < F.col("w2")).select(
            "w1", "w2"
        )
        out = pairs if out is None else out.unionByName(pairs)
    return (
        out.distinct()
        .withColumn("dist", F.levenshtein("w1", "w2").cast("long"))
        .where(F.col("dist") <= max_dist)
    )


def survivorship_merge(
    df: DataFrame,
    cluster_col: str,
    mode_cols: list[str],
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
) -> DataFrame:
    """Golden-record construction — the SURVIVORSHIP step that
    completes the entity-resolution funnel (blocking:
    `blocked_fuzzy_join` → clustering: `dedup.connected_components` →
    this): one merged record per cluster, each field resolved by its
    own rule instead of keeping one whole source row
    (`dedup.keep_best` does that; MDM survivorship merges FIELDS from
    different rows).

    Rules: ``mode_cols`` take the most frequent non-null value
    ((count DESC, value ASC) tiebreak — deterministic in any engine;
    all-NULL fields survive as NULL), emitted as strings (one long
    stream covers any column mix — callers cast back);
    ``max_cols``/``min_cols`` take the extreme native-typed value.
    Also emits ``n_members`` (cluster size).

    Plan shape: ALL mode fields ride ONE melted stream —
    (cluster, field, value) → count → per-(cluster,field) argmax via
    min(struct(-cnt, value)) → conditional-min re-widening — two
    field-keyed partial-aggregated shuffles regardless of column
    count, never a per-column join; the native aggregates share the
    final cluster-keyed groupBy. A corpus-wide mega-cluster combines
    map-side (no windows over the cluster key).
    """
    max_cols = max_cols or []
    min_cols = min_cols or []
    melted = (
        df.select(
            cluster_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("field"),
                            F.col(c).cast("string").alias("value"),
                        )
                        for c in mode_cols
                    ]
                )
            ).alias("f"),
        )
        .select(cluster_col, "f.*")
        .where(F.col("value").isNotNull())
    )
    counts = melted.groupBy(cluster_col, "field", "value").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    best = (
        counts.groupBy(cluster_col, "field")
        .agg(
            F.min(
                F.struct(
                    (-F.col("__cnt")).alias("__neg"),
                    F.col("value").alias("__v"),
                )
            ).alias("__m")
        )
        .select(cluster_col, "field", F.col("__m.__v").alias("value"))
    )
    modes = best.groupBy(cluster_col).agg(
        *[
            F.min(F.when(F.col("field") == c, F.col("value"))).alias(c)
            for c in mode_cols
        ]
    )
    aggs = df.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
    )
    return aggs.join(modes, cluster_col, "left")


def containment_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int,
    t_den: int,
    max_token_bucket: int | None = None,
    token_sets: DataFrame | None = None,
) -> DataFrame:
    """All ORDERED document pairs where a's token set is mostly inside
    b's: |a ∩ b| / |a| >= t_num/t_den, a ≠ b — set CONTAINMENT, the
    asymmetric sibling of `set_similarity_join`'s Jaccard: quote /
    excerpt / subset detection ("this doc is a fragment of that one"),
    which a symmetric threshold structurally misses because a big
    container dilutes Jaccard (a 20-token quote inside a 2000-token
    page has J ≈ 0.01 but containment 1.0).

    Returns (doc_a, doc_b, overlap, size_a, size_b, containment) with
    doc_a the CONTAINED side; mutually-containing near-equal docs
    appear in both orders — directed semantics, deliberately.

    Prefix filter (Chaudhuri et al. ICDE'06, adapted): the required
    overlap ceil(t·|a|) depends ONLY on the contained side, so a's
    prefix is the same |a| − ceil(t·|a|) + 1 rarest-token rule the
    Jaccard join uses (`_prefix_table`, shared — one definition), but
    the CONTAINER side must be indexed on ALL its tokens (|b| is
    unbounded, no prefix shrinks it). Candidate buckets are therefore
    bounded by each prefix token's full corpus df, not its prefix df
    — worse skew than the Jaccard join by construction, which is what
    ``max_token_bucket`` guards: container-index tokens with corpus
    df above the cap are dropped BEFORE the join (capped recall is a
    LOWER bound — pair it with `oversized_container_tokens`, the
    oversized_* contract). Threshold math all-integer
    (o·t_den ≥ t_num·|a|); containment itself is ONE IEEE division.

    Scale: one (doc, token) distinct + df count + doc-keyed prefix
    windows (the Jaccard join's exact shape), then a token-keyed
    candidate join and a candidate-bounded verify count — nothing
    all-pairs; the token-set table feeds four legs and is
    materialized once."""
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    if token_sets is None:
        toks = doc_token_sets(docs, id_col, text_col)
    else:
        toks = token_sets.select(
            F.col(token_sets.columns[0]).alias("_doc"),
            F.col(token_sets.columns[1]).alias("token"),
        ).where(
            F.col("_doc").isNotNull() & F.col("token").isNotNull()
        ).distinct()
    toks = toks.localCheckpoint()
    pa = _prefix_table(toks, t_num, t_den).select(
        F.col("_doc").alias("doc_a"),
        "token",
        F.col("sz").alias("size_a"),
    )
    container = toks
    if max_token_bucket is not None:
        widths = toks.groupBy("token").agg(
            F.count(F.lit(1)).alias("__w")
        )
        container = toks.join(
            widths.filter(F.col("__w") <= max_token_bucket).drop(
                "__w"
            ),
            "token",
        )
    tb_sz = container.withColumn(
        "size_b",
        F.count(F.lit(1))
        .over(Window.partitionBy("_doc"))
        .cast("long"),
    ).select(F.col("_doc").alias("doc_b"), "token", "size_b")
    cand = (
        pa.join(tb_sz, "token")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "size_a", "size_b")
        .distinct()
    )
    ta = toks.select(F.col("_doc").alias("doc_a"), "token")
    tb = toks.select(F.col("_doc").alias("doc_b"), "token")
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
        .where(
            F.col("overlap") * F.lit(t_den)
            >= F.lit(t_num) * F.col("size_a")
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "overlap",
        "size_a",
        "size_b",
        (
            F.col("overlap").cast("double")
            / F.col("size_a").cast("double")
        ).alias("containment"),
    )


def oversized_container_tokens(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_token_bucket: int,
) -> DataFrame:
    """(token, n_docs) for container-index tokens whose corpus df
    exceeds ``max_token_bucket`` — what `containment_join(...,
    max_token_bucket=...)` drops from the container index, computed
    from the SAME distinct token sets (the oversized_* contract:
    capped recall is a lower bound only if this report is read)."""
    return (
        doc_token_sets(docs, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > max_token_bucket)
    )
