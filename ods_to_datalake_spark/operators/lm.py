"""Corpus n-gram language-model scoring (charter LLM extension).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM 5-gram model; the distributable, oracle-checkable form of that
signal is a corpus-trained add-α bigram model scored back over each
document — high cross-entropy flags boilerplate-free but incoherent
text, low cross-entropy flags repetitive/templated text, and the
corpus itself is the training set (no external model artifact).

Cross-engine determinism: every probability is a ratio of integer
counts (identical doubles in both engines), but ln() is NOT
bit-stable across engines — measured: JVM Math.log and DuckDB's libm
log disagree by 1 ulp on ~6% of integer-ratio inputs. Each token's
-ln(p) is therefore quantized by a cast to DECIMAL(28,6) (a 1-ulp
input wiggle flips the 6-dp quantization only within ~1e-15 of a
boundary — ~2e-9 per token), the decimals sum exactly
(order-independent, unlike a float sum), and the per-doc mean is the
RAW double quotient (sum ≤ ~1e3 with 6 dp ⇒ exact in double; same
IEEE division both engines — never re-round a decimal quotient, see
the q02 build note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, n_bigrams, xent): per-document cross-entropy under the
    corpus's own add-one-smoothed bigram model —

        P(w2 | w1) = (c(w1 w2) + 1) / (c(w1·) + V)

    with c(w1·) the bigram-prefix total and V the corpus vocabulary
    size. xent = Σ quantized(-ln P) / n_bigrams; docs with < 2 tokens
    have no bigrams and score NULL.

    Plan shape (all shuffles on n-gram/word keys, never on raw docs):
    one pass explodes bigrams; counts aggregate with map-side partial
    combine; prefix counts derive from the (much smaller) bigram count
    table, not a second corpus pass; V is a 1-row broadcast. The key
    cost lever: per-bigram NLL is finalized at the MODEL level (one
    row per DISTINCT bigram — the bgc⋈w1c join moves model-sized
    tables), so the instance-level bigram stream pays exactly ONE join
    against the finished model (joining instances against bgc and w1c
    separately doubled the corpus-sized shuffle work — 5.7s → see the
    stress table). At 100 TB the model tables are themselves large —
    they join (shuffle on key), they are never collected or broadcast.
    """
    bg = docs.select(
        F.col(id_col),
        F.explode(X.shingles(X.tokens(text_col), 2)).alias("bg"),
    )
    bgc = bg.groupBy("bg").agg(F.count("*").alias("c_bg"))
    w1c = (
        bgc.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c_bg").alias("c_w1"))
    )
    vocab = (
        docs.select(
            F.explode(X.tokens(text_col)).alias("w")
        )
        .agg(F.countDistinct("w").alias("v"))
    )
    p = (F.col("c_bg") + 1) / (F.col("c_w1") + F.col("v"))
    model = (
        bgc.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(w1c, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg", (-F.log(p)).cast("decimal(28,6)").alias("nll")
        )
    )
    scored = bg.join(model, "bg").select(F.col(id_col), "nll")
    st = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("nll").cast("double") / F.count("*")).alias("xent"),
    )
    return docs.select(id_col).join(st, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.col("xent"),
    )


def build_lm(
    docs: DataFrame,
    text_col: str,
    path: str,
) -> None:
    """Persist the add-one bigram model as a lake artifact —

    - ``<path>/bigrams``  — (bg, c_bg), shuffled/written on the bigram
      key (the table a 100-TB corpus produces is itself large);
    - ``<path>/prefixes`` — (w1, c_w1);
    - ``<path>/vocab``    — 1 row (v).

    Train once over the reference corpus, then score every incoming
    batch against the FROZEN model via `score_with_lm` — the CCNet
    deployment shape (the quality bar must not drift with each batch),
    and the same train-offline/apply-on-ingest split as
    `build_ivf_index` + `ivf_index_append`.
    """
    bg = docs.select(
        F.explode(X.shingles(X.tokens(text_col), 2)).alias("bg")
    )
    bgc = bg.groupBy("bg").agg(F.count("*").alias("c_bg"))
    bgc.write.mode("overwrite").parquet(f"{path}/bigrams")
    spark = docs.sparkSession
    (
        spark.read.parquet(f"{path}/bigrams")
        .groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c_bg").alias("c_w1"))
        .write.mode("overwrite")
        .parquet(f"{path}/prefixes")
    )
    (
        docs.select(F.explode(X.tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .write.mode("overwrite")
        .parquet(f"{path}/vocab")
    )


def score_with_lm(
    spark,
    path: str,
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, n_bigrams, xent): score a NEW batch against a frozen
    `build_lm` artifact. Join semantics generalize the in-corpus
    scorer to unseen text: a bigram missing from the model scores
    c_bg = 0 (P = 1/(c_w1+V)), an unseen prefix scores c_w1 = 0
    (P = 1/V) — exactly what add-one smoothing is for. On the training
    corpus itself this reproduces `bigram_lm_scores` bit-for-bit
    (tested). Scoring cost: two shuffles of the batch's bigrams
    against the model tables + the per-doc rollup; the model is read,
    never rebuilt."""
    bgc = spark.read.parquet(f"{path}/bigrams")
    w1c = spark.read.parquet(f"{path}/prefixes")
    vocab = spark.read.parquet(f"{path}/vocab")
    bg = docs.select(
        F.col(id_col),
        F.explode(X.shingles(X.tokens(text_col), 2)).alias("bg"),
    )
    # seen-bigram NLL is finalized at the model level (one row per
    # distinct model bigram), so the instance stream joins the
    # finished model once; only the MISSES — unseen bigrams, the
    # minority on in-distribution ingest — take the prefix-fallback
    # join (same split-by-hit shape as incremental_dedup's tiers)
    model = (
        bgc.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(w1c, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            (-F.log((F.col("c_bg") + 1) / (F.col("c_w1") + F.col("v"))))
            .cast("decimal(28,6)")
            .alias("nll"),
        )
    )
    inst = bg.join(model, "bg", "left")
    hits = inst.filter(F.col("nll").isNotNull()).select(
        F.col(id_col), "nll"
    )
    miss_p = 1 / (F.coalesce("c_w1", F.lit(0)) + F.col("v"))
    misses = (
        inst.filter(F.col("nll").isNull())
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(w1c, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (-F.log(miss_p)).cast("decimal(28,6)").alias("nll"),
        )
    )
    scored = hits.unionByName(misses)
    st = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("nll").cast("double") / F.count("*")).alias("xent"),
    )
    return docs.select(id_col).join(st, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.col("xent"),
    )


def _dsir_bucket(col: "F.Column", n_buckets: int) -> "F.Column":
    """Stable bigram feature bucket in [0, n_buckets): 32 bits of md5
    (the engine-shared hash) reduced mod the feature-space size."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def dsir_feature_table(
    target_docs: DataFrame,
    source_docs: DataFrame,
    text_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """(b, w): the DSIR Δ-log-weight feature table — per hash bucket,
    quantized ln p_target(b) − ln p_source(b) under add-one
    multinomials over the fixed ``n_buckets`` feature space. Exactly
    ``n_buckets`` rows (a full bucket spine left-joins the counts), so
    it always broadcasts; persist it with `build_dsir` and score any
    stream/batch against the FROZEN table via `score_with_dsir` — the
    same train-offline/apply-on-ingest split as `build_lm` +
    `score_with_lm`. ``w`` is exact DECIMAL (each ln quantized to
    DECIMAL(28,6) — module docstring), so a parquet round-trip is
    bit-faithful."""
    spark = target_docs.sparkSession

    def counts(docs: DataFrame, name: str) -> DataFrame:
        bg = docs.select(
            F.explode(X.shingles(X.tokens(text_col), 2)).alias("bg")
        )
        return bg.groupBy(
            _dsir_bucket(F.col("bg"), n_buckets).alias("b")
        ).agg(F.count(F.lit(1)).alias(name))

    spine = spark.range(n_buckets).select(F.col("id").alias("b"))
    tc = spine.join(counts(target_docs, "ct"), "b", "left").select(
        "b", F.coalesce("ct", F.lit(0)).alias("ct")
    )
    sc = spine.join(counts(source_docs, "cs"), "b", "left").select(
        "b", F.coalesce("cs", F.lit(0)).alias("cs")
    )
    tt = tc.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    ts = sc.agg(F.coalesce(F.sum("cs"), F.lit(0)).alias("ts"))
    nb = F.lit(n_buckets)
    return (
        tc.join(sc, "b")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(ts))
        .select(
            "b",
            (
                F.log((F.col("ct") + 1) / (F.col("tt") + nb)).cast(
                    "decimal(28,6)"
                )
                - F.log((F.col("cs") + 1) / (F.col("ts") + nb)).cast(
                    "decimal(28,6)"
                )
            ).alias("w"),
        )
    )


def build_dsir(
    target_docs: DataFrame,
    source_docs: DataFrame,
    text_col: str,
    path: str,
    n_buckets: int = 4096,
) -> None:
    """Persist the DSIR feature table as a lake artifact (one parquet
    of ``n_buckets`` rows). Refreshing it is an offline rebuild + new
    path, never an in-stream retrain."""
    dsir_feature_table(
        target_docs, source_docs, text_col, n_buckets
    ).write.mode("overwrite").parquet(path)


def score_with_dsir(
    feats: DataFrame,
    score_docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """(id, n_bigrams, dsir_logratio) against a FROZEN feature table
    ((b, w) from `dsir_feature_table` / `build_dsir`). The feature
    space size defaults to the table's OWN row count (the spine always
    materializes every bucket), so a scorer can never silently
    mis-bucket against a table built with a different ``n_buckets``.
    The table broadcasts, so the scored corpus pays one map-side join
    + one per-doc rollup; no-bigram docs score NULL."""
    if n_buckets is None:
        n_buckets = feats.count()
    inst = score_docs.select(
        F.col(id_col),
        F.explode(X.shingles(X.tokens(text_col), 2)).alias("bg"),
    ).select(F.col(id_col), _dsir_bucket(F.col("bg"), n_buckets).alias("b"))
    per = (
        inst.join(F.broadcast(feats), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("w").alias("sw"),
        )
    )
    return (
        score_docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) == 0,
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.col("sw").cast("double") / F.col("n_bigrams")
            )
            .alias("dsir_logratio"),
        )
    )


def dsir_logratio(
    target_docs: DataFrame,
    source_docs: DataFrame,
    score_docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """(id, n_bigrams, dsir_logratio): Data Selection via Importance
    Resampling (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling") over hashed bigram features — the
    per-document log importance weight

        mean over bigram instances of  ln p_target(b) − ln p_source(b)

    where ``b`` is the bigram's hash bucket and each model is an
    add-one multinomial over the ``n_buckets`` fixed buckets:
    p(b) = (c(b) + 1) / (total + n_buckets). Hashed features are
    DSIR's own device and also remove the unseen-n-gram asymmetry: a
    fixed feature space needs no OOV fallback in either model. Docs
    scoring high look like the target distribution (select / upweight
    them); ≤ 1-token docs have no bigrams and score NULL (no
    evidence — the same convention as `bigram_lm_scores`, never a
    sentinel 0.0 that would read as "exactly neutral").

    Composition of `dsir_feature_table` (train) + `score_with_dsir`
    (apply) in one plan — the one-shot batch face; streaming ingest
    uses the same pieces against a `build_dsir` artifact.

    Scale: both models reduce to ``n_buckets`` rows — the feature
    table (bucket, Δ-log-weight) is a BROADCAST, so the scored corpus
    pays one map-side join and one per-doc rollup; nothing
    corpus-sized shuffles on a model key (the bounded-model
    counterpart to `bigram_lm_scores`, whose open-vocabulary tables
    must shuffle-join). Determinism: the count ratios are exact
    integer ratios, each ln() is quantized to DECIMAL(28,6) in the
    4096-row model table (ln is not cross-engine bit-stable — module
    docstring), the Δ and the per-doc sum are exact decimal math, and
    the mean is the raw double quotient.
    """
    return score_with_dsir(
        dsir_feature_table(target_docs, source_docs, text_col, n_buckets),
        score_docs,
        id_col,
        text_col,
        n_buckets,
    )


def skipgram_pmi(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 2,
    min_count: int = 5,
) -> DataFrame:
    """(tok_a, tok_b, n_pair, n_a, n_b, pmi) — skip-gram co-occurrence
    PMI over a ±``window`` token context: the word2vec/SGNS
    preprocessing table (Mikolov et al. 2013; Levy & Goldberg 2014
    showed SGNS factorizes exactly this shifted-PMI matrix), and the
    corpus-level collocation panel x72 computes for BASKETS applied to
    token CONTEXTS — "which words keep company", the input to
    embedding training, phrase mining, and tokenizer-merge decisions.

        pmi(a,b) = ln( n_ab · N_tok² / (N_pairs · n_a · n_b) )

    with n_ab the unordered co-occurrence events at distance ≤ w,
    n_a/n_b corpus unigram counts, N_tok total tokens, N_pairs total
    events. Pairs below ``min_count`` are dropped BEFORE the marginal
    joins (rare-pair PMI is noise — the standard SGNS floor — and the
    filter shrinks the join input).

    Exactness: counts exact BIGINTs; the ratio cross-multiplies in
    DECIMAL(38,0) (n_ab·N_tok² caps ~1e36 at 1e12 tokens) and divides
    once in IEEE doubles; the single ln is quantized to DECIMAL(18,6)
    (the x72 rule — JVM vs libm ln diverges 1 ulp on integer ratios;
    the oracle VARCHAR-hops its casts per the u17 rule) and emitted
    through finalize_output's decimal→double. Empty-string tokens are
    excluded in both engines (x87's rule).

    Scale: pair GENERATION is the shingles zip-shift trick (w shifted
    zips per document — map-side, never a positional self-join of the
    exploded corpus, which would shuffle corpus×w rows on doc id);
    ONE pair-keyed count shuffle bounded by observed-pair vocabulary;
    two token-keyed marginal joins against the unigram table (both
    vocabulary-sized); 1-row totals broadcast."""
    from ods_to_datalake_spark.functions import text as X

    tok = F.filter(X.tokens(text_col), lambda t: t != F.lit(""))
    # raw (left, right) first, filter the null-padded tail, THEN the
    # unordered (least, greatest) map: least/greatest SKIP nulls in
    # Spark, so ordering before the null filter would fabricate
    # self-pairs at every array tail
    shifted_pairs = [
        F.transform(
            F.filter(
                F.zip_with(
                    tok,
                    F.slice(
                        tok,
                        k + 1,
                        F.greatest(F.size(tok) - k, F.lit(1)),
                    ),
                    lambda a, b: F.struct(
                        a.alias("ra"), b.alias("rb")
                    ),
                ),
                lambda s: s.getField("rb").isNotNull(),
            ),
            lambda s: F.struct(
                F.least(
                    s.getField("ra"), s.getField("rb")
                ).alias("ta"),
                F.greatest(
                    s.getField("ra"), s.getField("rb")
                ).alias("tb"),
            ),
        )
        for k in range(1, window + 1)
    ]
    pairs = docs.select(
        F.explode(F.flatten(F.array(*shifted_pairs))).alias("p")
    ).select(F.col("p.ta").alias("tok_a"), F.col("p.tb").alias("tok_b"))
    pair_counts = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .localCheckpoint(eager=True)  # feeds the totals agg AND the
        # marginal joins (the x25 rule; observed-pair-vocab-sized)
    )
    uni = (
        docs.select(F.explode(tok).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)  # feeds N_tok agg + two joins
    )
    totals = uni.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("__nt")
    ).crossJoin(
        pair_counts.agg(
            F.coalesce(F.sum("n_pair"), F.lit(0))
            .cast("long")
            .alias("__np")
        )
    )
    d38 = "decimal(38,0)"
    kept = pair_counts.where(F.col("n_pair") >= min_count)
    out = (
        kept.join(
            uni.select(
                F.col("t").alias("tok_a"), F.col("n").alias("n_a")
            ),
            "tok_a",
        )
        .join(
            uni.select(
                F.col("t").alias("tok_b"), F.col("n").alias("n_b")
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    num = (
        F.col("n_pair").cast(d38)
        * F.col("__nt").cast(d38)
        * F.col("__nt").cast(d38)
    ).cast("double")
    den = (
        F.col("__np").cast(d38)
        * F.col("n_a").cast(d38)
        * F.col("n_b").cast(d38)
    ).cast("double")
    return out.select(
        "tok_a",
        "tok_b",
        "n_pair",
        "n_a",
        "n_b",
        F.log(num / den).cast("decimal(18,6)").alias("pmi"),
    )
