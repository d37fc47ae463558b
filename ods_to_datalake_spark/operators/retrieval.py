"""Keyword retrieval: inverted index + Okapi BM25 ranking.

The reference's query surface is columnar scans and joins
(pyspark_utilities.py's filter/join shapes); a training-data pipeline
additionally needs *lexical* retrieval — fuzzy decontamination against
benchmark suites, boilerplate hunting, and quality triage are all
keyword lookups, and BM25 (Robertson & Zaragoza 2009) is the standard
baseline next to the embedding ANN family in `operators/similarity.py`.

Relational design, not a search-engine port:

- the inverted index is a plain aggregate over the exploded
  (token, doc) stream — one shuffle keyed by token with map-side
  partial combine; posting lists are built per token, never collected
  to the driver, and persist as an ordinary parquet lake artifact.
- stop-word skew is the classic failure: a universal token's posting
  list is corpus-sized in ONE group. `max_df` prunes those rows after
  the (token, doc) aggregate (where the data is already one row per
  doc, not one per occurrence) — the same opt-in width-guard pattern
  as `dedup.cap_bucket_width`.
- BM25 never materializes the index for scoring: term statistics
  (df) aggregate from the tf table itself, the corpus stats are a
  1-row broadcast, and only tokens IN the query-term list survive the
  first filter — at 100 TB the scored stream is |terms ∩ corpus|
  rows per document, not the corpus token stream.

Cross-engine determinism (the x38 rules, see operators/lm.py): idf's
ln() is NOT bit-stable across engines, so each (doc, term) weight is
quantized to DECIMAL(28,6) before the per-document sum; decimal sums
are exact and order-independent, ranking compares decimals, doc_id
breaks ties, and the final column is emitted as DOUBLE by
``finalize_output``/``double_cols``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import text as X

BM25_K1 = 1.2
BM25_B = 0.75


def _doc_term_freqs(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(``_doc``, token, tf) for non-empty whitespace tokens."""
    return (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(X.tokens(text_col)).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("_doc", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
) -> DataFrame:
    """Corpus inverted index: one row per token with document frequency
    ``df``, collection frequency ``cf``, and ``postings`` — the
    doc-ordered ``"id:tf"`` posting list as a single string (sorted by
    the unique doc id, so the fold is deterministic in any engine).

    Two shuffles total: (doc, token) tf aggregate, then the token-level
    fold — both with map-side partials. ``max_df`` drops tokens present
    in more than that many documents (stop-word elision): a universal
    token's posting group is corpus-sized and un-splittable, the same
    degenerate-bucket shape `dedup.cap_bucket_width` guards. Like that
    guard, the prune happens BEFORE the expensive fold — over-wide
    tokens are identified by a cheap count-only aggregate and
    anti-joined out of the tf stream (the over-wide list is tiny:
    stop-words), so the corpus-sized posting group is never built,
    not built-then-discarded.
    """
    tf = _doc_term_freqs(docs, id_col, text_col)
    if max_df is not None:
        over_wide = (
            tf.groupBy("token")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > F.lit(int(max_df)))
            .select("token")
        )
        tf = tf.join(over_wide, "token", "left_anti")
    idx = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("_doc").alias("d"),
                            F.col("tf").alias("t"),
                        )
                    )
                ),
                lambda s: F.concat_ws(":", s["d"], s["t"]),
            ),
            " ",
        ).alias("postings"),
    )
    return idx


def _dbl(c: str) -> Column:
    return F.col(c).cast("double")


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Per-document Okapi BM25 over ``query_terms``: (id, n_hits,
    bm25) for every document matching >= 1 term, where

        bm25 = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t) = ln(1 + (N − df + 0.5) / (df + 0.5))

    Plan shape: the exploded token stream is filtered to the query
    terms FIRST (a tiny IN-list the scan can push), so every aggregate
    and join downstream moves |matching (doc, term)| rows; df comes
    from the tf table (no second corpus pass); N/avgdl is a 1-row
    broadcast. Each term weight is ``DECIMAL(28,6)``-quantized before
    the per-doc sum (ln is not cross-engine bit-stable — see module
    docstring); callers rank by the exact decimal and emit DOUBLE.

    The doc-length table ``dl`` intentionally counts ALL tokens (the
    BM25 normalizer), so one full-corpus aggregate remains — it is a
    2-column (id, long) map-side-combined rollup, the cheapest possible
    full pass, and at 100 TB it is the piece you precompute once per
    snapshot and reuse across every query.
    """
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(X.tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    dl = toks.groupBy("_doc").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.sum("dl").cast("long").alias("total_len"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    terms = [str(t) for t in query_terms]
    tf = (
        toks.where(F.col("token").isin(terms))
        .groupBy("_doc", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df_t")
    )
    # identical floating-point op ORDER in the DuckDB oracle
    # (sql_bm25_weight) — any re-association changes the rounding
    idf = F.log(
        F.lit(1.0)
        + (_dbl("n_docs") - _dbl("df_t") + F.lit(0.5))
        / (_dbl("df_t") + F.lit(0.5))
    )
    avgdl = _dbl("total_len") / _dbl("n_docs")
    norm = F.lit(float(k1)) * (
        F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * (_dbl("dl") / avgdl)
    )
    tfn = (_dbl("tf") * F.lit(float(k1) + 1.0)) / (_dbl("tf") + norm)
    scored = (
        tf.join(dfreq, "token")
        .join(dl, "_doc")
        .join(F.broadcast(stats))
        .select(
            "_doc",
            (idf * tfn).cast("decimal(28,6)").alias("w"),
        )
    )
    return scored.groupBy("_doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.sum("w").alias("bm25"),
    ).select(F.col("_doc").alias(id_col), "n_hits", "bm25")


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Global top-``k`` documents by BM25, ties broken by the unique
    doc id — a TakeOrderedAndProject (per-partition top-k, then a
    k-row merge on the driver), never a full sort."""
    return (
        bm25_scores(docs, id_col, text_col, query_terms, k1=k1, b=b)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(int(k))
    )


def sql_bm25_weight(k1: float = BM25_K1, b: float = BM25_B) -> str:
    """The per-(doc, term) weight as ANSI SQL with the SAME literal
    doubles and op order as :func:`bm25_scores` (Python ``repr`` of the
    float guarantees both engines parse the identical IEEE value);
    expects columns n_docs, df_t, tf, dl, total_len in scope."""
    rk1, rb, rk1p1 = repr(float(k1)), repr(float(b)), repr(float(k1) + 1.0)
    idf = (
        "ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)"
        " / (CAST(df_t AS DOUBLE) + 0.5))"
    )
    avgdl = "(CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    norm = f"{rk1} * (1.0 - {rb} + {rb} * (CAST(dl AS DOUBLE) / {avgdl}))"
    tfn = f"(CAST(tf AS DOUBLE) * {rk1p1}) / (CAST(tf AS DOUBLE) + {norm})"
    return f"CAST(({idf}) * ({tfn}) AS DECIMAL(28,6))"


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    k: int,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of ranked
    lists: each input carries (id_col, rank); the fused score is
    Σ 1/(c + rank) over the lists an id appears in, and the output is
    the global top-``k`` by (rrf DESC, id) with per-list ranks kept
    as nullable ``rank_0..rank_{n-1}`` columns.

    The standard lexical ⊕ semantic hybrid: BM25 and ANN rankings
    disagree precisely on the documents worth inspecting, and rank
    fusion needs no score calibration between a decimal BM25 and a
    cosine. Each addend is one double division on identical integers
    (bit-stable cross-engine); the inputs are top-k lists, so the
    fusion joins k-row frames — driver-scale regardless of corpus
    size.
    """
    fused = None
    for i, r in enumerate(rankings):
        part = r.select(
            F.col(id_col), F.col("rank").cast("long").alias(f"rank_{i}")
        )
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    score = None
    for i in range(len(rankings)):
        addend = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0),
        )
        score = addend if score is None else score + addend
    return (
        fused.withColumn("rrf", score)
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(int(k))
    )


def phrase_match(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str | None = None,
    n: int = 2,
) -> DataFrame:
    """(doc_id, phrase, n_matches) — exact position-verified phrase
    retrieval: which documents contain the n-word phrase VERBATIM
    (adjacent tokens, in order) and how many times — the grep face of
    the retrieval family (x55/x56 rank by bag-of-words; a phrase
    query is the one thing a bag can't answer: "learning to rank"
    must not match "rank to learning"). The positional verification
    is FREE here: an n-token shingle IS its position-adjacency proof,
    so phrase occurrences = shingle-equality matches — no positional
    postings join, the x34/x16 shingle machinery reused verbatim
    (one n-gram definition corpus-wide).

    ``phrase=None`` retrieves the corpus's own TOP n-gram (max count,
    lexicographic tiebreak — deterministic, reproducible on any
    corpus); pass an explicit space-joined phrase for a real query.
    Only matching docs appear (no fabricated zero rows); NULL texts
    and sub-n-token docs shingle to nothing in both engines.

    Scale: the shingle stream is map-side generation; the phrase
    filter broadcasts ONE row against it (or a literal, when given),
    so the only shuffles are the n-gram count agg behind the argmax
    (vocabulary-bounded) and the per-doc match count. A standing
    phrase workload should build x55's index once instead —
    this is the ad-hoc path."""
    from ods_to_datalake_spark.functions import text as X

    bg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            X.shingles(X.tokens(text_col), n)
        ).alias("__bg"),
    )
    if phrase is None:
        top = (
            bg.groupBy("__bg")
            .agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col("__bg").asc())
            .limit(1)
            .select("__bg")
        )
        hits = bg.join(F.broadcast(top), "__bg")
    else:
        hits = bg.where(F.col("__bg") == F.lit(phrase))
    return hits.groupBy("doc_id", F.col("__bg").alias("phrase")).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )
