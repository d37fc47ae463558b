"""Retrieval suite: inverted index + BM25 keyword ranking (x55, x56).

Lexical retrieval is the third leg of the near-dup/search stack next
to hash dedup (`operators/dedup.py`) and embedding ANN
(`operators/similarity.py`): fuzzy benchmark decontamination, targeted
boilerplate hunts, and corpus debugging are all "find the documents
containing these terms, best first" queries. Both operators are plain
relational aggregates (see `operators/retrieval.py` for the 100-TB
shape notes: token-keyed shuffles with map-side partials, stop-word
`max_df` guard, query-term filter-first scoring, 1-row stats
broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.operators.retrieval import (
    bm25_topk,
    inverted_index,
    sql_bm25_weight,
)
from ods_to_datalake_spark.plans.sql_fragments import SQL_TOKENS
from ods_to_datalake_spark.plans.suite import register

# (doc_id, token) stream shared by both oracles — non-empty whitespace
# tokens, identical to operators/retrieval._doc_term_freqs's input
SQL_DOC_TOKS_CTE = f"""
    toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
      ) AS _u WHERE token <> ''
    )"""

# mixed document frequencies on the sf corpora: 'dup' is rare (~5% of
# docs), 'the'/'vector' are near-universal, 'zzzunseen' matches nothing
# (the absent-term path must contribute no rows, not a NULL weight)
QUERY_TERMS = ["dup", "the", "vector", "zzzunseen"]
TOP_K = 10


@register(
    "x55_inverted_index",
    oracle=f"""
    WITH {SQL_DOC_TOKS_CTE},
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, token
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS cf,
           array_to_string(
             list(concat(doc_id, ':', tf) ORDER BY doc_id), ' '
           ) AS postings
    FROM tf GROUP BY token
    """,
    doc="Corpus inverted index as a lake artifact: one row per token "
    "with document frequency, collection frequency, and the "
    "doc-ordered id:tf posting list folded to a string (unique doc id "
    "= deterministic fold in both engines). Two token-keyed shuffles "
    "with map-side partials, posting lists built per group and never "
    "collected; the opt-in max_df stop-word guard (not applied here — "
    "the oracle checks every token) caps the one un-splittable group "
    "a universal token would create.",
)
def x55_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return inverted_index(cat.table("documents"), "doc_id", "text")


@register(
    "x56_bm25_topk",
    oracle=f"""
    WITH {SQL_DOC_TOKS_CTE},
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      FROM toks GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS total_len,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM dl
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks
      WHERE token IN ('dup', 'the', 'vector', 'zzzunseen')
      GROUP BY doc_id, token
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t
      FROM tf GROUP BY token
    ),
    scored AS (
      SELECT tf.doc_id, {sql_bm25_weight()} AS w
      FROM tf
      JOIN dfreq USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           SUM(w) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT {TOP_K}
    """,
    double_cols=["bm25"],
    doc="Okapi BM25 top-10 over a mixed rare/common/absent term set — "
    "the lexical-retrieval baseline next to the cosine/ANN family "
    "(fuzzy decontamination, boilerplate hunts). The token stream is "
    "filtered to the query terms BEFORE any aggregate (downstream "
    "moves only matching doc-term rows, not the corpus), df derives from "
    "the tf table, N/avgdl is a 1-row broadcast, and the global top-k "
    "is TakeOrderedAndProject. Each term weight's ln() is quantized "
    "to DECIMAL(28,6) pre-sum (ln is not cross-engine bit-stable — "
    "the x38 rule), decimal-exact ranking, doc_id tiebreak.",
)
def x56_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return bm25_topk(
        cat.table("documents"), "doc_id", "text", QUERY_TERMS, k=TOP_K
    )


def _phrase_oracle() -> str:
    """x98: the top corpus bigram (max count, lexicographic tiebreak)
    phrase-matched per doc — shingle equality IS the position proof,
    via the same sql_shingles fragment as the span/chunk family."""
    from ods_to_datalake_spark.plans.sql_fragments import sql_shingles

    return f"""
    WITH bg AS (
      SELECT doc_id, unnest({sql_shingles(SQL_TOKENS, 2)}) AS bg
      FROM documents
    ),
    top AS (
      SELECT bg FROM (
        SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg
      ) AS _c ORDER BY c DESC, bg ASC LIMIT 1
    )
    SELECT b.doc_id, t.bg AS phrase,
           CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM bg b JOIN top t ON b.bg = t.bg
    GROUP BY b.doc_id, t.bg
    """


@register(
    "x98_phrase_match",
    oracle=_phrase_oracle(),
    doc="Exact position-verified phrase retrieval (the grep face of "
    "the retrieval family — x55/x56 rank bags of words; a phrase "
    "query is the one thing a bag can't answer): occurrences of the "
    "corpus's TOP bigram per doc, where an n-token shingle IS its "
    "own adjacency proof, so phrase matching is shingle equality — "
    "no positional-postings join, the span/chunk shingle machinery "
    "reused verbatim (one n-gram definition corpus-wide). The query "
    "phrase is data-derived (max count, lexicographic tiebreak — "
    "deterministic on any corpus); only matching docs appear; NULL "
    "and sub-2-token texts shingle to nothing in both engines. "
    "Map-side shingle stream; the phrase broadcasts ONE row against "
    "it; shuffles are the vocabulary-bounded bigram count agg and "
    "the per-doc match count. operators/retrieval.phrase_match.",
)
def x98_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.retrieval import phrase_match

    cat = load_testdata(spark, sf_dir)
    return phrase_match(cat.table("documents"), "doc_id", "text")
