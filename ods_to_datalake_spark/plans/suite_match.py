"""Matching & fusion suite (round 7): exact set-similarity join with
prefix filtering (x60), blocked fuzzy-string entity matching (x61),
per-source score normalization (x62), and lexical ⊕ semantic hybrid
retrieval via reciprocal-rank fusion (x63).

These close the LSH-free leg of the near-dup/search stack: x60 is the
EXACT counterpart of the MinHash/LSH candidate pipeline (same answers,
no recall loss, candidate-bounded by the prefix-filter theorem), x61 is
the entity-resolution primitive (blocking + edit-distance verify), x62
normalizes quality signals for cross-source comparability, and x63
fuses the x56 BM25 ranking with the x07 cosine ranking — the standard
hybrid-retrieval baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.functions import vectors as V
from ods_to_datalake_spark.operators.matching import (
    blocked_fuzzy_join,
    set_similarity_join,
)
from ods_to_datalake_spark.operators.retrieval import (
    bm25_scores,
    rrf_fuse,
    sql_bm25_weight,
)
from ods_to_datalake_spark.operators.similarity import brute_force_topk
from ods_to_datalake_spark.plans.sql_fragments import SQL_TOKENS
from ods_to_datalake_spark.plans.suite import register

# x60: Jaccard >= 9/10 (all-integer cross-multiplied in both engines)
SSJ_NUM, SSJ_DEN = 9, 10

# x63: fuse the top-20 of each ranking, emit the fused top-10
RRF_POOL = 20
RRF_TOPK = 10
RRF_C = 60
RRF_QUERY_VEC = 0  # query = embedding of vec_id 0
RRF_TERMS = ["dup", "the", "vector", "zzzunseen"]  # x56's mixed-df set


@register(
    "x60_set_similarity_join",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
      ) AS _u WHERE token <> ''
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
      FROM toks GROUP BY doc_id
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS dfr
      FROM toks GROUP BY token
    ),
    ranked AS (
      SELECT t.doc_id, t.token, s.sz,
             ROW_NUMBER() OVER (
               PARTITION BY t.doc_id ORDER BY d.dfr, t.token
             ) AS rn
      FROM toks t JOIN dfreq d USING (token) JOIN sizes s USING (doc_id)
    ),
    prefix AS (
      SELECT doc_id, token FROM ranked
      WHERE rn <= sz - (({SSJ_NUM}*sz + {SSJ_DEN} - 1) // {SSJ_DEN}) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.token = b.token AND a.doc_id < b.doc_id
    ),
    ov AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS overlap
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.doc_a
      JOIN toks tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT ov.doc_a, ov.doc_b, overlap,
           sa.sz AS size_a, sb.sz AS size_b,
           CAST(overlap AS DOUBLE) /
             CAST(sa.sz + sb.sz - overlap AS DOUBLE) AS jaccard
    FROM ov
    JOIN sizes sa ON sa.doc_id = ov.doc_a
    JOIN sizes sb ON sb.doc_id = ov.doc_b
    WHERE overlap * ({SSJ_DEN} + {SSJ_NUM})
          >= {SSJ_NUM} * (sa.sz + sb.sz)
    """,
    doc=f"Exact set-similarity self-join at Jaccard >= "
    f"{SSJ_NUM}/{SSJ_DEN} via prefix filtering (PPJoin family, Xiao "
    "et al. WWW'08): global rarest-first token ranking, equi-join on "
    "prefix tokens only, candidate-bounded exact verify — the "
    "LSH-free near-dup path with ZERO recall loss. Prefix tokens are "
    "by construction a document's rarest, so join buckets are bounded "
    "by rare-token df (stop-words never enter a prefix — the inverse "
    "of the LSH degenerate-bucket problem). Verified against the "
    "all-pairs brute force at registration (51,493 = 51,493 pairs at "
    "t=0.7 before tightening to 0.9). The pair-dense synthetic corpus "
    "makes OUTPUT size quadratic — a data artifact, like x04's "
    "amplified-corpus cell, not a plan property.",
)
def x60_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return set_similarity_join(
        cat.table("documents"), "doc_id", "text", SSJ_NUM, SSJ_DEN
    )


@register(
    "x61_fuzzy_name_match",
    oracle="""
    WITH v AS (
      -- ASCII-only oracle domain: DuckDB levenshtein counts BYTES
      -- ('é' -> 2 edits) while Spark counts codepoints (1) — measured
      -- divergence on any non-ASCII name; the operator keeps Spark's
      -- codepoint semantics, the registered query pins the comparable
      -- subset (see CLAUDE.md cross-engine notes)
      SELECT DISTINCT c_name AS w FROM customer
      WHERE c_name IS NOT NULL AND regexp_matches(c_name, '^[ -~]*$')
    ),
    b AS (
      SELECT w, substring(w, 1, length(w) - 2) AS blk FROM v
    ),
    pairs AS (
      SELECT DISTINCT a.w AS w1, b2.w AS w2
      FROM b a JOIN b b2 ON a.blk = b2.blk AND a.w < b2.w
    )
    SELECT w1, w2, CAST(levenshtein(w1, w2) AS BIGINT) AS dist
    FROM pairs WHERE levenshtein(w1, w2) <= 1
    """,
    doc="Blocked fuzzy entity matching over customer names: "
    "deletion-neighborhood blocking (drop the last 2 chars) bounds "
    "candidate pairs to same-prefix blocks, then JVM-side Levenshtein "
    "verifies dist <= 1 — the entity-resolution primitive (blocking + "
    "edit-distance verify) with |block|^2 work per key instead of "
    "|corpus|^2, and block keys that distribute across the cluster. "
    "Generic multi-pass prefix/suffix blocking lives in "
    "operators/matching.blocked_fuzzy_join.",
)
def x61_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    names = (
        cat.table("customer")
        .select("c_name")
        # ASCII-only comparable domain — see the oracle comment
        .where(F.col("c_name").rlike(r"^[\x20-\x7e]*$"))
    )
    return blocked_fuzzy_join(
        names,
        "c_name",
        max_dist=1,
        block_fns=[lambda w: F.expr("substring(w, 1, length(w) - 2)")],
    )


@register(
    "x62_score_normalize",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, n_chars FROM documents
      WHERE n_chars IS NOT NULL
    ),
    stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(n_chars * n_chars) AS BIGINT) AS DOUBLE) AS sxx
      FROM d GROUP BY source
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
             CAST(RANK() OVER (
               PARTITION BY source ORDER BY n_chars
             ) AS BIGINT) AS rnk
      FROM d
    )
    SELECT r.doc_id, r.source, r.n_chars,
           CASE WHEN s.n = 1 THEN 0.0
                ELSE CAST(r.rnk - 1 AS DOUBLE) / CAST(s.n - 1 AS DOUBLE)
           END AS pct_rank,
           CASE WHEN sqrt(greatest(
                  sxx / CAST(s.n AS DOUBLE)
                  - (sx / CAST(s.n AS DOUBLE)) * (sx / CAST(s.n AS DOUBLE)),
                  0.0)) = 0.0 THEN NULL
                ELSE (CAST(r.n_chars AS DOUBLE) - sx / CAST(s.n AS DOUBLE))
                     / sqrt(greatest(
                         sxx / CAST(s.n AS DOUBLE)
                         - (sx / CAST(s.n AS DOUBLE))
                           * (sx / CAST(s.n AS DOUBLE)),
                         0.0))
           END AS z_score
    FROM ranked r JOIN stats s ON r.source = s.source
    """,
    doc="Per-source score normalization for cross-source curation "
    "thresholds: exact percentile rank ((rank-1)/(n-1), rank-based so "
    "ties agree cross-engine) and z-score from integer-exact Σx/Σx² "
    "sums (variance in a FIXED double op order, sqrt is correctly "
    "rounded IEEE in both engines, σ=0 groups yield NULL under the "
    "ANSI guard). One shuffle on source for the stats, one window "
    "sort — map-side partial aggregates; the stats side broadcasts.",
)
def x62_score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    d = (
        cat.table("documents")
        .where(F.col("n_chars").isNotNull())
        .select("doc_id", "source", "n_chars")
    )
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").cast("double").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("long")
        .cast("double")
        .alias("sxx"),
    )
    ranked = d.withColumn(
        "rnk",
        F.rank()
        .over(Window.partitionBy("source").orderBy("n_chars"))
        .cast("long"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sx") / n_d
    std = F.sqrt(
        F.greatest(F.col("sxx") / n_d - mean * mean, F.lit(0.0))
    )
    return ranked.join(F.broadcast(stats), "source").select(
        "doc_id",
        "source",
        "n_chars",
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("rnk") - 1).cast("double") / (F.col("n") - 1).cast("double")
        )
        .alias("pct_rank"),
        F.when(std == 0.0, F.lit(None).cast("double"))
        .otherwise((F.col("n_chars").cast("double") - mean) / std)
        .alias("z_score"),
    )


_SQL_RRF_TERMS = ", ".join(f"'{t}'" for t in RRF_TERMS)

# x07's cosine fragment, fixed single query vector
_SQL_RRF_COS = (
    "ROUND(list_dot_product(qv, cv) / "
    "NULLIF((sqrt(list_dot_product(qv, qv)) * "
    "sqrt(list_dot_product(cv, cv))), 0), 6)"
)


@register(
    "x63_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
      ) AS _u WHERE token <> ''
    ),
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
      FROM toks WHERE token IN ({_SQL_RRF_TERMS})
      GROUP BY doc_id, token
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t
      FROM tf GROUP BY token
    ),
    bm AS (
      SELECT tf.doc_id, SUM({sql_bm25_weight()}) AS bm25
      FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    bm_ranked AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY bm25 DESC, doc_id
      ) AS BIGINT) AS rank_0
      FROM bm QUALIFY rank_0 <= {RRF_POOL}
    ),
    q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}
    ),
    c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings WHERE vec_id <> {RRF_QUERY_VEC}
    ),
    cos_ranked AS (
      SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER (
        ORDER BY {_SQL_RRF_COS} DESC, vec_id
      ) AS BIGINT) AS rank_1
      FROM c, q QUALIFY rank_1 <= {RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, e.doc_id) AS doc_id,
             b.rank_0, e.rank_1,
             COALESCE(1.0 / ({RRF_C}.0 + CAST(b.rank_0 AS DOUBLE)), 0.0)
             + COALESCE(1.0 / ({RRF_C}.0 + CAST(e.rank_1 AS DOUBLE)), 0.0)
               AS rrf
      FROM bm_ranked b FULL OUTER JOIN cos_ranked e
        ON b.doc_id = e.doc_id
    )
    SELECT doc_id, rank_0, rank_1, rrf FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
    """,
    doc=f"Hybrid retrieval: reciprocal-rank fusion (Cormack SIGIR'09) "
    f"of the BM25 top-{RRF_POOL} (x56's decimal-exact ranking over the "
    f"mixed-df term set) and the cosine top-{RRF_POOL} for query "
    f"vector {RRF_QUERY_VEC} (x07's rounded-cosine ranking), fused as "
    f"Σ 1/({RRF_C}+rank) with id tiebreak. The fusion join moves two "
    "k-row lists — driver-scale no matter the corpus; each leg keeps "
    "its own scale story (term-filtered scoring, broadcast query "
    "vector, TakeOrderedAndProject top-k).",
)
def x63_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    emb = cat.table("embeddings")
    bm = (
        bm25_scores(docs, "doc_id", "text", RRF_TERMS)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "rank")
    )
    queries = emb.where(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.lit(RRF_QUERY_VEC).alias("query_id"), "embedding"
    )
    cos = (
        brute_force_topk(emb, queries, "vec_id", "embedding", RRF_POOL)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
            ),
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([bm, cos], "doc_id", RRF_TOPK, c=RRF_C)


CONT_NUM, CONT_DEN = 19, 20


@register(
    "x82_containment_join",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
      ) AS _u WHERE token <> ''
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
      FROM toks GROUP BY doc_id
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS dfr
      FROM toks GROUP BY token
    ),
    ranked AS (
      SELECT t.doc_id, t.token, s.sz,
             ROW_NUMBER() OVER (
               PARTITION BY t.doc_id ORDER BY d.dfr, t.token
             ) AS rn
      FROM toks t JOIN dfreq d USING (token) JOIN sizes s USING (doc_id)
    ),
    prefix AS (
      SELECT doc_id, token FROM ranked
      WHERE rn <= sz
            - (({CONT_NUM}*sz + {CONT_DEN} - 1) // {CONT_DEN}) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN toks b
        ON a.token = b.token AND a.doc_id <> b.doc_id
    ),
    ov AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS overlap
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.doc_a
      JOIN toks tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT ov.doc_a, ov.doc_b, overlap,
           sa.sz AS size_a, sb.sz AS size_b,
           CAST(overlap AS DOUBLE) / CAST(sa.sz AS DOUBLE)
             AS containment
    FROM ov
    JOIN sizes sa ON sa.doc_id = ov.doc_a
    JOIN sizes sb ON sb.doc_id = ov.doc_b
    WHERE overlap * {CONT_DEN} >= {CONT_NUM} * sa.sz
    """,
    doc=f"Exact set-CONTAINMENT join at |a∩b|/|a| >= "
    f"{CONT_NUM}/{CONT_DEN} — the asymmetric sibling of x60's "
    "Jaccard join: quote/excerpt/subset detection, which a symmetric "
    "threshold structurally misses (a 20-token quote inside a "
    "2000-token page has J≈0.01 but containment 1.0 — exactly the "
    "doc-in-doc duplication a training corpus wants found before "
    "the page and its fragment both ship). ORDERED pairs, doc_a the "
    "contained side. Prefix filter on the CONTAINED side only (the "
    "required overlap ceil(t·|a|) depends only on |a| — the same "
    "shared `_prefix_table` rule as x60), container indexed on ALL "
    "tokens (|b| is unbounded, no prefix shrinks it — worse skew by "
    "construction, which `max_token_bucket` + "
    "`oversized_container_tokens` guard at 100 TB; registered form "
    "uncapped, oracle exact). All-integer threshold math; "
    "containment one IEEE division. "
    "operators/matching.containment_join.",
)
def x82_containment_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.matching import (
        containment_join,
    )

    cat = load_testdata(spark, sf_dir)
    return containment_join(
        cat.table("documents"), "doc_id", "text", CONT_NUM, CONT_DEN
    )
