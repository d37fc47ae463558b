"""Curation suite: the large-corpus curation shapes — exact-substring
span dedup + token-level rewrite (Lee et al. 2022), keep-first block
dedup (CCNet-shaped), product quantization (Jégou et al. 2011),
SemDeDup-style clustered semantic dedup (Abbas et al. 2023), and the
round-6 additions: temperature-smoothed mixture resampling (XLM-R
α-sampling), keep-best cluster canonicalization, cross-source
duplication provenance, train/eval split-leakage auditing, scored
benchmark decontamination, DSIR importance weighting (Xie et al.
2023), the Gopher quality-rule and repetition filters (Rae et al.
2021, both halves of A1.1), the C4 cleaning rules (Raffel et al.
2020), and the per-source quality report card that aggregates them.

Determinism strategy for the embedding queries: "training" artifacts
(PQ codebooks, semantic-dedup centroids) are seeded from the ks/k
lowest-vec_id corpus rows — a deterministic choice both engines can
derive — and the nearest-centroid argmin relies on the bit-identical
IEEE fold documented at `similarity.nearest_centroid` (Spark's
zip_with/aggregate vs DuckDB's list_dot_product over an element-wise
diff list replay the same op order), so assignments match with no
rounding epsilon. The real k-means path (`pq_train`, `kmeans_assign`)
is property-tested in pytest; these oracles pin the seeded instance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.plans.sql_fragments import (
    NEAR_DUP_TAU,
    SQL_TOKENS,
    sql_shingles as _sql_shingles,
)
from ods_to_datalake_spark.plans.suite import register

# exact-substring span length (tokens). Lee et al. use 50-token spans on
# web text; the synthetic corpus averages ~60 tokens per doc, so 5 keeps
# the span/doc ratio comparable.
SPAN_N = 5
# disjoint block width for the keep-first rewrite
BLOCK_TOKENS = 16
# product quantization: 64-dim vectors → 4 subspaces × 16 dims, 4
# codewords each (tiny ks for an exactly-pinned oracle; production uses
# ks=256 → 8-bit codes, same plan shape)
PQ_M = 4
PQ_KS = 4
PQ_SUB = 16
# semantic dedup: 8 seed centroids, same cosine threshold as x13/x14
SEM_K = 8
# IVF cell-balance audit: same seeded-centroid count (the audit reads
# an assignment's layout, so it shares x36's assignment arithmetic)
IVF_BAL_K = 8


@register(
    "x34_duplicate_spans",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS, SPAN_N)} AS sh
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(sh) AS s FROM t
    ), per AS (
      SELECT doc_id, md5(s) AS h, COUNT(*) AS c
      FROM ex GROUP BY doc_id, md5(s)
    ), tot AS (
      SELECT doc_id, c,
             CAST(SUM(c) OVER (PARTITION BY h) AS BIGINT) AS g
      FROM per
    ), st AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN g > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n_dup_spans
      FROM tot GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_spans, 0) AS n_spans,
           COALESCE(n_dup_spans, 0) AS n_dup_spans,
           CASE WHEN COALESCE(n_spans, 0) = 0 THEN 0.0
                ELSE CAST(n_dup_spans AS DOUBLE) / n_spans
           END AS dup_ratio
    FROM documents d LEFT JOIN st USING (doc_id)
    """,
    doc=f"Exact-substring dedup signal (Lee et al. 2022): per-doc count "
    f"and ratio of {SPAN_N}-token spans whose verbatim n-gram repeats "
    "anywhere in the corpus — shingle explode, groupBy (doc, span-hash), "
    "corpus totals attached by an AQE-skew-splittable join; the "
    "relational form of the suffix-array dedup workload.",
)
def x34_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import span_stats

    cat = load_testdata(spark, sf_dir)
    return span_stats(cat.table("documents"), "doc_id", "text", SPAN_N)


@register(
    "x39_span_rewrite",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks,
             {_sql_shingles(SQL_TOKENS, SPAN_N)} AS sh
      FROM documents
    ), sp AS (
      SELECT doc_id,
             CAST(generate_subscripts(sh, 1) - 1 AS INT) AS block_idx,
             unnest(sh) AS block
      FROM t
    ), flagged AS (
      SELECT doc_id, block_idx,
             ROW_NUMBER() OVER (
               PARTITION BY md5(block) ORDER BY doc_id, block_idx
             ) AS rn
      FROM sp
    ), removed AS (
      SELECT DISTINCT doc_id, block_idx + off AS tok_pos
      FROM flagged, range(0, {SPAN_N}) r(off)
      WHERE rn > 1
    ), tok AS (
      SELECT doc_id,
             CAST(generate_subscripts(toks, 1) - 1 AS INT) AS tok_pos,
             unnest(toks) AS tok
      FROM t
    ), refold AS (
      SELECT tok.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok.tok, ' ' ORDER BY tok.tok_pos)
               AS clean_text
      FROM tok ANTI JOIN removed
        ON tok.doc_id = removed.doc_id
       AND tok.tok_pos = removed.tok_pos
      GROUP BY tok.doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - COALESCE(r.n_kept, 0) AS BIGINT)
             AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM t LEFT JOIN refold r USING (doc_id)
    """,
    doc=f"Token-level duplicate-span REMOVAL (the rewrite half of Lee "
    f"et al. 2022 ExactSubstr; x34 is the signal half): every "
    f"{SPAN_N}-token window repeating anywhere in the corpus keeps "
    "only its (doc, position)-first occurrence; tokens covered by a "
    "non-first instance are deleted and docs re-assembled. Variable-"
    "length runs fall out by window composition — no block-boundary "
    "artifacts. Skew-safe keep-first (partial-agg on span hash + "
    "unique-key join), anti-join token stream, one per-doc refold.",
)
def x39_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import span_rewrite

    cat = load_testdata(spark, sf_dir)
    return span_rewrite(cat.table("documents"), "doc_id", "text", SPAN_N)


@register(
    "x37_block_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ), bl AS (
      SELECT doc_id,
             [array_to_string(
                toks[(i - 1) * {BLOCK_TOKENS} + 1 : i * {BLOCK_TOKENS}],
                ' ')
              for i in range(1,
                GREATEST(CAST(ceil(len(toks) / {BLOCK_TOKENS}.0)
                              AS BIGINT), 1) + 1)]
               AS block_list
      FROM t
    ), blocks AS (
      -- generate_subscripts + unnest: index-aligned, no arbitrary
      -- range cap (range(1, 10000) silently diverged past 10k blocks)
      SELECT doc_id,
             CAST(generate_subscripts(block_list, 1) - 1 AS INT)
               AS block_idx,
             unnest(block_list) AS block
      FROM bl
    ), flagged AS (
      SELECT doc_id, block_idx, block,
             ROW_NUMBER() OVER (
               PARTITION BY md5(block) ORDER BY doc_id, block_idx
             ) AS rn
      FROM blocks
    ), refold AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
             COALESCE(string_agg(CASE WHEN rn = 1 THEN block END,
                                 ' ' ORDER BY block_idx), '')
               AS clean_text
      FROM flagged GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_blocks, 0) AS n_blocks,
           COALESCE(n_kept, 0) AS n_kept,
           COALESCE(clean_text, '') AS clean_text
    FROM documents d LEFT JOIN refold USING (doc_id)
    """,
    doc=f"Keep-first block dedup (CCNet paragraph-dedup shape over "
    f"disjoint {BLOCK_TOKENS}-token blocks): every block's first "
    "corpus-wide occurrence (by doc_id, position) survives, later "
    "verbatim repeats are dropped, docs re-assemble from survivors — "
    "one shuffle on the block hash, one re-fold on doc_id.",
)
def x37_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import block_dedup

    cat = load_testdata(spark, sf_dir)
    return block_dedup(cat.table("documents"), "doc_id", "text", BLOCK_TOKENS)


_SQL_PQ_CB = f"""cb AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
               AS code, v
      FROM c ORDER BY vec_id LIMIT {PQ_KS}
    ), sub AS (
      SELECT code, m,
             v[m * {PQ_SUB} + 1 : m * {PQ_SUB} + {PQ_SUB}] AS cw
      FROM cb, (SELECT unnest(range(0, {PQ_M})) AS m)
    )"""


@register(
    "x35_pq_encode",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), {_SQL_PQ_CB}, dpre AS (
      SELECT c.vec_id, s.m, s.code,
             list_transform(
               list_zip(c.v[s.m * {PQ_SUB} + 1 : s.m * {PQ_SUB} + {PQ_SUB}],
                        s.cw),
               z -> z[1] - z[2]) AS dv
      FROM c CROSS JOIN sub s
    ), d AS (
      SELECT vec_id, m, code, list_dot_product(dv, dv) AS d2 FROM dpre
    ), best AS (
      SELECT vec_id, m, code, d2 FROM (
        SELECT vec_id, m, code, d2,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id, m ORDER BY d2, code
               ) AS rn
        FROM d
      ) WHERE rn = 1
    )
    SELECT vec_id,
           MAX(CASE WHEN m = 0 THEN code END) AS code_0,
           MAX(CASE WHEN m = 1 THEN code END) AS code_1,
           MAX(CASE WHEN m = 2 THEN code END) AS code_2,
           MAX(CASE WHEN m = 3 THEN code END) AS code_3,
           MAX(CASE WHEN m = 0 THEN d2 END)
             + MAX(CASE WHEN m = 1 THEN d2 END)
             + MAX(CASE WHEN m = 2 THEN d2 END)
             + MAX(CASE WHEN m = 3 THEN d2 END) AS recon_d2
    FROM best GROUP BY vec_id
    """,
    doc=f"Product quantization encode (Jégou et al. 2011): {PQ_M} "
    f"subspaces × {PQ_KS} seeded codewords, per-subspace nearest-"
    "codeword argmin (bit-identical IEEE fold both engines) + total "
    "squared reconstruction error — map-only, codebooks as plan "
    "literals; the compression tier under IVF-PQ ANN (pq_topk).",
)
def x35_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import (
        pq_encode,
        pq_seed_codebooks,
    )

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    books = pq_seed_codebooks(
        emb, "vec_id", "embedding", PQ_M * PQ_SUB, PQ_M, PQ_KS
    )
    return pq_encode(emb, "vec_id", "embedding", books)


@register(
    "x36_semantic_dedup",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cb AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
               AS cid, v AS cv
      FROM c ORDER BY vec_id LIMIT {SEM_K}
    ), dpre AS (
      SELECT c.vec_id, cb.cid,
             list_transform(list_zip(c.v, cb.cv), z -> z[1] - z[2]) AS dv
      FROM c CROSS JOIN cb
    ), d AS (
      SELECT vec_id, cid, list_dot_product(dv, dv) AS d2 FROM dpre
    ), assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY d2, cid
               ) AS rn
        FROM d
      ) WHERE rn = 1
    ), t AS (
      SELECT c.vec_id, c.v, a.cluster FROM c JOIN assign a USING (vec_id)
    ), dropped AS (
      SELECT DISTINCT b.vec_id FROM t a JOIN t b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.v, b.v) /
                  NULLIF((sqrt(list_dot_product(a.v, a.v)) *
                   sqrt(list_dot_product(b.v, b.v))), 0), 6)
              >= {NEAR_DUP_TAU}
    )
    SELECT t.vec_id, t.cluster,
           CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM t LEFT JOIN dropped dr ON t.vec_id = dr.vec_id
    """,
    doc=f"SemDeDup-shaped semantic dedup (Abbas et al. 2023): assign to "
    f"{SEM_K} seeded centroids (bit-identical argmin), compare cosine "
    f"≥ {NEAR_DUP_TAU} ONLY within a cluster (one shuffle, O(Σ cluster²) "
    "not O(n²)), keep the lowest id of each near-dup group.",
)
def x36_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import semantic_dedup

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(SEM_K)
        .collect()
    ]
    return semantic_dedup(
        emb, "vec_id", "embedding", cents, NEAR_DUP_TAU
    )


@register(
    "x93_ivf_cell_balance",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cb AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
               AS cid, v AS cv
      FROM c ORDER BY vec_id LIMIT {IVF_BAL_K}
    ), dpre AS (
      SELECT c.vec_id, cb.cid,
             list_transform(list_zip(c.v, cb.cv), z -> z[1] - z[2]) AS dv
      FROM c CROSS JOIN cb
    ), d AS (
      SELECT vec_id, cid, list_dot_product(dv, dv) AS d2 FROM dpre
    ), assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY d2, cid
               ) AS rn
        FROM d
      ) WHERE rn = 1
    ), sizes AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM assign GROUP BY cluster
    ), tot AS (
      SELECT CAST(COALESCE(SUM(n_vecs), 0) AS BIGINT) AS t FROM sizes
    )
    SELECT s.cluster, s.n_vecs,
           CASE WHEN tot.t > 0
                THEN CAST(s.n_vecs AS DOUBLE) / tot.t END AS vec_share,
           CAST(ROW_NUMBER() OVER (ORDER BY s.n_vecs DESC, s.cluster)
                AS BIGINT) AS size_rank,
           CASE WHEN tot.t > 0 THEN
             CAST(CAST(SUM(s.n_vecs) OVER (
               ORDER BY s.n_vecs DESC, s.cluster
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS DOUBLE) / tot.t
           END AS cum_share
    FROM sizes s CROSS JOIN tot
    """,
    doc=f"IVF cell-balance audit: assign every embedding to its "
    f"nearest of {IVF_BAL_K} seeded centroids (x36's bit-identical "
    "euclidean argmin), then the cell-size concentration curve — per "
    "cell: exact count, corpus share, size rank, and cumulative share "
    "of the top-rank cells. The index-health face of the ANN audit "
    "family (recall x80, quantization x83, estimator bias x89): "
    "probed-cell recall decays silently as appends pile into few "
    "cells under frozen centroids, and cum_share at rank m reads "
    "'share of the corpus in the top m cells' directly. Exact BIGINT "
    "counts, n_vecs DESC + cluster-id tiebreak (total order), one "
    "IEEE division per share; the windowed SUM is cast back to "
    "BIGINT in the oracle (DuckDB promotes to HUGEINT → float64 in "
    "pandas). operators/similarity.ivf_cell_balance.",
)
def x93_ivf_cell_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.similarity import (
        assign_to_centroids,
        ivf_cell_balance,
    )

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(IVF_BAL_K)
        .collect()
    ]
    if not cents:
        # empty-corpus seeding (the x36 guard): no centroids → no
        # assignments; schema-stable empty frame, kept lazy
        assignment = emb.select(
            "vec_id", F.lit(0).cast("int").alias("cluster")
        ).where(F.lit(False))
    else:
        assignment = assign_to_centroids(
            emb.select("vec_id", "embedding"), "embedding", cents,
            "cluster",
        )
    return ivf_cell_balance(assignment, "cluster")


@register(
    "x38_lm_perplexity",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS, 2)} AS sh FROM documents
    ), bg AS (
      SELECT doc_id, unnest(sh) AS bg FROM t
    ), bgc AS (
      SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg
    ), w1c AS (
      SELECT split_part(bg, ' ', 1) AS w1,
             CAST(SUM(c_bg) AS BIGINT) AS c_w1
      FROM bgc GROUP BY split_part(bg, ' ', 1)
    ), vocab AS (
      SELECT COUNT(DISTINCT w) AS v FROM (
        SELECT unnest({SQL_TOKENS}) AS w FROM documents
      )
    ), scored AS (
      SELECT b.doc_id,
             CAST(-ln((c.c_bg + 1) / (w.c_w1 + vocab.v))
                  AS DECIMAL(28,6)) AS nll
      FROM bg b
      JOIN bgc c USING (bg)
      JOIN w1c w ON split_part(b.bg, ' ', 1) = w.w1
      CROSS JOIN vocab
    ), st AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS xent
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           xent
    FROM documents d LEFT JOIN st USING (doc_id)
    """,
    doc="CCNet-shaped LM quality signal: per-doc cross-entropy under "
    "the corpus's own add-one bigram model — bigram/prefix/vocab "
    "counts shuffle on n-gram keys (model tables join, never "
    "broadcast/collect); per-token -ln(p) quantized to DECIMAL(28,6) "
    "(ln is NOT cross-engine bit-stable — measured 1-ulp divergence), "
    "decimal-exact sum, raw-double mean.",
)
def x38_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.lm import bigram_lm_scores

    cat = load_testdata(spark, sf_dir)
    return bigram_lm_scores(cat.table("documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# round-6 additions: mixture resampling, keep-best canonicalization,
# cross-source duplication analytics
# ---------------------------------------------------------------------------

# 20-bit fractional bucket: keeps every integer product of the sampling
# arithmetic far inside int64; imported so the oracle SQL can never
# drift from the operator's scale
from ods_to_datalake_spark.operators.sampling import (  # noqa: E402
    FRAC_BUCKETS as _FRAC,
)


@register(
    "x42_temperature_mixture",
    oracle=f"""
    WITH stats AS (
      SELECT source, COUNT(*) AS n_s, SUM(n_chars) AS c_s
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_s,
             CAST(FLOOR(SQRT(c_s)) AS BIGINT) AS w_s
      FROM stats
    ), tot AS (
      SELECT SUM(w_s) AS den, SUM(n_s) AS t FROM w
    ), rates AS (
      -- `//` truncates but every operand is non-negative, matching
      -- Spark's `div`; den=0 (all-empty corpus) guarded in both engines
      SELECT source, n_s,
             CAST(CASE WHEN den > 0 THEN (t * w_s) // den
                       ELSE 0 END AS BIGINT) AS k_s
      FROM w, tot
    ), b AS (
      SELECT doc_id, source,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                         1, 5)) AS BIGINT) AS bkt
      FROM documents
    ), c AS (
      SELECT b.doc_id, b.source,
             k_s // n_s
             + CASE WHEN bkt * n_s < (k_s % n_s) * {_FRAC}
                    THEN 1 ELSE 0 END AS copies
      FROM b JOIN rates USING (source)
    )
    SELECT doc_id, source,
           CAST(unnest(range(0, copies)) AS BIGINT) AS replica
    FROM c WHERE copies > 0
    """,
    doc="Temperature-smoothed (α=0.5) mixture resampling: per-source "
    "targets follow sqrt of character mass — dominant sources "
    "down-sampled by content hash, tail sources UP-sampled by "
    "deterministic replication (replica index), all in exact integer "
    "arithmetic so membership is engine-independent. Map-side + one "
    "tiny broadcast-joined stats table; zero corpus shuffles.",
)
def x42_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.sampling import temperature_mixture

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    return temperature_mixture(
        docs, "doc_id", "source", "n_chars"
    ).select("doc_id", "source", "replica")


@register(
    "x43_cluster_canonical",
    oracle=None,  # assembled below from x25's oracle (single source of
    # truth for the cluster labeling)
    doc="Keep-BEST canonicalization of near-dup clusters: for each "
    "connected component of the verified-pair funnel, keep the "
    "longest member (n_chars argmax, min-id ties) instead of the "
    "arbitrary min-id representative — the CCNet/RefinedWeb keep-best "
    "convention. One corpus join + one partial-aggregated "
    "groupBy(cluster) carrying a single argmax struct per group; no "
    "window over the cluster key, so a corpus-wide mega-cluster still "
    "combines map-side. Oracle: x25's recursive min-reachable CTE "
    "joined to documents, max-chars-then-min-id in two exact steps.",
)
def x43_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        cluster_canonical,
        connected_components,
    )
    from ods_to_datalake_spark.plans.suite_llm import verified_pairs
    from pyspark.sql import functions as F

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    cc = connected_components(verified_pairs(docs), "id_a", "id_b")
    return cluster_canonical(cc, docs, "doc_id", "n_chars").select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "canonical_doc_id",
        "canonical_quality",
        "cluster_size",
    )


@register(
    "x44_source_overlap",
    oracle=None,  # assembled below from x05's oracle
    doc="Cross-source duplication matrix: verified near-dup pairs "
    "(the x05 funnel at jaccard >= 0.5) attributed to their "
    "(source, source) cell — the provenance report that tells a "
    "corpus owner WHICH feeds duplicate each other before they pay "
    "for full dedup. Pairs are candidate-bounded; the two source "
    "lookups are id-keyed corpus joins of a (id, source) projection; "
    "final agg is tiny (|sources|²).",
)
def x44_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.plans.suite_llm import verified_pairs
    from pyspark.sql import functions as F

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    verified = verified_pairs(docs)
    src = docs.select("doc_id", "source")
    pa = verified.join(
        src.select(F.col("doc_id").alias("id_a"),
                   F.col("source").alias("src_a")), "id_a"
    ).join(
        src.select(F.col("doc_id").alias("id_b"),
                   F.col("source").alias("src_b")), "id_b"
    )
    return (
        pa.groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def _assemble_round6_oracles() -> None:
    """x43/x44 embed the registered x25/x05 oracles (assembled at
    suite_llm import time) so the funnel semantics have one source of
    truth; import order inside load_all() guarantees suite_llm is
    loaded, and the explicit import covers standalone use."""
    from ods_to_datalake_spark.plans import suite_llm  # noqa: F401
    from ods_to_datalake_spark.plans.suite import REGISTRY

    x25 = REGISTRY["x25_dedup_clusters"].oracle
    assert x25, "x25 oracle must be assembled before suite_curation"
    REGISTRY["x43_cluster_canonical"].oracle = f"""
    WITH j AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars
      FROM ({x25}) c JOIN documents d USING (doc_id)
    ), mx AS (
      SELECT cluster_id,
             MAX(n_chars) AS canonical_quality,
             CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM j GROUP BY cluster_id
    )
    SELECT m.cluster_id,
           MIN(j.doc_id) AS canonical_doc_id,
           m.canonical_quality,
           m.cluster_size
    FROM mx m
    JOIN j ON j.cluster_id = m.cluster_id
          AND j.n_chars IS NOT DISTINCT FROM m.canonical_quality
    GROUP BY m.cluster_id, m.canonical_quality, m.cluster_size
    """
    x05 = REGISTRY["x05_lsh_jaccard_verify"].oracle
    REGISTRY["x44_source_overlap"].oracle = f"""
    WITH pairs AS (
      SELECT id_a, id_b FROM ({x05}) v WHERE jaccard >= {suite_llm.NEAR_DUP_JACCARD}
    ), src AS (
      SELECT doc_id, source FROM documents
    )
    SELECT least(sa.source, sb.source) AS source_a,
           greatest(sa.source, sb.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN src sa ON p.id_a = sa.doc_id
    JOIN src sb ON p.id_b = sb.doc_id
    GROUP BY least(sa.source, sb.source), greatest(sa.source, sb.source)
    """


_assemble_round6_oracles()


@register(
    "x45_split_leakage",
    oracle=None,  # assembled below from x05's oracle + x19's split rule
    doc="Train/eval leakage audit: verified near-dup pairs (the x05 "
    "funnel at jaccard >= 0.5) whose two sides land in DIFFERENT "
    "cells of the deterministic md5 train/val/test split (x19's "
    "rule) — the pairs that silently inflate eval scores if the "
    "corpus ships as-is. Near-dup-aware split auditing is the step "
    "benchmark decontamination (x18) does not cover: the leaked "
    "text is a near-copy, not an exact n-gram hit. Candidate-bounded "
    "funnel + two id-keyed split lookups; output is the leak list a "
    "pipeline either quarantines or re-splits.",
)
def x45_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.plans.suite_llm import verified_pairs

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    verified = verified_pairs(docs)
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    splits = docs.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        verified.join(
            splits.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
            ),
            "id_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
            ),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


@register(
    "x46_decontaminate_scored",
    oracle=None,  # assembled below (shares x18's shingle/benchmark rule)
    doc="Scored benchmark decontamination: per training doc, the "
    "FRACTION of its distinct shingles that appear in the benchmark "
    "set — the threshold-tuning variant of x18's binary flag (real "
    "pipelines drop above a contamination fraction, not on a single "
    "n-gram hit). Shingle explode + broadcast membership join + "
    "per-doc rollup; zero-shingle training docs report 0.0 via the "
    "left attach, not NULL division (ANSI-safe).",
)
def x46_decontaminate_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.dedup import spread_small_input
    from ods_to_datalake_spark.plans.suite_llm import (
        DECON_BENCH_IDS,
        DECON_SHINGLE_N,
    )
    from ods_to_datalake_spark.functions import text as X

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    sh = F.array_distinct(
        X.shingles(X.tokens("text"), DECON_SHINGLE_N)
    ).alias("sh")
    exploded = spread_small_input(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(sh).alias("s")
    )
    bench = (
        exploded.filter(F.col("doc_id") < DECON_BENCH_IDS)
        .select("s")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train = exploded.filter(F.col("doc_id") >= DECON_BENCH_IDS)
    per = (
        train.join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") >= DECON_BENCH_IDS)
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias(
                "n_shingles"
            ),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            # RAW double quotient, never re-rounded: an integer ratio
            # can land exactly on a decimal midpoint where the two
            # engines round opposite ways; identical IEEE divisions
            # are bit-identical (CLAUDE.md ratio rule)
            F.when(F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles")
            )
            .alias("contamination_frac"),
        )
    )


def _assemble_round6b_oracles() -> None:
    from ods_to_datalake_spark.plans import suite_llm
    from ods_to_datalake_spark.plans.suite import REGISTRY

    x05 = REGISTRY["x05_lsh_jaccard_verify"].oracle
    assert x05, "x05 oracle must be assembled before suite_curation"
    REGISTRY["x45_split_leakage"].oracle = f"""
    WITH pairs AS (
      SELECT id_a, id_b, jaccard FROM ({x05}) v WHERE jaccard >= {suite_llm.NEAR_DUP_JACCARD}
    ), s AS (
      SELECT doc_id,
             CASE WHEN CAST(concat('0x',
                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(concat('0x',
                    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT p.id_a, p.id_b,
           sa.split AS split_a, sb.split AS split_b, p.jaccard
    FROM pairs p
    JOIN s sa ON p.id_a = sa.doc_id
    JOIN s sb ON p.id_b = sb.doc_id
    WHERE sa.split <> sb.split
    """
    bench_ids = suite_llm.DECON_BENCH_IDS
    shn = suite_llm.DECON_SHINGLE_N
    from ods_to_datalake_spark.plans.sql_fragments import (
        SQL_TOKENS as _toks,
        sql_shingles as _shg,
    )

    REGISTRY["x46_decontaminate_scored"].oracle = f"""
    WITH sh_t AS (
      SELECT doc_id, list_distinct({_shg(_toks, shn)}) AS sh
      FROM documents
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh_t
      WHERE doc_id < {bench_ids}
    ), ex AS (
      SELECT doc_id, unnest(sh) AS s FROM sh_t
      WHERE doc_id >= {bench_ids}
    ), per AS (
      SELECT e.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(COUNT(b.s) AS BIGINT) AS n_contaminated
      FROM ex e LEFT JOIN bench b ON e.s = b.s
      GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_shingles, 0) AS n_shingles,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0
                ELSE CAST(n_contaminated AS DOUBLE) / n_shingles
           END AS contamination_frac
    FROM documents d LEFT JOIN per USING (doc_id)
    WHERE d.doc_id >= {bench_ids}
    """


_assemble_round6b_oracles()


# DSIR hashed-feature space (operators/lm.dsir_logratio default)
DSIR_BUCKETS = 4096
# target distribution = the benchmark slice — IMPORTED so x18/x46/x47
# provably share one benchmark boundary
from ods_to_datalake_spark.plans.suite_llm import (  # noqa: E402
    DECON_BENCH_IDS as DSIR_TARGET_IDS,
)


@register(
    "x47_dsir_weights",
    oracle=f"""
    WITH bt AS (
      SELECT unnest({_sql_shingles(SQL_TOKENS, 2)}) AS bg
      FROM documents WHERE doc_id < {DSIR_TARGET_IDS}
    ), bs AS (
      SELECT unnest({_sql_shingles(SQL_TOKENS, 2)}) AS bg
      FROM documents WHERE doc_id >= {DSIR_TARGET_IDS}
    ), spine AS (
      SELECT unnest(range(0, {DSIR_BUCKETS})) AS b
    ), tcr AS (
      SELECT CAST(concat('0x', substring(md5(bg), 1, 8)) AS BIGINT)
               % {DSIR_BUCKETS} AS b,
             COUNT(*) AS ct
      FROM bt GROUP BY 1
    ), scr AS (
      SELECT CAST(concat('0x', substring(md5(bg), 1, 8)) AS BIGINT)
               % {DSIR_BUCKETS} AS b,
             COUNT(*) AS cs
      FROM bs GROUP BY 1
    ), tc AS (
      SELECT spine.b, COALESCE(ct, 0) AS ct
      FROM spine LEFT JOIN tcr ON spine.b = tcr.b
    ), sc AS (
      SELECT spine.b, COALESCE(cs, 0) AS cs
      FROM spine LEFT JOIN scr ON spine.b = scr.b
    ), tt AS (
      SELECT COALESCE(SUM(ct), 0) AS tt FROM tcr
    ), ts AS (
      SELECT COALESCE(SUM(cs), 0) AS ts FROM scr
    ), feats AS (
      SELECT tc.b,
             CAST(ln((tc.ct + 1) / (tt.tt + {DSIR_BUCKETS}))
                  AS DECIMAL(28,6))
             - CAST(ln((sc.cs + 1) / (ts.ts + {DSIR_BUCKETS}))
                  AS DECIMAL(28,6)) AS w
      FROM tc JOIN sc ON tc.b = sc.b, tt, ts
    ), inst AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(bg), 1, 8)) AS BIGINT)
               % {DSIR_BUCKETS} AS b
      FROM (
        SELECT doc_id, unnest({_sql_shingles(SQL_TOKENS, 2)}) AS bg
        FROM documents WHERE doc_id >= {DSIR_TARGET_IDS}
      )
    ), per AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             SUM(w) AS sw
      FROM inst JOIN feats ON inst.b = feats.b
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(sw AS DOUBLE) / n_bigrams
           END AS dsir_logratio
    FROM documents d LEFT JOIN per USING (doc_id)
    WHERE d.doc_id >= {DSIR_TARGET_IDS}
    """,
    doc="DSIR importance weights (Xie et al. 2023): per-doc mean "
    "log-ratio of target vs source add-one multinomials over hashed "
    "bigram features — select/upweight the docs that look like the "
    "benchmark slice. Both models collapse to a fixed "
    f"{DSIR_BUCKETS}-bucket table, so the (bucket, Δ-log-weight) "
    "feature table BROADCASTS and the scored corpus pays one map-side "
    "join + one rollup — no corpus-sized model-key shuffle at any "
    "scale (contrast x38's open-vocabulary model joins). ln() "
    "quantized to DECIMAL(28,6) in the model table; exact decimal "
    "sums; raw-double mean.",
)
def x47_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.lm import dsir_logratio

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    target = docs.filter(F.col("doc_id") < DSIR_TARGET_IDS)
    source = docs.filter(F.col("doc_id") >= DSIR_TARGET_IDS)
    return dsir_logratio(
        target, source, source, "doc_id", "text", n_buckets=DSIR_BUCKETS
    )


def _sql_gopher_stop_sum() -> str:
    """CASE-sum of distinct Gopher stopwords present — explicit per-word
    contains terms (array_intersect dedup semantics differ across
    engines; neither side uses them)."""
    from ods_to_datalake_spark.functions import text as X

    return " + ".join(
        f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)"
        for w in X.GOPHER_STOPWORDS
    )


def _gopher_oracle() -> str:
    from ods_to_datalake_spark.functions import text as X

    return f"""
    WITH t AS (
      SELECT doc_id, text, {SQL_TOKENS} AS toks,
             string_split_regex(text, '\\r?\\n') AS ln
      FROM documents
    ), m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(toks, t -> length(t)))
             AS BIGINT) AS word_chars,
        CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
             AS BIGINT) AS n_alpha_words,
        CAST({_sql_gopher_stop_sum()} AS BIGINT) AS n_stop,
        CAST((length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3
           + (length(text) - length(replace(text, '…', '')))
             AS BIGINT) AS n_symbols,
        CAST(len(ln) AS BIGINT) AS n_lines,
        CAST(len(list_filter(ln,
               l -> regexp_matches(ltrim(l), '^[-*•]')))
             AS BIGINT) AS n_bullet_lines,
        CAST(len(list_filter(ln,
               l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
             AS BIGINT) AS n_ellipsis_lines
      FROM t
    )
    SELECT doc_id, n_words, word_chars, n_alpha_words, n_stop,
           n_symbols, n_lines, n_bullet_lines, n_ellipsis_lines,
           CAST(CASE WHEN n_words >= {X.GOPHER_MIN_WORDS}
                 AND n_words <= {X.GOPHER_MAX_WORDS}
                 AND {X.GOPHER_MEAN_LEN_MIN} * n_words <= word_chars
                 AND word_chars <= {X.GOPHER_MEAN_LEN_MAX} * n_words
                 AND {X.GOPHER_SYMBOL_DEN} * n_symbols
                     <= {X.GOPHER_SYMBOL_NUM} * n_words
                 AND {X.GOPHER_ALPHA_DEN} * n_alpha_words
                     >= {X.GOPHER_ALPHA_NUM} * n_words
                 AND n_stop >= {X.GOPHER_MIN_STOPWORDS}
                 AND {X.GOPHER_BULLET_DEN} * (n_lines - n_bullet_lines)
                     >= {X.GOPHER_BULLET_NUM} * n_lines
                 AND {X.GOPHER_ELLIPSIS_DEN} * n_ellipsis_lines
                     <= {X.GOPHER_ELLIPSIS_NUM} * n_lines
            THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM m
    """


@register(
    "x48_gopher_quality",
    oracle=_gopher_oracle(),
    doc="Gopher quality-rule filter (Rae et al. 2021 A1.1): word-count "
    "bounds, mean-word-length bounds, symbol-to-word ratio, "
    "alphabetic-word fraction, distinct-stopword floor, bullet-start / "
    "ellipsis-end line ratios — every threshold an integer-scaled "
    "comparison (no division, no float literals), all JVM codegen "
    "expressions, zero shuffles: the narrow map stage you'd run FIRST "
    "in a 100-TB curation funnel before any dedup shuffle.",
)
def x48_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions.text import (
        gopher_passes,
        gopher_stats,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    s = gopher_stats("text")
    cols = [
        "n_words", "word_chars", "n_alpha_words", "n_stop", "n_symbols",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines",
    ]
    return docs.select(
        "doc_id",
        *[s[c].alias(c) for c in cols],
        gopher_passes(s).alias("passes"),
    )


def _c4_oracle() -> str:
    from ods_to_datalake_spark.functions import text as X

    keep_line = (
        "regexp_matches(rtrim(l), '[.!?\"]$') "
        "AND len(string_split_regex(trim(l), '\\s+')) >= "
        f"{X.C4_MIN_LINE_WORDS} "
        f"AND NOT contains(lower(l), '{X.C4_LINE_BLOCKWORD}')"
    )
    blocked = " OR ".join(
        f"contains(lower(text), '{w}')" for w in X.C4_DOC_BLOCKLIST
    )
    return f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(text, '\\r?\\n') AS ln
      FROM documents
    ), k AS (
      SELECT doc_id, text, ln,
             list_filter(ln, l -> {keep_line}) AS kept
      FROM t
    ), m AS (
      SELECT doc_id,
        CAST(len(ln) AS BIGINT) AS n_lines,
        CAST(len(kept) AS BIGINT) AS n_kept_lines,
        -- DuckDB array_to_string([]) is NULL where Spark array_join([])
        -- is '' — coalesce the empty case, keep NULL text NULL
        CASE WHEN kept IS NULL THEN NULL
             ELSE COALESCE(array_to_string(kept, chr(10)), '')
        END AS cleaned_text,
        ({blocked}) AS blocked_b
      FROM k
    )
    SELECT doc_id, n_lines, n_kept_lines,
           CAST(len(regexp_extract_all(cleaned_text, '[.!?]'))
                AS BIGINT) AS n_sentences,
           CAST(CASE WHEN blocked_b THEN 1 ELSE 0 END AS BIGINT)
             AS blocked,
           cleaned_text,
           CAST(CASE WHEN NOT blocked_b
                 AND len(regexp_extract_all(cleaned_text, '[.!?]'))
                     >= {X.C4_MIN_SENTENCES}
                 AND n_kept_lines >= 1
            THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM m
    """


@register(
    "x49_c4_line_filter",
    oracle=_c4_oracle(),
    doc="C4 cleaning rules (Raffel et al. 2020 §2.2): keep lines that "
    "end in terminal punctuation, have >= 5 words, and don't mention "
    "javascript; rebuild the cleaned text; gate the document on the "
    "blocklist (lorem ipsum, '{') and a >= 3-sentence floor. Pure "
    "per-row line filtering — the other canonical pre-dedup map stage "
    "next to x48's Gopher rules; zero shuffles at any scale.",
)
def x49_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions.text import c4_stats

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    s = c4_stats("text")
    cols = [
        "n_lines", "n_kept_lines", "n_sentences", "blocked",
        "cleaned_text", "keep",
    ]
    return docs.select("doc_id", *[s[c].alias(c) for c in cols])


@register(
    "x50_source_quality_report",
    oracle=f"""
    WITH g AS ({_gopher_oracle()}),
    c AS ({_c4_oracle()})
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(g.passes) AS BIGINT) AS n_gopher_pass,
           CAST(SUM(c.keep) AS BIGINT) AS n_c4_keep,
           CAST(SUM(g.n_words) AS BIGINT) AS sum_words,
           CAST(SUM(g.word_chars) AS BIGINT) AS sum_word_chars
    FROM documents d
    JOIN g USING (doc_id) JOIN c USING (doc_id)
    GROUP BY d.source
    """,
    doc="Per-source corpus report card: document count, Gopher-rule "
    "pass count, C4 keep count, token and character mass per source — "
    "the curation-funnel observability query (which sources are worth "
    "ingesting?). The per-doc rule signals are zero-shuffle codegen "
    "expressions computed inline, so the whole report costs ONE "
    "map-side-combined exchange on source at any corpus size; the "
    "oracle embeds x48's and x49's oracles and aggregates them.",
)
def x50_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.functions.text import (
        c4_stats,
        gopher_passes,
        gopher_stats,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    g = gopher_stats("text")
    c = c4_stats("text")
    per_doc = docs.select(
        "source",
        gopher_passes(g).alias("__gp"),
        c["keep"].alias("__ck"),
        g["n_words"].alias("__nw"),
        g["word_chars"].alias("__wc"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__gp").cast("long").alias("n_gopher_pass"),
        F.sum("__ck").cast("long").alias("n_c4_keep"),
        F.sum("__nw").cast("long").alias("sum_words"),
        F.sum("__wc").cast("long").alias("sum_word_chars"),
    )


def _repetition_oracle() -> str:
    from ods_to_datalake_spark.operators import quality as Q

    return f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks,
             string_split_regex(text, '\\r?\\n') AS ln
      FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS BIGINT) AS word_chars,
             {_sql_shingles('toks', 2)} AS g2,
             {_sql_shingles('toks', Q.REP_5GRAM_N)} AS gg5,
             ln
      FROM t
    ), l AS (
      SELECT doc_id, unnest(ln) AS line FROM b
    ), pl AS (
      SELECT doc_id, line, COUNT(*) AS c FROM l GROUP BY doc_id, line
    ), ls AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n_dup_lines,
             CAST(SUM(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)
                  AS BIGINT) AS dup_line_chars,
             CAST(SUM(c * length(line)) AS BIGINT) AS total_line_chars
      FROM pl GROUP BY doc_id
    ), gg AS (
      SELECT doc_id, unnest(g2) AS g FROM b
    ), pg AS (
      SELECT doc_id, g, COUNT(*) AS c FROM gg GROUP BY doc_id, g
    ), tg AS (
      SELECT doc_id, CAST(c AS BIGINT) AS top2_count,
             CAST(c * length(g) AS BIGINT) AS top2_chars
      FROM (
        SELECT doc_id, g, c,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY c DESC, g DESC
               ) AS rn
        FROM pg
      ) WHERE rn = 1
    ), sp AS (
      SELECT doc_id,
             CAST(generate_subscripts(gg5, 1) - 1 AS INT) AS p,
             unnest(gg5) AS g
      FROM b
    ), dg AS (
      SELECT doc_id, g FROM sp GROUP BY doc_id, g
      HAVING COUNT(*) >= 2
    ), di AS (
      SELECT sp.doc_id, sp.p
      FROM sp SEMI JOIN dg
        ON sp.doc_id = dg.doc_id AND sp.g = dg.g
    ), cov AS (
      SELECT DISTINCT doc_id, p + off AS tp
      FROM di, range(0, {Q.REP_5GRAM_N}) r(off)
    ), d5 AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup5_positions
      FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, b.word_chars,
           COALESCE(n_lines, 0) AS n_lines,
           COALESCE(n_dup_lines, 0) AS n_dup_lines,
           COALESCE(dup_line_chars, 0) AS dup_line_chars,
           COALESCE(total_line_chars, 0) AS total_line_chars,
           COALESCE(top2_count, 0) AS top2_count,
           COALESCE(top2_chars, 0) AS top2_chars,
           COALESCE(dup5_positions, 0) AS dup5_positions,
           CAST(CASE WHEN COALESCE(b.n_tokens, 0) >= 1
                 AND {Q.REP_DUP_LINE_DEN} * COALESCE(n_dup_lines, 0)
                     <= {Q.REP_DUP_LINE_NUM} * COALESCE(n_lines, 0)
                 AND {Q.REP_DUP_LINE_CHAR_DEN}
                     * COALESCE(dup_line_chars, 0)
                     <= {Q.REP_DUP_LINE_CHAR_NUM}
                        * COALESCE(total_line_chars, 0)
                 AND {Q.REP_TOP2_CHAR_DEN} * COALESCE(top2_chars, 0)
                     <= {Q.REP_TOP2_CHAR_NUM}
                        * COALESCE(b.word_chars, 0)
                 AND {Q.REP_DUP5_DEN} * COALESCE(dup5_positions, 0)
                     <= {Q.REP_DUP5_NUM} * COALESCE(b.n_tokens, 0)
            THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM b LEFT JOIN ls USING (doc_id)
           LEFT JOIN tg USING (doc_id)
           LEFT JOIN d5 USING (doc_id)
    """


@register(
    "x51_gopher_repetition",
    oracle=_repetition_oracle(),
    doc="Gopher REPETITION rules (Rae et al. 2021 A1.1, the second "
    "half of the quality table; x48 is the rule half): within-doc "
    "duplicate-line fraction and char fraction, top-2-gram char "
    "fraction (ties to the lexicographically largest gram), and "
    "duplicate-5-gram token-position coverage (overlap-correct via "
    "DISTINCT covered positions, the x39 span machinery). All "
    "BIGINT numerator/denominator counts, thresholds as "
    "integer-scaled comparisons; every group key includes doc_id so "
    "the operator is doc-parallel with map-side partials — no "
    "cross-document join at any scale.",
)
def x51_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.quality import gopher_repetition

    cat = load_testdata(spark, sf_dir)
    return gopher_repetition(cat.table("documents"), "doc_id", "text")


# x76: the synthetic PII text is BUILT identically in both engines
# from customer columns (the corpus has no real PII to scrub), with a
# no-PII cohort (custkey % 3 = 0) so zero counts are exercised too
_PII_TEXT_SPARK = None  # built inline in the query fn
SQL_PII_TEXT = """(
      SELECT c_custkey AS id,
             concat(
               COALESCE(c_name, ''), ' can be reached',
               CASE WHEN c_custkey % 3 = 0 THEN ' at the office'
                    ELSE concat(' at user', CAST(c_custkey AS VARCHAR),
                                '@example.com') END,
               CASE WHEN c_custkey % 4 = 0 THEN ''
                    ELSE concat(' or +1555',
                                lpad(CAST(c_custkey % 10000000
                                          AS VARCHAR), 7, '0')) END,
               ' from host 10.', CAST(c_custkey % 200 AS VARCHAR),
               '.', CAST(c_custkey % 250 AS VARCHAR),
               '.', CAST(c_custkey % 100 AS VARCHAR),
               ' re ', COALESCE(c_mktsegment, '')
             ) AS text
      FROM customer WHERE c_custkey IS NOT NULL
    )"""


@register(
    "x76_pii_scrub",
    oracle=f"""
    WITH src AS {SQL_PII_TEXT}
    SELECT id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                 '<EMAIL>', 'g'),
               '\\+[0-9]{{8,15}}', '<PHONE>', 'g'),
             '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b',
             '<IP>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
             AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\\+[0-9]{{8,15}}'))
             AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text,
             '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b'))
             AS BIGINT) AS n_ips
    FROM src
    """,
    doc="Rule-based PII redaction with an audit trail — the compliance "
    "pass a shared training corpus runs before release: e-mails, "
    "international-format phones (+, 8-15 digits), and dotted-quad "
    "IPs replaced by typed placeholder tags, per-document match "
    "counts kept (a scrub that doesn't count what it removed can't "
    "be reviewed). Patterns restricted to the regex subset Java "
    "(Spark) and RE2 (DuckDB) interpret identically — classes, "
    "bounded repetition, word boundaries; no lookaround/backrefs — "
    "so the oracle runs the SAME expressions; replacement order is "
    "pinned email → phone → IP (an email contains dots+digits and "
    "must leave before the IP pass); counts measure the ORIGINAL "
    "text. The demo text is synthesized identically in both engines "
    "from customer columns (the corpus has no real PII), with no-PII "
    "cohorts so zero counts are exercised. Pure map-side codegen "
    "string work — zero shuffles, no UDFs. operators/curate.pii_scrub.",
)
def x76_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.curate import pii_scrub

    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer").where(
        F.col("c_custkey").isNotNull()
    )
    k = F.col("c_custkey")
    # coalesced per the suite null rule: Spark CONCAT nulls the
    # whole result where DuckDB's skips the part (fuzz tier has NULLs)
    text = F.concat(
        F.coalesce(F.col("c_name"), F.lit("")),
        F.lit(" can be reached"),
        F.when(k % 3 == 0, F.lit(" at the office")).otherwise(
            F.concat(
                F.lit(" at user"),
                k.cast("string"),
                F.lit("@example.com"),
            )
        ),
        F.when(k % 4 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit(" or +1555"),
                F.lpad((k % 10000000).cast("string"), 7, "0"),
            )
        ),
        F.lit(" from host 10."),
        (k % 200).cast("string"),
        F.lit("."),
        (k % 250).cast("string"),
        F.lit("."),
        (k % 100).cast("string"),
        F.lit(" re "),
        F.coalesce(F.col("c_mktsegment"), F.lit("")),
    )
    src = cust.select(k.alias("id"), text.alias("text"))
    return pii_scrub(src, "id", "text")


SAMPLE_K = 997  # prime, forces non-zero remainders at every sf


@register(
    "x77_stratified_allocation",
    oracle=f"""
    WITH rows_ AS (
      SELECT o_orderpriority AS stratum, o_orderkey AS id
      FROM orders WHERE o_orderkey IS NOT NULL
    ),
    per AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n
      FROM rows_ GROUP BY stratum
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM per),
    alloc AS (
      SELECT stratum, n,
             (n * {SAMPLE_K}) // nn AS base,
             (n * {SAMPLE_K}) % nn AS rem
      FROM per CROSS JOIN tot
    ),
    ex AS (
      SELECT CAST({SAMPLE_K} - SUM(base) AS BIGINT) AS extras
      FROM alloc
    ),
    q AS (
      SELECT stratum,
             CAST(base + CASE WHEN ROW_NUMBER() OVER (
                 ORDER BY rem DESC, stratum ASC NULLS FIRST)
               <= ex.extras THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM alloc CROSS JOIN ex
    ),
    ranked AS (
      SELECT stratum, id, ROW_NUMBER() OVER (
          PARTITION BY stratum
          ORDER BY md5(CAST(id AS VARCHAR)), id) AS p
      FROM rows_
    )
    SELECT r.stratum, r.id, q.quota
    FROM ranked r JOIN q
      ON r.stratum IS NOT DISTINCT FROM q.stratum
    WHERE r.p <= q.quota
    """,
    doc=f"Fixed-budget stratified sample: exactly {SAMPLE_K} orders "
    "with per-priority quotas allocated by the largest-remainder "
    "method (Hamilton apportionment) — floor(n_s·k/N) each plus one "
    "of the leftovers by (remainder DESC, stratum ASC NULLS FIRST) — "
    "the zero-rounding-drift draw behind eval sets and annotation "
    "batches, where x42's rate-based mixture is Binomial per stratum "
    "and can't promise a total. All arithmetic integer (n·k div N / "
    "mod N — never a float rate, the sampling-boundary rule); "
    "remainder ranking is a window over the STRATA-sized frame; "
    "within a stratum rows are the bottom-quota by (md5(id), id) — "
    "seedless, reproducible, engine-shared — executed as "
    "WindowGroupLimit so a huge stratum moves ~quota rows per "
    "partition. The quota join is NULL-SAFE (a plain equi-join would "
    "silently drop a NULL stratum). "
    "operators/sampling.stratified_exact_sample.",
)
def x77_stratified_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sampling import (
        stratified_exact_sample,
    )

    cat = load_testdata(spark, sf_dir)
    return stratified_exact_sample(
        cat.table("orders"), "o_orderkey", "o_orderpriority",
        k=SAMPLE_K,
    )


CAL_BINS = 10


def _calibration_oracle() -> str:
    """x81: the reliability/ECE arithmetic over (stopword count /
    token count) as the score and x51's Gopher-repetition pass flag
    as the label — the label CTE embeds x51's full oracle verbatim
    (the x25 single-source rule). Every engine-hazard in the chain
    has a named rule: all-integer bin edges (x42), per-row quotient
    quantized to DECIMAL before the order-free sum (x38's class), and
    HUGEINT/DECIMAL sums recast before the final divisions."""
    from ods_to_datalake_spark.plans.suite_llm import _sql_stop_count

    return f"""
    WITH lbl AS ({_repetition_oracle()}),
    feat AS (
      SELECT doc_id,
             CAST({_sql_stop_count('en')} AS BIGINT) AS num,
             CAST(len(toks) AS BIGINT) AS den
      FROM (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents)
    ),
    binned AS (
      SELECT LEAST(CAST({CAL_BINS - 1} AS BIGINT),
                   (CAST({CAL_BINS} AS BIGINT) * f.num) // f.den)
               AS bin,
             -- VARCHAR hop (the u17 rule): Spark's double→DECIMAL
             -- rounds the shortest string repr, DuckDB the exact
             -- binary — hop through the (identical) shortest repr
             CAST(CAST(CAST(f.num AS DOUBLE) / CAST(f.den AS DOUBLE)
               AS VARCHAR) AS DECIMAL(18,12)) AS p,
             l.passes AS y
      FROM feat f JOIN lbl l USING (doc_id)
      WHERE f.den > 0
    ),
    per_bin AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             SUM(p) AS sp
      FROM binned GROUP BY bin
    ),
    scored AS (
      SELECT bin, n, n_pos,
             CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
               AS mean_pred,
             CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
      FROM per_bin
    ),
    gapped AS (
      SELECT *, ABS(mean_pred - frac_pos) AS abs_gap FROM scored
    ),
    tot AS (
      SELECT SUM(CAST(CAST(abs_gap * CAST(n AS DOUBLE)
               AS VARCHAR) AS DECIMAL(28,12))) AS gsum,
             CAST(SUM(n) AS BIGINT) AS nn
      FROM gapped
    )
    SELECT g.bin, g.n, g.n_pos, g.mean_pred, g.frac_pos, g.abs_gap,
           CAST(CAST(t.gsum AS VARCHAR) AS DOUBLE)
             / CAST(t.nn AS DOUBLE) AS ece
    FROM gapped g CROSS JOIN tot t
    """


@register(
    "x81_score_calibration",
    oracle=_calibration_oracle(),
    doc=f"Reliability diagram + Expected Calibration Error (Naeini "
    "2015 / Guo 2017) of the stopword-ratio quality score as a "
    "predictor of the Gopher-repetition pass flag — x75 evaluates a "
    "score's RANKING, this evaluates its SCALE: whether 0.8 means "
    "80%, the property that decides if a score can gate thresholds "
    "or price sampling directly. The prediction enters as the exact "
    f"integer rational stops/tokens; {CAL_BINS} bins with all-integer "
    "edges (least(9, (10·num) div den) — the x42 rule, exact at "
    "every boundary); per-row quotients quantized DECIMAL(18,12) "
    "before the order-free per-bin sum; the ECE fold runs the per-bin "
    "|gap|·n terms through DECIMAL(28,12) the same way (even 10 "
    "doubles sum in partition order); label CTE embeds x51's oracle "
    "verbatim (single-source). One bin-keyed partial agg over the "
    "doc-keyed feature⋈label join, then nothing exceeds 10 rows. "
    "operators/features.calibration_report.",
)
def x81_score_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.functions import text as X
    from ods_to_datalake_spark.operators.features import (
        calibration_report,
    )
    from ods_to_datalake_spark.operators.quality import (
        gopher_repetition,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    toks = X.tokens("text")
    feat = docs.select(
        "doc_id",
        X.stopword_count(toks, X.STOPWORDS["en"])
        .cast("long")
        .alias("__stops"),
        F.size(toks).cast("long").alias("__ntok"),
    )
    lbl = gopher_repetition(docs, "doc_id", "text").select(
        "doc_id", "passes"
    )
    joined = feat.join(lbl, "doc_id")
    return calibration_report(
        joined,
        F.col("__stops"),
        F.col("__ntok"),
        F.col("passes"),
        n_bins=CAL_BINS,
    )


PQR_K = 5  # recall@k of the PQ layer vs exact-L2 truth


_SQL_L2D2 = (
    "list_dot_product("
    "list_transform(list_zip({a}, {b}), z -> z[1] - z[2]), "
    "list_transform(list_zip({a}, {b}), z -> z[1] - z[2]))"
)


@register(
    "x83_pq_recall_audit",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), {_SQL_PQ_CB}, dpre AS (
      SELECT c.vec_id, s.m, s.code,
             list_transform(
               list_zip(c.v[s.m * {PQ_SUB} + 1 : s.m * {PQ_SUB} + {PQ_SUB}],
                        s.cw),
               z -> z[1] - z[2]) AS dv
      FROM c CROSS JOIN sub s
    ), d AS (
      SELECT vec_id, m, code, list_dot_product(dv, dv) AS d2 FROM dpre
    ), codes AS (
      SELECT vec_id, m, code FROM (
        SELECT vec_id, m, code,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id, m ORDER BY d2, code
               ) AS rn
        FROM d
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM c
      WHERE vec_id < 8
    ), qdpre AS (
      SELECT q.query_id, s.m, s.code,
             list_transform(
               list_zip(q.qv[s.m * {PQ_SUB} + 1 : s.m * {PQ_SUB} + {PQ_SUB}],
                        s.cw),
               z -> z[1] - z[2]) AS dv
      FROM q CROSS JOIN sub s
    ), qd AS (
      SELECT query_id, m, code, list_dot_product(dv, dv) AS d2
      FROM qdpre
    ), ad AS (
      SELECT qd.query_id, cs.vec_id,
             MAX(CASE WHEN qd.m = 0 THEN qd.d2 END)
               + MAX(CASE WHEN qd.m = 1 THEN qd.d2 END)
               + MAX(CASE WHEN qd.m = 2 THEN qd.d2 END)
               + MAX(CASE WHEN qd.m = 3 THEN qd.d2 END) AS approx_d2
      FROM codes cs
      JOIN qd ON qd.m = cs.m AND qd.code = cs.code
      WHERE qd.query_id <> cs.vec_id
      GROUP BY qd.query_id, cs.vec_id
    ), approx AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY approx_d2, vec_id
        ) AS rn FROM ad
      ) WHERE rn <= {PQR_K}
    ), ts AS (
      SELECT q.query_id, c.vec_id,
             {_SQL_L2D2.format(a="q.qv", b="c.v")} AS d2
      FROM c, q WHERE c.vec_id <> q.query_id
    ), truth AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY d2, vec_id
        ) AS rn FROM ts
      ) WHERE rn <= {PQR_K}
    ), hits AS (
      SELECT a.query_id FROM approx a
      JOIN truth t ON a.query_id = t.query_id AND a.vec_id = t.vec_id
    ), counts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)
               AS n_true_pairs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM approx)
               AS n_approx_pairs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits
    )
    SELECT n_true_pairs, n_approx_pairs, n_hits,
           CASE WHEN n_true_pairs > 0 THEN
             CAST(n_hits AS DOUBLE) / CAST(n_true_pairs AS DOUBLE)
           END AS recall,
           CASE WHEN n_approx_pairs > 0 THEN
             CAST(n_hits AS DOUBLE) / CAST(n_approx_pairs AS DOUBLE)
           END AS precision
    FROM counts
    """,
    doc=f"PQ-layer quality audit (x80's sibling for the compression "
    f"tier — together they close VERDICT r9 ask #4's IVF/PQ pair): "
    f"realized recall@{PQR_K} / precision@{PQR_K} of ADC top-k over "
    f"the x35 PQ codes ({PQ_M}×{PQ_KS} seeded codebooks) against the "
    "EXACT squared-L2 top-k truth on the same query vectors — L2 "
    "truth deliberately, the index's own metric, so the audit "
    "measures QUANTIZATION loss alone (cosine truth would conflate "
    "it with metric mismatch). Self-matches excluded from BOTH legs "
    "(pq_topk exclude_self=True). Every d² is the shared zip-diff "
    "IEEE fold (bit-identical cross-engine, proven by x35/x36); "
    "approx distances sum the 4 LUT terms in fixed m order both "
    "sides; counts exact BIGINTs, CASE-guarded ratios. "
    "operators/similarity.ann_recall_audit(truth=exact-L2) + "
    "brute_force_topk_l2 + pq_topk.",
)
def x83_pq_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.similarity import (
        ann_recall_audit,
        brute_force_topk_l2,
        pq_encode,
        pq_seed_codebooks,
        pq_topk,
    )

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    books = pq_seed_codebooks(
        emb, "vec_id", "embedding", PQ_M * PQ_SUB, PQ_M, PQ_KS
    )
    encoded = pq_encode(emb, "vec_id", "embedding", books)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_topk(
        encoded, queries, books, "vec_id", "query_id", "embedding",
        PQR_K, exclude_self=True,
    )
    truth = brute_force_topk_l2(
        emb, queries, "vec_id", "embedding", PQR_K
    )
    return ann_recall_audit(
        emb, queries, "vec_id", "embedding", PQR_K, approx,
        truth=truth,
    )


# weighted exact-k draw: per-priority seats, weight = order value cents
WES_K = 20


@register(
    "x94_weighted_sample",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS weight,
             CAST(concat('0x', substring(
                 md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
               AS hb
      FROM orders WHERE o_orderkey IS NOT NULL
    ), f AS (
      SELECT o_orderpriority, o_orderkey, weight,
             CAST(CAST(-ln((hb + 1) / 4294967297.0) AS VARCHAR)
                  AS DECIMAL(18,12)) AS lnq
      FROM h WHERE weight > 0
    ), r AS (
      SELECT o_orderpriority, o_orderkey, weight,
             CAST(CAST(lnq AS VARCHAR) AS DOUBLE)
               / CAST(weight AS DOUBLE) AS race_key
      FROM f
    ), rk AS (
      SELECT o_orderpriority, o_orderkey, weight, race_key,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY race_key, o_orderkey
             ) AS INT) AS rank
      FROM r
    )
    SELECT o_orderpriority, rank, o_orderkey, weight, race_key
    FROM rk WHERE rank <= {WES_K}
    """,
    doc=f"Weight-proportional exact-{WES_K} draw per order priority "
    "(Efraimidis-Spirakis 2006 exponential race): race_key = "
    "-ln(u)/weight with u a deterministic md5-uniform, k smallest "
    "keys win — the fixed-budget weighted draw completing the "
    "sampling family (x24/x42 rate-based, x59/x77 exact-k "
    "weight-blind). ln quantized DECIMAL(18,12) per-term via the "
    "VARCHAR hop (u17 rule — and the decimal→double read-back hops "
    "too: 2.2e13-scaled internal ints sit exactly in DuckDB's 1-ulp "
    "direct-cast territory), ONE IEEE division by the cents weight "
    "(u23's money rule), unique-id tiebreak; rank<=k rewrites to "
    "WindowGroupLimit. operators/sampling.weighted_exact_sample.",
)
def x94_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.sampling import (
        weighted_exact_sample,
    )

    cat = load_testdata(spark, sf_dir)
    return weighted_exact_sample(
        cat.table("orders"),
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)") * 100,
        WES_K,
        by=["o_orderpriority"],
    )


def _auc_oracle() -> str:
    """x95: tie-aware Mann-Whitney AUC of token count as a predictor
    of x51's Gopher-repetition pass flag, per source — the label CTE
    embeds x51's oracle verbatim (x81's single-source pattern; x81
    evaluates a score's SCALE, this evaluates DISCRIMINATION). The
    rank sum never ranks rows: per distinct (source, score) value the
    tied block contributes p*(2*cum_before + c + 1) exactly."""
    return f"""
    WITH lbl AS ({_repetition_oracle()}),
    feat AS (
      SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS s
      FROM (SELECT doc_id, source, {SQL_TOKENS} AS toks
            FROM documents)
    ),
    rows_pc AS (
      SELECT f.source, f.s, CAST(l.passes AS BIGINT) AS y
      FROM feat f JOIN lbl l USING (doc_id)
      WHERE f.s IS NOT NULL AND l.passes IS NOT NULL
    ),
    per_v AS (
      SELECT source, s,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(y) AS BIGINT) AS p
      FROM rows_pc GROUP BY source, s
    ),
    cum AS (
      SELECT source, c, p,
             CAST(SUM(c) OVER (
               PARTITION BY source ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - c AS BIGINT) AS cb
      FROM per_v
    ),
    agg AS (
      SELECT source,
             CAST(SUM(p) AS BIGINT) AS n_pos,
             CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
             SUM(CAST(p AS HUGEINT)
                 * (2 * CAST(cb AS HUGEINT)
                    + CAST(c AS HUGEINT) + 1)) AS sr2
      FROM cum GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(CAST(sr2 - CAST(n_pos AS HUGEINT)
                             * (CAST(n_pos AS HUGEINT) + 1)
                  AS VARCHAR) AS DOUBLE)
             / CAST(CAST(2 * CAST(n_pos AS HUGEINT)
                           * CAST(n_neg AS HUGEINT)
                    AS VARCHAR) AS DOUBLE)
           END AS auc
    FROM agg
    """


@register(
    "x95_score_auc",
    oracle=_auc_oracle(),
    doc="Exact tie-aware ROC AUC (Mann-Whitney rank-sum identity) of "
    "token count as a predictor of the Gopher-repetition pass flag, "
    "per source — the DISCRIMINATION face of the score-eval family "
    "(x75 ranking, x81 calibration/scale): is document length alone "
    "already a separability baseline any learned quality score must "
    "beat, and does it differ by source. Label CTE embeds x51's "
    "oracle verbatim; score is x02's token segmentation (one "
    "definition each). AUC = (SumR2+ - n+(n+1)) / (2 n+ n-) with the "
    "2*rank trick keeping tie-averaged ranks integral: per distinct "
    "(source, score) block, positives contribute p*(2*cum_before + "
    "c + 1) — ONE (source,score)-keyed pre-agg shuffle, a cumulative "
    "window over the DOMAIN-sized value frame (u23/u25 shape), NO "
    "row-level rank join anywhere; single IEEE division of exact "
    "DECIMAL(38,0)/HUGEINT integers (VARCHAR-hopped oracle casts). "
    "Class-missing groups CASE-guarded NULL. "
    "operators/profile.mann_whitney_auc.",
)
def x95_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.functions import text as X
    from ods_to_datalake_spark.operators.profile import (
        mann_whitney_auc,
    )
    from ods_to_datalake_spark.operators.quality import (
        gopher_repetition,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    feat = docs.select(
        "doc_id",
        "source",
        F.size(X.tokens("text")).cast("long").alias("__ntok"),
    )
    lbl = gopher_repetition(docs, "doc_id", "text").select(
        "doc_id", "passes"
    )
    return mann_whitney_auc(
        feat.join(lbl, "doc_id"),
        ["source"],
        F.col("__ntok"),
        F.col("passes"),
    )


def _lift_oracle() -> str:
    """x96: decile-lift arithmetic over the same token-count score
    and Gopher-repetition label as x95 (one score, one label, three
    eval faces: x95 discrimination, x81 calibration, this gains)."""
    return f"""
    WITH lbl AS ({_repetition_oracle()}),
    feat AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS s
      FROM (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents)
    ),
    rows_pc AS (
      SELECT f.s, CAST(l.passes AS BIGINT) AS y
      FROM feat f JOIN lbl l USING (doc_id)
      WHERE f.s IS NOT NULL AND l.passes IS NOT NULL
    ),
    per_v AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(y) AS BIGINT) AS p
      FROM rows_pc GROUP BY s
    ),
    cum AS (
      SELECT c, p,
             CAST(SUM(c) OVER (
               ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - c AS BIGINT) AS cb,
             CAST(SUM(c) OVER () AS BIGINT) AS n,
             CAST(SUM(p) OVER () AS BIGINT) AS np
      FROM per_v
    ),
    binned AS (
      SELECT (CAST(10 AS BIGINT) * cb) // n AS bin,
             c, p, n, np
      FROM cum
    ),
    per_bin AS (
      SELECT bin,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(SUM(p) AS BIGINT) AS n_pos,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(np) AS BIGINT) AS np
      FROM binned GROUP BY bin
    ),
    staged AS (
      SELECT bin, n_rows, n_pos,
             CAST(SUM(n_rows) OVER (
               ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_rows,
             CAST(SUM(n_pos) OVER (
               ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_pos,
             n, np
      FROM per_bin
    )
    SELECT bin, n_rows, n_pos, cum_rows, cum_pos,
           CASE WHEN np > 0 THEN
             CAST(cum_pos AS DOUBLE) / CAST(np AS DOUBLE)
           END AS capture_rate,
           CASE WHEN np > 0 AND cum_rows > 0 THEN
             CAST(CAST(CAST(cum_pos AS HUGEINT) * CAST(n AS HUGEINT)
                  AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(cum_rows AS HUGEINT)
                         * CAST(np AS HUGEINT)
                  AS VARCHAR) AS DOUBLE)
           END AS cum_lift
    FROM staged
    """


@register(
    "x96_lift_table",
    oracle=_lift_oracle(),
    doc="Cumulative-gains / decile-lift table of token count against "
    "the Gopher-repetition pass flag — the OPERATIONAL face of the "
    "score-eval family (x95 discrimination, x81 calibration, this "
    "gains: 'act on the top 20%, get what fraction of positives'): "
    "sort by score DESC, all-integer equal-population binning (a "
    "tied block lands WHOLE in bin (10*cum_before) div n — ties "
    "never split, the x42 rule; a dominant block may leave later "
    "bins absent), exact BIGINT folds, capture/lift single IEEE "
    "divisions of DECIMAL(38,0)/HUGEINT cross-products (oracle "
    "VARCHAR-hops). Same score+label single-sources as x95/x81. ONE "
    "score-keyed pre-agg, domain-sized cumulative window, 10-row "
    "tail. operators/features.lift_table.",
)
def x96_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.functions import text as X
    from ods_to_datalake_spark.operators.features import lift_table
    from ods_to_datalake_spark.operators.quality import (
        gopher_repetition,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    feat = docs.select(
        "doc_id",
        F.size(X.tokens("text")).cast("long").alias("__ntok"),
    )
    lbl = gopher_repetition(docs, "doc_id", "text").select(
        "doc_id", "passes"
    )
    return lift_table(
        feat.join(lbl, "doc_id"),
        F.col("__ntok"),
        F.col("passes"),
    )
