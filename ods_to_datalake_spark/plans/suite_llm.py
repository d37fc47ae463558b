"""LLM-data-pipeline suite: dedup, similarity, text analysis over the
`documents` and `embeddings` tables (charter north-star extensions).

Oracle strategy: every hash-based operator is built on md5 — the one hash
both Spark and DuckDB compute identically — so even MinHash/LSH has an
exact ANSI-SQL oracle. Vector math is cast to double on both sides, folded
in the same element order, and rounded before ranking so top-k selection
is cross-engine deterministic. The SQL below is *generated* from the same
constants the Spark operators use, keeping both sides in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.functions import text as X
from ods_to_datalake_spark.functions import vectors as V
from ods_to_datalake_spark.plans.suite import register

# shared fragments/constants live in sql_fragments (import-side-effect
# free, so suite_ingest can reuse them without triggering this module's
# registrations out of load_all()'s window order)
from ods_to_datalake_spark.plans.sql_fragments import (  # noqa: E402
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    SHINGLE_N,
    SQL_TOKENS,
    SQL_WORD_VALUE,
    sql_band_key as _sql_band_key,
    sql_minhash_ctes as _sql_minhash_ctes,
    sql_shingles as _sql_shingles,
)

ANN_TOPK = 10
IVF_TOPK = 5
IVF_NPROBE = 2
N_QUERY_VECS = 8  # queries = vec_id < 8


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "x01_exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
    doc="Exact dedup via content-hash groupBy: one shuffle on the hash, "
    "keep-min representative; duplicate clusters only.",
)
def x01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import exact_dedup

    cat = load_testdata(spark, sf_dir)
    return exact_dedup(cat.table("documents"), "text", "doc_id")


@register(
    "x03_minhash_signature",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS)} AS sh FROM documents
    ), {_sql_minhash_ctes()}
    SELECT doc_id,
           concat_ws(',', {", ".join(f"mh_{s}" for s in range(MINHASH_K))})
             AS signature
    FROM sig
    """,
    doc=f"MinHash signatures: k={MINHASH_K} Carter-Wegman affine maps of "
    f"one md5 per word {SHINGLE_N}-shingle, explode + min-aggregate "
    "(codegen + map-side partials; shuffle carries k values per doc) — "
    "bit-identical in the SQL oracle.",
)
def x03_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import minhash_table

    cat = load_testdata(spark, sf_dir)
    sig = minhash_table(
        cat.table("documents"), "doc_id", "text", SHINGLE_N, MINHASH_K
    )
    return sig.select(
        "doc_id",
        F.concat_ws(
            ",", *[F.col(f"mh_{s}") for s in range(MINHASH_K)]
        ).alias("signature"),
    )


_BAND_SQL = ", ".join(
    f"{_sql_band_key(b)} AS bk_{b}" for b in range(LSH_BANDS)
)
_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, bk_{b} AS band_key FROM bands"
    for b in range(LSH_BANDS)
)


@register(
    "x04_minhash_lsh_candidates",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS)} AS sh FROM documents
    ), {_sql_minhash_ctes()}, bands AS (
      SELECT doc_id, {_BAND_SQL} FROM sig
    ), banded AS (
      {_BAND_UNION}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
    doc=f"MinHash+LSH near-dup candidates: {LSH_BANDS} bands × {LSH_ROWS} "
    "rows; explode to band keys, one shuffle, per-bucket self-join — "
    "never the O(n²) cross product.",
    headline=True,
)
def x04_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import minhash_lsh_candidates

    cat = load_testdata(spark, sf_dir)
    return minhash_lsh_candidates(
        cat.table("documents"),
        "doc_id",
        "text",
        shingle_n=SHINGLE_N,
        k=MINHASH_K,
        bands=LSH_BANDS,
        rows=LSH_ROWS,
    )


@register(
    "x05_lsh_jaccard_verify",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, list_distinct({_sql_shingles(SQL_TOKENS)}) AS sh
      FROM documents
    ), sh_ok AS (
      SELECT doc_id, sh FROM sh_t WHERE len(sh) > 0
    ), {_sql_minhash_ctes('sh_ok')}, bands AS (
      SELECT doc_id, {_BAND_SQL} FROM sig
    ), banded AS (
      {_BAND_UNION}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), shx AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sh_ok
    ), sizes AS (
      SELECT doc_id, len(sh) AS n_sh FROM sh_ok
    ), inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN shx ea ON c.id_a = ea.doc_id
      JOIN shx eb ON c.id_b = eb.doc_id AND ea.shingle = eb.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT c.id_a, c.id_b,
           ROUND(COALESCE(i.n_inter, 0)
                 / (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)), 6)
             AS jaccard
    FROM cand c
    JOIN sizes sa ON c.id_a = sa.doc_id
    JOIN sizes sb ON c.id_b = sb.doc_id
    LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
    """,
    doc="Exact n-gram Jaccard for LSH candidate pairs only — the "
    "candidate pre-filter bounds the quadratic verify step; the full "
    "dedup funnel (hash → LSH → verify) in one plan.",
)
def x05_lsh_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    cands = minhash_lsh_candidates(
        docs,
        "doc_id",
        "text",
        shingle_n=SHINGLE_N,
        k=MINHASH_K,
        bands=LSH_BANDS,
        rows=LSH_ROWS,
    )
    return jaccard_pairs(
        docs, cands, "doc_id", "text", shingle_n=SHINGLE_N
    )


# near-dup verification threshold shared by every funnel consumer
# (x25/x33 clustering, x43 canonicalization, x44 overlap, x45 leakage,
# and their assembled oracles)
NEAR_DUP_JACCARD = 0.5


def verified_pairs(docs: DataFrame) -> DataFrame:
    """The shared LSH -> exact-Jaccard verified-pair funnel over a
    documents frame: (id_a, id_b, jaccard) with jaccard >=
    NEAR_DUP_JACCARD. Single Spark-side source of truth for the five
    registered queries built on verified pairs — their oracles embed
    x05's SQL with the same threshold, so engine and oracle can only
    change together."""
    from ods_to_datalake_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
    )

    cands = minhash_lsh_candidates(
        docs,
        "doc_id",
        "text",
        shingle_n=SHINGLE_N,
        k=MINHASH_K,
        bands=LSH_BANDS,
        rows=LSH_ROWS,
    )
    return jaccard_pairs(
        docs, cands, "doc_id", "text", shingle_n=SHINGLE_N
    ).filter(F.col("jaccard") >= NEAR_DUP_JACCARD)


_SIMHASH_BITS_SQL = ",\n        ".join(
    f"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN "
    f"substring(h, {i}, 1) IN ('8','9','a','b','c','d','e','f') "
    f"THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
    for i in range(1, 33)
)


@register(
    "x06_simhash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_transform({SQL_TOKENS}, tk -> md5(tk)) AS hs
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN hs IS NULL THEN NULL
                ELSE concat({_SIMHASH_BITS_SQL}) END AS simhash
    FROM t
    """,
    doc="32-bit SimHash (nibble-MSB projection of per-token md5): "
    "map-only signature for Hamming-bucket near-dup grouping; one md5 "
    "per token via array-accumulator aggregate. NULL text → NULL "
    "signature (the per-bit CASEs would otherwise fabricate an "
    "all-zero signature on the SQL side — caught by the NULL edge "
    "doc).",
)
def x06_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import simhash_signatures

    cat = load_testdata(spark, sf_dir)
    return simhash_signatures(cat.table("documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_SQL_COS = (
    "ROUND(list_dot_product(qv, cv) / "
    "NULLIF((sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 0), 6)"
)


@register(
    "x07_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}
    ), c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings
    ), s AS (
      SELECT query_id, vec_id, {_SQL_COS} AS cosine
      FROM c, q WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
      ) AS rn FROM s
    ) WHERE rn <= {ANN_TOPK}
    """,
    doc=f"Brute-force cosine top-{ANN_TOPK}: broadcast query set × corpus "
    "scan, rounded-cosine ranking with id tiebreak, WindowGroupLimit "
    "top-k — the exact ANN baseline.",
    headline=True,
)
def x07_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import brute_force_topk

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return brute_force_topk(
        emb, queries, "vec_id", "embedding", ANN_TOPK
    ).select("query_id", "vec_id", "cosine")


@register(
    "x08_ivf_ann",
    oracle=f"""
    WITH dims AS (
      SELECT unnest(range(1,
        (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS pos
    ), per_dim AS (
      SELECT e.label, d.pos,
             CAST(SUM(CAST(CAST(e.embedding[d.pos] AS DOUBLE)
                           AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS mean_val
      FROM embeddings e, dims d
      GROUP BY e.label, d.pos
    ), cents AS (
      SELECT label, list(mean_val ORDER BY pos) AS centroid
      FROM per_dim GROUP BY label
    ), q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}
    ), probe_scores AS (
      SELECT q.query_id, c.label,
             ROUND(list_dot_product(qv, centroid) /
                   NULLIF((sqrt(list_dot_product(qv, qv)) *
                    sqrt(list_dot_product(centroid, centroid))), 0), 6)
               AS c_cos
      FROM q, cents c
    ), probes AS (
      SELECT query_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY c_cos DESC, label
        ) AS rn FROM probe_scores
      ) WHERE rn <= {IVF_NPROBE}
    ), c AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings
    ), s AS (
      SELECT p.query_id, c.vec_id, {_SQL_COS} AS cosine
      FROM c JOIN probes p ON c.label = p.label
      JOIN q ON q.query_id = p.query_id
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
      ) AS rn FROM s
    ) WHERE rn <= {IVF_TOPK}
    """,
    doc=f"IVF-style ANN: decimal-exact label centroids, nprobe={IVF_NPROBE} "
    f"probe, exact top-{IVF_TOPK} within probed cells only — corpus scan "
    "drops ~n_clusters/nprobe; centroids broadcast, corpus never shuffled.",
)
def x08_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import ivf_topk

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return ivf_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        "label",
        IVF_TOPK,
        nprobe=IVF_NPROBE,
    ).select("query_id", "vec_id", "cosine")


@register(
    "x19_hash_split",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                         1, 8)) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
    doc="Deterministic 80/10/10 train/val/test split by content-stable "
    "hash bucket (md5 of the id, not rand()) — membership is "
    "reproducible across runs, machines, and engines; THE way to cut "
    "holdout sets in a distributed corpus.",
)
def x19_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return cat.table("documents").select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "x20_quality_topk_per_source",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             ROUND(CAST(length(text) AS DOUBLE) /
                   greatest(LEN(string_split_regex(TRIM(text), '\\s+')), 1),
                   6) AS mean_token_len
      FROM documents
    )
    SELECT source, doc_id, mean_token_len FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY mean_token_len DESC, doc_id
      ) AS rn FROM scored
    ) WHERE rn <= 5
    """,
    doc="Curation: keep the top-5 docs per source by a quality signal — "
    "score map-side, WindowGroupLimit per-group cut (map-side limit "
    "before the shuffle); the domain-balanced selection step of a "
    "training-mix builder.",
)
def x20_quality_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    cat = load_testdata(spark, sf_dir)
    scored = cat.table("documents").select(
        "doc_id",
        "source",
        F.round(
            F.length("text").cast("double")
            / F.greatest(
                F.size(F.split(F.trim(F.col("text")), r"\s+")), F.lit(1)
            ),
            6,
        ).alias("mean_token_len"),
    )
    return top_k_per_group(
        scored,
        ["source"],
        [F.col("mean_token_len").desc(), F.col("doc_id")],
        5,
    ).select("source", "doc_id", "mean_token_len")


DECON_SHINGLE_N = 5
DECON_BENCH_IDS = 10  # "benchmark set" = doc_id < 10


@register(
    "x18_decontaminate",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id,
             list_distinct({_sql_shingles(SQL_TOKENS, DECON_SHINGLE_N)})
               AS sh
      FROM documents
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh_t
      WHERE doc_id < {DECON_BENCH_IDS}
    ), train AS (
      SELECT doc_id, unnest(sh) AS s FROM sh_t
      WHERE doc_id >= {DECON_BENCH_IDS}
    )
    SELECT DISTINCT t.doc_id AS contaminated_doc_id
    FROM train t JOIN bench b ON t.s = b.s
    """,
    doc=f"Benchmark decontamination: flag training docs sharing any "
    f"{DECON_SHINGLE_N}-gram with the benchmark set — shingle explode + "
    "semi-join on the (small, broadcastable) benchmark shingle set; the "
    "standard eval-leakage gate for training corpora.",
)
def x18_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import spread_small_input

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
    )
    train = exploded.filter(F.col("doc_id") >= DECON_BENCH_IDS)
    return (
        train.join(F.broadcast(bench), on="s", how="left_semi")
        .select(F.col("doc_id").alias("contaminated_doc_id"))
        .distinct()
    )


SIMHASH_MAX_HAMMING = 6
_SIMHASH_BANDS = [(1, 8), (9, 8), (17, 8), (25, 8)]  # (start, len) ×4


@register(
    "x21_simhash_near_dup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_transform({SQL_TOKENS}, tk -> md5(tk)) AS hs
      FROM documents
    ), sig AS (
      -- NULL text → no signature → no pairs (mirrors Spark's NULL
      -- propagation; the per-bit CASEs would fabricate all-zeros)
      SELECT doc_id, concat({_SIMHASH_BITS_SQL}) AS simhash FROM t
      WHERE hs IS NOT NULL
    ), banded AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band_idx, "
        f"substring(simhash, {s}, {l}) AS band FROM sig"
        for i, (s, l) in enumerate(_SIMHASH_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sh_a,
                      b.doc_id AS id_b, b.simhash AS sh_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band = b.band
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_filter(list_transform(range(1, 33),
                i -> substring(sh_a, i, 1) <> substring(sh_b, i, 1)),
                x -> x)) AS INT) AS hamming
    FROM cand
    WHERE len(list_filter(list_transform(range(1, 33),
          i -> substring(sh_a, i, 1) <> substring(sh_b, i, 1)),
          x -> x)) <= {SIMHASH_MAX_HAMMING}
    """,
    doc=f"SimHash near-dup search: band the 32-bit signature into 4×8-bit "
    f"chunks (a pair within Hamming {SIMHASH_MAX_HAMMING} must agree on "
    "≥1 band by pigeonhole when ≤3 bands differ... banding gives "
    "candidates, exact Hamming verifies ≤ "
    f"{SIMHASH_MAX_HAMMING}) — signature banding join, no cross "
    "product; completes the SimHash dedup path started by x06.",
)
def x21_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        simhash_band_pairs,
        simhash_signatures,
        spread_small_input,
    )

    cat = load_testdata(spark, sf_dir)
    sig = simhash_signatures(
        spread_small_input(cat.table("documents").select("doc_id", "text")),
        "doc_id",
        "text",
    )
    return simhash_band_pairs(
        sig,
        id_col="doc_id",
        sig_col="simhash",
        n_bands=len(_SIMHASH_BANDS),
        max_hamming=SIMHASH_MAX_HAMMING,
    )


from ods_to_datalake_spark.plans.sql_fragments import (  # noqa: E402
    N_PLANES,
    NEAR_DUP_TAU,
)


@register(
    "x13_cosine_near_dup",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) /
                 NULLIF((sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v))), 0), 6) AS cosine
    FROM c a JOIN c b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) /
                NULLIF((sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 0), 6) >= {NEAR_DUP_TAU}
    """,
    doc=f"Embedding-cosine near-dup pairs, exact: all pairs ≥ {NEAR_DUP_TAU} "
    "— the ground-truth face of x14. ORACLE-ONLY AT SCALE: the self-join "
    "is O(n²) by construction; production code must use x14 / "
    "similarity.hyperplane_lsh_pairs (bucketed, one shuffle) and reserve "
    "this exact form for verifying an LSH-reduced candidate set.",
)
def x13_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    c = emb.select(
        F.col("vec_id"), V.to_double("embedding").alias("v")
    ).withColumn("vn", V.norm(F.col("v")))
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            V.cosine_rounded_prenorm(
                F.col("a.v"),
                F.col("b.v"),
                F.col("a.vn"),
                F.col("b.vn"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_TAU)
    )


from ods_to_datalake_spark.plans.sql_fragments import (  # noqa: E402
    EMB_DIM as _EMB_DIM,
    sql_hyperplane_bucket,
)

_SQL_BUCKET = sql_hyperplane_bucket(_EMB_DIM)


@register(
    "x14_hyperplane_lsh_near_dup",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), tagged AS (
      SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM c
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) /
                 NULLIF((sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v))), 0), 6) AS cosine
    FROM tagged a JOIN tagged b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v) /
                NULLIF((sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 0), 6) >= {NEAR_DUP_TAU}
    """,
    doc=f"Embedding near-dup via random-hyperplane LSH ({N_PLANES} "
    "deterministic md5-derived planes): bucket on projection sign bits, "
    "pair within buckets, verify exact cosine — the scale path (one "
    "shuffle on bucket keys, no O(n²) cross product); oracle runs the "
    "identical algorithm.",
)
def x14_hyperplane_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import (
        hyperplane_lsh_pairs,
    )

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    return hyperplane_lsh_pairs(
        emb, "vec_id", "embedding", _EMB_DIM,
        n_planes=N_PLANES, threshold=NEAR_DUP_TAU,
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _sql_stop_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in X.STOPWORDS[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


_SQL_LANG_SCORES = ",\n             ".join(
    f"{_sql_stop_count(lang)} / greatest(len(toks), 1) AS s_{lang}"
    for lang in X.STOPWORDS
)
_SQL_LANG_CASE = " ".join(
    f"WHEN s_{lang} = best THEN '{lang}'" for lang in X.STOPWORDS
)


@register(
    "x09_langid",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ), scores AS (
      SELECT doc_id,
             {_SQL_LANG_SCORES}
      FROM t
    ), best_t AS (
      SELECT doc_id,
             greatest({", ".join(f"s_{lang}" for lang in X.STOPWORDS)})
               AS best, *
      FROM scores
    )
    SELECT doc_id,
           CASE WHEN best <= 0 THEN 'und' {_SQL_LANG_CASE} END
             AS lang_pred
    FROM best_t
    """,
    doc="Language-ID heuristic: stopword-hit ratio per language, argmax "
    "with deterministic tie-break — map-only, no shuffle.",
)
def x09_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return cat.table("documents").select(
        "doc_id", X.langid(X.tokens("text")).alias("lang_pred")
    )


@register(
    "x10_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {SQL_TOKENS} AS toks,
             {_sql_stop_count('en')} AS en_stops
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS
                      DOUBLE) / greatest(length(text), 1), 6)
             AS punct_ratio,
           ROUND(CAST(en_stops AS DOUBLE) / greatest(len(toks), 1), 6)
             AS stopword_ratio,
           ROUND(CAST(length(text) AS DOUBLE) / greatest(len(toks), 1), 6)
             AS mean_token_len
    FROM t
    """,
    doc="Quality-signal extraction: length, punctuation ratio, stopword "
    "ratio, mean token length — the filter features of a corpus-quality "
    "pipeline, all JVM-side regexp/array ops.",
)
def x10_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    toks = X.tokens("text")
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    return cat.table("documents").select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9 ]"), 0))
            .cast("double")
            / F.greatest(n_chars, F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.round(
            X.stopword_count(toks, X.STOPWORDS["en"]).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.round(
            n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("mean_token_len"),
    )


@register(
    "x11_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(1, len(toks) + 1),
                i -> {SQL_WORD_VALUE.format(w='toks[i]')}
                     * ((i * {X.FP_WEIGHT}) % {X.FP_MOD})))
                % {X.FP_MOD} AS BIGINT) AS fingerprint
    FROM t
    """,
    doc="Order-sensitive document fingerprint: positional weighted hash "
    "mod 2^31-1 — order-sensitive like a rolling hash but expressible as "
    "a plain sum, so it parallelizes and has an exact SQL oracle.",
)
def x11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return cat.table("documents").select(
        "doc_id", X.fingerprint(X.tokens("text")).alias("fingerprint")
    )


CHUNK_SIZE = 32
CHUNK_OVERLAP = 8
_CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP


@register(
    "x15_redact_text",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                              '<EMAIL>', 'g'),
               'https?://[^ ]+', '<URL>', 'g'),
             '[0-9]{4,}', '<NUM>', 'g') AS redacted,
           CAST(LEN(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails
    FROM documents
    """,
    doc="PII/URL scrubbing: email, URL, and long-digit-run redaction via "
    "JVM-side regexp_replace (the corpus-cleaning pre-step); counts "
    "surfaced for audit.",
)
def x15_redact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    url = r"https?://[^ ]+"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email, "<EMAIL>"),
            url,
            "<URL>",
        ),
        r"[0-9]{4,}",
        "<NUM>",
    )
    return cat.table("documents").select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email), 0))
        .cast("long")
        .alias("n_emails"),
    )


@register(
    "x16_chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ), chunks AS (
      SELECT doc_id,
             [array_to_string(toks[(i - 1) * {_CHUNK_STEP} + 1 :
                                   (i - 1) * {_CHUNK_STEP} + {CHUNK_SIZE}],
                              ' ')
              for i in range(1,
                GREATEST(CAST(ceil((len(toks) - {CHUNK_OVERLAP})
                              / {_CHUNK_STEP}) AS BIGINT), 1) + 1)]
               AS chunk_list
      FROM t
    )
    SELECT doc_id,
           CAST(generate_subscripts(chunk_list, 1) - 1 AS INT)
             AS chunk_id,
           unnest(chunk_list) AS chunk_text
    FROM chunks
    """,
    doc=f"Document chunking for training pipelines: {CHUNK_SIZE}-token "
    f"windows with {CHUNK_OVERLAP}-token overlap via token-slice + "
    "posexplode — map-only, order-preserving, no UDF; chunk count = "
    "ceil((n-overlap)/step).",
)
def x16_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    toks = X.tokens("text")
    n_chunks = F.greatest(
        F.ceil(
            (F.size(toks) - F.lit(CHUNK_OVERLAP)) / F.lit(_CHUNK_STEP)
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    chunk_list = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * _CHUNK_STEP + 1, CHUNK_SIZE), " "
        ),
    )
    return (
        cat.table("documents")
        .select("doc_id", F.posexplode(chunk_list).alias("chunk_id", "chunk_text"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            "chunk_text",
        )
    )


@register(
    "x17_profile_table",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_non_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    """,
    doc="Column profiling (ODS landing QA): per-column row/null/distinct "
    "counts and min/max in ONE pass over the table (single aggregate, "
    "unpivoted to rows) — the ingest-gate health check. Shares "
    "operators/profile.table_profile with u11's full-table profile.",
)
def x17_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import table_profile

    cat = load_testdata(spark, sf_dir)
    prof = table_profile(
        cat.table("orders"), ["o_custkey", "o_orderstatus"]
    )
    # this query's historical shape reports non-null counts; the
    # operator reports null counts — same one-pass aggregate
    return prof.select(
        "column_name",
        "n_rows",
        (prof.n_rows - prof.n_nulls).alias("n_non_null"),
        "n_distinct",
        "min_value",
        "max_value",
    )


@register(
    "x02_token_count",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split_regex(TRIM(text), '\\s+')) AS BIGINT)
             AS ws_tokens,
           CAST(LEN(regexp_extract_all(LOWER(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens + a BPE-ish regex segmentation "
    "(letter runs / digit runs / single punctuation) — pure JVM-side "
    "regexp, no UDF.",
)
def x02_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "ws_tokens"
        ),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ).cast("long").alias("bpe_ish_tokens"),
    )


@register(
    "x22_repetition_metrics",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ), t AS (
      SELECT doc_id, unnest(w) AS word FROM toks
    ), wc AS (
      SELECT doc_id, word, COUNT(*) AS c FROM t GROUP BY doc_id, word
    ), wa AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_count
      FROM wc GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 2
                  THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
                  ELSE [] END AS bigrams
      FROM toks
    ), ba AS (
      SELECT doc_id, CAST(len(bigrams) AS BIGINT) AS n_bigrams,
             CAST(len(list_distinct(bigrams)) AS BIGINT)
               AS n_distinct_bigrams
      FROM bg
    )
    SELECT wa.doc_id, n_words,
           ROUND(1 - CAST(n_distinct AS DOUBLE)
                     / CAST(n_words AS DOUBLE), 6) AS dup_word_frac,
           ROUND(CAST(top_count AS DOUBLE)
                 / CAST(n_words AS DOUBLE), 6) AS top_word_share,
           CASE WHEN n_bigrams = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(1 - CAST(n_distinct_bigrams AS DOUBLE)
                           / CAST(n_bigrams AS DOUBLE), 6)
           END AS dup_bigram_frac
    FROM wa JOIN ba ON wa.doc_id = ba.doc_id
    """,
    doc="Gopher-style intra-document repetition metrics (duplicate-word "
    "fraction, most-common-word share, duplicate-bigram fraction) — the "
    "'repetitious documents' filter of a training-data pipeline. "
    "Relational form: one explode + two codegen'd aggregations + a lead "
    "window for bigrams (NOT nested higher-order functions — see the "
    "measured 20x trap in operators/dedup.minhash_table). All ratios "
    "are exact-count divisions rounded to 6; the zero-bigram case "
    "(single-word doc) is guarded in both engines (ANSI div-by-zero).",
)
def x22_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "word"
        ),
    )
    wc = words.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    wa = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_count"),
    )
    w_seq = Window.partitionBy("doc_id").orderBy("pos")
    ba = (
        words.withColumn("nxt", F.lead("word").over(w_seq))
        .filter(F.col("nxt").isNotNull())
        .select(
            "doc_id", F.concat_ws(" ", "word", "nxt").alias("bigram")
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.count_distinct("bigram").cast("long").alias(
                "n_distinct_bigrams"
            ),
        )
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        wa.join(ba, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round(
                F.lit(1) - dbl("n_distinct") / dbl("n_words"), 6
            ).alias("dup_word_frac"),
            F.round(dbl("top_count") / dbl("n_words"), 6).alias(
                "top_word_share"
            ),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) == 0,
                F.lit(0.0),
            )
            .otherwise(
                F.round(
                    F.lit(1)
                    - dbl("n_distinct_bigrams") / dbl("n_bigrams"),
                    6,
                )
            )
            .alias("dup_bigram_frac"),
        )
    )


@register(
    "x23_tfidf_top_terms",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
      FROM documents
    ), wc AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM t GROUP BY doc_id, word
    ), dl AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len
      FROM wc GROUP BY doc_id
    ), dfreq AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS df
      FROM wc GROUP BY word
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
      SELECT wc.doc_id, wc.word,
             ROUND((CAST(wc.tf AS DOUBLE) / CAST(dl.doc_len AS DOUBLE))
                   * LN(CAST(n.n_docs AS DOUBLE)
                        / CAST(dfreq.df AS DOUBLE)), 9) AS score
      FROM wc
      JOIN dl ON wc.doc_id = dl.doc_id
      JOIN dfreq ON wc.word = dfreq.word
      CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, word, score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, word ASC
             ) AS rn
      FROM scored
    )
    SELECT doc_id, word, score FROM ranked WHERE rn <= 3
    """,
    doc="Corpus TF-IDF with per-document top-3 terms: term frequencies "
    "and document frequencies from ONE exploded pass (the (doc, word) "
    "aggregate feeds doc-length, df, and the score join), the corpus "
    "size as a 1-row broadcast, WindowGroupLimit top-k. Score doubles "
    "are computed with identical cast/op order in both engines and "
    "rounded to 9 BEFORE ranking; ties broken by word — cross-engine "
    "deterministic top-k.",
)
def x23_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators import agg as agg_ops

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "word"
        ),
    )
    wc = words.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = wc.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len")
    )
    dfreq = wc.groupBy("word").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    scored = (
        wc.join(dl, "doc_id")
        .join(dfreq, "word")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                (dbl("tf") / dbl("doc_len"))
                * F.log(dbl("n_docs") / dbl("df")),
                9,
            ).alias("score"),
        )
    )
    return agg_ops.top_k_per_group(
        scored,
        ["doc_id"],
        [F.col("score").desc(), F.col("word").asc()],
        3,
    )


@register(
    "x24_stratified_sample",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, source,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 10000 AS bucket,
             CASE WHEN source IN ('src0','src1','src2','src3','src4')
                    THEN 3000
                  WHEN source IN ('src5','src6','src7','src8','src9')
                    THEN 6000
                  ELSE 10000 END AS keep_per_10k
      FROM documents
    )
    SELECT doc_id, source FROM hashed
    WHERE bucket < keep_per_10k
    """,
    doc="Deterministic stratified downsampling (corpus rebalancing): "
    "keep 30% of src0-4, 60% of src5-9, all of the rest — selected by "
    "md5 hash bucket of the doc id, NOT df.sample(), so the kept set "
    "is identical across runs, partitionings, and engines. Stateless "
    "map, no shuffle (operators/sampling.stratified_sample).",
)
def x24_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.sampling import stratified_sample

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    rates = {f"src{i}": 3000 for i in range(5)}
    rates |= {f"src{i}": 6000 for i in range(5, 10)}
    return stratified_sample(docs, "doc_id", "source", rates).select(
        "doc_id", "source"
    )


@register(
    "x25_dedup_clusters",
    oracle=None,  # assembled from x05's oracle below (single source of
    # truth for what a "verified pair" is)
    doc="Dedup-funnel clustering: verified near-dup pairs (the x05 "
    "funnel, jaccard >= 0.5) grouped into connected components via "
    "min-label propagation; keep one representative per cluster "
    "(doc_id == cluster_id) instead of dropping one side per pair, "
    "which over-deletes on chains A~B~C. Oracle: the same pair SQL "
    "wrapped in a recursive min-reachable CTE.",
)
def x25_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import connected_components

    cat = load_testdata(spark, sf_dir)
    cc = connected_components(
        verified_pairs(cat.table("documents")), "id_a", "id_b"
    )
    return cc.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


@register(
    "x33_dedup_clusters_star",
    oracle=None,  # assembled below: identical to x25's (same clustering
    # semantics, different — O(log n)-round — algorithm)
    doc="Dedup-funnel clustering via alternating large-star/small-star "
    "rounds (Kiveris et al. 2014): same verified-pair funnel and the "
    "same (id, min-reachable-id) output as x25, but convergence is "
    "O(log n) rounds independent of component diameter — the loop "
    "that survives templated corpora whose near-dup chains make "
    "min-label propagation crawl. Oracle: x25's recursive "
    "min-reachable CTE verbatim, so the two algorithms are "
    "driver-checked to agree.",
)
def x33_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        connected_components_star,
    )

    cat = load_testdata(spark, sf_dir)
    cc = connected_components_star(
        verified_pairs(cat.table("documents")), "id_a", "id_b"
    )
    return cc.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _assemble_x25_oracle() -> None:
    """The x25 oracle embeds x05's full funnel SQL as the pair source,
    then clusters with a recursive min-reachable CTE — guaranteeing the
    two queries can never disagree about what a 'verified pair' is.
    x33 (star-algorithm clustering) gets the SAME oracle: both must
    produce the identical (id, min-reachable-id) labeling."""
    from ods_to_datalake_spark.plans.suite import REGISTRY

    x05 = REGISTRY["x05_lsh_jaccard_verify"].oracle
    REGISTRY["x25_dedup_clusters"].oracle = f"""
    WITH RECURSIVE dup_pairs AS (
      SELECT id_a, id_b FROM ({x05}) v WHERE jaccard >= {NEAR_DUP_JACCARD}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION
      SELECT id_b, id_a FROM dup_pairs
    ), nodes AS (
      SELECT DISTINCT src AS id FROM edges
    ), reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst
    )
    SELECT CAST(id AS BIGINT) AS doc_id,
           CAST(MIN(r) AS BIGINT) AS cluster_id
    FROM reach GROUP BY id
    """
    REGISTRY["x33_dedup_clusters_star"].oracle = REGISTRY[
        "x25_dedup_clusters"
    ].oracle


_assemble_x25_oracle()


# number of shards for the deterministic training-order query
SHARD_N = 8
# vocabulary size for the OOV-coverage query (top-V corpus tokens)
VOCAB_V = 256


@register(
    "x40_deterministic_shard",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS hh,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % {SHARD_N} AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY hh, doc_id
           ) - 1 AS BIGINT) AS shard_pos
    FROM h
    """,
    doc=f"Reproducible global training order: {SHARD_N}-way shard by "
    "content-stable md5 bucket, within-shard position by (md5(id), id) "
    "— a deterministic pseudo-random permutation; round-robin reads "
    "replay the identical example order across runs, partitionings, "
    "and engines (df.sample()/rand() are only seed-stable per "
    "partitioning). One shuffle on the shard key; the window "
    "parallelizes across shards — no global single-partition "
    "row_number (operators/sampling.deterministic_shard).",
)
def x40_deterministic_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.sampling import (
        deterministic_shard,
    )

    cat = load_testdata(spark, sf_dir)
    return deterministic_shard(cat.table("documents"), "doc_id", SHARD_N)


@register(
    "x41_vocab_oov",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
        ORDER BY cnt DESC, tok LIMIT {VOCAB_V}
      )
    ), per AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov
      FROM tok t LEFT JOIN vocab v USING (tok)
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_tokens, 0) AS n_tokens,
           COALESCE(n_oov, 0) AS n_oov,
           CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0.0
                ELSE CAST(n_oov AS DOUBLE) / n_tokens
           END AS oov_ratio
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
    doc=f"Tokenizer-coverage audit: corpus top-{VOCAB_V} vocabulary by "
    "frequency (count-desc, token-asc tiebreak — deterministic at the "
    "cut), then per-doc out-of-vocabulary token count and ratio. The "
    "vocab is a two-stage partial-agg top-k (never a global sort of "
    "the token stream) broadcast back against the exploded tokens — "
    "one corpus-token shuffle for the counts, map-side membership "
    "after; high-OOV docs are garbage/wrong-language candidates the "
    "quality funnel quarantines.",
)
def x41_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    tok = docs.select(
        "doc_id", F.explode(X.tokens("text")).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_V)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
        .otherwise(F.col("n_oov").cast("double") / F.col("n_tokens"))
        .alias("oov_ratio"),
    )


# ---------------------------------------------------------------------------
# round 7: JL projection + leakage-free splitting
# ---------------------------------------------------------------------------

RP_OUT_DIM = 16
RP_IN_DIM = 64  # testdata embedding dimensionality (TESTDATA.md)
RP_SIGNS = None  # filled below (module-import-time constant)


def _rp_signs():
    from ods_to_datalake_spark.functions.vectors import projection_signs

    return projection_signs(RP_OUT_DIM, RP_IN_DIM)


RP_SIGNS = _rp_signs()


def _rp_oracle() -> str:
    legs = []
    for i, row in enumerate(RP_SIGNS):
        ints = ", ".join("1" if s > 0 else "-1" for s in row)
        legs.append(
            f"SELECT {i} AS out_dim, list_transform([{ints}], "
            "x -> CAST(x AS DOUBLE)) AS signs"
        )
    return f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings
    ),
    m AS ({' UNION ALL '.join(legs)})
    SELECT vec_id, out_dim,
           list_dot_product(cv, signs) AS value
    FROM c, m
    """


@register(
    "x65_random_projection",
    oracle=_rp_oracle(),
    doc=f"Signed random projection {RP_IN_DIM}→{RP_OUT_DIM} "
    "(Achlioptas 2003): y_i = Σ_j x_j·s_ij with the ±1 sign matrix a "
    "deterministic plan-side constant (md5-parity seeded, "
    "functions/vectors.projection_signs) — the "
    "Johnson-Lindenstrauss front-end that shrinks embeddings 4× "
    "before ANN indexing/clustering, re-ranking survivors at full "
    "precision. Each output component is the same zip_with + "
    "left-fold as the cosine family, bit-matching DuckDB's "
    "list_dot_product element order; pure map-side codegen, zero "
    "shuffles. Long-format output (vec_id, out_dim, value).",
)
def x65_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions.vectors import (
        signed_projection,
        to_double,
    )

    cat = load_testdata(spark, sf_dir)
    # pre-project the float→double cast ONCE per vector: inlined into
    # signed_projection it is re-evaluated inside every one of the 16
    # interpreted dot folds (no CSE across HOF references — the u19
    # inlining trap, plan-verified 16 cast-transforms → 1 here; the
    # Generate boundary keeps CollapseProject from re-inlining it)
    pre = cat.table("embeddings").select(
        "vec_id", to_double("embedding").alias("__cv")
    )
    return pre.select(
        "vec_id",
        F.posexplode(
            signed_projection(F.col("__cv"), RP_SIGNS, cast_input=False)
        ).alias("out_dim", "value"),
    )


@register(
    "x66_leakage_free_split",
    oracle=None,  # assembled below from x25's cluster oracle (single
    # source of truth for the near-dup components)
    doc="Cluster-aware train/val/test split: documents are hashed "
    "into 80/10/10 splits by their near-dup CLUSTER label (x25's "
    "connected components; singletons label themselves), so a "
    "near-duplicate pair can never straddle train and test — the "
    "leakage-safe replacement for x19's per-document split "
    "(operators/sampling.leakage_free_split; all-integer md5-bucket "
    "membership). The only cost over x19 is the component labels the "
    "dedup funnel already produces; the split itself is one "
    "broadcast-able left join + a map-side expression.",
)
def x66_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import connected_components
    from ods_to_datalake_spark.operators.sampling import (
        leakage_free_split,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    cc = connected_components(
        verified_pairs(docs), "id_a", "id_b"
    ).select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("__cl"),
    )
    labeled = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("__cl", F.col("doc_id")).alias("cluster_id"),
    )
    return leakage_free_split(labeled, "cluster_id")


def _assemble_x66_oracle() -> None:
    from ods_to_datalake_spark.plans.suite import REGISTRY

    x25 = REGISTRY["x25_dedup_clusters"].oracle
    REGISTRY["x66_leakage_free_split"].oracle = f"""
    WITH lab AS (
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d
      LEFT JOIN ({x25}) c ON c.doc_id = d.doc_id
    ),
    b AS (
      SELECT doc_id, cluster_id,
             CAST(concat('0x', substring(
                 md5(CAST(cluster_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 AS bucket
      FROM lab
    )
    SELECT doc_id, cluster_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """


_assemble_x66_oracle()


# ---------------------------------------------------------------------------
# round 7: BPE tokenizer training (Sennrich et al. 2016)
# ---------------------------------------------------------------------------


def _bpe_round_ctes(r: int) -> str:
    """One unrolled merge round: pair stats, argmax, greedy-leftmost
    rewrite — the SQL mirror of operators/bpe._apply_merge."""
    return f"""p{r} AS (
      SELECT sym, nxt, CAST(SUM(wcount) AS BIGINT) AS cnt FROM (
        SELECT sym, wcount,
               LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM s{r}) AS _p
      WHERE nxt IS NOT NULL GROUP BY sym, nxt
    ),
    m{r} AS (
      SELECT sym AS a, nxt AS b, cnt FROM p{r}
      ORDER BY cnt DESC, sym, nxt LIMIT 1
    ),
    c{r} AS (
      SELECT t.word, t.wcount, t.pos, t.sym, m.a AS ma, m.b AS mb,
             COALESCE(t.sym = m.a AND t.nxt = m.b, FALSE) AS is_cand
      FROM (SELECT word, wcount, pos, sym,
                   LEAD(sym) OVER (PARTITION BY word ORDER BY pos)
                     AS nxt
            FROM s{r}) t CROSS JOIN m{r} m
    ),
    d{r} AS (
      SELECT *, SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) OVER (
          PARTITION BY word ORDER BY pos
          ROWS UNBOUNDED PRECEDING) AS rnc
      FROM c{r}
    ),
    e{r} AS (
      SELECT *, CASE WHEN is_cand THEN pos - rnc END AS grp
      FROM d{r}
    ),
    f{r} AS (
      SELECT *, CASE WHEN is_cand THEN
          (rnc - MIN(CASE WHEN is_cand THEN rnc END) OVER (
             PARTITION BY word, grp)) % 2 = 0
        ELSE FALSE END AS kept
      FROM e{r}
    ),
    g{r} AS (
      SELECT *, COALESCE(LAG(kept) OVER (
          PARTITION BY word ORDER BY pos), FALSE) AS consumed
      FROM f{r}
    ),
    s{r + 1} AS (
      SELECT word, wcount,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos)
               AS pos,
             CASE WHEN kept THEN ma || mb ELSE sym END AS sym
      FROM g{r} WHERE NOT consumed
    )"""


def _bpe_oracle(n_merges: int) -> str:
    head = f"""WITH wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount FROM (
        SELECT unnest({SQL_TOKENS}) AS word FROM documents
      ) AS _t WHERE word <> '' GROUP BY word
    ),
    s0 AS (
      SELECT wc.word, wc.wcount, u.i AS pos,
             substring(wc.word, CAST(u.i AS INT), 1) AS sym
      FROM wc, LATERAL (
        SELECT unnest(generate_series(1, length(wc.word))) AS i) u
    )"""
    rounds = ",\n    ".join(
        _bpe_round_ctes(r) for r in range(n_merges)
    )
    legs = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym, "
        f"a || b AS merged, cnt AS pair_count FROM m{r}"
        for r in range(n_merges)
    )
    return f"{head},\n    {rounds}\n    {legs}"


@register(
    "x67_bpe_merges",
    oracle=_bpe_oracle(8),
    doc="BPE tokenizer training as relational dataflow (Sennrich et "
    "al. 2016, word-frequency formulation): learn the top-8 merge "
    "rules over the corpus vocabulary — pair stats weighted by word "
    "count, (count DESC, left, right) argmax per round, greedy "
    "leftmost non-overlapping rewrite via the gaps-and-islands "
    "parity trick (runs only chain when left == right; 'aaaa' under "
    "(a,a) merges positions 1-2 and 3-4, exactly the reference "
    "implementation — property-tested against a pure-Python Sennrich "
    "reference in tests/test_bpe.py). The corpus collapses to the "
    "(word, count) table in ONE text pass; every training round then "
    "touches only vocabulary-sized state — why 100-TB corpora train "
    "tokenizers overnight. Oracle: the 8-round loop unrolled into "
    "chained CTEs (the g01 pattern); no floats anywhere, bit-exact "
    "in both engines.",
)
def x67_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.bpe import (
        bpe_train,
        word_counts,
    )

    cat = load_testdata(spark, sf_dir)
    return bpe_train(word_counts(cat.table("documents")), 8)


FEATURE_HASH_BUCKETS = 1024


@register(
    "x74_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({SQL_TOKENS}) AS tok
      FROM documents
    )
    SELECT id,
           CAST(CAST(concat('0x', substring(
                 md5(concat('fh:', tok)), 1, 8)) AS BIGINT)
               % {FEATURE_HASH_BUCKETS} AS BIGINT) AS bucket,
           CAST(SUM(CASE WHEN substring(md5(concat('fh:', tok)), 9, 1)
                 IN ('0','1','2','3','4','5','6','7')
                 THEN 1 ELSE -1 END) AS BIGINT) AS value
    FROM tok
    GROUP BY 1, 2
    """,
    doc=f"Hashing-trick featurization (Weinberger et al. 2009): each "
    f"token hashes to one of {FEATURE_HASH_BUCKETS} feature indices "
    "(first 8 md5 hex chars mod buckets) plus an independent ±1 sign "
    "(9th hex char's high bit), feature value = signed token count — "
    "the fixed-width, vocabulary-FREE text featurizer: no vocab "
    "table to build, broadcast, or version across corpus snapshots "
    "(the whole point vs x41's vocab path), collisions cancel in "
    "expectation. md5 is the one hash both engines share; bucket and "
    "sign are integer arithmetic on non-negative operands; zero-sum "
    "collision buckets stay (computed values, not collision luck). "
    "Plan: token explode + ONE (id, bucket) partial-agg groupBy — "
    "map-side combinable, nothing to join at apply time. "
    "operators/features.feature_hash.",
)
def x74_feature_hashing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.features import feature_hash

    cat = load_testdata(spark, sf_dir)
    return feature_hash(
        cat.table("documents"), "doc_id", "text",
        n_buckets=FEATURE_HASH_BUCKETS,
    )


AUDIT_T_NUM, AUDIT_T_DEN = 1, 2


@register(
    "x78_lsh_recall_audit",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS)} AS sh FROM documents
    ), {_sql_minhash_ctes()}, bands AS (
      SELECT doc_id, {_BAND_SQL} FROM sig
    ), banded AS (
      {_BAND_UNION}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), shx AS (
      SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sh_t
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
      FROM shx GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM shx a JOIN shx b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT i.id_a, i.id_b FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.o * {AUDIT_T_DEN + AUDIT_T_NUM}
            >= {AUDIT_T_NUM} * (sa.n_sh + sb.n_sh)
    ), hits AS (
      SELECT c.id_a FROM cand c
      JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b
    ), counts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)
               AS n_true_pairs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
               AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits
    )
    SELECT n_true_pairs, n_candidates, n_hits,
           CASE WHEN n_true_pairs > 0 THEN
             CAST(n_hits AS DOUBLE) / CAST(n_true_pairs AS DOUBLE)
           END AS recall,
           CASE WHEN n_candidates > 0 THEN
             CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE)
           END AS precision
    FROM counts
    """,
    doc=f"LSH-layer quality audit: realized recall and precision of "
    f"the x04 MinHash/LSH candidate generator ({LSH_BANDS} bands × "
    f"{LSH_ROWS} rows) against the EXACT shingle-Jaccard >= "
    f"{AUDIT_T_NUM}/{AUDIT_T_DEN} truth over the SAME shingle sets "
    "the signatures hash (the Spark truth leg is x60's prefix-"
    "filtered exact join with token_sets swapped to shingles — no "
    "tokenizer drift between layers; the oracle's truth leg is the "
    "simple shared-shingle join, fine at oracle scale). LSH recall "
    "is a per-pair probability (1 − (1 − J^r)^b) that shingle-length "
    "and corpus skew move — a pipeline that tunes bands/rows without "
    "measuring realized recall on ITS corpus is guessing; this is "
    "the measured answer, and the audit a dedup run ships next to "
    "its drop list. Counts exact BIGINTs; recall/precision one "
    "IEEE division each, CASE-guarded on empty denominators. "
    "operators/dedup.lsh_recall_audit.",
)
def x78_lsh_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import lsh_recall_audit

    cat = load_testdata(spark, sf_dir)
    return lsh_recall_audit(
        cat.table("documents"),
        "doc_id",
        "text",
        shingle_n=SHINGLE_N,
        k=MINHASH_K,
        bands=LSH_BANDS,
        rows=LSH_ROWS,
        t_num=AUDIT_T_NUM,
        t_den=AUDIT_T_DEN,
    )


ZIPF_K = 100


@register(
    "x79_zipf_profile",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok GROUP BY tok
    ),
    totals AS (
      SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM counts
    ),
    top AS (
      SELECT tok, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
               AS BIGINT) AS rank,
             CAST(SUM(n) OVER (ORDER BY n DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM counts ORDER BY n DESC, tok LIMIT {ZIPF_K}
    )
    SELECT rank, tok AS token, n AS n_occurrences,
           CAST(cum AS DOUBLE) / CAST(t.n_total_tokens AS DOUBLE)
             AS cum_share,
           t.n_total_tokens, t.n_types
    FROM top CROSS JOIN totals t
    """,
    doc=f"Corpus rank-frequency (Zipf) profile: top-{ZIPF_K} tokens "
    "by (count DESC, token ASC — deterministic at every tie), each "
    "with its cumulative share of all occurrences, plus the corpus "
    "totals (token instances and distinct types — the Heaps-law "
    "coordinates). The corpus-health diagnostic read before any text "
    "pipeline decision: a natural corpus is Zipfian, boilerplate "
    "crawls spike the head, OCR noise fattens the tail — and a "
    "MISSING tail is PPJoin's documented worst case (this repo's own "
    "stress corpus, CLAUDE.md), so the profile is also the fit check "
    "for prefix-filter joins. One corpus token shuffle; top-k is "
    "orderBy+limit (TakeOrderedAndProject — a k-heap per partition, "
    "never a global sort); the cum window orders K rows; totals ride "
    "the SAME vocabulary-sized count table (checkpointed, one extra "
    "agg, no second corpus pass; DuckDB's HUGEINT window sum recast "
    "to BIGINT per CLAUDE.md). cum_share is one IEEE division per "
    "row of exact BIGINTs. operators/quality.zipf_profile.",
)
def x79_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.quality import zipf_profile

    cat = load_testdata(spark, sf_dir)
    return zipf_profile(
        cat.table("documents"), "doc_id", "text", k=ZIPF_K
    )


@register(
    "x80_ann_recall_audit",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}
    ), c AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings
    ), exact_s AS (
      SELECT query_id, vec_id, {_SQL_COS} AS cosine
      FROM c, q WHERE vec_id <> query_id
    ), truth AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rn FROM exact_s
      ) WHERE rn <= {IVF_TOPK}
    ), dims AS (
      SELECT unnest(range(1,
        (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS pos
    ), per_dim AS (
      SELECT e.label, d.pos,
             CAST(SUM(CAST(CAST(e.embedding[d.pos] AS DOUBLE)
                           AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS mean_val
      FROM embeddings e, dims d
      GROUP BY e.label, d.pos
    ), cents AS (
      SELECT label, list(mean_val ORDER BY pos) AS centroid
      FROM per_dim GROUP BY label
    ), probe_scores AS (
      SELECT q.query_id, cn.label,
             ROUND(list_dot_product(qv, centroid) /
                   NULLIF((sqrt(list_dot_product(qv, qv)) *
                    sqrt(list_dot_product(centroid, centroid))), 0), 6)
               AS c_cos
      FROM q, cents cn
    ), probes AS (
      SELECT query_id, label FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY c_cos DESC, label
        ) AS rn FROM probe_scores
      ) WHERE rn <= {IVF_NPROBE}
    ), ivf_s AS (
      SELECT p.query_id, c.vec_id, {_SQL_COS} AS cosine
      FROM c JOIN probes p ON c.label = p.label
      JOIN q ON q.query_id = p.query_id
      WHERE c.vec_id <> p.query_id
    ), approx AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id
        ) AS rn FROM ivf_s
      ) WHERE rn <= {IVF_TOPK}
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
    doc=f"ANN-layer quality audit (the x78 contract for the vector "
    f"index family — VERDICT r9 ask #4): realized recall@{IVF_TOPK} "
    f"and precision@{IVF_TOPK} of the x08 IVF layer (nprobe="
    f"{IVF_NPROBE} of 10 label cells) against the EXACT brute-force "
    f"cosine top-{IVF_TOPK} truth (x07's plan at the same k) on the "
    "same query vectors. IVF recall is what the probed cells happen "
    "to contain — cluster balance and query placement move it — so "
    "an index tuned without measuring realized recall on ITS vectors "
    "is guessing; this is the measured number the index ships with, "
    "run on a sampled query set at scale (the truth leg is one exact "
    "corpus pass per query batch). Counts are exact BIGINTs over "
    "(query, neighbor) pairs; recall/precision one CASE-guarded IEEE "
    "division each; both legs' k-lists are deterministic (rounded "
    "cosine + id tiebreak), so the audit is exactly reproducible. "
    "operators/similarity.ann_recall_audit.",
)
def x80_ann_recall_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import (
        ann_recall_audit,
        ivf_topk,
    )

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    approx = ivf_topk(
        emb, queries, "vec_id", "embedding", "label",
        IVF_TOPK, nprobe=IVF_NPROBE,
    )
    return ann_recall_audit(
        emb, queries, "vec_id", "embedding", IVF_TOPK, approx
    )


@register(
    "x84_dup_multiplicity",
    oracle="""
    WITH g AS (
      SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY md5(text)
    ),
    hist AS (
      SELECT n AS multiplicity,
             CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM g GROUP BY n
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(multiplicity * n_groups), 0) AS BIGINT)
        AS t
      FROM hist
    )
    SELECT multiplicity, n_groups,
           CAST(multiplicity * n_groups AS BIGINT) AS n_docs,
           CASE WHEN t > 0 THEN
             CAST(multiplicity * n_groups AS DOUBLE)
               / CAST(t AS DOUBLE)
           END AS doc_share
    FROM hist CROSS JOIN tot
    """,
    doc="Exact-duplicate multiplicity spectrum: content-hash group "
    "counts by copy count plus each multiplicity's share of the "
    "corpus — the 'how duplicated is this crawl, and how' panel read "
    "BEFORE paying for dedup (40% at multiplicity 2 → exact dedup "
    "suffices; a long tail → boilerplate; the multiplicity-1 share "
    "is the unique mass x01 leaves untouched). x01 lists duplicate "
    "groups, this is their distribution. NULL text is one NULL-hash "
    "group in both engines (duplicated missingness); counts exact, "
    "doc_share one CASE-guarded IEEE division. One content-hash "
    "shuffle + a multiplicity rollup over the GROUP table + a 1-row "
    "total. operators/dedup.dup_multiplicity_histogram.",
)
def x84_dup_multiplicity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        dup_multiplicity_histogram,
    )

    cat = load_testdata(spark, sf_dir)
    return dup_multiplicity_histogram(
        cat.table("documents"), "doc_id", "text"
    )


@register(
    "x85_token_entropy",
    oracle=f"""
    WITH counts AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS tok
            FROM documents) AS _t
      WHERE tok <> ''
      GROUP BY doc_id, tok
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             SUM(CAST(c AS DECIMAL(18,6))
                 * CAST(CAST(log2(c) AS VARCHAR)
                     AS DECIMAL(18,6))) AS clog
      FROM counts GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.n_types, 0) AS BIGINT) AS n_types,
           CASE WHEN p.n_tokens > 0 THEN
             CAST(CAST(CAST(log2(p.n_tokens) AS VARCHAR)
                    AS DECIMAL(18,6)) AS DOUBLE)
               - CAST(p.clog AS DOUBLE)
                 / CAST(p.n_tokens AS DOUBLE)
           END AS entropy_bits
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Per-document Shannon token entropy (bits) — the canonical "
    "repetitiveness feature the Gopher ratio rules (x22/x51) "
    "approximate piecewise: one-token spam reads 0, n distinct "
    "tokens read log2 n; the single knob quality pipelines threshold "
    "on. Identity H = log2(n) − Σc·log2(c)/n so only log2 of INTEGER "
    "counts crosses engines; each transcendental term quantized "
    "DECIMAL(18,6) BEFORE the multiply/sum (the x38/x72 rule) with "
    "the oracle's double→DECIMAL casts VARCHAR-hopped (the u17 "
    "rule); singleton counts contribute exactly 0; final H is raw "
    "IEEE ops on identical operands (q02 rule). NULL/empty docs → "
    "NULL entropy (a one-token doc reads 0; no tokens reads "
    "nothing). One (doc, token) partial agg + one doc rollup — "
    "doc-parallel at any scale. operators/quality.token_entropy.",
)
def x85_token_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.quality import token_entropy

    cat = load_testdata(spark, sf_dir)
    return token_entropy(cat.table("documents"), "doc_id", "text")


@register(
    "x86_shingle_novelty",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS)} AS sh
      FROM documents WHERE doc_id IS NOT NULL
    ),
    pairs AS (
      SELECT DISTINCT doc_id, unnest(sh) AS s
      FROM sh_t WHERE len(sh) > 0
    ),
    first AS (
      SELECT s, MIN(doc_id) AS f FROM pairs GROUP BY s
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COALESCE(SUM(CASE WHEN p.doc_id = first.f
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_novel,
           CAST(COALESCE(SUM(CASE WHEN p.doc_id = first.f
                                  THEN 1 ELSE 0 END), 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty_share
    FROM pairs p JOIN first ON first.s = p.s
    GROUP BY p.doc_id
    """,
    doc=f"Per-document shingle novelty: of each document's DISTINCT "
    f"word {SHINGLE_N}-shingles, the count and share THIS document "
    "introduced to the corpus (no smaller doc_id contains them) — the "
    "per-document Heaps-law panel: x84 says how duplicated whole "
    "documents are, this says how derivative the rest is (near-dup "
    "boilerplate exact hashing never groups), and 'keep the "
    "high-novelty tail' is a standard curation move before paying for "
    "MinHash. Introducer = min(doc_id) per shingle (total order, no "
    "ties); zero-shingle docs absent (the u16 no-evidence rule); "
    "share one raw BIGINT/BIGINT division. One (doc,shingle) distinct "
    "shuffle; the shingle→first map is the vocabulary-sized MERGEABLE "
    "artifact (min is associative) an incremental ingest folds "
    "today's batch against. operators/dedup.shingle_novelty.",
)
def x86_shingle_novelty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import shingle_novelty

    cat = load_testdata(spark, sf_dir)
    return shingle_novelty(
        cat.table("documents"), "doc_id", "text", SHINGLE_N
    )


@register(
    "x87_source_kl",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    t2 AS (SELECT source, tok FROM toks WHERE tok <> ''),
    st AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n_st
      FROM t2 GROUP BY source, tok
    ),
    nc AS (SELECT CAST(SUM(n_st) AS BIGINT) AS n_c FROM st),
    terms AS (
      SELECT source, n_st,
             CAST(SUM(n_st) OVER (PARTITION BY tok) AS BIGINT)
               AS n_ct,
             CAST(SUM(n_st) OVER (PARTITION BY source) AS BIGINT)
               AS n_s,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
               AS n_types
      FROM st
    )
    SELECT source,
           CAST(MAX(n_s) AS BIGINT) AS n_tokens,
           CAST(MAX(n_types) AS BIGINT) AS n_types,
           CAST(CAST(SUM(CAST(n_st AS DECIMAL(18,0))
                 * CAST(CAST(ln((CAST(n_st AS DOUBLE)
                                 * CAST(nc.n_c AS DOUBLE))
                                / (CAST(n_s AS DOUBLE)
                                   * CAST(n_ct AS DOUBLE)))
                             AS VARCHAR) AS DECIMAL(18,6)))
                AS VARCHAR) AS DOUBLE)
           / CAST(MAX(n_s) AS DOUBLE) AS kl_nats
    FROM terms CROSS JOIN nc
    GROUP BY source
    """,
    doc="KL divergence of each source's unigram distribution from the "
    "whole-corpus mix, KL(p_s ‖ p_c) = Σ p_s·ln(p_s/p_c) — the "
    "domain-mixture panel behind DSIR/DoReMi-style data-mixing: ≈0 "
    "nats is redundant with the mix, high-KL is the distinct material "
    "re-weighting would move, a release-over-release jump means the "
    "source changed under you (x47 scores documents against two fixed "
    "models; this scores SOURCES against the corpus). Support "
    "inclusion makes every term well-defined (no ln(0)/0-div guards); "
    "ratio in IEEE doubles from exact BIGINTs (products stay OFF the "
    "int path — n_st·N_c overflows int64 at scale), each ln quantized "
    "to DECIMAL(18,6) BEFORE the weighted DECIMAL-exact sum (x38/x72 "
    "rule, VARCHAR-hopped in the oracle per the u17 rule), ONE final "
    "raw double division. One corpus shuffle; token/source windows "
    "run over the vocabulary-sized count table (NULL source is a real "
    "group — window keys keep it where join keys drop it). "
    "operators/quality.source_kl_divergence.",
)
def x87_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.quality import (
        source_kl_divergence,
    )

    cat = load_testdata(spark, sf_dir)
    return source_kl_divergence(
        cat.table("documents"), "source", "text"
    )


_X89_MATCHES = " + ".join(
    f"(CASE WHEN a.mh_{s} = b.mh_{s} THEN 1 ELSE 0 END)"
    for s in range(MINHASH_K)
)


@register(
    "x89_minhash_calibration",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, list_distinct({_sql_shingles(SQL_TOKENS)}) AS sh
      FROM documents
    ), sh_ok AS (
      SELECT doc_id, sh FROM sh_t WHERE len(sh) > 0
    ), {_sql_minhash_ctes('sh_ok')}, bands AS (
      SELECT doc_id, {_BAND_SQL} FROM sig
    ), banded AS (
      {_BAND_UNION}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), shx AS (
      SELECT doc_id, unnest(sh) AS shingle FROM sh_ok
    ), sizes AS (
      SELECT doc_id, len(sh) AS n_sh FROM sh_ok
    ), inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN shx ea ON c.id_a = ea.doc_id
      JOIN shx eb ON c.id_b = eb.doc_id AND ea.shingle = eb.shingle
      GROUP BY c.id_a, c.id_b
    ), pe AS (
      SELECT ({_X89_MATCHES}) AS m,
             CAST(({_X89_MATCHES}) AS DOUBLE) / {MINHASH_K} AS est,
             CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)
                    AS DOUBLE) AS exact
      FROM cand c
      JOIN sig a ON c.id_a = a.doc_id
      JOIN sig b ON c.id_b = b.doc_id
      JOIN sizes sa ON c.id_a = sa.doc_id
      JOIN sizes sb ON c.id_b = sb.doc_id
      LEFT JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
    ), pf AS (
      SELECT m, est, exact, abs(est - exact) AS err FROM pe
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(CAST(COALESCE(SUM(m), 0) AS BIGINT) AS DOUBLE)
             / CAST({MINHASH_K} * COUNT(*) AS DOUBLE)
           END AS mean_est,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(CAST(SUM(CAST(CAST(exact AS VARCHAR)
                                AS DECIMAL(18,12))) AS VARCHAR)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           END AS mean_exact,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(CAST(SUM(CAST(CAST(err AS VARCHAR)
                                AS DECIMAL(18,12))) AS VARCHAR)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           END AS mean_abs_err,
           MAX(err) AS max_abs_err
    FROM pf
    """,
    doc=f"Calibration audit of the MinHash Jaccard ESTIMATOR over the "
    f"LSH candidate pairs: realized |Ĵ − J| where Ĵ = matching "
    f"signature coordinates / {MINHASH_K} and J is the exact "
    "shingle Jaccard the verify step computes (same jaccard_counts "
    "integers as x05 — one definition). x78 audits the candidate "
    "LAYER (recall); this audits the ESTIMATE — when a pipeline "
    "trusts Ĵ instead of paying exact verification, how wrong is it "
    "on THIS corpus at THIS k? E[|Ĵ−J|] ~ sqrt(J(1−J)/k), so the "
    "measured mean_abs_err prices a wider signature (2× shuffle "
    "weight per √2 accuracy). Ĵ exact in binary (power-of-two k); "
    "J/err correctly-rounded IEEE on identical integers; per-pair "
    "terms quantized DECIMAL(18,12) for the mean folds (double sums "
    "are partition-order-dependent; VARCHAR-hopped oracle casts), "
    "max left raw (order-free). Candidate frame DISK_ONLY-"
    "checkpointed (feeds counts + signature joins). Sample the "
    "candidate slice at 100 TB — a binomial proportion needs "
    "hundreds of pairs, not the corpus. "
    "operators/dedup.minhash_calibration_report.",
)
def x89_minhash_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        minhash_calibration_report,
    )

    cat = load_testdata(spark, sf_dir)
    return minhash_calibration_report(
        cat.table("documents"), "doc_id", "text",
        SHINGLE_N, MINHASH_K, LSH_BANDS, LSH_ROWS,
    )


@register(
    "x90_cluster_size_spectrum",
    oracle=None,  # assembled below: embeds x25's recursive-CTE oracle
    # as the cluster source (the single-source rule — x90 can never
    # disagree with x25 about what a cluster is)
    doc="Near-dup cluster-SIZE spectrum: how many verified near-dup "
    "families exist at each member count, and what share of the "
    "clustered documents sits at that size — x84's histogram applied "
    "one funnel stage later (x84 reads EXACT-dup multiplicities from "
    "content hashes; this reads NEAR-dup family sizes from the "
    "x25 connected components — a corpus can be exact-unique yet "
    "dominated by one giant near-dup family, the case that decides "
    "between keep-one-per-cluster and threshold re-tuning). Derived "
    "through the SAME dedup.dup_spectrum_from_group_sizes arithmetic "
    "as x84 and the x84 streaming face (one definition, three "
    "consumers); the funnel cost is x25's — the spectrum adds one "
    "cluster-keyed count and a histogram-sized rollup. "
    "operators/dedup.connected_components + dup_spectrum_from_group_sizes.",
)
def x90_cluster_size_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import (
        connected_components,
        dup_spectrum_from_group_sizes,
    )

    cat = load_testdata(spark, sf_dir)
    cc = connected_components(
        verified_pairs(cat.table("documents")), "id_a", "id_b"
    )
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return dup_spectrum_from_group_sizes(sizes, "__n")


def _assemble_x90_oracle() -> None:
    from ods_to_datalake_spark.plans.suite import REGISTRY

    x25 = REGISTRY["x25_dedup_clusters"].oracle
    REGISTRY["x90_cluster_size_spectrum"].oracle = f"""
    WITH sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM ({x25}) cc GROUP BY cluster_id
    ),
    hist AS (
      SELECT n AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_groups
      FROM sizes GROUP BY n
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(multiplicity * n_groups), 0) AS BIGINT)
        AS t
      FROM hist
    )
    SELECT multiplicity, n_groups,
           CAST(multiplicity * n_groups AS BIGINT) AS n_docs,
           CASE WHEN t > 0 THEN
             CAST(multiplicity * n_groups AS DOUBLE)
             / CAST(t AS DOUBLE)
           END AS doc_share
    FROM hist CROSS JOIN tot
    """


_assemble_x90_oracle()


@register(
    "x91_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(LEN(regexp_extract_all(LOWER(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]'))), 0) AS BIGINT)
             AS n_tokens,
           CAST(COALESCE(SUM(LENGTH(text)), 0) AS BIGINT) AS n_chars,
           CASE WHEN COALESCE(SUM(LEN(regexp_extract_all(LOWER(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]'))), 0) > 0 THEN
             CAST(COALESCE(SUM(LENGTH(text)), 0) AS DOUBLE)
             / CAST(COALESCE(SUM(LEN(regexp_extract_all(LOWER(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\\s]'))), 0) AS DOUBLE)
           END AS chars_per_token,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(COALESCE(SUM(LEN(regexp_extract_all(LOWER(text),
                   '[a-z]+|[0-9]+|[^a-z0-9\\s]'))), 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
           END AS tokens_per_doc
    FROM documents
    GROUP BY lang
    """,
    doc="Tokenizer fertility panel per language: chars per BPE-ish "
    "token (x02's segmentation — same tokens, one definition) and "
    "tokens per document — the multilingual cost metric (a language "
    "at 2× chars/token pays 2× context window for the same text; "
    "fertility is how tokenizer/mixture papers report it) and the "
    "budget number behind per-language sampling. Exact BIGINT "
    "counts; NULL text adds nothing in both engines but the doc "
    "counts; NULL lang is a real group; two raw guarded divisions. "
    "One group-keyed partial agg — the regexp count is map-side. "
    "operators/quality.tokenizer_fertility.",
)
def x91_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.quality import (
        tokenizer_fertility,
    )

    cat = load_testdata(spark, sf_dir)
    return tokenizer_fertility(cat.table("documents"), "lang", "text")


SGNS_WINDOW = 2
SGNS_MIN_COUNT = 5


@register(
    "x92_skipgram_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter({SQL_TOKENS}, t -> t <> '') AS t
      FROM documents
    ),
    pos AS (
      -- two same-length unnests zip positionally in DuckDB
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(t))) AS BIGINT) AS p,
             unnest(t) AS tok
      FROM toks
    ),
    ev AS (
      SELECT LEAST(a.tok, b.tok) AS tok_a,
             GREATEST(a.tok, b.tok) AS tok_b
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id
       AND b.p > a.p AND b.p <= a.p + {SGNS_WINDOW}
    ),
    pc AS (
      SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM ev GROUP BY tok_a, tok_b
    ),
    uni AS (
      SELECT tok AS t, CAST(COUNT(*) AS BIGINT) AS n
      FROM pos GROUP BY tok
    ),
    tot AS (
      SELECT CAST((SELECT COALESCE(SUM(n), 0) FROM uni) AS BIGINT)
               AS nt,
             CAST((SELECT COALESCE(SUM(n_pair), 0) FROM pc)
                  AS BIGINT) AS np
    )
    SELECT p.tok_a, p.tok_b, p.n_pair, ua.n AS n_a, ub.n AS n_b,
           CAST(CAST(ln(
             CAST(CAST(CAST(p.n_pair AS HUGEINT) * tot.nt * tot.nt
                       AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(tot.np AS HUGEINT) * ua.n * ub.n
                         AS VARCHAR) AS DOUBLE)
           ) AS VARCHAR) AS DECIMAL(18,6)) AS pmi
    FROM pc p
    JOIN uni ua ON ua.t = p.tok_a
    JOIN uni ub ON ub.t = p.tok_b
    CROSS JOIN tot
    WHERE p.n_pair >= {SGNS_MIN_COUNT}
    """,
    double_cols=["pmi"],
    doc=f"Skip-gram co-occurrence PMI over a ±{SGNS_WINDOW} token "
    "context — the word2vec/SGNS preprocessing table (Levy & "
    "Goldberg 2014: SGNS factorizes exactly this shifted-PMI "
    "matrix); x72's collocation statistic moved from baskets to "
    "token contexts: the input to embedding training, phrase "
    "mining, and tokenizer-merge decisions. Pair generation is the "
    "shingles zip-shift trick (w shifted zips per doc, map-side — "
    "never a positional self-join of the exploded corpus; the "
    "oracle's self-join IS that quadratic-ish form, fine for DuckDB "
    f"at gate scale); pairs below {SGNS_MIN_COUNT} drop BEFORE the "
    "marginal joins (the SGNS floor). least/greatest order AFTER "
    "the null-tail filter (Spark least skips NULLs — ordering first "
    "fabricates self-pairs at array tails). Ratio cross-multiplied "
    "in DECIMAL(38,0)/HUGEINT (VARCHAR-hopped oracle casts), ONE "
    "IEEE division, ln quantized DECIMAL(18,6) via the VARCHAR hop "
    "(the u17 rule for new quantizations), "
    "decimal→double via double_cols. "
    "operators/lm.skipgram_pmi.",
)
def x92_skipgram_pmi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.lm import skipgram_pmi

    cat = load_testdata(spark, sf_dir)
    return skipgram_pmi(
        cat.table("documents"), "doc_id", "text",
        window=SGNS_WINDOW, min_count=SGNS_MIN_COUNT,
    )


BURST_MIN_DF = 5
BURST_K = 20


@register(
    "x99_term_burstiness",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
      ) AS _u WHERE token <> ''
    ),
    stats AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS cf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY token
    )
    SELECT token, cf, df,
           CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
    FROM stats
    WHERE df >= {BURST_MIN_DF}
    ORDER BY burstiness DESC, token ASC
    LIMIT {BURST_K}
    """,
    doc="Top-20 burstiest terms: burstiness = collection frequency / "
    "document frequency, the mean occurrences per CONTAINING doc "
    "(Church & Gale 1995; Katz 1996) — function words spread thinly "
    "(ratio ~1 however common), content/topical words recur within "
    "the docs that use them: the corpus screen behind stopword "
    "induction and template-residue detection at TERM granularity "
    "(x51 reviews repetition per DOCUMENT). cf/df exact BIGINTs over "
    "x02's segmentation; burstiness ONE IEEE division (bit-equal "
    "doubles, so the DESC ordering agrees; token ASC unique "
    "tiebreak); df >= 5 floors hapax noise. ONE term-keyed agg "
    "(cf map-side, exact df on the distinct expand), "
    "vocabulary-bounded, then a global top-k limit — the t01 shape. "
    "operators/quality.term_burstiness.",
)
def x99_term_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.quality import (
        term_burstiness,
    )

    cat = load_testdata(spark, sf_dir)
    return term_burstiness(
        cat.table("documents"), "doc_id", "text",
        min_df=BURST_MIN_DF, k=BURST_K,
    )
