"""Incremental-ingestion suite: dedup a NEW snapshot against the
already-ingested corpus (the "v2 arrives after v1 was trained on" step
of a continuously-collected training set).

Registers after suite_events so the round-4 driver window covers it
(new query, no driver row yet — scripts/window_plan.py).

The oracle instantiates the generated MinHash/LSH SQL (sql_fragments)
twice — suffixes _n/_s for the new/seen corpora — from the same
constants the Spark operator uses, so both engines compute identical
band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.plans.suite import register
from ods_to_datalake_spark.plans.sql_fragments import (
    EMB_DIM,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    N_PLANES,
    NEAR_DUP_TAU,
    SHINGLE_N,
    SQL_TOKENS,
    sql_band_key as _sql_band_key,
    sql_hyperplane_bucket,
    sql_minhash_ctes as _sql_minhash_ctes,
    sql_shingles as _sql_shingles,
)


def _band_ctes(suffix: str) -> str:
    band_cols = ", ".join(
        f"{_sql_band_key(b)} AS bk_{b}" for b in range(LSH_BANDS)
    )
    union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, bk_{b} AS band_key "
        f"FROM bands{suffix}"
        for b in range(LSH_BANDS)
    )
    return (
        f"bands{suffix} AS (SELECT doc_id, {band_cols} FROM sig{suffix}), "
        f"banded{suffix} AS ({union})"
    )


@register(
    "x31_incremental_dedup",
    oracle=f"""
    WITH newd AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    ), seen AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ), fresh AS (
      SELECT doc_id, text, md5(COALESCE(text, '')) AS content_hash
      FROM newd
      WHERE md5(COALESCE(text, '')) NOT IN
            (SELECT md5(COALESCE(text, '')) FROM seen)
    ), sh_n AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS)} AS sh FROM fresh
    ), {_sql_minhash_ctes("sh_n", "_n")}, {_band_ctes("_n")},
    sh_s AS (
      SELECT doc_id, {_sql_shingles(SQL_TOKENS)} AS sh FROM seen
    ), {_sql_minhash_ctes("sh_s", "_s")}, {_band_ctes("_s")},
    near AS (
      SELECT DISTINCT n.doc_id
      FROM banded_n n JOIN banded_s s
        ON n.band_idx = s.band_idx AND n.band_key = s.band_key
    )
    SELECT doc_id, content_hash FROM fresh
    WHERE doc_id NOT IN (SELECT doc_id FROM near)
    """,
    doc="Incremental cross-corpus dedup (operators/dedup."
    "incremental_dedup): the odd-doc_id half of documents plays the "
    "arriving snapshot, the even half the ingested corpus. Tier 1 "
    "anti-joins content hashes (null-coalesced text, exact); tier 2 "
    "anti-joins on shared MinHash LSH band keys (near). Both joins "
    "shuffle on hash/band key only — the new batch is never "
    "cross-joined against the corpus, and at 100 TB the seen side's "
    "hash set + band table are materialized incrementally instead of "
    "recomputed.",
)
def x31_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.dedup import incremental_dedup

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    return incremental_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        "doc_id",
        "text",
        shingle_n=SHINGLE_N,
        k=MINHASH_K,
        bands=LSH_BANDS,
        rows=LSH_ROWS,
    )


@register(
    "x32_incremental_embedding_dedup",
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), tagged AS (
      SELECT vec_id, v, {sql_hyperplane_bucket(EMB_DIM)} AS bucket FROM c
    ), near AS (
      SELECT DISTINCT n.vec_id
      FROM tagged n JOIN tagged s
        ON n.bucket = s.bucket
       AND n.vec_id % 2 = 1 AND s.vec_id % 2 = 0
      WHERE ROUND(list_dot_product(n.v, s.v) /
                  NULLIF((sqrt(list_dot_product(n.v, n.v)) *
                   sqrt(list_dot_product(s.v, s.v))), 0), 6) >= {NEAR_DUP_TAU}
    )
    SELECT vec_id FROM c
    WHERE vec_id % 2 = 1 AND vec_id NOT IN (SELECT vec_id FROM near)
    """,
    doc="Incremental cross-corpus dedup on the EMBEDDING modality "
    "(operators/similarity.incremental_embedding_dedup): odd vec_ids "
    "play the arriving snapshot, even the ingested corpus; both bucket "
    f"map-side on {N_PLANES} hyperplane sign bits, candidates form only "
    "in shared buckets (one shuffle on the bucket key, never a corpus "
    f"cross-join) and verify exact rounded cosine >= {NEAR_DUP_TAU}. "
    "Exact duplicates share buckets at cosine 1.0, so no separate hash "
    "tier is needed; at 100 TB the seen bucket table is materialized "
    "incrementally.",
)
def x32_incremental_embedding_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.similarity import (
        incremental_embedding_dedup,
    )

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    return incremental_embedding_dedup(
        emb.filter(F.col("vec_id") % 2 == 1),
        emb.filter(F.col("vec_id") % 2 == 0),
        "vec_id",
        "embedding",
        EMB_DIM,
        n_planes=N_PLANES,
        threshold=NEAR_DUP_TAU,
    )
