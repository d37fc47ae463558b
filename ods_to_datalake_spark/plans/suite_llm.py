"""LLM-data-pipeline suite: dedup, similarity, text analysis over the
`documents` and `embeddings` tables (charter north-star extensions).

Oracle strategy: every hash-based operator is built on md5 — the one hash
both Spark and DuckDB compute identically — so even MinHash/LSH has an
exact ANSI-SQL oracle. Vector math is cast to double on both sides and
rounded before ranking so top-k selection is cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.plans.suite import register


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
    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
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
    "(letters runs / digit runs / single punctuation) — pure JVM-side "
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
