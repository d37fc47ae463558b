"""Sketch suite: mergeable-summary operators (HLL, count-min, Bloom).

The reference's exact aggregates (COUNT DISTINCT / per-key counts /
membership anti-joins — pyspark_utilities.py's dedup-and-count shapes)
stop being runnable verbatim at 100 TB; these queries register the
sketch replacements from `operators/sketch.py` next to their exact
counterparts so the oracle checks BOTH the sketch construction and the
error behavior against ground truth on the same data.

Unusual property: although the operators are "approximate" in the
statistical sense, their computation is exact integer/power-of-two
arithmetic over md5 — so every query here carries a full value-hash
oracle (most engines can't cross-verify their HLL against another
engine bit-for-bit; this one can).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.functions.text import tokens
from ods_to_datalake_spark.operators.sketch import (
    BLOOM_K,
    BLOOM_M,
    CMS_DEPTH,
    CMS_WIDTH,
    HIST_BUCKETS,
    HLL_P,
    bloom_bits,
    bloom_maybe_contains,
    cms_estimate,
    cms_sketch,
    hll_estimate,
    hll_registers,
    sql_hll_estimate,
    sql_hll_registers,
)
from ods_to_datalake_spark.plans.sql_fragments import SQL_TOKENS
from ods_to_datalake_spark.plans.suite import register

# the oracle's sketch-row generator must track CMS_DEPTH (a literal
# [0, 1, 2, 3] would silently diverge if the constant changed)
SQL_CMS_ROWS = f"(SELECT unnest([{', '.join(map(str, range(CMS_DEPTH)))}]) AS cms_row) AS _r"

# non-empty whitespace tokens, shared by x52/x53 (both engines)
SQL_TOKS_CTE = f"""
    toks AS (
      SELECT source, token FROM (
        SELECT source, unnest({SQL_TOKENS}) AS token FROM documents
      ) AS _u WHERE token <> ''
    )"""


def _spark_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "source", F.explode(tokens("text")).alias("token")
    ).where(F.col("token") != "")


@register(
    "x52_hll_vocab",
    oracle=f"""
    WITH {SQL_TOKS_CTE},
    regs AS (
      {sql_hll_registers("toks", "token", p=HLL_P, by="source")}
    ),
    est AS (
      {sql_hll_estimate("SELECT * FROM regs", p=HLL_P, by="source")}
    ),
    exact AS (
      SELECT source, COUNT(DISTINCT token) AS exact_vocab
      FROM toks GROUP BY source
    )
    SELECT exact.source, exact_vocab, used_buckets, sum_term,
           hll_estimate_raw
    FROM exact JOIN est ON exact.source = est.source
    ORDER BY exact.source
    """,
    doc="Per-source vocabulary size via relational HyperLogLog "
    "(Flajolet 2007) next to the exact COUNT DISTINCT: 2^p "
    "max-registers from disjoint md5 bit-slices, estimate from an "
    "exact BIGINT power-of-two sum (no transcendentals — engine "
    "bit-identical, see operators/sketch.py). At 100 TB the exact "
    "column is the one you drop: the register table is 256 rows per "
    "source, map-side-partial, and merges across corpora by max.",
    headline=True,  # the sketch family's bench trend line (VERDICT r6)
)
def x52_hll_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass restructure (OPTIMIZATION_r12): the original form ran
    # the corpus-scale token stream through TWO independent legs — a
    # COUNT(DISTINCT) (which expands to a full (source, token) dedup
    # shuffle) and a second scan+tokenize+md5 pass for the registers —
    # then joined them. Deduplicate (source, token) ONCE (the only
    # corpus-scale shuffle either leg ever needed), and fold BOTH
    # results out of the deduped stream in one chain: per (source,
    # bucket) the register is max(rho) and the distinct-token count is
    # count(*) (buckets partition the vocabulary, so Σ per-bucket
    # counts IS the exact distinct count), then one vocabulary-sized
    # aggregate per source. 1 scan instead of 2, md5 per distinct
    # token instead of per occurrence, no join. max(rho) over distinct
    # tokens equals max over occurrences, so registers — and every
    # output value — are bit-identical to the two-leg form (oracle
    # unchanged and still green).
    cat = load_testdata(spark, sf_dir)
    toks = _spark_tokens(cat.table("documents"))
    uniq = (
        toks.where(F.col("source").isNotNull())
        .select("source", "token")
        .distinct()
    )
    regs = hll_registers(
        uniq,
        "token",
        p=HLL_P,
        by=["source"],
        extra_aggs=[F.count(F.lit(1)).alias("__n_distinct")],
    )
    est = hll_estimate(
        regs,
        p=HLL_P,
        by=["source"],
        extra_aggs=[F.sum("__n_distinct").alias("exact_vocab")],
    )
    return est.select(
        "source",
        "exact_vocab",
        "used_buckets",
        "sum_term",
        "hll_estimate_raw",
    ).orderBy("source")


@register(
    "x53_cms_heavy_hitters",
    oracle=f"""
    WITH {SQL_TOKS_CTE},
    sk AS (
      SELECT cms_row,
             CAST(concat('0x', substring(md5(concat(
                 'cms', CAST(cms_row AS VARCHAR), ':', token)), 1, 8))
               AS BIGINT) % {CMS_WIDTH} AS cms_bucket,
             COUNT(*) AS cnt
      FROM toks, {SQL_CMS_ROWS}
      GROUP BY 1, 2
    ),
    top AS (
      SELECT token, COUNT(*) AS exact_cnt
      FROM toks GROUP BY token
      ORDER BY exact_cnt DESC, token LIMIT 20
    ),
    probes AS (
      SELECT token, exact_cnt, cms_row,
             CAST(concat('0x', substring(md5(concat(
                 'cms', CAST(cms_row AS VARCHAR), ':', token)), 1, 8))
               AS BIGINT) % {CMS_WIDTH} AS cms_bucket
      FROM top, {SQL_CMS_ROWS}
    )
    SELECT probes.token, probes.exact_cnt,
           MIN(COALESCE(sk.cnt, 0)) AS cms_est
    FROM probes LEFT JOIN sk
      ON probes.cms_row = sk.cms_row
     AND probes.cms_bucket = sk.cms_bucket
    GROUP BY probes.token, probes.exact_cnt
    ORDER BY probes.exact_cnt DESC, probes.token
    """,
    doc="Token heavy hitters through a count-min sketch (Cormode 2005) "
    "audited against exact counts: depth×width counter grid from "
    "seeded md5 prefixes ('cms0:'…), point estimates = min over rows "
    "— an upper bound, never under. The grid is "
    f"{CMS_DEPTH}×{CMS_WIDTH} cells no matter the corpus size, "
    "merges by +, and the probe join broadcasts — the 100-TB "
    "frequency path when an exact per-token groupBy's key set "
    "(the vocabulary) is itself too large to hold.",
)
def x53_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    toks = _spark_tokens(cat.table("documents")).select("token")
    sk = cms_sketch(toks, "token", depth=CMS_DEPTH, width=CMS_WIDTH)
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(20)
    )
    return cms_estimate(
        sk, top, "token", depth=CMS_DEPTH, width=CMS_WIDTH
    ).orderBy(F.desc("exact_cnt"), "token")


# k bit-position expressions for the oracle ('bloom0:'…'bloom6:')
_SQL_BLOOM_BITS = ", ".join(
    f"CAST(concat('0x', substring(md5(concat('bloom{i}:', "
    f"content_hash)), 1, 8)) AS BIGINT) % {BLOOM_M}"
    for i in range(BLOOM_K)
)


@register(
    "x54_bloom_prefilter",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, md5(text) AS content_hash
      FROM documents WHERE text IS NOT NULL
    ),
    seen AS (
      SELECT DISTINCT content_hash FROM docs WHERE doc_id % 2 = 0
    ),
    bits AS (
      SELECT DISTINCT bloom_bit FROM (
        SELECT unnest([{_SQL_BLOOM_BITS}]) AS bloom_bit FROM seen
      ) AS _b
    ),
    probes AS (
      -- per DISTINCT value, NOT per doc row: grouping probes by doc_id
      -- relies on doc_id uniqueness, and a repeated id fans its probes
      -- to 2k rows -> bits_set != k -> a fabricated false negative,
      -- exactly the per-row trap operators/sketch.bloom_maybe_contains
      -- documents (caught by tests/test_sketch_fuzz_parity.py)
      SELECT content_hash, unnest([{_SQL_BLOOM_BITS}]) AS bloom_bit
      FROM (SELECT DISTINCT content_hash FROM docs) AS _d
    ),
    hits AS (
      SELECT content_hash, COUNT(*) AS bits_set
      FROM probes WHERE bloom_bit IN (SELECT bloom_bit FROM bits)
      GROUP BY content_hash
    )
    SELECT docs.doc_id,
           COALESCE(bits_set, 0) = {BLOOM_K} AS bloom_maybe_dup,
           docs.content_hash IN (SELECT content_hash FROM seen)
             AS exact_dup
    FROM docs LEFT JOIN hits ON docs.content_hash = hits.content_hash
    ORDER BY docs.doc_id
    """,
    doc="Bloom-filter membership prefilter for incremental dedup "
    "(Bloom 1970): the even-doc_id half of the corpus is the 'seen "
    "lake', its k seeded-md5 bit positions form a ≤ m-row bit set, "
    "and every incoming doc is flagged maybe/no before any exact "
    "join. Zero false negatives by construction (every exact_dup row "
    "must be bloom_maybe_dup — the oracle exposes both flags so the "
    "FP rate is audited). At 100 TB the bit set broadcasts where the "
    "seen-hash anti-join would shuffle the corpus.",
)
def x54_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    docs = (
        cat.table("documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("content_hash"))
    )
    seen = docs.where(F.col("doc_id") % 2 == 0).select(
        "content_hash"
    ).distinct()
    bits = bloom_bits(seen, "content_hash", k=BLOOM_K, m=BLOOM_M)
    flagged = bloom_maybe_contains(
        bits, docs, "content_hash", k=BLOOM_K, m=BLOOM_M
    )
    seen_marked = seen.withColumn("_seen", F.lit(True))
    return (
        flagged.join(seen_marked, "content_hash", "left")
        .select(
            "doc_id",
            F.col("bloom_maybe").alias("bloom_maybe_dup"),
            F.coalesce(F.col("_seen"), F.lit(False)).alias("exact_dup"),
        )
        .orderBy("doc_id")
    )


# fixed histogram grid for x58: [0, $600k) in 256 cells — covers every
# o_totalprice (max ~$500k); the FIXED grid is what makes partial
# histograms from different days/corpora mergeable by +
HIST_LO = 0
HIST_HI = 60_000_000  # cents
HIST_QS = [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]

_SQL_QS = ", ".join(f"('{l}', {n}, {d})" for l, n, d in HIST_QS)


@register(
    "x58_histogram_quantiles",
    oracle=f"""
    WITH sk AS (
      SELECT o_orderstatus,
             ((least(greatest(
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT), {HIST_LO}), {HIST_HI - 1})
               - {HIST_LO}) * {HIST_BUCKETS}) // {HIST_HI - HIST_LO}
               AS hist_bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1, 2
    ), cum AS (
      SELECT o_orderstatus, hist_bucket,
             CAST(SUM(cnt) OVER (
               PARTITION BY o_orderstatus ORDER BY hist_bucket
             ) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (
               PARTITION BY o_orderstatus
             ) AS BIGINT) AS total
      FROM sk
    ), qs AS (
      SELECT * FROM (VALUES {_SQL_QS}) AS q(q_label, num, den)
    ), picked AS (
      SELECT o_orderstatus, q_label, MIN(hist_bucket) AS hist_bucket
      FROM cum CROSS JOIN qs
      WHERE cum * den >= total * num
      GROUP BY 1, 2
    )
    SELECT o_orderstatus, q_label, hist_bucket,
           CAST({HIST_LO} + ((hist_bucket + 1)
                * {HIST_HI - HIST_LO}) // {HIST_BUCKETS}
             AS BIGINT) AS est_upper_cents
    FROM picked
    """,
    doc="Quantile estimates from a mergeable fixed-grid histogram "
    "sketch — the quantile member of the sketch family (a09's exact "
    "percentile sorts each group; approx_percentile's t-digest is "
    "engine-private and unmergeable across corpora; this 256-cell "
    "grid merges by + and is engine-bit-identical). Money doubles go "
    "through DECIMAL(18,2)-cents BIGINTs, buckets and quantile ranks "
    "are pure integer arithmetic (cum*den >= total*num — never a "
    "float fraction), and every window/join runs over sketch rows, "
    "not data rows. Estimates are upper bounds off by at most one "
    "bucket width ($2,343.75 here).",
    headline=True,  # fixed-state quantile trend line (VERDICT r6)
)
def x58_histogram_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    cat = load_testdata(spark, sf_dir)
    sk = histogram_sketch(
        cat.table("orders"),
        "o_totalprice",
        HIST_LO,
        HIST_HI,
        buckets=HIST_BUCKETS,
        by=["o_orderstatus"],
    )
    return histogram_quantiles(
        sk,
        HIST_QS,
        HIST_LO,
        HIST_HI,
        buckets=HIST_BUCKETS,
        by=["o_orderstatus"],
    )


BOTTOMK = 5


@register(
    "x59_bottomk_sample",
    oracle=f"""
    WITH h AS (
      SELECT source, doc_id,
             CAST(concat('0x', substring(
                 md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS sample_h
      FROM documents WHERE doc_id IS NOT NULL
    ), r AS (
      SELECT source, doc_id, sample_h,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY sample_h, doc_id
             ) AS INT) AS rank
      FROM h
    )
    SELECT source, rank, doc_id, sample_h FROM r WHERE rank <= {BOTTOMK}
    """,
    doc=f"Bottom-k-by-hash sample: the {BOTTOMK} smallest-md5(id) docs "
    "per source — EXACT k per group regardless of group size (a "
    "rate-based sample can't promise that), deterministic in any "
    "engine/partitioning (unique id breaks ties), and MERGEABLE: the "
    "bottom-k of a union is the bottom-k of per-part bottom-k's, so "
    "per-corpus sample tables combine without re-scanning (the KMV "
    "sketch construction — the k-th hash doubles as a distinct-count "
    "estimator). rank<=k windows rewrite to WindowGroupLimit: a "
    "per-partition heap BEFORE the shuffle, k rows moved per "
    "partition however skewed the group.",
)
def x59_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.sampling import bottomk_sample

    cat = load_testdata(spark, sf_dir)
    return bottomk_sample(
        cat.table("documents"), "doc_id", BOTTOMK, by=["source"]
    )


def _hll_overlap_oracle() -> str:
    """x97: pairwise register-merge overlap — registers/estimates via
    the same SQL fragments as x52 (one HLL definition, every reader),
    exact columns from the distinct (source, token) table."""
    regs = sql_hll_registers(
        "(SELECT source, token FROM toks WHERE source IS NOT NULL)"
        " AS _base",
        "token",
        p=HLL_P,
        by="source",
    )
    ests = sql_hll_estimate("SELECT * FROM regs", p=HLL_P, by="source")
    uest = sql_hll_estimate(
        "SELECT * FROM uregs", p=HLL_P, by="source_a, source_b"
    )
    return f"""
    WITH {SQL_TOKS_CTE},
    regs AS ({regs}),
    ests AS ({ests}),
    dv AS (
      SELECT DISTINCT source, token FROM toks
      WHERE source IS NOT NULL
    ),
    exact AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS ex
      FROM dv GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, a.ex AS exact_a,
             b.source AS source_b, b.ex AS exact_b
      FROM exact a JOIN exact b ON a.source < b.source
    ),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS exact_common
      FROM dv a JOIN dv b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    ),
    uregs AS (
      SELECT source_a, source_b, hll_bucket,
             MAX(register) AS register
      FROM (
        SELECT p.source_a, p.source_b, r.hll_bucket, r.register
        FROM pairs p JOIN regs r ON r.source = p.source_a
        UNION ALL
        SELECT p.source_a, p.source_b, r.hll_bucket, r.register
        FROM pairs p JOIN regs r ON r.source = p.source_b
      ) AS _u GROUP BY 1, 2, 3
    ),
    uest AS ({uest})
    SELECT p.source_a, p.source_b, p.exact_a, p.exact_b,
           CAST(COALESCE(c.exact_common, 0) AS BIGINT)
             AS exact_common,
           ea.hll_estimate_raw AS est_a_raw,
           eb.hll_estimate_raw AS est_b_raw,
           u.hll_estimate_raw AS est_union_raw,
           ea.hll_estimate_raw + eb.hll_estimate_raw
             - u.hll_estimate_raw AS est_inter_raw
    FROM pairs p
    JOIN ests ea ON ea.source = p.source_a
    JOIN ests eb ON eb.source = p.source_b
    LEFT JOIN common c
      ON c.source_a = p.source_a AND c.source_b = p.source_b
    JOIN uest u
      ON u.source_a = p.source_a AND u.source_b = p.source_b
    """


@register(
    "x97_hll_source_overlap",
    oracle=_hll_overlap_oracle(),
    doc="Pairwise source vocabulary overlap via HLL register algebra "
    "+ exact calibration: registers are a SEMILATTICE under "
    "per-bucket max, so union cardinality = estimate over the merged "
    "pair registers and intersection follows by inclusion-exclusion "
    "(est_a + est_b - est_union) — 256-row sketches answering 'are "
    "these two scrapes the same crawl' without joining corpora; the "
    "exact_a/exact_b/exact_common columns ride along as the audit "
    "(the x89 rule; at 100 TB they are the ones you drop — x52's "
    "contract). All arithmetic engine-exact (md5 slices, power-of-2 "
    "BIGINT sums, IEEE adds in fixed order); inclusion-exclusion "
    "amplifies the 1.04/sqrt(m) noise so small overlaps can read "
    "NEGATIVE — reported unclamped, that is the calibration's point. "
    "One map-side register build, model-x-model pair merge "
    "(groups^2 * 2^p rows), one token-keyed distinct join for the "
    "exact leg. operators/sketch.hll_pairwise_overlap.",
)
def x97_hll_source_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.sketch import (
        hll_pairwise_overlap,
    )

    cat = load_testdata(spark, sf_dir)
    return hll_pairwise_overlap(
        _spark_tokens(cat.table("documents")), "source", "token",
        p=HLL_P,
    )
