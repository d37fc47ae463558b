"""Edge-case oracle parity for the text/dedup suite: write adversarial
documents (empty, whitespace-only, single-token, unicode, huge) as a
documents.parquet and replay the SAME query↔oracle pairs over them —
catching tokenizer/regex/hash divergences the synthetic corpus never
exercises."""

from __future__ import annotations

import pytest

from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

EDGE_DOCS = [
    (0, "", "en", "edge", 0),
    (1, "   ", "en", "edge", 3),
    (2, "one", "en", "edge", 3),
    (3, "two words", "en", "edge", 9),
    (4, "a b c d e f", "en", "edge", 11),
    (5, "héllo wörld ñandú", "es", "edge", 17),
    (6, "tabs\tand\nnewlines\r\nmixed   spaces", "en", "edge", 33),
    (7, "the the the the the", "en", "edge", 19),
    (8, "punct!!! ... ??? ;;; :::", "en", "edge", 24),
    (9, "x" * 500, "en", "edge", 500),
    (10, " ".join(f"w{i}" for i in range(1200)), "en", "edge", 6000),
    (11, "Email me at a.b@c.de or visit https://x.y/z?q=1 code 123456",
     "en", "edge", 59),
    (12, None, "en", "edge", 0),  # NULL text — every tokenizer path
    # multi-line docs that exercise the LINE-level rule families
    # (x48 Gopher bullet/ellipsis ratios, x49 C4 keeps) non-degenerately:
    # 13 passes both filters, 14 trips bullets/ellipsis/brace/javascript
    (13, "The quick brown fox jumps over the lazy dog today and it "
         "was glad to be here with all of that in mind. "
         "Every sentence in this document ends with a terminal mark "
         "and it has more than five words in every line. "
         "The corpus needs at least fifty words of mean length between "
         "three and ten so this line keeps adding plain words. "
         "That should be enough words to have the filter pass now.",
     "en", "edge", 420),
    (14, "- bullet line that would be dropped by gopher rules\n"
         "* another bullet line here\n"
         "this line trails off into an ellipsis and so on...\n"
         "A valid sentence with enough words ends here. { brace "
         "javascript mention.\r\nshort line.", "en", "edge", 200),
]

# per-document text/dedup queries whose semantics the edge docs stress
EDGE_QUERIES = [
    "x01_exact_dedup",
    "x02_token_count",
    "x03_minhash_signature",
    "x04_minhash_lsh_candidates",
    "x06_simhash",
    "x09_langid",
    "x10_quality_score",
    "x11_fingerprint",
    "x15_redact_text",
    "x16_chunk_documents",
    "x18_decontaminate",
    "x19_hash_split",
    "x21_simhash_near_dup",
    "x05_lsh_jaccard_verify",
    "x20_quality_topk_per_source",
    "x22_repetition_metrics",
    # round-11: first-occurrence shingle attribution on the dup-heavy
    # edge corpus (exact copies contest every shingle); unicode
    # shingles; 1200-token doc
    "x86_shingle_novelty",
    # round-11: near-dup family sizes on the dup-heavy edge corpus
    # (exact copies form multi-member clusters; the recursive oracle)
    "x90_cluster_size_spectrum",
    "x23_tfidf_top_terms",
    "x24_stratified_sample",
    "x25_dedup_clusters",
    "x31_incremental_dedup",
    "x33_dedup_clusters_star",
    "x34_duplicate_spans",
    "x37_block_dedup",
    "x38_lm_perplexity",
    "x39_span_rewrite",
    "x40_deterministic_shard",
    "x41_vocab_oov",
    "x42_temperature_mixture",
    "x43_cluster_canonical",
    "x44_source_overlap",
    "x45_split_leakage",
    "x46_decontaminate_scored",
    "x47_dsir_weights",
    "x48_gopher_quality",
    "x49_c4_line_filter",
    "x50_source_quality_report",
    "x51_gopher_repetition",
    "x52_hll_vocab",
    "x53_cms_heavy_hitters",
    "x54_bloom_prefilter",
    "x55_inverted_index",
    "x56_bm25_topk",
    "x59_bottomk_sample",
    "x60_set_similarity_join",
    "x62_score_normalize",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    df = spark.createDataFrame(
        EDGE_DOCS, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb_conn(edge_dir)  # only the documents view resolves; fine
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_doc_parity(spark, edge_dir, edge_con, name):
    q = load_all()[name]
    report = compare(q.fn(spark, edge_dir), edge_con, q.oracle)
    assert report["match"], f"{name}: {report}"
