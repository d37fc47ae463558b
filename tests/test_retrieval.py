"""Retrieval operator properties: inverted-index shape + max_df guard,
BM25 ranking semantics. The cross-engine bit-identity of the
registered faces (x55, x56) is covered by the oracle gate; these tests
pin the contracts a user of the operators relies on."""

from __future__ import annotations

import pytest

from ods_to_datalake_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    inverted_index,
)

DOCS_SCHEMA = "doc_id bigint, text string"


@pytest.fixture(scope="module")
def corpus(spark):
    # 'common' is in every doc (the stop-word), 'rare' in exactly one
    return spark.createDataFrame(
        [
            (1, "common rare alpha alpha"),
            (2, "common alpha beta"),
            (3, "common beta beta gamma"),
            (4, "common gamma"),
            (5, None),
            (6, "   "),
        ],
        DOCS_SCHEMA,
    )


def test_inverted_index_postings_and_counts(spark, corpus):
    rows = {
        r.token: r
        for r in inverted_index(corpus, "doc_id", "text").collect()
    }
    assert rows["common"].df == 4
    assert rows["common"].postings == "1:1 2:1 3:1 4:1"
    assert rows["alpha"].df == 2
    assert rows["alpha"].cf == 3
    assert rows["alpha"].postings == "1:2 2:1"
    assert rows["rare"].postings == "1:1"
    # NULL / whitespace-only docs contribute no tokens at all
    every_posting = " ".join(r.postings for r in rows.values()).split()
    assert not any(
        p.startswith(("5:", "6:")) for p in every_posting
    )
    assert "" not in rows


def test_inverted_index_max_df_drops_stop_words(spark, corpus):
    toks = {
        r.token
        for r in inverted_index(
            corpus, "doc_id", "text", max_df=3
        ).collect()
    }
    assert "common" not in toks  # df=4 > 3: the stop-word row pruned
    assert {"rare", "alpha", "beta", "gamma"} <= toks


def test_bm25_rare_term_outranks_stop_word(spark, corpus):
    """A document matching the rare term must outscore documents that
    match only the near-universal term — the idf property BM25 exists
    for."""
    top = bm25_topk(
        corpus, "doc_id", "text", ["rare", "common"], k=4
    ).collect()
    assert top[0].doc_id == 1  # the only 'rare' doc wins
    assert [r.doc_id for r in top[1:]] == [4, 2, 3]
    # shorter docs rank higher among equal-tf 'common' matches
    # (the dl/avgdl length normalization)


def test_bm25_scores_hits_and_absent_terms(spark, corpus):
    rows = {
        r.doc_id: r
        for r in bm25_scores(
            corpus, "doc_id", "text", ["rare", "alpha", "zzz"]
        ).collect()
    }
    assert set(rows) == {1, 2}  # only docs matching >= 1 term
    assert rows[1].n_hits == 2  # rare + alpha
    assert rows[2].n_hits == 1
    assert rows[1].bm25 > rows[2].bm25


def test_bm25_no_query_terms_matching_is_empty(spark, corpus):
    assert (
        bm25_scores(corpus, "doc_id", "text", ["zzz"]).count() == 0
    )


def test_inverted_index_partition_invariance(spark, corpus):
    """The postings fold is keyed by the unique doc id, so the string
    is identical under any shuffle layout."""
    a = inverted_index(
        corpus.repartition(3), "doc_id", "text"
    ).collect()
    b = inverted_index(
        corpus.repartition(17), "doc_id", "text"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_phrase_match_explicit_overlap_and_order(spark):
    from ods_to_datalake_spark.operators.retrieval import phrase_match

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),   # "a b" twice
            (2, "a a a"),       # overlapping "a a" counts both
            (3, "b a"),         # reversed order must NOT match "a b"
            (4, None),          # NULL text -> nothing
            (5, "a"),           # sub-phrase-length -> nothing
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_matches
        for r in phrase_match(
            docs, "doc_id", "text", phrase="a b"
        ).collect()
    }
    assert got == {1: 2}
    ov = {
        r.doc_id: r.n_matches
        for r in phrase_match(
            docs, "doc_id", "text", phrase="a a"
        ).collect()
    }
    assert ov == {2: 2}

    # data-derived mode: the top bigram here is "a b" (2 occurrences,
    # beats "b c"/"c a"/"a a"... wait "a a" also has 2 -> tie broken
    # lexicographically: "a a" < "a b")
    top = phrase_match(docs, "doc_id", "text").collect()
    assert {(r.doc_id, r.phrase, r.n_matches) for r in top} == {
        (2, "a a", 2)
    }
