"""BPE trainer/encoder vs a pure-Python Sennrich reference
(get_stats / merge_vocab with (count DESC, pair ASC) tiebreak and
greedy leftmost non-overlapping rewrite) — hypothesis corpora from a
tiny alphabet force repeated-char runs ('aaaa') and chained merges,
the cases where a wrong overlap rule diverges."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ods_to_datalake_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    initial_symbols,
    word_counts,
)


def ref_bpe(word_freq: dict, k: int) -> list[tuple]:
    vocab = {tuple(w): c for w, c in word_freq.items()}
    out = []
    for rank in range(k):
        stats: dict = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        (a, b), cnt = min(
            stats.items(),
            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
        )
        out.append((rank, a, b, a + b, cnt))
        new: dict = {}
        for syms, c in vocab.items():
            s, i, merged = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            new[tuple(merged)] = new.get(tuple(merged), 0) + c
        vocab = new
    return out


def ref_encode(tok: str, merges: list) -> list:
    s = list(tok)
    for a, b in merges:
        i, out = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


_WORD = st.text(alphabet="abc", min_size=1, max_size=6)
_CORPUS = st.lists(
    st.tuples(_WORD, st.integers(1, 5)), min_size=1, max_size=8
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_CORPUS)
def test_bpe_train_matches_reference(spark, corpus):
    freq: dict = {}
    for w, c in corpus:
        freq[w] = freq.get(w, 0) + c
    words = spark.createDataFrame(
        list(freq.items()), "word string, wcount long"
    )
    got = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in bpe_train(words, 4).collect()
    )
    assert got == ref_bpe(freq, 4)


def test_bpe_repeated_run_overlap(spark):
    """'aaaa' under (a,a): greedy leftmost merges 1-2 and 3-4 (two
    pairs), never the overlapping 2-3."""
    words = spark.createDataFrame(
        [("aaaa", 1)], "word string, wcount long"
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train(words, 2).collect()
    ]
    # round 0: (a,a) count 3 (overlapping occurrences all count);
    # round 1: 'aa','aa' -> (aa,aa) count 1
    assert sorted(got) == [(0, "a", "a", 3), (1, "aa", "aa", 1)]


def test_bpe_encode_matches_reference(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "aaaa aaa banana bananas",
        "abab ababab",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    wc = word_counts(docs)
    freq = {r.word: r.wcount for r in wc.collect()}
    merges = [(a, b) for _, a, b, _, _ in ref_bpe(freq, 6)]
    enc = bpe_encode(docs, merges).collect()
    by_tok: dict = {}
    for r in enc:
        by_tok.setdefault((r.doc_id, r.token_pos), []).append(
            (r.pos, r.sym)
        )
    for (di, tp), rows in by_tok.items():
        tok = texts[di].split()[tp]
        assert [s for _, s in sorted(rows)] == ref_encode(tok, merges)


def test_bpe_empty_and_single_char(spark):
    words = spark.createDataFrame(
        [("a", 3), ("b", 2)], "word string, wcount long"
    )
    # no adjacent pairs anywhere -> zero merges, loop stops early
    assert bpe_train(words, 4).count() == 0
    empty = spark.createDataFrame([], "word string, wcount long")
    assert bpe_train(empty, 4).count() == 0
    assert initial_symbols(empty).count() == 0


def test_bpe_partitioning_invariant(spark):
    words = spark.createDataFrame(
        [("banana", 3), ("bandana", 2), ("cabana", 4)],
        "word string, wcount long",
    )
    a = sorted(map(tuple, bpe_train(words, 5).collect()))
    b = sorted(
        map(tuple, bpe_train(words.repartition(7), 5).collect())
    )
    assert a == b
