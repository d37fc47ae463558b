"""Unit coverage for operators/matching block-width guarding: a
degenerate blocking key (10k words sharing one 2-char prefix — the
"th"/"co" natural-language hazard from the r7 verdict) must be
droppable via ``max_block`` BEFORE the |block|² self-join, reported by
`oversized_blocks`, and pairs recoverable through ANOTHER pass must
survive the cap (multi-pass recall is the point of blocking)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.matching import (
    blocked_fuzzy_join,
    oversized_blocks,
)


def _vocab(spark, words):
    return spark.createDataFrame([(w,) for w in words], "w string")


# every word shares the 'zz' prefix (pass 0 block = one 10k-wide key);
# suffixes spread over the 100 two-digit endings (pass 1 blocks ~100)
DEGENERATE = [f"zz{i:05d}" for i in range(10_000)]


def test_oversized_blocks_reports_the_degenerate_prefix(spark):
    rep = oversized_blocks(
        _vocab(spark, DEGENERATE), "w", max_block=1000
    ).collect()
    assert [(r.pass_idx, r.block, r.n_words) for r in rep] == [
        (0, "zz", 10_000)
    ]  # suffix blocks (100 words each) stay under the cap


def test_max_block_bounds_the_degenerate_pass(spark):
    capped = blocked_fuzzy_join(
        _vocab(spark, DEGENERATE), "w", max_dist=1, max_block=1000
    )
    # the prefix pass is dropped whole; the surviving suffix pass only
    # pairs words sharing their last 2 chars, so every result differs
    # in exactly one of the three leading digits (dist 1 within a
    # 100-word block) — e.g. zz00010 ~ zz00110 survives the cap
    rows = capped.collect()
    assert all(r.w1[-2:] == r.w2[-2:] for r in rows)
    assert ("zz00010", "zz00110") in {(r.w1, r.w2) for r in rows}
    # bounded: 100 blocks x C(100,2) candidate ceiling, and the
    # verified dist<=1 output is far smaller than the 10^8-pair
    # uncapped prefix block would admit as candidates
    assert 0 < len(rows) < 100 * 100 * 99 // 2


def test_capped_join_is_a_subset_of_uncapped(spark):
    words = [f"ab{i:03d}" for i in range(60)] + [
        "cb001",  # shares suffix '01' with ab001 at dist 1
        "xy001",
        "xy002",
    ]
    v = _vocab(spark, words)
    uncapped = {
        (r.w1, r.w2, r.dist)
        for r in blocked_fuzzy_join(v, "w", max_dist=1).collect()
    }
    capped = {
        (r.w1, r.w2, r.dist)
        for r in blocked_fuzzy_join(
            v, "w", max_dist=1, max_block=10
        ).collect()
    }
    assert capped <= uncapped
    capped_pairs = {(a, b) for a, b, _ in capped}
    uncapped_pairs = {(a, b) for a, b, _ in uncapped}
    # the 'ab' prefix block (60 > 10) is dropped: a dist-1 pair whose
    # differing char sits in the SUFFIX is reachable only through the
    # prefix pass, so the cap loses it (the documented recall cost)...
    assert ("ab001", "ab002") in uncapped_pairs
    assert ("ab001", "ab002") not in capped_pairs
    # ...while same-suffix neighbors survive through pass 1
    assert ("ab001", "cb001") in capped_pairs
    # a small prefix block ('xy', 2 <= cap) is untouched by the cap
    assert ("xy001", "xy002") in capped_pairs


def test_no_cap_is_the_default_and_unchanged(spark):
    words = ["cat", "cap", "car", "dog", "dot"]
    v = _vocab(spark, words)
    got = {
        (r.w1, r.w2)
        for r in blocked_fuzzy_join(v, "w", max_dist=1).collect()
    }
    # brute-force reference over the tiny vocab
    def dist1(a, b):
        if a == b:
            return False
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        return False

    expect = {
        (a, b)
        for a in words
        for b in words
        if a < b and dist1(a, b)
        # blocked join only sees same-prefix-or-suffix pairs
        and (a[:2] == b[:2] or a[-2:] == b[-2:])
    }
    assert got == expect


def test_oversized_blocks_empty_when_under_cap(spark):
    v = _vocab(spark, ["aa1", "aa2", "bb1"])
    assert (
        oversized_blocks(v, "w", max_block=5).count() == 0
    )


def test_cap_respects_custom_block_fns(spark):
    words = [f"k{i}" for i in range(50)]
    v = _vocab(spark, words)
    # one custom pass hashing everything into a single block
    fns = [lambda c: F.lit("ALL")]
    rep = oversized_blocks(v, "w", max_block=10, block_fns=fns)
    assert rep.collect()[0].n_words == 50
    assert (
        blocked_fuzzy_join(
            v, "w", max_dist=2, block_fns=fns, max_block=10
        ).count()
        == 0
    )


def test_empty_block_fns_raise(spark):
    import pytest as _pytest

    from ods_to_datalake_spark.operators.matching import (
        blocked_fuzzy_join,
        oversized_blocks,
    )

    words = spark.createDataFrame([("abc",)], "w string")
    with _pytest.raises(ValueError, match="block_fns"):
        blocked_fuzzy_join(words, "w", block_fns=[])
    with _pytest.raises(ValueError, match="block_fns"):
        oversized_blocks(words, "w", max_block=5, block_fns=[])


# --- prefix-bucket cap on the set-similarity join -----------------------


def test_ssj_capped_equals_uncapped_when_cap_is_loose(spark):
    from ods_to_datalake_spark.operators.matching import (
        set_similarity_join,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string",
    )
    un = sorted(
        map(tuple, set_similarity_join(docs, "doc_id", "text", 1, 2)
            .collect())
    )
    cap = sorted(
        map(tuple, set_similarity_join(
            docs, "doc_id", "text", 1, 2, max_prefix_bucket=10_000
        ).collect())
    )
    assert un == cap and len(un) == 1


def test_ssj_cap_drops_oversized_bridge_and_reports_it(spark):
    from ods_to_datalake_spark.operators.matching import (
        oversized_prefix_tokens,
        set_similarity_join,
    )

    # six single-token docs share ONLY the universal token "u" (every
    # pair J=1, bridged solely by u's corpus-wide prefix bucket); one
    # rare-token pair must survive the cap
    rows = [(i, "u") for i in range(1, 7)] + [
        (7, "v w x"),
        (8, "v w y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    un = set_similarity_join(docs, "doc_id", "text", 1, 2)
    assert un.count() == 15 + 1  # C(6,2) u-pairs + (7, 8)
    cap = set_similarity_join(
        docs, "doc_id", "text", 1, 2, max_prefix_bucket=3
    )
    assert {(r.doc_a, r.doc_b) for r in cap.collect()} == {(7, 8)}
    rep = oversized_prefix_tokens(
        docs, "doc_id", "text", 1, 2, max_prefix_bucket=3
    )
    assert {(r.token, r.n_docs) for r in rep.collect()} == {("u", 6)}


# --- containment join (x82) ------------------------------------------------


def _brute_containment(corpus, t_num, t_den):
    sets = {i: set(t.split()) for i, t in corpus if t and t.split()}
    out = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and len(sa & sb) * t_den >= t_num * len(sa):
                out.add((a, b))
    return out


def test_containment_matches_brute_force(spark):
    from ods_to_datalake_spark.operators.matching import (
        containment_join,
    )

    corpus = [
        (1, "rare quote words here"),  # fully inside doc 2
        (2, "rare quote words here plus a lot of page body text"),
        (3, "rare quote words differ"),  # 3/4 inside doc 2
        (4, "unrelated tokens entirely zq"),
        (5, None),
        (6, ""),
        (7, "rare quote words here"),  # exact dup of 1: mutual
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    for num, den in [(1, 1), (3, 4), (1, 2)]:
        got = {
            (r.doc_a, r.doc_b)
            for r in containment_join(
                df, "doc_id", "text", num, den
            ).collect()
        }
        assert got == _brute_containment(corpus, num, den), (num, den)


def test_containment_is_asymmetric_where_jaccard_is_blind(spark):
    """The quote-in-page case: containment 1.0 one way, tiny Jaccard
    — the pair x60 at 0.9 cannot emit."""
    from ods_to_datalake_spark.operators.matching import (
        containment_join,
        set_similarity_join,
    )

    page = "q1 q2 q3 " + " ".join(f"body{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, "q1 q2 q3"), (2, page)], "doc_id long, text string"
    )
    cont = containment_join(df, "doc_id", "text", 1, 1).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in cont] == [
        (1, 2, 1.0)
    ]
    assert (
        set_similarity_join(df, "doc_id", "text", 9, 10).count() == 0
    )


def test_containment_cap_is_lower_bound_with_report(spark):
    """Dropping a corpus-wide token from the container index loses
    only pairs bridged solely by it, and the report names it."""
    from ods_to_datalake_spark.operators.matching import (
        containment_join,
        oversized_container_tokens,
    )

    rows = [(i, f"common u{i}") for i in range(6)] + [
        (100, "common u0")  # contained in doc 0 via both tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in containment_join(df, "doc_id", "text", 1, 2).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in containment_join(
            df, "doc_id", "text", 1, 2, max_token_bucket=3
        ).collect()
    }
    assert capped <= uncapped
    assert (100, 0) in capped  # still bridged by the rare u0
    rep = oversized_container_tokens(df, "doc_id", "text", 3).collect()
    assert [(r.token, r.n_docs) for r in rep] == [("common", 7)]
