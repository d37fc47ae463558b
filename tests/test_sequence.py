"""Unit coverage for operators/sequence (Markov transitions,
gaps-and-islands streaks), operators/features (target encoding), and
operators/basket (co-occurrence + width guard)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.basket import (
    cooccurrence,
    oversized_baskets,
)
from ods_to_datalake_spark.operators.features import target_encoding
from ods_to_datalake_spark.operators.sequence import (
    longest_daily_streak,
    transition_matrix,
)

EV_SCHEMA = "user_id long, ts timestamp, event_type string, event_id long"


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


def test_transition_matrix_counts_and_rows_normalize(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1, 0), "a", 1),
            (1, _ts(1, 1), "b", 2),
            (1, _ts(1, 2), "a", 3),
            (1, _ts(1, 3), "c", 4),
            (2, _ts(1, 0), "a", 5),
            (2, _ts(1, 1), "b", 6),
        ],
        EV_SCHEMA,
    )
    got = {
        (r.prev_state, r.state): (r.n_transitions, r.p)
        for r in transition_matrix(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    # from 'a': a->b twice, a->c once; from 'b': b->a once
    assert got[("a", "b")] == (2, 2 / 3)
    assert got[("a", "c")] == (1, 1 / 3)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3


def test_transition_matrix_null_states_removed_before_pairing(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1, 0), "a", 1),
            (1, _ts(1, 1), None, 2),
            (1, _ts(1, 2), "b", 3),
        ],
        EV_SCHEMA,
    )
    got = {
        (r.prev_state, r.state)
        for r in transition_matrix(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert got == {("a", "b")}  # the NULL is excised, a->b bridges it


def test_longest_streak_picks_longest_then_earliest(spark):
    rows = (
        # user 1: days 1-3 (len 3), day 7, days 10-11
        [(1, _ts(d), "x", d) for d in [1, 2, 3, 7, 10, 11]]
        # user 2: two 2-day streaks -> earliest start wins
        + [(2, _ts(d), "x", 20 + d) for d in [4, 5, 8, 9]]
        # duplicate events within a day must not inflate streaks
        + [(1, _ts(2, 6), "y", 99)]
    )
    got = {
        r.user_id: (
            r.streak_days,
            r.streak_start.day,
            r.streak_end.day,
        )
        for r in longest_daily_streak(
            spark.createDataFrame(rows, EV_SCHEMA), "user_id", "ts"
        ).collect()
    }
    assert got == {1: (3, 1, 3), 2: (2, 4, 5)}


def test_target_encoding_blends_toward_prior(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 0), ("b", 0)],
        "cat string, y int",
    )
    enc = {
        r.category: (r.n, r.hits, r.enc)
        for r in target_encoding(df, "cat", "y", smoothing=2).collect()
    }
    # global rate 2/4; enc(a) = (2 + 2*0.5)/(3+2) = 0.6 exactly
    assert enc["a"] == (3, 2, (2 * 4 + 2 * 2) / (5 * 4))
    assert enc["b"] == (1, 0, (0 * 4 + 2 * 2) / (3 * 4))
    # smoothing=0 degenerates to the plain per-category mean
    enc0 = {
        r.category: r.enc
        for r in target_encoding(df, "cat", "y", smoothing=0).collect()
    }
    assert enc0["a"] == 2 / 3 and enc0["b"] == 0.0


def test_target_encoding_null_labels_count_rows_not_hits(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None)], "cat string, y int"
    )
    r = target_encoding(df, "cat", "y", smoothing=0).collect()[0]
    assert (r.n, r.hits, r.enc) == (2, 1, 0.5)


def test_cooccurrence_counts_baskets_not_rows(spark):
    df = spark.createDataFrame(
        # basket 1 holds item 10 twice: the pair (10,20) counts ONCE
        [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20), (3, 10)],
        "basket long, item long",
    )
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in cooccurrence(df, "basket", "item").collect()
    }
    assert got == {(10, 20): 2}
    assert (
        cooccurrence(df, "basket", "item", min_count=3).count() == 0
    )


def test_cooccurrence_max_basket_drops_megabasket(spark):
    rows = [(1, i) for i in range(100)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "basket long, item long")
    capped = cooccurrence(df, "basket", "item", max_basket=10)
    assert {(r.item_a, r.item_b) for r in capped.collect()} == {(1, 2)}
    rep = oversized_baskets(df, "basket", "item", max_basket=10)
    assert [(r.basket, r.n_items) for r in rep.collect()] == [(1, 100)]


def test_null_ts_parity(spark, tmp_path):
    """NULL-ts rows must drop from e12/e13 in BOTH engines: Spark
    windows order NULLS FIRST, DuckDB's LAST, so an unfiltered NULL
    ts would pair at opposite ends of a user's stream (code-review r8
    catch — the events edge corpus deliberately has no NULL ts)."""
    from ods_to_datalake_spark.plans.suite import load_all
    from tests.oracle_utils import compare, duckdb_conn

    rows = [
        (1, datetime(2024, 1, 1, 5), 7, "a", 1.0, None),
        (2, None, 7, "b", 1.0, None),  # the hazard row
        (3, datetime(2024, 1, 2, 5), 7, "c", 1.0, None),
        (4, datetime(2024, 1, 4, 5), 7, "a", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb_conn(str(tmp_path))
    try:
        for name in ("e12_markov_transitions", "e13_activity_streaks"):
            q = load_all()[name]
            report = compare(q.fn(spark, str(tmp_path)), con, q.oracle)
            assert report["match"], f"{name}: {report}"
    finally:
        con.close()


def test_association_rules_exact_trio(spark):
    # baskets: {1,2} x3, {1,3} x1, {1} alone x1  ->  N=5, n_1=5,
    # n_2=3, n_3=1, n_12=3, n_13=1
    rows = (
        [(b, i) for b in (10, 11, 12) for i in (1, 2)]
        + [(13, 1), (13, 3), (14, 1)]
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    from ods_to_datalake_spark.operators.basket import (
        association_rules,
    )

    got = {
        (r.item_a, r.item_b): r
        for r in association_rules(df, "basket", "item").collect()
    }
    r12 = got[(1, 2)]
    assert (r12.n_a, r12.n_b, r12.n_baskets) == (5, 3, 3)
    assert r12.support == 3 / 5
    assert r12.confidence == 3 / 5
    assert r12.lift == (3 * 5) / (5 * 3)  # == 1.0: independent
    r13 = got[(1, 3)]
    assert r13.lift == (1 * 5) / (5 * 1)
    assert set(got) == {(1, 2), (1, 3), (2, 3)} - {(2, 3)}


def test_also_bought_topk_ranks_and_caps(spark):
    # item 1 co-occurs with 2 (3 baskets), 3 (2), 4 (1): k=2 keeps
    # neighbors 2 and 3; ties broken by neighbor id
    rows = (
        [(b, i) for b in (10, 11, 12) for i in (1, 2)]
        + [(b, i) for b in (13, 14) for i in (1, 3)]
        + [(15, 1), (15, 4)]
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    from ods_to_datalake_spark.operators.basket import also_bought_topk

    got = {
        (r.item, r.rank): (r.neighbor, r.n_baskets)
        for r in also_bought_topk(df, "basket", "item", k=2).collect()
    }
    assert got[(1, 1)] == (2, 3)
    assert got[(1, 2)] == (3, 2)
    assert (1, 3) not in got  # capped at k
    assert got[(2, 1)] == (1, 3)


def test_also_bought_plan_uses_window_group_limit(spark):
    import contextlib
    import io

    from ods_to_datalake_spark.operators.basket import also_bought_topk

    df = spark.createDataFrame(
        [(1, 1), (1, 2)], "basket long, item long"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        also_bought_topk(df, "basket", "item").explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_running_distinct_counts_first_seen_only(spark):
    rows = [
        (1, _ts(1), "x", 1),
        (1, _ts(3), "x", 2),  # re-appearance: not a new key
        (2, _ts(1), "x", 3),
        (3, _ts(2), "x", 4),
        (None, _ts(2), "x", 5),  # NULL key dropped
        (4, None, "x", 6),  # NULL ts dropped
    ]
    from ods_to_datalake_spark.operators.sequence import (
        running_distinct,
    )

    got = {
        r.day.day: (r.new_keys, r.cumulative_keys)
        for r in running_distinct(
            spark.createDataFrame(rows, EV_SCHEMA), "user_id", "ts"
        ).collect()
    }
    assert got == {1: (2, 2), 2: (1, 3)}


def test_profile_drift_rates_and_extrema_flags(spark):
    from ods_to_datalake_spark.operators.profile import profile_drift

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "b")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(5, "a"), (6, None), (7, None), (8, "z")], "k long, v string"
    )
    got = {
        r.column_name: r
        for r in profile_drift(old, new, ["k", "v"]).collect()
    }
    v = got["v"]
    assert (v.old_nulls, v.new_nulls) == (1, 2)
    assert v.null_rate_delta == 2 / 4 - 1 / 4
    assert v.max_changed and not v.min_changed  # b->z, a stays
    k = got["k"]
    assert (k.old_distinct, k.new_distinct) == (4, 4)
    assert k.min_changed and k.max_changed  # 1->5, 4->8


def test_profile_drift_null_safe_extrema(spark):
    from ods_to_datalake_spark.operators.profile import profile_drift

    old = spark.createDataFrame([(None,)], "v string")
    new = spark.createDataFrame([(None,)], "v string")
    r = profile_drift(old, new, ["v"]).collect()[0]
    # NULL min == NULL min: unchanged under null-safe equality
    assert not r.min_changed and not r.max_changed
    assert r.null_rate_delta == 0.0


def _llr_reference(n_ab, n_a, n_b, nn):
    """Float reference for Dunning's G² (quantization-free; the
    operator quantizes each ln to 6 dp, so tolerance is
    ~1e-6 · Σ k_ij)."""
    import math

    cells = [
        (n_ab, n_a, n_b),
        (n_a - n_ab, n_a, nn - n_b),
        (n_b - n_ab, nn - n_a, n_b),
        (nn - n_a - n_b + n_ab, nn - n_a, nn - n_b),
    ]
    return 2 * sum(
        k * math.log(k * nn / (r * c)) for k, r, c in cells if k
    )


def test_rule_information_scores_match_float_reference(spark):
    import math

    from ods_to_datalake_spark.operators.basket import (
        rule_information_scores,
    )

    # same corpus as the Apriori trio test: N=5, n_1=5, n_2=3,
    # n_3=1, n_12=3, n_13=1 — (1,2)/(1,3) are independent (PMI 0);
    # (2,3) never co-occur and is absent (PMI is pair-conditional)
    rows = (
        [(b, i) for b in (10, 11, 12) for i in (1, 2)]
        + [(13, 1), (13, 3), (14, 1)]
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r.item_a, r.item_b): r
        for r in rule_information_scores(df, "basket", "item").collect()
    }
    assert set(got) == {(1, 2), (1, 3)}
    for (a, b), r in got.items():
        ref_pmi = math.log(r.n_baskets * 5 / (r.n_a * r.n_b))
        ref_llr = _llr_reference(r.n_baskets, r.n_a, r.n_b, 5)
        assert abs(float(r.pmi) - ref_pmi) < 1e-5
        assert abs(float(r.llr) - ref_llr) < 1e-5
    # item 1 is in EVERY basket: for (1,2) the k21 and (with n_a=N)
    # k22 cells are zero — the CASE guard must keep ANSI mode from
    # evaluating ln(0) / 0-division on them (values checked above)
    assert float(got[(1, 2)].pmi) == 0.0  # ln(lift)=ln(1)


def test_rule_information_scores_positive_vs_negative_association(
    spark,
):
    from ods_to_datalake_spark.operators.basket import (
        rule_information_scores,
    )

    # items 1,2 always together; 1,3 co-occur once against the
    # grain — PMI must split signs. LLR is sign-blind (G² on a
    # permuted contingency table is identical — these two ARE
    # permutations, asserted), but it must weight EVIDENCE: the same
    # perfect association backed by 12 baskets (5,6) beats one
    # backed by 4 (1,2), where PMI alone can't tell them apart
    base = (
        [(b, i) for b in (10, 11, 12, 13) for i in (1, 2)]
        + [(b, 3) for b in (14, 15, 16)]
        + [(17, 1), (17, 3)]
    )
    df = spark.createDataFrame(base, "basket long, item long")
    got = {
        (r.item_a, r.item_b): r
        for r in rule_information_scores(df, "basket", "item").collect()
    }
    assert float(got[(1, 2)].pmi) > 0
    assert float(got[(1, 3)].pmi) < 0
    # permuted tables → identical G² ((4,1,0,3) vs (1,4,3,0) over
    # the same marginals): the documented sign-blindness, not a bug
    assert float(got[(1, 2)].llr) == float(got[(1, 3)].llr)
    # a SEPARATE corpus with the same structure replicated 3× (all
    # ratios — and therefore PMI — identical): LLR must grow with
    # evidence volume where PMI cannot tell the corpora apart
    tripled = spark.createDataFrame(
        [(b + 100 * r, i) for (b, i) in base for r in range(3)],
        "basket long, item long",
    )
    got3 = {
        (r.item_a, r.item_b): r
        for r in rule_information_scores(
            tripled, "basket", "item"
        ).collect()
    }
    assert float(got3[(1, 2)].pmi) == float(got[(1, 2)].pmi)
    assert float(got3[(1, 2)].llr) > float(got[(1, 2)].llr)


def test_item_similarity_matches_set_reference(spark):
    import math

    from ods_to_datalake_spark.operators.basket import item_similarity

    # item 1 in baskets {10,11,12,13}, item 2 in {10,11,14},
    # item 3 in {13}: (1,2) share 2, (1,3) share 1
    rows = (
        [(b, 1) for b in (10, 11, 12, 13)]
        + [(b, 2) for b in (10, 11, 14)]
        + [(13, 3)]
    )
    df = spark.createDataFrame(rows, "basket long, item long")
    got = {
        (r.item_a, r.item_b): r
        for r in item_similarity(df, "basket", "item").collect()
    }
    r12 = got[(1, 2)]
    assert r12.jaccard == 2 / (4 + 3 - 2)
    assert r12.cosine == 2 / math.sqrt(4 * 3)
    r13 = got[(1, 3)]
    assert r13.jaccard == 1 / 4
    assert r13.cosine == 1 / math.sqrt(4)
    # identical basket sets → both scores exactly 1.0
    twin = spark.createDataFrame(
        [(b, i) for b in (1, 2) for i in (7, 8)],
        "basket long, item long",
    )
    t = item_similarity(twin, "basket", "item").collect()[0]
    assert t.jaccard == 1.0 and t.cosine == 1.0


# --- day-of-week seasonal profile (e15) -------------------------------


def test_seasonal_profile_values(spark):
    import datetime as dt

    from ods_to_datalake_spark.operators.sequence import (
        seasonal_profile,
    )

    # two Mondays (3 and 1 events), one Tuesday (2 events)
    rows = (
        [(dt.datetime(2024, 1, 1, h),) for h in (1, 2, 3)]
        + [(dt.datetime(2024, 1, 8, 9),)]
        + [(dt.datetime(2024, 1, 2, h),) for h in (4, 5)]
        + [(None,)]
    )
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r.day: r for r in seasonal_profile(df, "ts").collect()}
    assert len(out) == 3
    mon1 = out[dt.date(2024, 1, 1)]
    # 2024-01-01 is a Monday -> dow 0 (days since 1970-01-05 mod 7)
    assert mon1.dow == 0
    assert mon1.n_events == 3
    assert mon1.dow_mean == 2.0  # (3 + 1) / 2
    assert mon1.residual == 1.0
    tue = out[dt.date(2024, 1, 2)]
    assert tue.dow == 1
    assert tue.dow_mean == 2.0
    # grand mean = (3 + 1 + 2) / 3 days = 2.0
    assert tue.seasonal_index == 1.0
    assert tue.residual == 0.0


def test_seasonal_profile_pre_epoch_dow_is_positive(spark):
    import datetime as dt

    from ods_to_datalake_spark.operators.sequence import (
        seasonal_profile,
    )

    # 1969-12-31 was a Wednesday: pmod keeps pre-1970 days at dow 2
    # where raw % would truncate negative
    df = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 12),)], "ts timestamp"
    )
    (r,) = seasonal_profile(df, "ts").collect()
    assert r.dow == 2


# --- feature hashing (x74) --------------------------------------------


def test_feature_hash_is_signed_token_count(spark):
    import hashlib

    from ods_to_datalake_spark.operators.features import feature_hash

    docs = spark.createDataFrame(
        [(1, "the cat the cat dog"), (2, "dog")],
        "doc_id long, text string",
    )
    out = feature_hash(docs, "doc_id", "text", n_buckets=64)
    rows = {(r.id, r.bucket): r.value for r in out.collect()}

    def expected(tok):
        d = hashlib.md5(f"fh:{tok}".encode()).hexdigest()
        return int(d[:8], 16) % 64, 1 if d[8] in "01234567" else -1

    agg: dict[tuple, int] = {}
    for doc, toks in ((1, ["the", "cat", "the", "cat", "dog"]),
                      (2, ["dog"])):
        for t in toks:
            b, s = expected(t)
            agg[(doc, b)] = agg.get((doc, b), 0) + s
    assert rows == agg


def test_feature_hash_bucket_range_and_determinism(spark):
    from ods_to_datalake_spark.operators.features import feature_hash

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} shared") for i in range(20)],
        "doc_id long, text string",
    )
    a = feature_hash(docs, "doc_id", "text", n_buckets=16)
    assert a.filter(
        (a.bucket < 0) | (a.bucket >= 16)
    ).count() == 0
    b = feature_hash(
        docs.repartition(7), "doc_id", "text", n_buckets=16
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


# --- ranking-metric evaluation (x75) ------------------------------------


def test_ranking_metrics_hand_case(spark):
    from ods_to_datalake_spark.operators.basket import (
        dcg_gain_table,
        ranking_metrics,
    )

    recs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (9, "z", 1)],
        "qid long, item string, rank long",
    )
    truth = spark.createDataFrame(
        [(1, "a"), (1, "c"), (1, "d"), (1, "e"), (7, "q")],
        "qid long, item string",
    )
    out = {r.qid: r for r in ranking_metrics(recs, truth, 3).collect()}
    assert set(out) == {1, 7, 9}
    r1 = out[1]
    assert (r1.n_rec, r1.n_rel, r1.hits) == (3, 4, 2)
    assert r1.precision_at_k == 2.0 / 3.0
    assert r1.recall_at_k == 0.5
    gains = {r: float(g) for r, g, _ in dcg_gain_table(3)}
    idcg3 = float(dcg_gain_table(3)[2][2])
    assert abs(r1.ndcg_at_k - (gains[1] + gains[3]) / idcg3) < 1e-12
    # truth-only qid: all-miss zeros
    r7 = out[7]
    assert (r7.n_rec, r7.hits, r7.precision_at_k, r7.recall_at_k,
            r7.ndcg_at_k) == (0, 0, 0.0, 0.0, 0.0)
    # rec-only qid: no relevance set -> NULL recall/ndcg, not 0
    r9 = out[9]
    assert (r9.n_rel, r9.hits) == (0, 0)
    assert r9.recall_at_k is None and r9.ndcg_at_k is None


def test_ranking_metrics_rank_beyond_k_ignored_and_k_validated(spark):
    import pytest

    from ods_to_datalake_spark.operators.basket import ranking_metrics

    recs = spark.createDataFrame(
        [(1, "a", 4)], "qid long, item string, rank long"
    )
    truth = spark.createDataFrame(
        [(1, "a")], "qid long, item string"
    )
    (r,) = ranking_metrics(recs, truth, 3).collect()
    assert (r.n_rec, r.hits) == (0, 0)  # rank 4 outside @3
    with pytest.raises(ValueError):
        ranking_metrics(recs, truth, 0)


def test_ranking_metrics_perfect_list(spark):
    from ods_to_datalake_spark.operators.basket import ranking_metrics

    recs = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "qid long, item string, rank long"
    )
    truth = spark.createDataFrame(
        [(1, "a"), (1, "b")], "qid long, item string"
    )
    (r,) = ranking_metrics(recs, truth, 2).collect()
    assert r.ndcg_at_k == 1.0 and r.recall_at_k == 1.0


def test_ranking_metrics_duplicate_ranks_scored_as_is(spark):
    """Malformed producers (duplicate ranks / items per qid) score
    AS-IS and deterministically (VERDICT r9 ask #7): each surviving
    row contributes its gain and hit independently, so a truth item
    served twice hits twice and precision can honestly exceed 1.0 —
    two of the k slots really went to one item."""
    from ods_to_datalake_spark.operators.basket import (
        dcg_gain_table,
        ranking_metrics,
    )

    recs = spark.createDataFrame(
        # rank 1 duplicated; item 'a' served at ranks 1, 1 and 2
        [(1, "a", 1), (1, "a", 1), (1, "a", 2), (1, "b", 2)],
        "qid long, item string, rank long",
    )
    truth = spark.createDataFrame(
        # truth duplicates are deduped: a relevance SET
        [(1, "a"), (1, "a")], "qid long, item string"
    )
    (r,) = ranking_metrics(recs, truth, 2).collect()
    assert (r.n_rec, r.n_rel, r.hits) == (4, 1, 3)
    assert r.precision_at_k == 3.0 / 2.0  # > 1.0: double-served slots
    assert r.recall_at_k == 3.0
    gains = {rk: float(g) for rk, g, _ in dcg_gain_table(2)}
    idcg1 = float(dcg_gain_table(2)[0][2])
    expect = (2 * gains[1] + gains[2]) / idcg1
    assert abs(r.ndcg_at_k - expect) < 1e-12


# --- inter-arrival / burstiness (e17) ------------------------------------


def test_interarrival_metronome_reads_minus_one(spark):
    """Perfectly periodic events: σ = 0, so B = (0−μ)/(0+μ) = −1 —
    the scheduler/bot signature."""
    from datetime import datetime

    from ods_to_datalake_spark.operators.sequence import (
        interarrival_stats,
    )

    rows = [(i, 1, datetime(2024, 1, 1, i)) for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    (r,) = interarrival_stats(df, "user_id", "ts", "event_id").collect()
    assert (r.n_events, r.n_gaps, r.sum_gap_s) == (5, 4, 4 * 3600)
    assert r.mean_gap_s == 3600.0 and r.std_gap_s == 0.0
    assert r.burstiness == -1.0


def test_interarrival_bursty_and_degenerate_guards(spark):
    from datetime import datetime

    from ods_to_datalake_spark.operators.sequence import (
        interarrival_stats,
    )

    d = datetime
    rows = [
        # user 1: bursty — gaps 1, 1, 10798 s (B > 0)
        (0, 1, d(2024, 1, 1, 0, 0, 0)),
        (1, 1, d(2024, 1, 1, 0, 0, 1)),
        (2, 1, d(2024, 1, 1, 0, 0, 2)),
        (3, 1, d(2024, 1, 1, 3, 0, 0)),
        # user 2: single event — no gaps, NULL stats
        (4, 2, d(2024, 1, 1)),
        # user 3: all simultaneous — μ = σ = 0, NULL burstiness
        (5, 3, d(2024, 1, 1)),
        (6, 3, d(2024, 1, 1)),
        # NULL ts excluded
        (7, 1, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    out = {
        r.user_id: r
        for r in interarrival_stats(
            df, "user_id", "ts", "event_id"
        ).collect()
    }
    # finite-size ceiling (Kim & Jo 2016): for n gaps the population
    # σ/μ maxes at sqrt(n−1), so 3 gaps cap B at (√2−1)/(√2+1) ≈ 0.172
    # — this burst is ~at the ceiling, nowhere near the naive 1.0
    assert 0.15 < out[1].burstiness < 0.1716
    assert out[2].n_gaps == 0
    assert out[2].mean_gap_s is None and out[2].burstiness is None
    assert out[3].n_gaps == 1 and out[3].sum_gap_s == 0
    assert out[3].std_gap_s == 0.0 and out[3].burstiness is None


# --- A/B two-proportion z-test (e21) ------------------------------------------


def test_ab_proportion_known_value(spark):
    """4 users per cohort, A converts 3/4, B converts 1/4: z =
    (0.75-0.25)/sqrt(0.5*0.5*(1/4+1/4)) = sqrt(2) exactly (all the
    operands are exact binary fractions, so even the IEEE chain lands
    on the closed form)."""
    import math

    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.sequence import (
        ab_proportion_test,
    )

    rows = [(u, "p" if c else "x") for u, c in
            [(0, 1), (2, 1), (4, 1), (6, 0),
             (1, 1), (3, 0), (5, 0), (7, 0)]]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    (r,) = ab_proportion_test(
        df,
        "user_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long"),
        F.col("event_type") == "p",
    ).collect()
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (4, 3, 4, 1)
    assert r.lift == 0.5
    assert abs(r.z_score - math.sqrt(2.0)) <= 1e-15


def test_ab_unit_is_the_user_not_the_event(spark):
    """One user firing 100 purchase events is ONE conversion — the
    unit-of-analysis contract."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.sequence import (
        ab_proportion_test,
    )

    rows = [(0, "p")] * 100 + [(2, "x"), (1, "x"), (3, "x")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    (r,) = ab_proportion_test(
        df,
        "user_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long"),
        F.col("event_type") == "p",
    ).collect()
    assert (r.n_a, r.conv_a) == (2, 1)
    assert (r.n_b, r.conv_b) == (2, 0)


def test_ab_guards_empty_cohort_and_zero_variance(spark):
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.sequence import (
        ab_proportion_test,
    )

    # all users even -> cohort b empty
    df = spark.createDataFrame(
        [(0, "p"), (2, "x")], "user_id long, event_type string"
    )
    (r,) = ab_proportion_test(
        df, "user_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long"),
        F.col("event_type") == "p",
    ).collect()
    assert r.n_b == 0 and r.rate_b is None
    assert r.lift is None and r.z_score is None

    # everyone converts -> pooled p = 1, zero variance
    df2 = spark.createDataFrame(
        [(0, "p"), (1, "p")], "user_id long, event_type string"
    )
    (r2,) = ab_proportion_test(
        df2, "user_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long"),
        F.col("event_type") == "p",
    ).collect()
    assert r2.rate_a == 1.0 and r2.rate_b == 1.0
    assert r2.lift == 0.0 and r2.z_score is None

    # net-positive mode: a TIE (1 purchase, 1 error) is NOT converted
    df3 = spark.createDataFrame(
        [(0, "p"), (0, "e"), (1, "p")],
        "user_id long, event_type string",
    )
    (r3,) = ab_proportion_test(
        df3, "user_id",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long"),
        F.col("event_type") == "p",
        negative=F.col("event_type") == "e",
    ).collect()
    assert (r3.conv_a, r3.conv_b) == (0, 1)


def test_session_spectrum_depth_classes_and_durations(spark):
    from ods_to_datalake_spark.operators.sequence import session_spectrum
    from ods_to_datalake_spark.streaming.events import sessionize_batch

    # user 1: one 3-event session spanning 600s, then (>30 min later)
    # a 1-event bounce; user 2: a 1-event bounce
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 0), "a", 1),
            (1, datetime(2024, 1, 1, 0, 5, 0), "a", 2),
            (1, datetime(2024, 1, 1, 0, 10, 0), "a", 3),
            (1, datetime(2024, 1, 1, 2, 0, 0), "a", 4),
            (2, datetime(2024, 1, 1, 0, 0, 0), "a", 5),
        ],
        EV_SCHEMA,
    )
    rows = {
        r.n_events: r
        for r in session_spectrum(
            sessionize_batch(ev, "30 minutes")
        ).collect()
    }
    assert set(rows) == {1, 3}
    bounce, deep = rows[1], rows[3]
    assert bounce.n_sessions == 2 and bounce.n_users == 2
    assert bounce.total_duration_s == 0 and bounce.mean_duration_s == 0.0
    assert deep.n_sessions == 1 and deep.n_users == 1
    assert deep.total_duration_s == 600 and deep.mean_duration_s == 600.0
    assert bounce.session_share == 2 / 3 and deep.session_share == 1 / 3


def test_session_spectrum_empty_input_is_empty(spark):
    from ods_to_datalake_spark.operators.sequence import session_spectrum
    from ods_to_datalake_spark.streaming.events import sessionize_batch

    ev = spark.createDataFrame([], EV_SCHEMA)
    assert session_spectrum(sessionize_batch(ev)).count() == 0


def test_rfm_segments_hand_case_and_exclusions(spark):
    from ods_to_datalake_spark.operators.features import rfm_segments

    rows = [
        # c1: most recent, 3 orders, highest spend
        (1, "2024-01-09", 100.0), (1, "2024-01-10", 100.0),
        (1, "2024-01-08", 100.0),
        # c2: oldest, 1 order, mid spend
        (2, "2024-01-01", 50.0),
        # c3: mid recency, 2 orders, second spend
        (3, "2024-01-05", 60.0), (3, "2024-01-04", 40.0),
        # c4: recent, most orders, lowest spend
        (4, "2024-01-08", 5.0), (4, "2024-01-07", 5.0),
        (4, "2024-01-06", 5.0), (4, "2024-01-08", 5.0),
        # NULL customer excluded; c5 has only NULL dates -> excluded
        (None, "2024-01-09", 999.0), (5, None, 999.0),
    ]
    df = spark.createDataFrame(
        rows, "cust long, dt string, amt double"
    ).selectExpr("cust", "CAST(dt AS TIMESTAMP) AS dt", "amt")
    out = {
        (r.r_bin, r.f_bin, r.m_bin): (r.n_customers, r.total_cents)
        for r in rfm_segments(
            df, "cust", "dt", F.col("amt"), n_bins=2
        ).collect()
    }
    # asof = 2024-01-10: rec c1=0,c4=2,c3=5,c2=9 -> bins {c1,c4}=1;
    # freq desc c4,c1 | c3,c2; cents desc c1,c3 | c2,c4
    assert out == {
        (1, 1, 1): (1, 30000),
        (2, 2, 2): (1, 5000),
        (2, 2, 1): (1, 10000),
        (1, 1, 2): (1, 2000),
    }


def test_activation_latency_causality_median_and_guards(spark):
    from ods_to_datalake_spark.operators.sequence import (
        activation_latency,
    )

    def run(rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_type string"
        ).selectExpr(
            "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type"
        )
        return activation_latency(df, "user_id", "ts").collect()

    (r,) = run(
        [
            # u1: converts 100s after signup
            (1, "2024-01-01 00:00:00", "signup"),
            (1, "2024-01-01 00:01:40", "purchase"),
            # u2: purchase BEFORE signup only -> signed, NOT converted
            (2, "2024-01-01 00:00:00", "purchase"),
            (2, "2024-01-01 01:00:00", "signup"),
            # u3: converts instantly (same second counts, >= start)
            (3, "2024-01-02 00:00:00", "signup"),
            (3, "2024-01-02 00:00:00", "purchase"),
            # u4: signs, never converts
            (4, "2024-01-03 00:00:00", "signup"),
            # u5: purchases but never signed -> not in the panel
            (5, "2024-01-01 00:00:00", "purchase"),
            # NULL user/ts excluded
            (None, "2024-01-01 00:00:00", "signup"),
            (6, None, "signup"),
        ]
    )
    assert r.n_signed == 4 and r.n_converted == 2
    assert r.conversion_rate == 0.5
    # latencies {100, 0}: lower median = 0
    assert (r.min_latency_s, r.median_latency_s, r.max_latency_s) == (
        0, 0, 100,
    )

    # zero conversions: real 0 rate, NULL latencies
    (z,) = run([(1, "2024-01-01 00:00:00", "signup")])
    assert z.n_signed == 1 and z.n_converted == 0
    assert z.conversion_rate == 0.0
    assert z.median_latency_s is None

    # zero signups: no evidence -> empty
    assert run([(1, "2024-01-01 00:00:00", "purchase")]) == []
