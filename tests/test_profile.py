"""Unit coverage for operators/profile: per-column stats, each
constraint check's NULL semantics, and empty-input totals (the
registered u11/u12 queries get oracle + relational-edge coverage;
these pin the operator-level contracts directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.profile import (
    check_foreign_key,
    check_in_set,
    check_not_null,
    check_satisfies,
    check_unique,
    constraint_report,
    table_profile,
)

SCHEMA = "id long, grp string, amt long"
ROWS = [
    (1, "a", 10),
    (2, "a", None),
    (3, "b", 30),
    (3, None, 30),  # duplicate id, NULL grp
    (None, "c", -5),  # NULL id, negative amt
]


def _by_col(df, key="column_name"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_table_profile_counts_and_minmax(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    prof = _by_col(table_profile(df))
    assert set(prof) == {"id", "grp", "amt"}
    for p in prof.values():
        assert p["n_rows"] == 5
    assert prof["id"]["n_nulls"] == 1
    assert prof["id"]["n_distinct"] == 3  # 1,2,3 (3 repeats; NULL out)
    assert prof["id"]["min_value"] == "1"
    assert prof["id"]["max_value"] == "3"
    assert prof["grp"]["n_nulls"] == 1
    assert prof["grp"]["min_value"] == "a"
    assert prof["grp"]["max_value"] == "c"
    assert prof["amt"]["min_value"] == "-5"
    assert prof["amt"]["n_distinct"] == 3  # 10, 30, -5


def test_table_profile_empty_input(spark):
    df = spark.createDataFrame([], SCHEMA)
    prof = _by_col(table_profile(df, ["id", "grp"]))
    assert set(prof) == {"id", "grp"}
    for p in prof.values():
        assert (
            p["n_rows"],
            p["n_nulls"],
            p["n_distinct"],
            p["min_value"],
            p["max_value"],
        ) == (0, 0, 0, None, None)


def test_constraint_checks_null_semantics(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    report = {
        r["constraint_name"]: r.asDict()
        for r in constraint_report(
            [
                check_unique(df, ["id"]),  # id 3 twice -> 1 violation
                check_not_null(df, "grp"),  # 1 NULL
                # NULL grp is NOT an in_set violation (not_null's job)
                check_in_set(df, "grp", ["a", "b"]),  # only 'c'
                # NULL amt row is unevaluable -> violation; -5 too
                check_satisfies(df, "amt_pos", F.col("amt") > 0),
            ]
        ).collect()
    }
    assert report["unique(id)"]["n_violations"] == 1
    assert report["unique(id)"]["n_checked"] == 5
    assert not report["unique(id)"]["passed"]
    assert report["not_null(grp)"]["n_violations"] == 1
    assert report["in_set(grp:a,b)"]["n_violations"] == 1
    assert report["satisfies(amt_pos)"]["n_violations"] == 2
    assert all(r["n_checked"] == 5 for r in report.values())


def test_foreign_key_orphans_and_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = check_foreign_key(child, "fk", parent, "pk").collect()[0]
    # NULL FK is legal (not checked); 99 is the one orphan
    assert row["n_checked"] == 3
    assert row["n_violations"] == 1
    shuffled = check_foreign_key(
        child, "fk", parent, "pk", broadcast_parent=False
    ).collect()[0]
    assert (shuffled["n_checked"], shuffled["n_violations"]) == (3, 1)


def test_constraint_report_empty_input(spark):
    df = spark.createDataFrame([], SCHEMA)
    parent = spark.createDataFrame([], "pk long")
    rows = constraint_report(
        [
            check_unique(df, ["id"]),
            check_not_null(df, "grp"),
            check_in_set(df, "grp", ["a"]),
            check_satisfies(df, "ok", F.col("amt") > 0),
            check_foreign_key(df, "id", parent, "pk"),
        ]
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert (r["n_checked"], r["n_violations"]) == (0, 0)
        assert r["passed"]


def test_survivorship_merge_rules(spark):
    from ods_to_datalake_spark.operators.matching import (
        survivorship_merge,
    )

    rows = [
        # cluster 1: mode 'a' (2 vs 1), max amt 30; one NULL value
        (1, "a", "x", 30),
        (1, "a", "y", 10),
        (1, "b", None, 20),
        # cluster 2: count tie 'p' vs 'q' -> lexicographic first 'p'
        (2, "q", "z", 5),
        (2, "p", "z", 5),
        # cluster 3: all-NULL mode field survives as NULL
        (3, None, "w", 7),
    ]
    df = spark.createDataFrame(
        rows, "cluster_id long, seg string, name string, amt long"
    )
    got = {
        r.cluster_id: r.asDict()
        for r in survivorship_merge(
            df, "cluster_id", ["seg", "name"], max_cols=["amt"]
        ).collect()
    }
    assert got[1]["seg"] == "a"
    assert got[1]["name"] == "x"  # count tie x/y -> lexicographic
    assert got[1]["max_amt"] == 30
    assert got[1]["n_members"] == 3
    assert got[2]["seg"] == "p"
    assert got[3]["seg"] is None
    assert got[3]["name"] == "w"


def test_persisted_profiles_drift_equals_live_drift(spark, tmp_path):
    from ods_to_datalake_spark.operators.profile import (
        build_profile,
        profile_drift,
        profile_drift_tables,
        read_profile,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (4, None), (9, "z")], "k long, v string"
    )
    po, pn = str(tmp_path / "po"), str(tmp_path / "pn")
    build_profile(old, po, ["k", "v"])
    build_profile(new, pn, ["k", "v"])
    stored = profile_drift_tables(
        read_profile(spark, po), read_profile(spark, pn)
    )
    live = profile_drift(old, new, ["k", "v"])
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(stored) == key(live)
    # rebuild over unchanged data is bit-identical (replay-idempotent)
    before = key(read_profile(spark, po))
    build_profile(old, po, ["k", "v"])
    assert key(read_profile(spark, po)) == before


# --- functional-dependency audit (u15) --------------------------------


def test_fd_holds_and_violates(spark):
    from ods_to_datalake_spark.operators.profile import (
        check_functional_dependency,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 11),  # same det -> same dep: fine
            (2, "b", 20),
            (2, "c", 21),  # det 2 -> {b, c}: violation
            (3, "d", 30),
        ],
        "k long, dep string, other long",
    )
    r = check_functional_dependency(df, ["k"], "dep").collect()[0]
    assert r.constraint_name == "fd(k->dep)"
    assert r.n_checked == 3  # determinant GROUPS
    assert r.n_violations == 1
    ok = check_functional_dependency(df, ["k", "dep"], "k").collect()[0]
    assert ok.n_violations == 0


def test_fd_null_dependent_is_a_second_value(spark):
    # {10, NULL} under one determinant IS a violation (conservative
    # reading); an all-NULL dependent group maps to ONE value — not
    from ods_to_datalake_spark.operators.profile import (
        check_functional_dependency,
    )

    df = spark.createDataFrame(
        [(1, 10), (1, None), (2, None), (2, None)],
        "k long, dep long",
    )
    r = check_functional_dependency(df, ["k"], "dep").collect()[0]
    assert r.n_checked == 2
    assert r.n_violations == 1


def test_fd_null_determinants_group_together(spark):
    from ods_to_datalake_spark.operators.profile import (
        check_functional_dependency,
    )

    df = spark.createDataFrame(
        [(None, 1), (None, 2)], "k long, dep long"
    )
    r = check_functional_dependency(df, ["k"], "dep").collect()[0]
    assert r.n_checked == 1
    assert r.n_violations == 1


def test_fd_empty_input(spark):
    from ods_to_datalake_spark.operators.profile import (
        check_functional_dependency,
    )

    df = spark.createDataFrame([], "k long, dep long")
    r = check_functional_dependency(df, ["k"], "dep").collect()[0]
    assert (r.n_checked, r.n_violations) == (0, 0)


# --- robust outlier report (u16) ----------------------------------------


def test_robust_outliers_hand_case(spark):
    """Median/MAD mask nothing: one extreme value flags itself and
    doesn't move the robust center (the mean±stddev failure mode)."""
    from ods_to_datalake_spark.operators.profile import (
        robust_outlier_report,
    )
    from pyspark.sql import functions as F

    rows = [("a", v) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("a", None),
        ("b", 5),
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        r.grp: r
        for r in robust_outlier_report(
            df, ["grp"], F.col("v"), k=3
        ).collect()
    }
    a = out["a"]
    # lower-middle of [10,11,12,13,14,1000] is 12; |dev| sorted
    # [0,1,1,2,2,988] -> MAD = 1; only 1000 exceeds 12±3
    assert (a.n, a.n_null, a.median_v, a.mad_v, a.n_outliers) == (
        6, 1, 12, 1, 1,
    )
    b = out["b"]  # single row: MAD 0, never its own outlier
    assert (b.n, b.median_v, b.mad_v, b.n_outliers) == (1, 5, 0, 0)


def test_robust_outliers_constant_group_with_stray(spark):
    """All-equal majority: MAD 0, so any nonzero deviation flags —
    the documented MAD-filter behavior on constant data."""
    from ods_to_datalake_spark.operators.profile import (
        robust_outlier_report,
    )
    from pyspark.sql import functions as F

    rows = [("a", 7)] * 9 + [("a", 8)]
    df = spark.createDataFrame(rows, "grp string, v long")
    (r,) = robust_outlier_report(df, ["grp"], F.col("v")).collect()
    assert (r.median_v, r.mad_v, r.n_outliers) == (7, 0, 1)


def test_robust_outliers_all_null_group_absent(spark):
    from ods_to_datalake_spark.operators.profile import (
        robust_outlier_report,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1), ("z", None)], "grp string, v long"
    )
    got = {r.grp for r in
           robust_outlier_report(df, ["grp"], F.col("v")).collect()}
    assert got == {"a"}


# --- Benford audit (u17) ---------------------------------------------------


def test_benford_digit_extraction_and_spine(spark):
    """Leading digits via string head (999→9, 100→1); all 9 digits
    present even with zero observations; NULL/non-positive excluded."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import benford_audit

    rows = [(999,), (100,), (1,), (12,), (95,), (0,), (-7,), (None,)]
    df = spark.createDataFrame(rows, "v long")
    out = {r.digit: r for r in benford_audit(df, F.col("v")).collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n_obs == 3 and out[9].n_obs == 2
    assert out[1].n_total == 5  # 0, -7, NULL excluded
    assert out[2].n_obs == 0
    assert out[2].chi2_term is not None  # zero-count digit still scores
    assert out[1].chi2 == out[9].chi2  # one total on every row


def test_benford_empty_input_null_guards(spark):
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import benford_audit

    df = spark.createDataFrame([], "v long")
    out = benford_audit(df, F.col("v")).collect()
    assert len(out) == 9
    assert all(r.n_obs == 0 and r.n_total == 0 for r in out)
    assert all(r.obs_share is None and r.chi2_term is None for r in out)


def test_benford_logarithmic_data_scores_low(spark):
    """A geometric series (organic multiplicative growth) must score
    a far smaller chi2 than a uniform block at the same N — the
    discrimination the audit exists for."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import benford_audit

    geo = [int(1.05**i) + 1 for i in range(1, 300)]
    uni = list(range(400, 400 + len(geo)))  # all leading-digit 4..5
    chi_geo = benford_audit(
        spark.createDataFrame([(v,) for v in geo], "v long"), F.col("v")
    ).collect()[0].chi2
    chi_uni = benford_audit(
        spark.createDataFrame([(v,) for v in uni], "v long"), F.col("v")
    ).collect()[0].chi2
    assert chi_geo < chi_uni / 5


# --- concentration profile (u18) -------------------------------------------


def test_concentration_profile_hand_cases(spark):
    from ods_to_datalake_spark.operators.profile import (
        concentration_profile,
    )

    rows = [
        ("c", 1, None),
        ("c", 2, None),
        ("c", 3, None),
        ("c", 4, None),
    ]
    df = spark.createDataFrame(rows, "k string, u long, z string")
    out = {
        r.column_name: r
        for r in concentration_profile(df, ["k", "u", "z"]).collect()
    }
    k = out["k"]  # constant column: impurity exactly 0
    assert (k.n_distinct, k.top_value, k.top_count) == (1, "c", 4)
    assert k.gini_impurity == 0.0 and k.top_share == 1.0
    u = out["u"]  # all-distinct: impurity (N-1)/N, tie -> value ASC
    assert u.n_distinct == 4 and u.top_value == "1"
    assert u.gini_impurity == 0.75
    z = out["z"]  # all-NULL: NULL is the (only) value — the finding
    assert (z.n_distinct, z.top_value, z.top_share) == (1, "NULL", 1.0)
    assert z.gini_impurity == 0.0


def test_concentration_profile_empty_table(spark):
    from ods_to_datalake_spark.operators.profile import (
        concentration_profile,
    )

    df = spark.createDataFrame([], "k string")
    (r,) = concentration_profile(df, ["k"]).collect()
    assert (r.n_rows, r.n_distinct, r.top_count) == (0, 0, None)
    assert r.gini_impurity is None and r.top_share is None


# --- correlation profile (u19) -----------------------------------------------


def test_correlation_profile_exact_endpoints(spark):
    """y = 2x reads +1 and y = -x reads -1 to within one ulp — NOT
    exactly 1.0: the statistics are exact integers, but √dx·√dy is two
    correctly-rounded sqrts MULTIPLIED, which can differ from the
    exact √(dx·dy) by 1 ulp (observed: 1.0000000000000002). That ulp
    is identical in both engines (same operands, same IEEE ops — the
    contract the oracle hashes); the mathematical endpoint is what
    this test bounds."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import (
        correlation_profile,
    )

    df = spark.createDataFrame(
        [(1, 2, -1, 5), (2, 4, -2, 1), (3, 6, -3, 4)],
        "x int, y int, z int, w int",
    )
    got = {
        (r.col_x, r.col_y): (r.n_pairs, r.corr)
        for r in correlation_profile(
            df,
            [(c, F.col(c)) for c in ("x", "y", "z", "w")],
        ).collect()
    }
    ulp = 3e-16
    assert got[("x", "y")][0] == 3
    assert abs(got[("x", "y")][1] - 1.0) <= ulp
    assert abs(got[("x", "z")][1] + 1.0) <= ulp
    assert abs(got[("y", "z")][1] + 1.0) <= ulp
    n, r = got[("x", "w")]
    assert n == 3 and -1.0 < r < 1.0


def test_correlation_profile_constant_and_null_guards(spark):
    """A zero-variance column correlates with nothing (NULL, not 0);
    statistics are PAIRWISE-complete — a row NULL in one column still
    counts for the other pairs; an empty frame emits every pair with
    n_pairs 0 and NULL corr."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import (
        correlation_profile,
    )

    df = spark.createDataFrame(
        [(1, 7, 10), (2, 7, None), (3, 7, 30), (4, 7, 40)],
        "x int, c int, y int",
    )
    cols = [(n, F.col(n)) for n in ("x", "c", "y")]
    got = {
        (r.col_x, r.col_y): (r.n_pairs, r.corr)
        for r in correlation_profile(df, cols).collect()
    }
    assert got[("x", "c")] == (4, None)  # constant side
    assert got[("c", "y")] == (3, None)
    n, r = got[("x", "y")]
    assert n == 3 and r == 1.0  # (1,10),(3,30),(4,40) are collinear

    empty = {
        (r.col_x, r.col_y): (r.n_pairs, r.corr)
        for r in correlation_profile(df.limit(0), cols).collect()
    }
    assert empty == {
        ("x", "c"): (0, None),
        ("x", "y"): (0, None),
        ("c", "y"): (0, None),
    }


# --- referential audit (u20) -------------------------------------------------


def test_referential_audit_counts_orphans_and_nulls(spark):
    from ods_to_datalake_spark.operators.profile import (
        referential_audit,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 98), (6, 99)],
        "id long, fk long",
    )
    parent = spark.createDataFrame(
        [(10,), (11,), (None,)], "pk long"
    )
    (r,) = referential_audit(
        [("child.fk->parent", child, "fk", parent, "pk")]
    ).collect()
    assert r.n_rows == 6 and r.n_null_keys == 1
    assert r.n_orphan_keys == 2  # 98, 99
    assert r.n_orphan_rows == 3  # 99 twice + 98 once
    assert r.orphan_share == 3.0 / 5.0  # of the 5 non-null rows


def test_referential_audit_all_null_child_guard(spark):
    """A child whose FK column is entirely NULL has no non-null rows:
    orphan_share is NULL (no evidence), not 0 — and a NULL parent key
    never adopts anyone."""
    from ods_to_datalake_spark.operators.profile import (
        referential_audit,
    )

    child = spark.createDataFrame(
        [(1, None), (2, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(None,)], "pk long")
    (r,) = referential_audit(
        [("e", child, "fk", parent, "pk")]
    ).collect()
    assert (r.n_rows, r.n_null_keys) == (2, 2)
    assert (r.n_orphan_keys, r.n_orphan_rows) == (0, 0)
    assert r.orphan_share is None


def test_referential_audit_empty_fks_raises(spark):
    """An empty edge list is a caller bug — a clear ValueError, never
    an IndexError from the fold (ADVICE r11)."""
    import pytest

    from ods_to_datalake_spark.operators.profile import (
        referential_audit,
    )

    with pytest.raises(ValueError, match="non-empty"):
        referential_audit([])


# --- exact two-sample KS (u21) -------------------------------------------------


def test_ks_two_sample_known_values(spark):
    """Disjoint supports -> D = 1 exactly; identical samples -> D = 0;
    the classic quarter-shift case lands on an exact rational."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import ks_two_sample

    def ks(rows):
        df = spark.createDataFrame(rows, "g boolean, v long")
        return ks_two_sample(df, F.col("g"), F.col("v")).collect()[0]

    r = ks([(True, 1), (True, 2), (False, 10), (False, 11)])
    assert r.ks_d == 1.0 and r.at_value == 2

    r = ks([(True, 1), (True, 2), (False, 1), (False, 2)])
    assert r.ks_d == 0.0 and r.at_value == 1  # smallest argmax at ties

    # a: {1,2,3,4}, b: {3,4,5,6}: sup gap at v=2 (2/4 vs 0/4) = 0.5
    r = ks(
        [(True, v) for v in (1, 2, 3, 4)]
        + [(False, v) for v in (3, 4, 5, 6)]
    )
    assert r.ks_d == 0.5 and r.at_value == 2


def test_ks_two_sample_guards(spark):
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import ks_two_sample

    # one side empty -> NULL D (no evidence), counts still report
    df = spark.createDataFrame(
        [(True, 1), (True, 2)], "g boolean, v long"
    )
    (r,) = ks_two_sample(df, F.col("g"), F.col("v")).collect()
    assert (r.n_a, r.n_b) == (2, 0) and r.ks_d is None

    # NULL values and NULL groups excluded entirely
    df2 = spark.createDataFrame(
        [(True, 1), (True, None), (None, 5), (False, 2)],
        "g boolean, v long",
    )
    (r2,) = ks_two_sample(df2, F.col("g"), F.col("v")).collect()
    assert (r2.n_a, r2.n_b) == (1, 1)

    # empty input -> empty result
    assert (
        ks_two_sample(df.limit(0), F.col("g"), F.col("v")).count()
        == 0
    )


# --- weighted median (u23) -----------------------------------------------------


def test_weighted_median_unit_weights_equal_lower_median(spark):
    """With all weights 1 the weighted median IS u16's lower-middle
    order statistic (even count -> the LOWER of the two middles)."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import weighted_median

    df = spark.createDataFrame(
        [("g", v) for v in (10, 20, 30, 40)], "grp string, v long"
    )
    (r,) = weighted_median(
        df, ["grp"], F.col("v"), F.lit(1)
    ).collect()
    assert (r.total_weight, r.weighted_median) == (4, 20)


def test_weighted_median_weight_dominance_and_guards(spark):
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.profile import weighted_median

    # one 100-unit line at price 5 outweighs ten 1-unit lines at 99
    rows = [("g", 5, 100)] + [("g", 99, 1)] * 10
    # zero/negative/NULL weights excluded; NULL values excluded
    rows += [("g", 1, 0), ("g", 1, -3), ("g", 1, None), ("g", None, 5)]
    df = spark.createDataFrame(rows, "grp string, v long, w long")
    (r,) = weighted_median(
        df, ["grp"], F.col("v"), F.col("w")
    ).collect()
    assert r.total_weight == 110
    assert r.weighted_median == 5

    # a group with zero admissible weight is absent
    only_bad = spark.createDataFrame(
        [("z", 1, 0)], "grp string, v long, w long"
    )
    assert weighted_median(
        only_bad, ["grp"], F.col("v"), F.col("w")
    ).count() == 0


# --- mutual information (u24) --------------------------------------------------


def test_mutual_information_known_values(spark):
    """Independent columns -> MI ~ 0; a determined column -> NMI = 1
    (MI = min entropy); single-level column -> H = 0, NULL nmi."""
    import math

    import pytest

    from ods_to_datalake_spark.operators.profile import (
        mutual_information,
    )

    # perfectly determined: b = f(a), both uniform over 2 levels
    det = spark.createDataFrame(
        [("x", "u"), ("y", "v")] * 50, "a string, b string"
    )
    (r,) = mutual_information(
        det, F.col("a"), F.col("b")
    ).collect()
    assert (r.n_rows, r.n_levels_a, r.n_levels_b) == (100, 2, 2)
    assert r.h_a == pytest.approx(math.log(2), abs=1e-5)
    assert r.mi_nats == pytest.approx(math.log(2), abs=1e-5)
    assert r.nmi == pytest.approx(1.0, abs=1e-4)

    # independent uniform 2x2: every cell o*N == r*c -> each ln term
    # is exactly ln(1) = 0 -> MI exactly 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(25)],
        "a string, b string",
    )
    (r,) = mutual_information(
        ind, F.col("a"), F.col("b")
    ).collect()
    assert r.mi_nats == 0.0
    assert r.nmi == 0.0

    # single-level a: H_a = 0 -> NULL nmi, MI = 0
    single = spark.createDataFrame(
        [("k", "u"), ("k", "v")] * 10, "a string, b string"
    )
    (r,) = mutual_information(
        single, F.col("a"), F.col("b")
    ).collect()
    assert r.h_a == 0.0 and r.mi_nats == 0.0 and r.nmi is None

    # empty -> zero counts, NULL stats
    empty = spark.createDataFrame([], "a string, b string")
    (r,) = mutual_information(
        empty, F.col("a"), F.col("b")
    ).collect()
    assert (r.n_rows, r.mi_nats, r.nmi) == (0, None, None)


# --- Gini coefficient (u25) ----------------------------------------------------


def test_gini_known_values(spark):
    """Equal values -> 0; one-holder extreme -> (n-1)/n; the 2-row
    hand case [1, 3] -> 0.25; negatives/NULLs excluded; zero-total ->
    NULL; tie-permutation invariance via duplicated values."""
    import pytest

    from ods_to_datalake_spark.operators.profile import (
        gini_coefficient,
    )

    def g(rows):
        df = spark.createDataFrame(rows, "grp string, v long")
        return {
            r.grp: r
            for r in gini_coefficient(
                df, ["grp"], F.col("v")
            ).collect()
        }

    out = g(
        [("eq", 5)] * 4                      # equal -> 0
        + [("one", 0)] * 9 + [("one", 100)]  # 1 of 10 holds all -> 0.9
        + [("pair", 1), ("pair", 3)]         # hand: G = 0.25
        + [("mix", -7), ("mix", None), ("mix", 2), ("mix", 2)]
        + [("zero", 0), ("zero", 0)]         # zero total -> NULL
    )
    assert out["eq"].gini == 0.0
    assert out["one"].gini == pytest.approx(0.9)
    assert out["pair"].gini == pytest.approx(0.25)
    # mix: negatives and NULLs excluded -> two equal rows -> 0
    assert out["mix"].n_rows == 2 and out["mix"].gini == 0.0
    assert out["zero"].gini is None and out["zero"].n_rows == 2

    # tied blocks: [2,2,4] == any permutation; sorted rank sum
    # sum i*x = 1*2 + 2*2 + 3*4 = 18 -> G = (2*18 - 4*8)/(3*8) = 1/6
    t = g([("t", 2), ("t", 4), ("t", 2)])
    assert t["t"].gini == pytest.approx((2 * 18 - 4 * 8) / 24)


def test_spearman_known_values(spark):
    import pytest

    from ods_to_datalake_spark.operators.profile import (
        spearman_correlation,
    )

    def s(rows):
        df = spark.createDataFrame(
            rows, "grp string, x long, y long"
        )
        return {
            r.grp: r
            for r in spearman_correlation(
                df, ["grp"], F.col("x"), F.col("y")
            ).collect()
        }

    out = s(
        # monotone but NONLINEAR (y = x^3): rho = 1 where Pearson < 1
        [("cube", v, v**3) for v in (1, 2, 3, 4, 5)]
        # strictly decreasing -> -1
        + [("neg", v, 10 - v) for v in (1, 2, 3)]
        # constant y -> zero rank variance -> NULL
        + [("const", v, 7) for v in (1, 2, 3)]
        # NULLs excluded before ranking
        + [("nul", 1, 1), ("nul", 2, None), ("nul", 3, 9)]
    )
    # sqrt(d)*sqrt(d) can land 1 ulp off d, so +-1 reads 1 - 1ulp —
    # identical IEEE in both engines (the cross-engine contract holds)
    assert out["cube"].rho == pytest.approx(1.0, abs=1e-15)
    assert out["cube"].n_pairs == 5
    assert out["neg"].rho == pytest.approx(-1.0, abs=1e-15)
    assert out["const"].rho is None
    assert out["nul"].n_pairs == 2
    assert out["nul"].rho == pytest.approx(1.0, abs=1e-15)

    # tie-aware hand case: x = [1,2,2,3], y = [1,3,2,4]
    # avg ranks x: [1, 2.5, 2.5, 4]; y: [1, 3, 2, 4]
    # classic Pearson on those ranks = 0.9486832980505138...
    t = s([("t", 1, 1), ("t", 2, 3), ("t", 2, 2), ("t", 3, 4)])
    import math

    rx = [1.0, 2.5, 2.5, 4.0]
    ry = [1.0, 3.0, 2.0, 4.0]
    n = 4
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert t["t"].rho == pytest.approx(want, abs=1e-12)


def test_mann_whitney_auc_known_values(spark):
    from ods_to_datalake_spark.operators.profile import (
        mann_whitney_auc,
    )

    def a(rows):
        df = spark.createDataFrame(
            rows, "grp string, s long, y long"
        )
        return {
            r.grp: r
            for r in mann_whitney_auc(
                df, ["grp"], F.col("s"), F.col("y")
            ).collect()
        }

    out = a(
        # perfect separation -> 1; reversed -> 0
        [("sep", 1, 0), ("sep", 2, 0), ("sep", 5, 1), ("sep", 9, 1)]
        + [("rev", 9, 0), ("rev", 5, 0), ("rev", 1, 1)]
        # all scores tied -> 0.5 exactly (the half lives in integers)
        + [("tie", 3, 0), ("tie", 3, 1), ("tie", 3, 0)]
        # one class only -> NULL
        + [("pos", 1, 1), ("pos", 2, 1)]
        # hand case: pos={2,3}, neg={1,3}: pairs (2>1)=1, (2,3)=0,
        # (3>1)=1, (3=3)=0.5 -> AUC = 2.5/4
        + [("h", 1, 0), ("h", 3, 0), ("h", 2, 1), ("h", 3, 1)]
    )
    assert out["sep"].auc == 1.0
    assert out["rev"].auc == 0.0
    assert out["tie"].auc == 0.5
    assert out["pos"].auc is None and out["pos"].n_neg == 0
    assert out["h"].auc == 2.5 / 4


def test_lift_table_hand_case_tied_blocks_and_guards(spark):
    import pytest

    from ods_to_datalake_spark.operators.features import lift_table

    def lt(rows, n_bins):
        df = spark.createDataFrame(rows, "s long, y long")
        return {
            r.bin: r
            for r in lift_table(
                df, F.col("s"), F.col("y"), n_bins=n_bins
            ).collect()
        }

    # perfect score, 2 bins of 2: both positives in the top bin ->
    # bin 0 captures 100% at lift 2.0; bin 1 adds nothing (lift 1.0)
    out = lt([(9, 1), (8, 1), (2, 0), (1, 0)], 2)
    assert out[0].capture_rate == 1.0 and out[0].cum_lift == 2.0
    assert out[1].cum_pos == 2 and out[1].cum_lift == 1.0

    # a dominant tied block lands WHOLE in its start bin: 4 rows all
    # score 5 with 2 bins -> everything in bin 0, bin 1 absent
    out2 = lt([(5, 1), (5, 0), (5, 1), (5, 0)], 2)
    assert set(out2) == {0}
    assert out2[0].n_rows == 4 and out2[0].cum_lift == 1.0

    # no positives -> counts real, rates NULL
    out3 = lt([(3, 0), (2, 0)], 2)
    assert out3[0].capture_rate is None and out3[0].cum_lift is None

    # NULL score/label rows excluded
    out4 = lt([(9, 1), (None, 1), (3, None), (1, 0)], 2)
    assert out4[0].n_rows == 1 and out4[0].n_pos == 1

    with pytest.raises(ValueError):
        lift_table(
            spark.createDataFrame([(1, 1)], "s long, y long"),
            F.col("s"), F.col("y"), n_bins=0,
        )


def test_spearman_and_auc_partition_invariance(spark):
    import random

    from ods_to_datalake_spark.operators.profile import (
        mann_whitney_auc,
        spearman_correlation,
    )

    rng = random.Random(7)
    rows = [
        ("g", rng.randrange(0, 50), rng.randrange(0, 200))
        for _ in range(500)
    ]
    schema = "grp string, a long, b long"
    df1 = spark.createDataFrame(rows, schema).coalesce(1)
    df32 = spark.createDataFrame(rows, schema).repartition(32)

    s1 = sorted(map(tuple, spearman_correlation(
        df1, ["grp"], F.col("a"), F.col("b")).collect()))
    s32 = sorted(map(tuple, spearman_correlation(
        df32, ["grp"], F.col("a"), F.col("b")).collect()))
    assert s1 == s32  # bit-identical, not approx

    a1 = sorted(map(tuple, mann_whitney_auc(
        df1, ["grp"], F.col("a"), F.pmod(F.col("b"), F.lit(2))
    ).collect()))
    a32 = sorted(map(tuple, mann_whitney_auc(
        df32, ["grp"], F.col("a"), F.pmod(F.col("b"), F.lit(2))
    ).collect()))
    assert a1 == a32


def test_trend_fit_known_lines_and_guards(spark):
    import pytest

    from ods_to_datalake_spark.operators.profile import trend_fit

    def fit(rows):
        df = spark.createDataFrame(
            rows, "grp string, x long, y long"
        )
        return {
            r.grp: r
            for r in trend_fit(
                df, ["grp"], F.col("x"), F.col("y")
            ).collect()
        }

    out = fit(
        # exact line y = 3x + 7: slope/intercept/r2 recovered exactly
        # (all-integer sufficient stats -> the IEEE chain is exact
        # here: num/dx = 3.0 precisely)
        [("lin", v, 3 * v + 7) for v in (0, 1, 2, 5, 10)]
        # constant y over spread x: exact 0-slope line, r2 undefined
        + [("flat", 1, 9), ("flat", 2, 9), ("flat", 3, 9)]
        # one distinct x: no line
        + [("onex", 4, 1), ("onex", 4, 99)]
        # NULLs excluded
        + [("nul", 1, 1), ("nul", 2, None), ("nul", None, 5),
           ("nul", 3, 3)]
    )
    lin = out["lin"]
    assert lin.slope == 3.0 and lin.intercept == 7.0 and lin.r2 == 1.0
    flat = out["flat"]
    assert flat.slope == 0.0 and flat.intercept == 9.0
    assert flat.r2 is None
    onex = out["onex"]
    assert (onex.slope, onex.intercept, onex.r2) == (None,) * 3
    assert out["nul"].n_rows == 2
    assert out["nul"].slope == pytest.approx(1.0)
