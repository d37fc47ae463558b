"""Unit tests per engine operator (SURVEY §5 plan: tiny inline frames,
exact collect() comparisons, decimal-exact)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import nulls
from ods_to_datalake_spark.functions.decode import value_map_decode
from ods_to_datalake_spark.functions.timefmt import (
    clean_date,
    iso_ts_string,
    run_index_key,
)
from ods_to_datalake_spark.operators.agg import conditional_sum, pivot_sum
from ods_to_datalake_spark.operators.joins import asof_join, range_join
from ods_to_datalake_spark.operators.nest import fold_to_array
from ods_to_datalake_spark.operators.windows import (
    dedup_keep_first,
    sequence,
    surrogate_key,
)


def test_null_policy_req_opt(spark):
    df = spark.createDataFrame(
        [("5", "7.5"), (None, None)], "i string, d string"
    )
    r = df.select(
        nulls.req("i", "int").alias("ri"),
        nulls.req("d", "dec").alias("rd"),
        nulls.req("i", "str").alias("rs"),
        nulls.opt("i", "int").alias("oi"),
    ).collect()
    assert (r[0].ri, r[0].rd) == (5, Decimal("7.50"))
    assert (r[1].ri, r[1].rd, r[1].rs, r[1].oi) == (0, Decimal("0.00"), "", None)


def test_null_safe_add_all_cases(spark):
    df = spark.createDataFrame(
        [("1.10", "2.20"), ("1.10", None), (None, "2.20"), (None, None)],
        "a string, b string",
    )
    got = [r.s for r in df.select(nulls.null_safe_add("a", "b").alias("s")).collect()]
    assert got == [Decimal("3.30"), Decimal("1.10"), Decimal("2.20"), None]


def test_guarded_int(spark):
    df = spark.createDataFrame([("5",), ("  ",), ("",), (None,)], "x string")
    got = [r.g for r in df.select(nulls.guarded_int("x").alias("g")).collect()]
    assert got == [5, None, None, None]


def test_value_map_decode_trims_and_defaults(spark):
    df = spark.createDataFrame([(" A ",), ("B",), ("C",)], "c string")
    got = [
        r.d
        for r in df.select(
            value_map_decode("c", {"A": "1", "B": "2"}, default="99").alias("d")
        ).collect()
    ]
    assert got == ["1", "2", "99"]


def test_timefmt(spark):
    df = spark.createDataFrame([("20260123", "2026-01-23")], "c string, d string")
    r = df.select(
        clean_date("c", "yyyyMMdd").alias("cd"),
        iso_ts_string("d").alias("ts"),
        run_index_key("c", 3).alias("rk"),
    ).collect()[0]
    assert r.cd == "2026-01-23"
    assert r.ts == "2026-01-23T00:00:00+07:00"
    assert r.rk == "2026-01-23_3"


def test_sequence_and_surrogate(spark):
    df = spark.createDataFrame(
        [("g1", 3), ("g1", 1), ("g1", 2), ("g2", 9)], "g string, v int"
    )
    seq = {
        (r.g, r.v): r.row_num
        for r in sequence(df, ["g"], ["v"]).collect()
    }
    assert seq == {("g1", 1): 1, ("g1", 2): 2, ("g1", 3): 3, ("g2", 9): 1}
    sk = {
        (r.g, r.v): r.key
        for r in surrogate_key(df, "K_", ["g"], ["v"], out_col="key").collect()
    }
    assert sk[("g1", 2)] == "K_g1_2" and sk[("g2", 9)] == "K_g2_1"
    with pytest.raises(ValueError):
        sequence(df, [], ["v"])


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [("a", 2, "x"), ("a", 1, "y"), ("b", 5, "z")], "k string, o int, v string"
    )
    got = {r.k: r.v for r in dedup_keep_first(df, ["k"], ["o"]).collect()}
    assert got == {"a": "y", "b": "z"}


def test_fold_to_array_string_sort_gotcha(spark):
    """sort_array on struct<string,...> sorts lexicographically:
    '_1','_10','_2' — the golden-file order must be reproduced."""
    df = spark.createDataFrame(
        [("h", f"r_{i}", i) for i in (1, 2, 10)], "h string, n string, v int"
    )
    arr = fold_to_array(df, ["h"], ["n", "v"], out_col="a").collect()[0].a
    assert [x.n for x in arr] == ["r_1", "r_10", "r_2"]


def test_conditional_sum_reference_demo(spark):
    """The pyspark_sum_function demo: P001 basic=1000, rider=500,
    total=1500 with tax excluded (FIXTURES.md §5)."""
    df = spark.createDataFrame(
        [
            ("P001", "basic", 1000), ("P001", "rider", 500),
            ("P001", "tax", 50), ("P002", "basic", 2000),
            ("P002", "rider", 0), ("P003", "rider", 300),
        ],
        "policy_id string, premium_level string, amount long",
    )
    lvl = F.col("premium_level")
    out = {
        r.policy_id: (r.basic, r.rider, r.total)
        for r in df.groupBy("policy_id")
        .agg(
            conditional_sum("amount", lvl == "basic").alias("basic"),
            conditional_sum("amount", lvl == "rider").alias("rider"),
            conditional_sum("amount", lvl.isin("basic", "rider")).alias("total"),
        )
        .collect()
    }
    assert out["P001"] == (Decimal("1000.00"), Decimal("500.00"), Decimal("1500.00"))
    assert out["P003"] == (Decimal("0.00"), Decimal("300.00"), Decimal("300.00"))


def test_pivot_sum_pinned_values(spark):
    df = spark.createDataFrame(
        [("P1", "basic", 10), ("P1", "rider", 5), ("P2", "tax", 1)],
        "k string, lvl string, v int",
    )
    out = {r.k: (r.basic, r.rider) for r in
           pivot_sum(df, ["k"], "lvl", ["basic", "rider"], "v").collect()}
    # P2 has neither pinned value → filled with 0; 'tax' never a column
    assert out["P1"] == (Decimal("10.00"), Decimal("5.00"))
    assert out["P2"] == (Decimal("0.00"), Decimal("0.00"))


def test_range_join(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 150.0)], "id int, v double")
    right = spark.createDataFrame(
        [("lo", 0.0, 100.0), ("hi", 100.0, 1000.0)],
        "name string, lo double, hi double",
    )
    got = {r.id: r.name for r in range_join(left, right, "v", "lo", "hi").collect()}
    assert got == {1: "lo", 2: "hi"}


def test_asof_join_directions(spark):
    left = spark.createDataFrame(
        [("u", 5, "e1"), ("u", 12, "e2"), ("v", 3, "e3")],
        "k string, t int, name string",
    )
    right = spark.createDataFrame(
        [("u", 4, "r_a"), ("u", 10, "r_b"), ("u", 20, "r_c")],
        "k string, t int, tag string",
    )
    back = {
        r.name: r.tag
        for r in asof_join(left, right, ["k"], "t", "t", "backward").collect()
    }
    assert back == {"e1": "r_a", "e2": "r_b", "e3": None}
    fwd = {
        r.name: r.tag
        for r in asof_join(left, right, ["k"], "t", "t", "forward").collect()
    }
    assert fwd == {"e1": "r_b", "e2": "r_c", "e3": None}
    # tie: right row at exactly left's time matches in both directions
    tie = spark.createDataFrame([("u", 10, "eq")], "k string, t int, name string")
    assert (
        asof_join(tie, right, ["k"], "t", "t", "backward").collect()[0].tag
        == "r_b"
    )


def test_approx_profile_error_bounds(spark):
    """Sketch aggregates stay within their advertised error bounds of
    the exact answers (computed on the same data)."""
    from ods_to_datalake_spark.operators.agg import approx_profile

    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    approx = {
        r.o_orderstatus: (
            r.approx_distinct_o_custkey,
            r.approx_percentiles_o_totalprice,
        )
        for r in approx_profile(
            df, ["o_orderstatus"], "o_custkey", "o_totalprice"
        ).collect()
    }
    exact = {
        r.o_orderstatus: (r.nd, r.p50, r.p95)
        for r in df.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for status, (nd_e, p50_e, p95_e) in exact.items():
        nd_a, (p50_a, p95_a) = approx[status]
        assert abs(nd_a - nd_e) / nd_e < 0.15  # 3x the 5% rsd as slack
        assert abs(p50_a - p50_e) / p50_e < 0.05
        assert abs(p95_a - p95_e) / p95_e < 0.05


def test_scd2_apply_versioning_and_idempotence(spark):
    """SCD-2 lifecycle: bootstrap, change, insert, no-op update, and a
    second merge over the produced history (must not corrupt closed
    rows or re-close open ones)."""
    from ods_to_datalake_spark.operators.windows import scd2_apply

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string")
    upd1 = spark.createDataFrame([(1, "a2"), (3, "c")], "k int, val string")

    def snap(df):
        return {
            (r.k, r.version, r.val, str(r.valid_from), str(r.valid_to))
            for r in df.collect()
        }

    h1 = scd2_apply(base, upd1, "k", "2026-02-01")
    assert snap(h1) == {
        (1, 1, "a", "1900-01-01", "2026-02-01"),
        (1, 2, "a2", "2026-02-01", "None"),
        (2, 1, "b", "1900-01-01", "None"),
        (3, 1, "c", "2026-02-01", "None"),
    }

    # value-identical updates are no-ops: re-merging the same updates
    # over the produced history changes nothing (idempotence)
    h2 = scd2_apply(h1, upd1, "k", "2026-03-01")
    assert snap(h2) == snap(h1)

    # a later real change appends version 3 and closes only version 2
    upd2 = spark.createDataFrame([(1, "a3")], "k int, val string")
    h3 = scd2_apply(h2, upd2, "k", "2026-04-01")
    assert snap(h3) == {
        (1, 1, "a", "1900-01-01", "2026-02-01"),
        (1, 2, "a2", "2026-02-01", "2026-04-01"),
        (1, 3, "a3", "2026-04-01", "None"),
        (2, 1, "b", "1900-01-01", "None"),
        (3, 1, "c", "2026-02-01", "None"),
    }


def test_scd2_apply_null_safe_change_detection(spark):
    """NULL→value and value→NULL are real changes; NULL→NULL is not."""
    from ods_to_datalake_spark.operators.windows import scd2_apply

    base = spark.createDataFrame(
        [(1, None), (2, None)], "k int, val string"
    )
    upd = spark.createDataFrame([(1, "x"), (2, None)], "k int, val string")
    out = scd2_apply(base, upd, "k", "2026-02-01")
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r.k, []).append(r)
    assert len(by_key[1]) == 2  # NULL→x: closed + new version
    assert len(by_key[2]) == 1  # NULL→NULL: untouched
    assert by_key[2][0].valid_to is None


def test_connected_components_chain_and_islands(spark):
    """Chain A-B-C collapses to one cluster (pairwise delete would
    over-delete), islands stay separate, singletons absent."""
    from ods_to_datalake_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    got = {
        (r.id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_star_equals_min_label(spark):
    """Large-star/small-star CC must label exactly like min-label
    propagation on random graphs (islands, chains, cliques mixed)."""
    import random

    from ods_to_datalake_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        want = {
            (r.id, r.cluster_id)
            for r in connected_components(pairs, max_iter=100).collect()
        }
        got = {
            (r.id, r.cluster_id)
            for r in connected_components_star(pairs).collect()
        }
        assert got == want, f"seed={seed}"


def test_connected_components_star_deep_chain_fast_convergence(spark):
    """A 64-node path has diameter 63: min-label propagation needs ~63
    rounds, the star algorithm must finish in O(log n) — well under
    10 rounds — with the correct single cluster."""
    from ods_to_datalake_spark.operators.dedup import (
        connected_components_star,
    )

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels, rounds = connected_components_star(pairs, return_rounds=True)
    got = {(r.id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    assert rounds <= 10, rounds


def test_simhash_band_pairs_vs_brute_force(spark):
    """Banded Hamming search vs exhaustive comparison on random 32-bit
    signatures: (a) every reported pair's distance is exact and within
    the bound; (b) the pigeonhole guarantee holds — every pair with
    fewer than n_bands differing bits IS reported (they must share a
    band); (c) nothing outside the bound leaks through."""
    import random

    from ods_to_datalake_spark.operators.dedup import simhash_band_pairs

    rng = random.Random(7)
    base = [rng.getrandbits(32) for _ in range(12)]
    sigs = []
    for i, b in enumerate(base):
        sigs.append((i * 10, b))
        # a few perturbed near-dups at controlled distances
        for j, flips in enumerate((1, 3, 5, 7)):
            v = b
            for bit in rng.sample(range(32), flips):
                v ^= 1 << bit
            sigs.append((i * 10 + j + 1, v))

    def bits(v: int) -> str:
        return format(v, "032b")

    n_bands, max_h = 4, 6
    df = spark.createDataFrame(
        [(i, bits(v)) for i, v in sigs], "doc_id long, simhash string"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_band_pairs(
            df, n_bands=n_bands, max_hamming=max_h
        ).collect()
    }
    width = 32 // n_bands
    for ia, va in sigs:
        for ib, vb in sigs:
            if ia >= ib:
                continue
            h = bin(va ^ vb).count("1")
            ba, bb = bits(va), bits(vb)
            shares_band = any(
                ba[k * width : (k + 1) * width]
                == bb[k * width : (k + 1) * width]
                for k in range(n_bands)
            )
            if (ia, ib) in got:
                assert got[(ia, ib)] == h  # exact verify
                assert h <= max_h  # bound respected
            elif h <= max_h:
                # only probabilistic misses: all bands must differ,
                # impossible below n_bands differing bits
                assert not shares_band
                assert h >= n_bands
            if h < n_bands:
                assert (ia, ib) in got  # pigeonhole guarantee


def test_quantile_bins_matches_exact_ntile(spark):
    """The scalable binning (sketch cutpoints + stateless CASE) must
    agree with exact NTILE on ~all rows, with equal-ish bin sizes and
    no global single-partition sort in the plan."""
    import contextlib
    import io

    from pyspark.sql import Window

    from ods_to_datalake_spark.catalog import load_testdata
    from ods_to_datalake_spark.operators.agg import quantile_bins

    orders = load_testdata(spark, "/root/testdata/sf0.01").table("orders")
    binned = quantile_bins(orders, "o_totalprice", 4)

    w = Window.orderBy("o_totalprice", "o_orderkey")
    exact = orders.withColumn("ntile", F.ntile(4).over(w))
    joined = binned.join(exact, "o_orderkey")
    n = joined.count()
    agree = joined.filter(F.col("bin") == F.col("ntile")).count()
    assert agree / n > 0.99  # sketch error only at bin boundaries

    sizes = [
        r.n for r in binned.groupBy("bin").agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 4
    assert max(sizes) - min(sizes) < n * 0.02

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        binned.explain("formatted")
    assert "Window" not in buf.getvalue()  # stateless map, no sort


def test_pack_sequences_semantics(spark):
    """Contiguous-fill packing: in-shard running offsets, boundary
    straddle lands the next doc in the right window, shards isolated."""
    from ods_to_datalake_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100), (4, 50)],
        "doc_id long, n_tok long",
    )
    # one shard -> one global stream: offsets are the running sums
    rows = {
        r.doc_id: r
        for r in pack_sequences(
            df, "doc_id", "n_tok", target_len=512, n_shards=1
        ).collect()
    }
    assert (rows[1].seq_idx, rows[1].offset) == (0, 0)
    assert (rows[2].seq_idx, rows[2].offset) == (0, 300)  # straddles 512
    assert (rows[3].seq_idx, rows[3].offset) == (1, 88)  # 600 -> window 1
    assert (rows[4].seq_idx, rows[4].offset) == (1, 188)
    assert all(r.shard == 0 for r in rows.values())
    # many shards: offsets restart per shard, never exceed target
    sharded = pack_sequences(
        df, "doc_id", "n_tok", target_len=512, n_shards=4
    ).collect()
    assert {r.doc_id for r in sharded} == {1, 2, 3, 4}
    assert all(0 <= r.offset < 512 for r in sharded)


def test_incremental_dedup_tiers(spark):
    """Cross-corpus admission: exact duplicates of the seen corpus are
    rejected by content hash, token-identical (whitespace-differing)
    docs by shared LSH bands, unique and too-short-for-shingles docs
    are admitted, and null text behaves like empty text."""
    from ods_to_datalake_spark.operators.dedup import incremental_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running far away"
    )
    seen = spark.createDataFrame(
        [
            (2, base),
            (4, "completely different content about spark engines"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),  # exact copy -> tier-1 reject
            # same tokens, different raw bytes (double spaces): not an
            # exact dup, but the shingle set is identical -> every band
            # key matches -> tier-2 reject
            (3, base.replace(" ", "  ")),
            (5, "entirely novel words nobody wrote before today here"),
            (7, "hi there"),  # < shingle_n tokens: no bands, admitted
            (9, None),  # null text == seen null/empty -> tier-1 reject
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(new, seen, "doc_id", "text")
    assert sorted(r.doc_id for r in out.collect()) == [5, 7]


def test_incremental_dedup_cold_start(spark):
    """Empty seen corpus (first-ever snapshot): everything is admitted
    and the band join against an empty table doesn't error."""
    from ods_to_datalake_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame(
        [(1, "some words repeated here some words"), (2, None)],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame([], "doc_id long, text string")
    out = incremental_dedup(new, seen, "doc_id", "text")
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """1k identical docs hash every band into one bucket — uncapped
    that is ~500k candidate pairs per band. With max_bucket the join
    completes with ZERO pairs from the degenerate key, the spill is
    reported (not silent), and distinct sub-cap near-dup groups are
    still found."""
    from ods_to_datalake_spark.operators.dedup import (
        lsh_banded,
        minhash_lsh_candidates,
        oversized_buckets,
    )

    boiler = [(i, "the same boilerplate text repeated verbatim here")
              for i in range(1000)]
    # a small genuine near-dup group, below the cap
    group = [
        (2000, "alpha beta gamma delta epsilon zeta eta theta"),
        (2001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(
        boiler + group, "doc_id long, text string"
    )

    capped = minhash_lsh_candidates(df, "doc_id", "text", max_bucket=50)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert all(a >= 2000 and b >= 2000 for a, b in pairs), (
        "degenerate boilerplate bucket leaked pairs"
    )
    assert (2000, 2001) in pairs  # sub-cap group still found

    report = oversized_buckets(
        lsh_banded(df, "doc_id", "text"), max_bucket=50
    ).collect()
    assert len(report) == 4  # all 4 bands of the boilerplate overflow
    assert all(r.n_docs == 1000 for r in report)

    # uncapped on the small group alone is unaffected by the cap param
    small = spark.createDataFrame(group, "doc_id long, text string")
    assert minhash_lsh_candidates(
        small, "doc_id", "text", max_bucket=50
    ).count() == minhash_lsh_candidates(small, "doc_id", "text").count()


def test_hyperplane_bucket_cap(spark):
    """Same guard on the embedding face: a degenerate sign bucket (many
    identical vectors) is excluded and reported; a distinct sub-cap
    near-dup pair elsewhere survives."""
    from ods_to_datalake_spark.operators.dedup import oversized_buckets
    from ods_to_datalake_spark.operators.similarity import (
        _tag_hyperplane_buckets,
        hyperplane_lsh_pairs,
    )

    dup = [(i, [1.0, 0.5, -0.25, 0.75]) for i in range(200)]
    pair = [(900, [-1.0, -0.5, 0.25, -0.75]),
            (901, [-1.0, -0.5, 0.25, -0.74])]
    df = spark.createDataFrame(dup + pair, "vec_id long, v array<double>")

    got = hyperplane_lsh_pairs(
        df, "vec_id", "v", dim=4, threshold=0.9, max_bucket=50
    )
    ids = {(r.id_a, r.id_b) for r in got.collect()}
    assert ids == {(900, 901)}

    report = oversized_buckets(
        _tag_hyperplane_buckets(df, "vec_id", "v", 4, 4),
        max_bucket=50,
        keys=("__bucket",),
    ).collect()
    assert len(report) == 1 and report[0].n_docs == 200


def test_simhash_band_pairs_bucket_cap(spark):
    """The SimHash face gets the same width guard: identical docs
    collapse into one signature bucket per band — capped, they emit no
    pairs and the spill is reportable; a distinct near-dup pair below
    the cap survives."""
    from ods_to_datalake_spark.operators.dedup import (
        oversized_buckets,
        simhash_band_pairs,
        simhash_signatures,
    )

    boiler = [(i, "the same boilerplate text repeated verbatim here")
              for i in range(300)]
    pair = [
        (900, "alpha beta gamma delta epsilon zeta eta theta"),
        (901, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    sig = simhash_signatures(df, "doc_id", "text")

    got = simhash_band_pairs(sig, max_hamming=16, max_bucket=50)
    assert all(
        r.id_a >= 900 for r in got.collect()
    ), "degenerate signature bucket leaked pairs"

    report = oversized_buckets(
        sig.selectExpr(
            "doc_id",
            "posexplode(array(substring(simhash,1,8), substring(simhash,9,8),"
            " substring(simhash,17,8), substring(simhash,25,8)))"
            " AS (band_idx, band)",
        ),
        max_bucket=50,
        keys=("band_idx", "band"),
    )
    assert report.count() == 4


def test_jaccard_pairs_precomputed_shingle_table(spark, tmp_path):
    """The extreme-scale path: shingle_sets persisted to the lake and
    handed to jaccard_pairs skips re-shingling (and the checkpoint) and
    produces the identical verify output."""
    from ods_to_datalake_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
        shingle_sets,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight nine"),
        (4, "one two three four five six seven eight ten"),
        (5, "completely different text about the weather today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = minhash_lsh_candidates(df, "doc_id", "text")

    inline = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(df, cands, "doc_id", "text").collect()
    }

    lake = str(tmp_path / "shingles")
    shingle_sets(df, "doc_id", "text").write.parquet(lake)
    precomputed = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(
            df,
            cands,
            "doc_id",
            "text",
            shingle_table=spark.read.parquet(lake),
        ).collect()
    }
    assert precomputed == inline and len(inline) > 0


def test_minhash_candidates_precomputed_band_table(spark, tmp_path):
    """Cross-query band-table reuse: a persisted lsh_banded frame passed
    via band_table= yields identical candidates to the inline path."""
    from ods_to_datalake_spark.operators.dedup import (
        lsh_banded,
        minhash_lsh_candidates,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight nine"),
        (4, "one two three four five six seven eight ten"),
        (5, "completely different text about the weather today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inline = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(df, "doc_id", "text").collect()
    }
    lake = str(tmp_path / "bands")
    lsh_banded(df, "doc_id", "text").write.parquet(lake)
    precomputed = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            df, "doc_id", "text", band_table=spark.read.parquet(lake)
        ).collect()
    }
    assert precomputed == inline and len(inline) > 0


def test_cdc_apply_semantics(spark):
    """Delete wins for a key whose latest op is D; latest version of a
    double-updated key applies; U on a missing key inserts; untouched
    base rows pass through."""
    from ods_to_datalake_spark.operators.cdc import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1),
            (1, "a2", "U", 2),   # latest wins
            (2, None, "D", 1),   # delete
            (4, "d", "U", 1),    # update on missing key = insert
            (5, "e", "I", 1),
            (5, None, "D", 2),   # inserted then deleted in one batch
        ],
        "k long, v string, op string, ver int",
    )
    out = cdc_apply(base, changes, ["k"], op_col="op", version_col="ver")
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a2", 3: "c", 4: "d"}


# --- stratified largest-remainder sample (x77) --------------------------


def test_stratified_exact_sample_hits_k_exactly(spark):
    from ods_to_datalake_spark.operators.sampling import (
        stratified_exact_sample,
    )

    rows = [(i, "a" if i % 7 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_exact_sample(df, "id", "s", k=13).collect()
    assert len(out) == 13
    # proportional: stratum a has 86 rows, b 14 -> quotas 11.18/1.82
    # -> bases 11/1, one leftover goes to the larger remainder (b)
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r)
    assert {s: len(v) for s, v in by.items()} == {"a": 11, "b": 2}
    assert {r.quota for r in by["a"]} == {11}


def test_stratified_exact_sample_deterministic_and_null_stratum(spark):
    from ods_to_datalake_spark.operators.sampling import (
        stratified_exact_sample,
    )

    rows = [(i, None if i % 3 == 0 else "x") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, s string")
    key = lambda t: (t[0] is not None, t[0] or "", t[1])
    a = sorted(((r.stratum, r.id) for r in
                stratified_exact_sample(df, "id", "s", k=9).collect()),
               key=key)
    b = sorted(((r.stratum, r.id) for r in
                stratified_exact_sample(
                    df.repartition(7), "id", "s", k=9).collect()),
               key=key)
    assert a == b and len(a) == 9
    # the NULL stratum participates (10 of 30 rows -> quota 3)
    assert sum(1 for s, _ in a if s is None) == 3


def test_stratified_exact_sample_k_edge_cases(spark):
    import pytest

    from ods_to_datalake_spark.operators.sampling import (
        stratified_exact_sample,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, s string"
    )
    assert stratified_exact_sample(df, "id", "s", k=0).count() == 0
    # k > N degrades to every row
    assert stratified_exact_sample(df, "id", "s", k=99).count() == 3
    with pytest.raises(ValueError):
        stratified_exact_sample(df, "id", "s", k=-1)


def test_stratified_exact_sample_uses_window_group_limit(spark):
    # the literal-k rank pre-filter is what lets Spark plan the
    # per-stratum selection as WindowGroupLimit (a k-heap per
    # partition BEFORE the exchange); the join-derived quota filter
    # alone would full-sort every stratum — plan-asserted so a
    # refactor can't silently lose it
    from ods_to_datalake_spark.operators.sampling import (
        stratified_exact_sample,
    )

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(200)],
        "id long, s string",
    )
    out = stratified_exact_sample(df, "id", "s", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert out.count() == 10


# --- rising runs (w08) ------------------------------------------------------


def test_rising_runs_hand_case(spark):
    """values 1,2,3,1,2 → runs [1,2,3] and [1,2]: longest 3, one run
    at min 3; a NULL breaks any run."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.windows import rising_runs

    rows = [
        (1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 4, 1), (1, 5, 2),
        # key 2: 1,2,NULL,3,4 — the NULL splits [1,2] from [3,4]
        (2, 1, 1), (2, 2, 2), (2, 3, None), (2, 4, 3), (2, 5, 4),
        (3, 1, 7),  # single row: trivial run of 1
    ]
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    out = {
        r.k: r
        for r in rising_runs(
            df, "k", [F.col("seq")], F.col("v"), min_run=3
        ).collect()
    }
    assert (out[1].n_rows, out[1].longest_rising_run,
            out[1].n_runs_at_min) == (5, 3, 1)
    assert (out[2].longest_rising_run, out[2].n_runs_at_min) == (2, 0)
    assert (out[3].n_rows, out[3].longest_rising_run) == (1, 1)


def test_minhash_calibration_sampled_slice(spark):
    """sample_mod=M keeps a deterministic hash-mod slice of the
    candidate PAIRS before the exact-verify joins — the 100-TB mode
    for dup-heavy corpora where the candidate stream is quadratic by
    LSH construction. The slice is stable (same pairs every run), the
    report arithmetic is unchanged, and M=1/None is the full report."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.dedup import (
        minhash_calibration_report,
        minhash_lsh_candidates,
    )

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta w{i} "
            f"iota kappa w{i % 7} lambda mu nu xi")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = minhash_calibration_report(
        df, "doc_id", "text", 3, 8, 4, 2
    ).collect()[0]
    again = minhash_calibration_report(
        df, "doc_id", "text", 3, 8, 4, 2, sample_mod=1
    ).collect()[0]
    assert full == again
    assert full.n_pairs > 0

    mod = 4
    sampled = minhash_calibration_report(
        df, "doc_id", "text", 3, 8, 4, 2, sample_mod=mod
    ).collect()[0]
    expected = (
        minhash_lsh_candidates(df, "doc_id", "text", 3, 8, 4, 2)
        .where(F.pmod(F.xxhash64("id_a", "id_b"), F.lit(mod)) == 0)
        .count()
    )
    assert sampled.n_pairs == expected < full.n_pairs
    if sampled.n_pairs > 0:
        assert 0.0 <= sampled.mean_est <= 1.0
        assert 0.0 <= sampled.mean_exact <= 1.0
        assert sampled.max_abs_err <= 1.0


def test_weighted_exact_sample_properties(spark):
    """Exact k per group, weight-exclusion rules, reproducibility,
    WindowGroupLimit plan, and the defining distribution property:
    a heavy row wins a seat far more often than a light one across
    many independent draws (salted ids simulate re-draws)."""
    from ods_to_datalake_spark.operators.sampling import (
        weighted_exact_sample,
    )

    rows = [(i, "g" + str(i % 2), (i % 7 + 1) * 100) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, w long")

    out = weighted_exact_sample(df, "id", F.col("w"), 5, by=["g"])
    got = out.collect()
    assert len(got) == 10  # exactly k per group
    assert {r.g for r in got} == {"g0", "g1"}
    assert all(1 <= r.rank <= 5 for r in got)

    # reproducible: same draw every run
    again = weighted_exact_sample(df, "id", F.col("w"), 5, by=["g"])
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))

    # plan: per-group selection is a WindowGroupLimit k-heap
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan

    # non-positive/NULL weights and NULL ids are excluded
    bad = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None), (None, 10)],
        "id long, w long",
    )
    kept = weighted_exact_sample(bad, "id", F.col("w"), 10).collect()
    assert sorted(r.id for r in kept) == [1]

    # weight-proportionality: 500 independent 1-of-2 draws between a
    # weight-9 row and a weight-1 row (distinct id salts = fresh
    # uniforms); the heavy row should win ~90% of the seats
    many = spark.createDataFrame(
        [(f"h#{t}", "t" + str(t), 9000) for t in range(500)]
        + [(f"l#{t}", "t" + str(t), 1000) for t in range(500)],
        "id string, trial string, w long",
    )
    winners = weighted_exact_sample(
        many, "id", F.col("w"), 1, by=["trial"]
    ).collect()
    heavy_wins = sum(1 for r in winners if r.id.startswith("h#"))
    assert len(winners) == 500
    assert 400 <= heavy_wins <= 490, heavy_wins
