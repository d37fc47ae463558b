"""Generative fuzz for the sketch family (VERDICT r6 item 4): the
round-6 sketches (x52 HLL, x53 count-min, x54 Bloom, x58 histogram
quantiles, x59 bottom-k) ride exact cross-engine value-hash oracles —
rare for approximate structures, and exactly the kind of bit-level
contract adversarial data breaks (hash-input normalization, register
boundary indexing, grid edge buckets, NULL propagation). Same
derandomized shrink-to-edge-doc workflow as test_fuzz_parity."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

# hash-boundary inputs: empty/whitespace strings, a huge token, unicode
# (incl. astral-plane + combining marks — md5 runs over UTF-8 bytes in
# both engines), digits-only, and heavy duplication (all-identical docs
# collapse every register/bucket onto the same cells)
_SKWORD = st.one_of(
    st.sampled_from(
        [
            "a",
            "the",
            "0",
            "00",
            "é́",  # é + combining acute (non-NFC)
            "\U0001f600",  # astral plane
            "￿",
            "x" * 900,  # one token wider than any real word
            "Ab",
            "ab",  # case-distinct pair (no folding anywhere)
        ]
    ),
    st.text(alphabet="abσ", min_size=1, max_size=4),
)
_SKTEXT = st.one_of(
    st.none(),
    st.just(""),
    st.just("   \t\n  "),
    st.lists(_SKWORD, min_size=0, max_size=25).map(" ".join),
)
# doc ids at long-hash boundaries (0, sign flips, extremes, the stress
# replica offset) plus NULL — x59's bottom-k hashes the id
_SKID = st.sampled_from(
    [0, 1, -1, 2**31 - 1, 2**31, 2**63 - 1, -(2**63), 10_000_000, None]
)


@st.composite
def _sk_corpus(draw):
    texts = draw(st.lists(_SKTEXT, min_size=1, max_size=10))
    if draw(st.booleans()):  # all-identical corpus variant
        texts = [texts[0]] * len(texts)
    ids = [draw(_SKID) for _ in texts]
    return list(zip(ids, texts))


SKETCH_FUZZ_QUERIES = [
    "x52_hll_vocab",
    "x53_cms_heavy_hitters",
    "x54_bloom_prefilter",
    "x59_bottomk_sample",
]


@pytest.mark.parametrize("name", SKETCH_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_sk_corpus())
def test_fuzz_sketch_parity(spark, tmp_path_factory, name, docs):
    d = tmp_path_factory.mktemp("skfuzz")
    rows = [
        (did, t, "en", f"s{i % 3}", len(t) if t else 0)
        for i, (did, t) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()[name]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"{name} on {docs!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# histogram-grid fuzz: prices ON bucket boundaries
# ---------------------------------------------------------------------------

# x58's fixed integer-cents grid is exactly wrong-able at bucket edges:
# values landing ON a boundary, at 0, negative, sub-cent fractions
# (binary-unrepresentable), and far outside the grid range, with NULLs
# and single-status groups (rank edge: cumulative == total)
_PRICE = st.one_of(
    st.none(),
    st.sampled_from(
        [
            0.0,
            0.01,
            -0.01,
            -5000.0,
            1.005,  # half-cent: binary rounding direction matters
            999.99,
            1000.0,
            1000.01,
            99999.995,
            1e7,
            4.9e5,
            123456.78,
        ]
    ),
    st.integers(0, 600_000).map(lambda c: c / 100.0),
)
_ORDER = st.tuples(st.sampled_from(["O", "F", "P"]), _PRICE)
_ORDERS = st.lists(_ORDER, min_size=1, max_size=14)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orders=_ORDERS)
def test_fuzz_histogram_quantiles_parity(spark, tmp_path_factory, orders):
    d = tmp_path_factory.mktemp("histfuzz")
    rows = [
        (i, i % 5, status, price) for i, (status, price) in enumerate(orders)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()["x58_histogram_quantiles"]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"x58 on {orders!r}: {report}"
    finally:
        con.close()
