"""Property-based cross-engine parity: hypothesis generates small
random document corpora (including whitespace runs, unicode, NULLs,
empties, duplicates) and a representative slice of the text suite must
hash-match its oracle on every one — the generative generalization of
the hand-picked edge tiers (those pin known divergence classes; this
hunts unknown ones).

derandomized + bounded examples: the value is breadth of shape, not
volume — each example costs two engine runs, and failures shrink to a
minimal corpus which then belongs in test_text_edge_parity.EDGE_DOCS.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from ods_to_datalake_spark.plans.suite import load_all
from tests.oracle_utils import compare, duckdb_conn

# words skew toward collisions (tiny alphabet) so dedup/LSH paths get
# real shingle overlap, plus unicode and whitespace oddities
_WORD = st.one_of(
    st.sampled_from(["a", "b", "c", "ab", "the", "héllo", "ñ", "x" * 40]),
    st.text(alphabet="abσπ", min_size=1, max_size=6),
)
_TEXT = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.lists(_WORD, min_size=0, max_size=30).map(" ".join),
    # literal tabs/newlines between words
    st.lists(_WORD, min_size=1, max_size=10).map("\t".join),
)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=12)

# cheap, structurally diverse slice: tokenizer stats, langid scores,
# the full minhash pipeline, span dedup, and the LM (joins + decimal)
FUZZ_QUERIES = [
    "x02_token_count",
    "x03_minhash_signature",
    "x34_duplicate_spans",
    "x38_lm_perplexity",
    "x39_span_rewrite",
    "x41_vocab_oov",
    # round-6b: benchmark-overlap ratio + DSIR two-model log-ratio
    # (corpora with ≤ 10 docs are all-benchmark — empty train side)
    "x46_decontaminate_scored",
    "x47_dsir_weights",
    # round-6c: posting-list fold determinism + BM25 decimal ranking
    # ('the' is in the fuzz word pool, so term matches are non-trivial)
    "x55_inverted_index",
    "x56_bm25_topk",
    # round-7: prefix-filtered exact set-similarity join (tiny-alphabet
    # corpora are Jaccard-dense, so the verify leg really fires)
    "x60_set_similarity_join",
    # round-9: hashing-trick featurizer (empty/whitespace docs hash
    # the '' token; sign cancellation must match bit-for-bit)
    "x74_feature_hashing",
    # round-9: LSH recall audit — tiny corpora exercise the
    # empty-truth/empty-candidate CASE guards and sub-shingle docs
    "x78_lsh_recall_audit",
    # round-9: rank-frequency profile — whitespace/unicode token ties
    # at the k-cut, and the all-NULL corpus (zero totals, no rows)
    "x79_zipf_profile",
    # round-10: reliability/ECE — zero-token docs excluded, empty
    # corpus -> empty report, integer bin edges at exact boundaries
    "x81_score_calibration",
    # round-10: containment join — tiny-alphabet corpora are
    # containment-dense; single-token docs make prefix length 1 and
    # t=1 boundary pairs
    "x82_containment_join",
    # round-10: multiplicity spectrum — tiny corpora duplicate
    # constantly (incl. NULL-hash groups and all-dup corpora)
    "x84_dup_multiplicity",
    # round-10: token entropy — empty/whitespace docs (no
    # distribution), single-token docs (exactly 0 bits), the
    # quantized log2 terms under unicode token counts
    "x85_token_entropy",
    # round-11: shingle novelty — tiny-alphabet corpora collide
    # shingles constantly (first-occurrence attribution really
    # contested), sub-shingle docs absent, within-doc repeats distinct
    "x86_shingle_novelty",
    # round-11: source KL — single-source fuzz corpora must read
    # EXACTLY 0 nats (support == mix), all-NULL corpora have no tokens
    "x87_source_kl",
    # round-11: estimator calibration — tiny-alphabet corpora are
    # candidate-dense, zero-candidate corpora hit the NULL-mean
    # guards, and the DECIMAL(18,12) per-pair quantization folds
    "x89_minhash_calibration",
    # round-11: fertility — unicode codepoint counting, NULL texts
    # count docs but no tokens, empty corpora (single fuzz lang group)
    "x91_tokenizer_fertility",
    # round-11: skip-gram PMI — tiny-alphabet corpora are pair-dense
    # past the min-count floor, single/empty-token docs hit the
    # null-tail filter, unordered least/greatest on unicode
    "x92_skipgram_pmi",
    # round-12: Mann-Whitney AUC — tiny corpora hit the one-class
    # NULL guard constantly, tied token counts exercise the exact
    # half-credit integer arithmetic, NULL texts rank nothing
    "x95_score_auc",
    # round-12: decile lift — tiny corpora make dominant tied blocks
    # (whole-block binning with absent later bins), zero-positive
    # corpora hit the NULL rate guards
    "x96_lift_table",
    # round-12: phrase match — tiny-alphabet corpora make the top
    # bigram genuinely contested (count ties broken lexicographically
    # must agree cross-engine), overlapping occurrences, sub-2-token
    # and NULL docs shingle to nothing
    "x98_phrase_match",
    # round-12: burstiness — tiny-alphabet corpora tie ratios at the
    # k-cut constantly (bit-equal doubles + token tiebreak must order
    # identically), df floor, unicode tokens
    "x99_term_burstiness",
]


@pytest.mark.parametrize("name", FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_CORPUS)
def test_fuzz_corpus_parity(spark, tmp_path_factory, name, texts):
    d = tmp_path_factory.mktemp("fuzz")
    rows = [
        (i, t, "en", "fuzz", len(t) if t else 0)
        for i, t in enumerate(texts)
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
        assert report["match"], f"{name} on {texts!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# quality-filter fuzz: punctuation / bullet / line-structure corpora
# ---------------------------------------------------------------------------

# the Gopher/C4 rule families key on structure the generic word soup
# never produces: terminal punctuation, ellipses (ASCII and U+2026),
# bullets, braces, blockwords, CRLF vs LF line breaks — a dedicated
# strategy so the existing derandomized FUZZ_QUERIES examples stay put
_FWORD = st.sampled_from(
    ["the", "of", "and", "word.", "mid", "x#y", "...", "…", "end!",
     "why?", 'quote"', "- a", "* b", "•", "{", "javascript",
     "lorem", "ipsum", "a" * 12]
)
_FLINE = st.lists(_FWORD, min_size=0, max_size=12).map(" ".join)
_FTEXT = st.one_of(
    st.none(),
    st.just(""),
    st.lists(_FLINE, min_size=1, max_size=4).map("\n".join),
    st.lists(_FLINE, min_size=1, max_size=3).map("\r\n".join),
)
_FILTER_CORPUS = st.lists(_FTEXT, min_size=1, max_size=10)

FILTER_FUZZ_QUERIES = [
    "x48_gopher_quality",
    "x49_c4_line_filter",
    # repetition rules feed on the same line/punctuation structure,
    # and the small word set makes duplicate lines/n-grams common
    "x51_gopher_repetition",
    # the per-source rollup of the rule signals (all-NULL SUM groups)
    "x50_source_quality_report",
]


@pytest.mark.parametrize("name", FILTER_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_FILTER_CORPUS)
def test_fuzz_filter_parity(spark, tmp_path_factory, name, texts):
    d = tmp_path_factory.mktemp("ffuzz")
    rows = [
        (i, t, "en", "fuzz", len(t) if t else 0)
        for i, t in enumerate(texts)
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
        assert report["match"], f"{name} on {texts!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# matching fuzz: collision-heavy customer names (r8 — VERDICT r7 #7)
# ---------------------------------------------------------------------------

# names skew toward shared prefixes/suffixes (the blocking keys), edit
# distance <= 1 neighbors, and the hazards the edge tiers pinned by
# hand: unicode names the ASCII filter must exclude in BOTH engines
# (byte-vs-codepoint levenshtein), length <= 2 words whose drop-last-2
# block key is '' (negative-length substring is '' in both), all-tie
# mode counts for the survivorship argmax, and NULLs
_NAME = st.one_of(
    st.none(),
    st.sampled_from(
        ["Customer#001", "Customer#002", "Customer#0O2", "Cust",
         "Custo", "ab", "a", "", "Customér#001", "naïve", "the",
         "thé", "AB", "aB"]
    ),
    st.text(alphabet="abAB#é", min_size=0, max_size=8),
)
_SEG = st.sampled_from([None, "AUTO", "BUILDING", "auto", ""])
_CUSTOMERS = st.lists(
    st.tuples(_NAME, _SEG), min_size=1, max_size=14
)

MATCH_FUZZ_QUERIES = [
    "x61_fuzzy_name_match",
    "u13_golden_record",
    # round-9: the PII scrub builds its text from these customer
    # columns — unicode names exercise the ASCII regex classes, NULL
    # name/segment the cross-engine CONCAT null rule
    "x76_pii_scrub",
]


@pytest.mark.parametrize("name", MATCH_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_CUSTOMERS)
def test_fuzz_matching_parity(spark, tmp_path_factory, name, rows):
    d = tmp_path_factory.mktemp("mfuzz")
    data = [
        # acctbal from a tiny exact set so MAX ties are frequent and
        # the double passes through both engines bit-identically
        (i, n, seg, float((i * 7) % 3) - 1.0)
        for i, (n, seg) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "c_custkey bigint, c_name string, c_mktsegment string, "
        "c_acctbal double",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()[name]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"{name} on {rows!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# embedding fuzz: tie-heavy vectors
# ---------------------------------------------------------------------------

# components from a tiny exact-value set: random floats never tie, but
# real quantized/normalized embeddings do — this forces equal distances
# and equal cosines, stressing the argmin and top-k TIE-BREAK paths
# (struct array_min vs ROW_NUMBER ordering) in both engines. The set
# includes float32 denormals (1e-45) and large magnitudes (±1e15) so
# norm/dot paths hit underflow-adjacent and precision-loss regions
# (VERDICT r5 item 5); every corpus also carries one all-zero vector —
# the zero-norm guard (cosine → NULL, never DIVIDE_BY_ZERO/NaN) fires
# on every example.
_COMP = st.sampled_from(
    [0.0, 1.0, -1.0, 0.5, -0.5, 2.0, 1e-45, 1e15, -1e15]
)
_VEC = st.lists(_COMP, min_size=64, max_size=64)
_EMB_CORPUS = st.lists(_VEC, min_size=2, max_size=10).map(
    lambda vs: vs + [[0.0] * 64]
)

EMB_FUZZ_QUERIES = [
    "x13_cosine_near_dup",
    "x35_pq_encode",
    "x36_semantic_dedup",
    "x29_quantize_embeddings",
    "x65_random_projection",  # linear map: ±1e15 components and the
    # zero vector must fold bit-identically through both engines
]


@pytest.mark.parametrize("name", EMB_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_EMB_CORPUS)
def test_fuzz_embedding_parity(spark, tmp_path_factory, name, vecs):
    d = tmp_path_factory.mktemp("efuzz")
    rows = [(i, v, i % 3) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()[name]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"{name} on {len(vecs)} vecs: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# events fuzz: malformed JSON × epoch-edge timestamps
# ---------------------------------------------------------------------------

import datetime as _dt  # noqa: E402

# timestamps cluster around known divergence regions — epoch 0 and the
# 1970-01-05 week anchor (negative-day floor-vs-truncate), exact ties
# (tiny sampled pool), plus arbitrary datetimes inside the pandas-ns
# range (oracle_utils hashes through pandas)
_EVENT_TS = st.one_of(
    st.sampled_from(
        [
            _dt.datetime(1969, 12, 31, 23, 59, 59),
            _dt.datetime(1970, 1, 1, 0, 0, 0),
            _dt.datetime(1970, 1, 4, 12, 0, 0),
            _dt.datetime(1970, 1, 5, 0, 0, 0),
            _dt.datetime(2024, 1, 1, 0, 0, 0),
            _dt.datetime(2200, 12, 31, 23, 59, 59, 999999),
        ]
    ),
    st.datetimes(
        min_value=_dt.datetime(1900, 1, 1),
        max_value=_dt.datetime(2200, 1, 1),
    ),
)
# malformed / non-scalar / overflow / fractional JSON props — both
# engines must NULL out, never throw (get_json_object lenience vs
# DuckDB TRY_CAST twice)
_PROPS = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "",
            "{",
            "not json at all",
            "[1, 2]",
            '{"k": 1}',
            '{"k": 50}',
            '{"k": -3}',
            '{"k": 49.9}',
            '{"k": "str"}',
            '{"k": {"nested": 1}}',
            '{"k": 99999999999999999999}',
            '{"other": 9}',
            '{"k": null}',
            '{"k": true}',
        ]
    ),
    st.integers(-100, 100).map(lambda i: f'{{"k": {i}}}'),
)
_EVENT = st.tuples(
    _EVENT_TS,
    st.integers(1, 4),  # few users → funnel/session overlap
    st.sampled_from(["view", "click", "purchase", "signup", "error"]),
    st.sampled_from([0.0, 1.0, -7.5, 0.01, 1e6]),
    _PROPS,
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=14)

# JSON extraction, the negative-week floor, the ordered funnel, and
# sessionization over exact-tie timestamps
EV_FUZZ_QUERIES = [
    "e02_sessionize",
    "e04_json_extract",
    "e06_retention_cohorts",
    "e07_event_funnel",
    # round-6: trigram paths (exact-tie ordering via the event_id
    # tiebreak) and daily anomaly (1-day / zero-variance guards)
    "e09_event_paths",
    "e10_daily_anomaly",
]


@pytest.mark.parametrize("name", EV_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS)
def test_fuzz_events_parity(spark, tmp_path_factory, name, events):
    d = tmp_path_factory.mktemp("evfuzz")
    rows = [
        (i, ts, uid, etype, val, props)
        for i, (ts, uid, etype, val, props) in enumerate(events)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()[name]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"{name} on {events!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# basket fuzz: degenerate basket shapes the hand-picked TPC-H slices
# never produce — mega-baskets (a bot cart), single-item baskets,
# duplicated (basket, item) rows, NULL keys, and near-empty corpora.
# Tiny id pools force dense co-occurrence so the pair/rule/core legs
# all fire; g05's fixed-depth oracle is safe here because a <= 8-node
# co-occurrence graph peels to its fixpoint well inside 18 rounds.
# ---------------------------------------------------------------------------

_BASKET_ROW = st.tuples(
    st.one_of(st.none(), st.integers(0, 4)),  # few baskets → overlap
    st.one_of(st.none(), st.integers(0, 7)),  # few items → dense pairs
)
_BASKETS = st.lists(_BASKET_ROW, min_size=1, max_size=40)

BASKET_FUZZ_QUERIES = [
    "x69_part_cooccurrence",
    "x70_association_rules",
    "x71_also_bought_topk",
    "x72_rule_information_scores",
    "x73_item_similarity",
    "g05_k_core",
    "g06_label_propagation",
    "g07_link_prediction",
    "g08_degree_assortativity",
    "x75_ranking_eval",
]


@pytest.mark.parametrize("name", BASKET_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_BASKETS)
def test_fuzz_basket_parity(spark, tmp_path_factory, name, rows):
    d = tmp_path_factory.mktemp("bfuzz")
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()[name]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"{name} on {rows!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# sequence fuzz: the shapes e12/e13/e14's TPC-H-slice evidence never
# covers — all-NULL ts streams, NULL user keys (a window partition of
# their own in BOTH engines), a state vocabulary of 1, single-day
# streaks, and exact-tie timestamps resolved by the event_id tiebreak
# ---------------------------------------------------------------------------

_SEQ_TS = st.one_of(
    st.none(),  # the NULLS FIRST/LAST window hazard (r8 review catch)
    st.sampled_from(
        [
            _dt.datetime(2024, 1, 1, 0, 0, 0),  # exact ties
            _dt.datetime(2024, 1, 1, 5, 0, 0),
            _dt.datetime(2024, 1, 2, 0, 0, 0),
            _dt.datetime(2024, 1, 3, 0, 0, 0),
            _dt.datetime(2024, 1, 7, 0, 0, 0),
        ]
    ),
    st.datetimes(
        min_value=_dt.datetime(2023, 12, 25),
        max_value=_dt.datetime(2024, 1, 10),
    ),
)
_SEQ_EVENT = st.tuples(
    _SEQ_TS,
    st.one_of(st.none(), st.integers(1, 3)),  # NULL user keys
    st.one_of(
        st.none(), st.sampled_from(["view", "click"])
    ),  # vocab of <= 2 (+ NULL states)
)
_SEQ_EVENTS = st.lists(_SEQ_EVENT, min_size=1, max_size=16)

SEQ_FUZZ_QUERIES = [
    "e12_markov_transitions",
    "e13_activity_streaks",
    "e14_running_distinct_users",
    "e15_seasonal_profile",
    # round-10: CUSUM — all-NULL ts (empty series after the filter),
    # single-day series (all deviations 0), exact-tie timestamps
    "e16_cusum_changepoint",
    # round-10: burstiness — single-event users, exact-tie timestamps
    # (zero gaps; σ+μ=0 guard), fractional-second epoch truncation
    "e17_interarrival_stats",
    # round-10: autocorrelation — sub-lag series (no pairs), constant
    # series (zero variance), all-NULL ts
    "e18_weekly_autocorrelation",
]


@pytest.mark.parametrize("name", SEQ_FUZZ_QUERIES)
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_SEQ_EVENTS)
def test_fuzz_sequence_parity(spark, tmp_path_factory, name, events):
    d = tmp_path_factory.mktemp("sfuzz")
    rows = [
        (i, ts, uid, etype)
        for i, (ts, uid, etype) in enumerate(events)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()[name]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"{name} on {events!r}: {report}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# allocation fuzz: tiny order tables for the largest-remainder draw —
# NULL strata (their own stratum, null-safe quota join), NULL ids
# (excluded), single-stratum corpora, k far above N (quotas clamp at
# population in BOTH engines), remainder ties (stratum-ASC tiebreak)
# ---------------------------------------------------------------------------

_ALLOC_ROW = st.tuples(
    st.one_of(st.none(), st.integers(0, 50)),
    st.one_of(
        st.none(), st.sampled_from(["1-URGENT", "5-LOW", "x"])
    ),
)
_ALLOC_ROWS = st.lists(_ALLOC_ROW, min_size=1, max_size=25)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ALLOC_ROWS)
def test_fuzz_allocation_parity(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("afuzz")
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string"
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    con = duckdb_conn(str(d))
    try:
        q = load_all()["x77_stratified_allocation"]
        report = compare(q.fn(spark, str(d)), con, q.oracle)
        assert report["match"], f"x77 on {rows!r}: {report}"
    finally:
        con.close()
