"""Round-5 curation operators: exact-substring span stats, keep-first
block/paragraph dedup, product quantization (encode + ADC search +
k-means training), and SemDeDup-style clustered semantic dedup.

The registered queries (x34-x37) pin the oracle-checked instances; the
tests here cover the semantics the oracles can't — real paragraph
delimiters, the ADC-distance exactness property, the trained-codebook
path, and the cluster-width guard.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.operators.dedup import (
    block_dedup,
    paragraph_dedup,
    span_stats,
)
from ods_to_datalake_spark.operators.similarity import (
    pq_encode,
    pq_seed_codebooks,
    pq_topk,
    pq_train,
    semantic_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# span stats
# ---------------------------------------------------------------------------


def test_span_stats_counts_cross_and_within_doc_repeats(spark):
    docs = _docs(
        spark,
        [
            # "a b c" appears in docs 1 and 2 (cross-doc dup)
            (1, "a b c x y"),
            (2, "z a b c w"),
            # doc 3 repeats "p q r" internally twice
            (3, "p q r s p q r"),
            # doc 4: unique spans only
            (4, "u v w x y z"),
            # doc 5: too short for a 3-token span
            (5, "hi"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_ratio"])
        for r in span_stats(docs, "doc_id", "text", 3).collect()
    }
    assert got[1] == (3, 1, pytest.approx(1 / 3))
    assert got[2] == (3, 1, pytest.approx(1 / 3))
    # doc 3: 5 spans, "p q r" twice → 2 dup instances
    assert got[3] == (5, 2, pytest.approx(2 / 5))
    assert got[4] == (4, 0, 0.0)
    assert got[5] == (0, 0, 0.0)  # span-less doc still reports a row


# ---------------------------------------------------------------------------
# block / paragraph dedup
# ---------------------------------------------------------------------------


def test_block_dedup_keeps_first_occurrence_only(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d"),  # blocks (2 tokens): "a b", "c d"
            (2, "a b e f"),  # "a b" repeats → dropped here
            (3, "c d a b"),  # both blocks repeats → fully deduped
        ],
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["clean_text"])
        for r in block_dedup(docs, "doc_id", "text", 2).collect()
    }
    assert got[1] == (2, 2, "a b c d")
    assert got[2] == (2, 1, "e f")
    assert got[3] == (2, 0, "")


def test_span_rewrite_removes_non_first_occurrences(spark):
    from ods_to_datalake_spark.operators.dedup import span_rewrite

    docs = _docs(
        spark,
        [
            (1, "a b c d e f"),
            # "a b c d e" repeats mid-doc → its 5 tokens are removed
            (2, "z z a b c d e w"),
            # exact dup of doc 1 → fully rewritten away
            (3, "a b c d e f"),
            (4, "hi"),  # shorter than the span → untouched
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in span_rewrite(docs, "doc_id", "text", 5).collect()
    }
    assert got[1] == (6, 0, "a b c d e f")
    assert got[2] == (8, 5, "z z w")
    assert got[3] == (6, 6, "")
    assert got[4] == (1, 0, "hi")


def test_span_rewrite_variable_length_run(spark):
    """A duplicated run longer than span_n disappears WHOLE at the
    non-canonical site — window composition covers every token of the
    run, no block-boundary residue (the fixed-block limitation
    block_dedup has)."""
    from ods_to_datalake_spark.operators.dedup import span_rewrite

    run = "q w e r t y u i o p"  # 10-token run, span_n = 5
    docs = _docs(spark, [(1, f"{run} tail"), (2, f"head {run}")])
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in span_rewrite(docs, "doc_id", "text", 5).collect()
    }
    assert got[1] == (0, f"{run} tail")
    assert got[2] == (10, "head")


def test_block_dedup_degenerate_corpus_plan(spark):
    """One block shared by EVERY doc (the license-banner workload):
    keep-first must run through a partial-aggregated Exchange — never
    a single-partition window over the block hash, which AQE cannot
    split (VERDICT r5 item 2)."""
    docs = _docs(spark, [(i, "all rights reserved") for i in range(1, 65)])
    out = block_dedup(docs, "doc_id", "text", 4)
    got = {r["doc_id"]: r["n_kept"] for r in out.collect()}
    assert got[1] == 1
    assert all(got[i] == 0 for i in range(2, 65))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # the keep-first agg is partially aggregated before its exchange
    assert "partial_min" in plan or "HashAggregate" in plan, plan


def test_paragraph_dedup_on_newline_corpus(spark):
    boiler = "all rights reserved"
    docs = _docs(
        spark,
        [
            (1, f"intro one\n\n{boiler}"),
            (2, f"other text\n\n{boiler}\n\nmore"),
            (3, boiler),
        ],
    )
    got = {
        r["doc_id"]: (r["n_kept"], r["clean_text"])
        for r in paragraph_dedup(docs, "doc_id", "text").collect()
    }
    # the banner survives only in doc 1 (lowest doc_id)
    assert got[1] == (2, f"intro one\n\n{boiler}")
    assert got[2] == (2, "other text\n\nmore")
    assert got[3] == (0, "")


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _emb(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_matches_numpy_argmin(spark):
    dim, m, ks = 8, 2, 4
    emb = _emb(spark, dim=dim)
    books = pq_seed_codebooks(emb, "vec_id", "embedding", dim, m, ks)
    enc = {
        r["vec_id"]: (
            [r[f"code_{j}"] for j in range(m)],
            r["recon_d2"],
        )
        for r in pq_encode(emb, "vec_id", "embedding", books).collect()
    }
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    sub = dim // m
    for vid, v in vecs.items():
        codes, err = enc[vid]
        expect_err = 0.0
        for j in range(m):
            d2 = [
                float(((v[j * sub : (j + 1) * sub] - np.array(c)) ** 2).sum())
                for c in books[j]
            ]
            assert codes[j] == int(np.argmin(d2))
            expect_err += min(d2)
        assert err == pytest.approx(expect_err, rel=1e-9)


def test_pq_topk_adc_equals_reconstructed_distance(spark):
    """ADC property: approx_d2 is EXACTLY the squared distance from the
    query to the codeword-reconstructed corpus vector."""
    dim, m, ks, k = 8, 2, 4, 5
    emb = _emb(spark, dim=dim)
    books = pq_seed_codebooks(emb, "vec_id", "embedding", dim, m, ks)
    enc = pq_encode(emb, "vec_id", "embedding", books, with_error=False)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = pq_topk(enc, queries, books, "vec_id", "qid", "embedding", k)
    rows = got.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(r["rn"] <= k for r in rows)

    codes = {
        r["vec_id"]: [r["code_0"], r["code_1"]] for r in enc.collect()
    }
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    sub = dim // m
    for r in rows:
        recon = np.concatenate(
            [np.array(books[j][codes[r["vec_id"]][j]]) for j in range(m)]
        )
        true_d2 = float(((vecs[r["query_id"]] - recon) ** 2).sum())
        assert r["approx_d2"] == pytest.approx(true_d2, rel=1e-9)


def test_pq_train_reduces_reconstruction_error(spark):
    dim, m, ks = 8, 2, 4
    emb = _emb(spark, n=60, dim=dim)

    def total_err(books):
        return (
            pq_encode(emb, "vec_id", "embedding", books)
            .agg(F.sum("recon_d2"))
            .collect()[0][0]
        )

    seed_err = total_err(
        pq_seed_codebooks(emb, "vec_id", "embedding", dim, m, ks)
    )
    trained_err = total_err(
        pq_train(emb, "embedding", dim, m, ks, n_iter=3)
    )
    assert trained_err <= seed_err


def test_pq_validates_dim_divisibility(spark):
    emb = _emb(spark, dim=8)
    with pytest.raises(ValueError, match="divisible"):
        pq_seed_codebooks(emb, "vec_id", "embedding", 8, 3, 4)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, "embedding", 8, 3, 4)


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_higher_id_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),  # near-dup of 0 → dropped
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.98, 0.2]),  # near-dup of 3 → dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", cents, 0.9
        ).collect()
    }
    assert got == {0: 1, 1: 0, 2: 1, 3: 1, 4: 0}


def test_semantic_dedup_cluster_cap_skips_oversized(spark):
    # every vector lands in centroid 0's cluster; cap excludes the whole
    # cluster from pair generation → nothing dropped, rows all kept
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    out = semantic_dedup(
        df, "vec_id", "embedding", cents, 0.5, max_cluster=5
    )
    assert [r["kept"] for r in out.collect()] == [1] * 10
    uncapped = semantic_dedup(df, "vec_id", "embedding", cents, 0.5)
    assert sum(r["kept"] for r in uncapped.collect()) == 1


# ---------------------------------------------------------------------------
# bigram LM perplexity
# ---------------------------------------------------------------------------


def test_bigram_lm_scores_match_reference(spark):
    import math
    from collections import Counter
    from decimal import Decimal

    from ods_to_datalake_spark.operators.lm import bigram_lm_scores

    corpus = {1: "a b a b c", 2: "a b a b a b", 3: "z", 4: ""}
    docs = _docs(spark, sorted(corpus.items()))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in bigram_lm_scores(docs, "doc_id", "text").collect()
    }

    # reference model (tokenizer: lower/trim split; '' → [''])
    toks = {d: t.lower().strip().split() if t.strip() else [""]
            for d, t in corpus.items()}
    bgs = {d: [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
           for d, w in toks.items()}
    bgc = Counter(b for bl in bgs.values() for b in bl)
    w1c = Counter(b.split(" ")[0] for bl in bgs.values() for b in bl
                  for _ in range(1))
    w1tot = Counter()
    for b, c in bgc.items():
        w1tot[b.split(" ")[0]] += c
    vocab = len({w for wl in toks.values() for w in wl})
    for d, bl in bgs.items():
        if not bl:
            assert got[d] == (0, None)
            continue
        q = [
            Decimal(
                str(round(-math.log((bgc[b] + 1) / (w1tot[b.split(' ')[0]] + vocab)), 6))
            )
            for b in bl
        ]
        want = float(sum(q)) / len(bl)
        n, xent = got[d]
        assert n == len(bl)
        assert xent == pytest.approx(want, abs=2e-6)
    # repetitive doc scores LOWER cross-entropy than the varied one
    assert got[2][1] < got[1][1]


def test_frozen_lm_reproduces_in_corpus_scores_and_handles_unseen(
    spark, tmp_path
):
    from ods_to_datalake_spark.operators.lm import (
        bigram_lm_scores,
        build_lm,
        score_with_lm,
    )

    corpus = _docs(
        spark,
        [(1, "a b a b c"), (2, "a b a b a b"), (3, "c a b")],
    )
    path = str(tmp_path / "lm")
    build_lm(corpus, "text", path)

    frozen = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in score_with_lm(spark, path, corpus, "doc_id", "text").collect()
    }
    inline = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in bigram_lm_scores(corpus, "doc_id", "text").collect()
    }
    assert frozen == inline

    # unseen text: unknown bigram → P=1/(c_w1+V); unknown prefix → P=1/V
    new = _docs(spark, [(9, "a zebra"), (10, "qq ww")])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in score_with_lm(spark, path, new, "doc_id", "text").collect()
    }
    import math

    v = 3  # vocab: a, b, c
    c_w1_a = 6  # bigrams starting with 'a' (2 + 3 + 1 across the docs)
    assert got[9][0] == 1
    assert got[9][1] == pytest.approx(
        float(round(-math.log(1 / (c_w1_a + v)), 6)), abs=2e-6
    )
    assert got[10][1] == pytest.approx(
        float(round(-math.log(1 / v), 6)), abs=2e-6
    )


# ---------------------------------------------------------------------------
# end-to-end curation pipeline
# ---------------------------------------------------------------------------


def test_curate_corpus_end_to_end(spark):
    from ods_to_datalake_spark.operators.curate import curate_corpus

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base),  # exact dup of 1 → exact tier
            (3, base + " extra"),  # near-dup of 1 → jaccard tier
            (4, "short"),  # < min_tokens → quality tier
            (5, "completely different text about spark query engines "
                "running large distributed scans"),
        ],
    )
    curated, report = curate_corpus(
        docs, "doc_id", "text",
        jaccard_tau=0.5, min_tokens=3,
    )
    assert sorted(r.doc_id for r in curated.collect()) == [1, 5]
    stages = {s.stage: (s.docs_in, s.docs_out) for s in report}
    assert stages["exact_dedup"] == (5, 4)
    assert stages["near_dup_dedup"] == (4, 3)
    assert stages["min_tokens"] == (3, 2)
    assert sum(s.removed for s in report) == 3


def test_curate_corpus_block_rewrite_and_lm_band(spark):
    from ods_to_datalake_spark.operators.curate import curate_corpus

    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d x y z w"),  # first block repeats doc 1's
            (3, "p q r s t u v w"),
        ],
    )
    curated, report = curate_corpus(
        docs, "doc_id", "text",
        jaccard_tau=0.99, block_tokens=4, xent_band=(0.0, 100.0),
    )
    got = {r.doc_id: r.text for r in curated.collect()}
    assert got[1] == "a b c d e f g h"
    assert got[2] == "x y z w"  # duplicated leading block removed
    assert got[3] == "p q r s t u v w"
    assert [s.stage for s in report] == [
        "exact_dedup", "near_dup_dedup", "lm_xent_band", "block_rewrite"
    ]


def test_shingles_zipwith_equals_slice_form(spark):
    """X.shingles' zip_with chain (the 6-9× faster codegen-friendly
    form) must produce EXACTLY the slice-and-join shingles — the md5
    hash family, the LSH band keys, and both engines' oracles all key
    off these strings."""
    import random

    from pyspark.sql import functions as F

    from ods_to_datalake_spark.functions import text as X

    random.seed(5)
    texts = ["", "   ", "one", "a b", "a b c", "a b c d e", "x " * 50,
             "tabs\tand\nnl mix"]
    texts += [
        " ".join(random.choice("abcdefg")
                 for _ in range(random.randint(0, 12)))
        for _ in range(100)
    ]
    df = _docs(spark, [(i, t) for i, t in enumerate(texts)])

    def slice_form(tok, n):
        return F.when(
            F.size(tok) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tok) - F.lit(n - 1)),
                lambda i: F.array_join(F.slice(tok, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    for n in (2, 3, 5):
        t = X.tokens("text")
        bad = (
            df.select(
                X.shingles(t, n).alias("new"),
                slice_form(t, n).alias("old"),
            )
            .where(~F.col("new").eqNullSafe(F.col("old")))
            .count()
        )
        assert bad == 0, f"n={n}: {bad} mismatches"


# ---------------------------------------------------------------------------
# round-6b: temperature mixture resampling + keep-best canonicalization
# ---------------------------------------------------------------------------


def _expected_copies(doc_id: int, n_s: int, k_s: int) -> int:
    """Reference implementation of the integer sampling rule."""
    import hashlib

    bkt = int(
        hashlib.md5(str(doc_id).encode()).hexdigest()[:5], 16
    )  # 20 bits
    return k_s // n_s + (1 if bkt * n_s < (k_s % n_s) * (1 << 20) else 0)


def test_temperature_mixture_up_and_down_samples_exactly(spark):
    """Heavy-mass tiny stratum gets replicated, light-mass big stratum
    gets hash-thinned; every row's copy count matches the integer rule
    bit-for-bit (no float rate anywhere)."""
    from ods_to_datalake_spark.operators.sampling import temperature_mixture

    rows = [(i, "A", 1) for i in range(96)] + [
        (100 + i, "B", 2500) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    out = (
        temperature_mixture(df, "doc_id", "source", "w")
        .select("doc_id", "source", "replica")
        .collect()
    )
    # w_A = floor(sqrt(96)) = 9, w_B = floor(sqrt(10000)) = 100,
    # den = 109, T = 100 → k_A = 8, k_B = 91
    per_doc: dict[int, int] = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
        assert r.replica < per_doc[r.doc_id]
    for i in range(96):
        exp = _expected_copies(i, 96, 8)
        assert per_doc.get(i, 0) == exp, (i, exp)
    for i in range(4):
        exp = _expected_copies(100 + i, 4, 91)
        assert exp >= 22  # 91 div 4 — genuine up-sampling
        assert per_doc.get(100 + i, 0) == exp, (100 + i, exp)


def test_temperature_mixture_target_total_scales_output(spark):
    from ods_to_datalake_spark.operators.sampling import temperature_mixture

    rows = [(i, f"s{i % 3}", 10 + i) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    n = temperature_mixture(
        df, "doc_id", "source", "w", target_total=600
    ).count()
    # expected output ~target; integer flooring loses < 1 row/stratum
    # and the fractional hash draw adds binomial noise around it
    assert 540 <= n <= 660, n


def test_cluster_canonical_prefers_quality_then_min_id(spark):
    from ods_to_datalake_spark.operators.dedup import cluster_canonical

    cc = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)],
        "id long, cluster_id long",
    )
    meta = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 4), (9, 2)],
        "doc_id long, n_chars long",
    )
    got = {
        r.cluster_id: (r.canonical_doc_id, r.canonical_quality, r.cluster_size)
        for r in cluster_canonical(cc, meta, "doc_id", "n_chars").collect()
    }
    # cluster 1: max quality 9 shared by ids 2 and 3 → min id 2 wins
    assert got == {1: (2, 9, 3), 7: (7, 4, 2)}


def test_curate_corpus_dsir_and_mixture_tiers(spark):
    """Tier 5/6 plumbing: the DSIR gate keeps target-like docs (their
    log importance weights provably exceed every source-typical doc's)
    and the mixture tier resamples with a replica column."""
    from ods_to_datalake_spark.operators.curate import curate_corpus
    from ods_to_datalake_spark.operators.lm import dsir_logratio

    rows = [
        (i, f"alpha beta gamma delta w{i}", "en", "web", 30)
        for i in range(6)
    ] + [
        (10, "delta epsilon zeta eta", "en", "books", 22),
        (11, "epsilon zeta eta theta", "en", "books", 22),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    target = spark.createDataFrame(
        [(100, "delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    w = {
        r.doc_id: r.dsir_logratio
        for r in dsir_logratio(
            target, docs, docs, "doc_id", "text"
        ).collect()
    }
    books = [w[10], w[11]]
    web = [w[i] for i in range(6)]
    assert min(books) > max(web)  # the semantic claim DSIR makes
    thr = (min(books) + max(web)) / 2
    curated, report = curate_corpus(
        docs, "doc_id", "text",
        jaccard_tau=0.99,
        dsir_target=target, dsir_min=thr,
        mixture_strata="source",
    )
    stages = {s.stage: (s.docs_in, s.docs_out) for s in report}
    assert stages["dsir_select"] == (8, 2)
    assert "mixture_resample" in stages
    assert "replica" in curated.columns
    assert {r.doc_id for r in curated.collect()} <= {10, 11}


def test_curate_corpus_near_dup_keep_best_quality(spark):
    """A near-dup chain keeps its LONGEST member under the
    best_quality policy (vs the lowest surviving id under the default
    pairwise policy, which also over-deletes the chain)."""
    from ods_to_datalake_spark.operators.curate import curate_corpus

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " one"),
        (2, base + " one two three four"),  # longest chain member
        (3, base),
        (4, "completely different text about spark query engines "
            "running large distributed scans"),
    ]
    docs = _docs(spark, rows)
    best, report_b = curate_corpus(
        docs, "doc_id", "text",
        jaccard_tau=0.5, near_dup_keep="best_quality",
    )
    assert sorted(r.doc_id for r in best.collect()) == [2, 4]
    lowest, _ = curate_corpus(
        docs, "doc_id", "text", jaccard_tau=0.5,
    )
    assert sorted(r.doc_id for r in lowest.collect()) == [1, 4]
    stages = {s.stage: (s.docs_in, s.docs_out) for s in report_b}
    assert stages["near_dup_dedup"] == (4, 2)


def test_temperature_mixture_matches_reference_rule_on_random_strata(spark):
    """Property: for arbitrary strata/weights the per-doc copy counts
    equal the pure-Python integer rule bit-for-bit (no float rate ever
    enters), and per-stratum totals land within the deterministic
    bound base*n_s <= out_s <= (base+1)*n_s."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ods_to_datalake_spark.operators.sampling import temperature_mixture

    @settings(
        max_examples=5,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        strata=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d"]),
                st.integers(min_value=1, max_value=12),  # rows
                st.integers(min_value=0, max_value=5000),  # weight each
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda t: t[0],
        )
    )
    def prop(strata):
        rows, next_id = [], 0
        for name, n, wt in strata:
            for _ in range(n):
                rows.append((next_id, name, wt))
                next_id += 1
        df = spark.createDataFrame(
            rows, "doc_id long, source string, w long"
        )
        out = temperature_mixture(df, "doc_id", "source", "w").collect()
        per_doc: dict[int, int] = {}
        for r in out:
            per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
        # reference rule
        stats = {
            name: (n, n * wt) for name, n, wt in strata
        }
        wsum = {
            name: math.floor(math.sqrt(c)) for name, (n, c) in stats.items()
        }
        den = sum(wsum.values())
        total = sum(n for n, _ in stats.values())
        expected_total = 0
        for doc_id, name, _ in rows:
            n_s = stats[name][0]
            k_s = (total * wsum[name]) // den if den > 0 else 0
            exp = _expected_copies(doc_id, n_s, k_s)
            assert per_doc.get(doc_id, 0) == exp, (doc_id, exp)
            expected_total += exp
        assert len(out) == expected_total

    prop()


def test_curate_corpus_rejects_unknown_near_dup_policy(spark):
    import pytest as _pytest

    from ods_to_datalake_spark.operators.curate import curate_corpus

    docs = _docs(spark, [(1, "a b c")])
    with _pytest.raises(ValueError, match="near_dup_keep"):
        curate_corpus(docs, "doc_id", "text", near_dup_keep="keep_best")


def test_score_with_dsir_frozen_equals_one_shot(spark, tmp_path):
    """The persisted feature-table path must reproduce the one-shot
    dsir_logratio bit-for-bit (decimal weights round-trip parquet
    exactly), and the scorer must derive the feature-space size from
    the table itself (built with a non-default n_buckets)."""
    from ods_to_datalake_spark.operators.lm import (
        build_dsir,
        dsir_logratio,
        score_with_dsir,
    )

    target = _docs(spark, [(100, "delta epsilon zeta eta theta")])
    docs = _docs(
        spark,
        [(i, f"alpha beta gamma w{i}") for i in range(5)]
        + [(10, "delta epsilon zeta eta"), (11, "solo")],
    )
    for nb in (4096, 512):
        one_shot = {
            (r.doc_id, r.n_bigrams, r.dsir_logratio)
            for r in dsir_logratio(
                target, docs, docs, "doc_id", "text", n_buckets=nb
            ).collect()
        }
        path = str(tmp_path / f"dsir_{nb}")
        build_dsir(target, docs, "text", path, n_buckets=nb)
        feats = spark.read.parquet(path)
        assert feats.count() == nb
        frozen = {
            (r.doc_id, r.n_bigrams, r.dsir_logratio)
            for r in score_with_dsir(
                feats, docs, "doc_id", "text"  # n_buckets derived
            ).collect()
        }
        assert frozen == one_shot
    # single-token doc has no bigrams → NULL, never sentinel 0.0
    assert any(d == 11 and n == 0 and s is None for d, n, s in frozen)


def test_curate_corpus_rule_filter_tiers(spark):
    from ods_to_datalake_spark.operators.curate import curate_corpus

    good = (
        "The quick brown fox jumps over the lazy dog today and it "
        "was glad to be here with all of that in mind. "
        "Every sentence in this document ends with a terminal mark "
        "and it has more than five words in every line. "
        "The corpus needs at least fifty words of mean length between "
        "three and ten so this line keeps adding plain words. "
        "That should be enough words to have the filter pass now."
    )
    docs = _docs(
        spark,
        [
            (1, good),
            # C4 drops the bullet/short lines; what's left fails the
            # 3-sentence floor → removed by the c4 tier
            (2, "- bullet\n* other bullet\nshort line."),
            # passes C4 (3 sentences, >= 5 words each, terminal punct)
            # but fails Gopher's 50-word floor → removed by gopher tier
            (3, "Five plain words sit here. Another line of five "
                "words. One more sentence with the needed words."),
            # javascript-mentioning lines are dropped by C4's line
            # filter → no kept lines → removed by the c4 tier
            (4, "this javascript line goes away entirely now.\n"
                "also javascript in this second long line here."),
        ],
    )
    curated, report = curate_corpus(
        docs, "doc_id", "text", c4_rules=True, gopher_rules=True,
    )
    assert [r.doc_id for r in curated.collect()] == [1]
    stages = {s.stage: (s.docs_in, s.docs_out) for s in report}
    assert stages["c4_rules"] == (4, 2)
    assert stages["gopher_rules"] == (2, 1)
    # the c4 tier REWRITES text: doc 1 keeps all its (one-line) text
    assert curated.collect()[0].text == good


def test_curate_corpus_repetition_tier(spark):
    from ods_to_datalake_spark.operators.curate import curate_corpus

    varied = " ".join(f"w{i} x{i} y{i} z{i} q{i}" for i in range(12))
    # one 5-gram block repeated 10x: dup-5gram coverage ~ 50/59 >> 0.15
    repeated = " ".join(["aa bb cc dd ee"] * 10) + " tail word here"
    docs = _docs(spark, [(1, varied), (2, repeated)])
    curated, report = curate_corpus(
        docs, "doc_id", "text", repetition_rules=True,
    )
    assert [r.doc_id for r in curated.collect()] == [1]
    stages = {s.stage: (s.docs_in, s.docs_out) for s in report}
    assert stages["repetition_rules"] == (2, 1)


# --- PII scrub (x76) ----------------------------------------------------


def test_pii_scrub_redacts_and_counts(spark):
    from ods_to_datalake_spark.operators.curate import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co or +4915551234567 via 10.0.0.1"),
            (2, "two mails p@q.io q@p.io and 999.999.999.999"),
            (3, "nothing sensitive here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in pii_scrub(docs, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1.clean_text == "mail <EMAIL> or <PHONE> via <IP>"
    assert (r1.n_emails, r1.n_phones, r1.n_ips) == (1, 1, 1)
    r2 = rows[2]
    # syntactic scrub: 999.* is a dotted quad to the rule, by design
    assert r2.clean_text == "two mails <EMAIL> <EMAIL> and <IP>"
    assert (r2.n_emails, r2.n_phones, r2.n_ips) == (2, 0, 1)
    assert rows[3].clean_text == "nothing sensitive here"
    assert (rows[3].n_emails, rows[3].n_phones, rows[3].n_ips) == (
        0, 0, 0,
    )
    # NULL text stays NULL with zero counts
    assert rows[4].clean_text is None
    assert (rows[4].n_emails, rows[4].n_phones, rows[4].n_ips) == (
        0, 0, 0,
    )


def test_pii_scrub_order_email_before_ip(spark):
    # an address like 1.2.3.4@host.com must scrub as ONE email, not
    # leave an <IP> fragment — the pinned replacement order
    from ods_to_datalake_spark.operators.curate import pii_scrub

    docs = spark.createDataFrame(
        [(1, "from 1.2.3.4@host.com end")], "doc_id long, text string"
    )
    (r,) = pii_scrub(docs, "doc_id", "text").collect()
    assert r.clean_text == "from <EMAIL> end"
    # counts measure the ORIGINAL text per pattern independently: the
    # dotted quad inside the address is both an email hit and an IP
    # hit — the audit counts every rule's matches, the redaction
    # order decides which tag survives
    assert (r.n_emails, r.n_ips) == (1, 1)


# --- LSH recall audit (x78) ----------------------------------------------


def test_lsh_recall_audit_exact_dups_always_recalled(spark):
    # identical docs have identical signatures -> every band collides
    # -> candidates superset of truth -> recall exactly 1.0
    from ods_to_datalake_spark.operators.dedup import lsh_recall_audit

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),
            (3, "q r s t u v w x"),
            (4, "q r s t u v w x"),
            (5, "totally different words here now ok fine yes"),
        ],
        "doc_id long, text string",
    )
    (r,) = lsh_recall_audit(docs, "doc_id", "text").collect()
    assert r.n_true_pairs == 2  # (1,2) and (3,4)
    assert r.n_hits == 2 and r.recall == 1.0
    assert r.n_candidates >= r.n_hits
    assert 0.0 < r.precision <= 1.0


def test_lsh_recall_audit_empty_guards(spark):
    from ods_to_datalake_spark.operators.dedup import lsh_recall_audit

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "three four")],  # < shingle_n tokens
        "doc_id long, text string",
    )
    (r,) = lsh_recall_audit(docs, "doc_id", "text").collect()
    assert (r.n_true_pairs, r.n_candidates, r.n_hits) == (0, 0, 0)
    assert r.recall is None and r.precision is None


# --- Zipf rank-frequency profile (x79) -----------------------------------


def test_zipf_profile_values_and_tiebreak(spark):
    from ods_to_datalake_spark.operators.quality import zipf_profile

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b d")], "doc_id long, text string"
    )
    rows = {r.rank: r for r in
            zipf_profile(docs, "doc_id", "text", k=3).collect()}
    # counts: a=3, b=3, c=1, d=1 -> tie at 3 broken token-ASC
    assert [rows[i].token for i in (1, 2, 3)] == ["a", "b", "c"]
    assert rows[1].n_occurrences == 3
    assert rows[1].n_total_tokens == 8 and rows[1].n_types == 4
    assert rows[1].cum_share == 3 / 8
    assert rows[2].cum_share == 6 / 8
    assert rows[3].cum_share == 7 / 8


def test_zipf_profile_k_cut_and_plan(spark):
    from ods_to_datalake_spark.operators.quality import zipf_profile

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i))) for i in range(1, 30)],
        "doc_id long, text string",
    )
    out = zipf_profile(docs, "doc_id", "text", k=5)
    assert out.count() == 5
    # top-k must be a per-partition heap, never a global sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


# --- score calibration / ECE (x81) ---------------------------------------


def test_calibration_perfectly_calibrated_score(spark):
    """A score whose bin-mean equals its bin positive rate reads
    ECE 0 — the fixed point of the reliability diagram."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.features import (
        calibration_report,
    )

    # 4 rows at p=1/2 with exactly 2 positives: gap 0
    rows = [(1, 2, 1), (1, 2, 1), (1, 2, 0), (1, 2, 0)]
    df = spark.createDataFrame(rows, "num long, den long, y long")
    (r,) = calibration_report(
        df, F.col("num"), F.col("den"), F.col("y"), n_bins=4
    ).collect()
    assert r.bin == 2  # 4 * 1/2 = 2
    assert r.mean_pred == 0.5 and r.frac_pos == 0.5
    assert r.abs_gap == 0.0 and r.ece == 0.0


def test_calibration_bin_edges_and_overconfidence(spark):
    """All-integer bin edges: p = 1.0 clamps into the top bin; an
    always-wrong confident score reads ECE 1.0."""
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.features import (
        calibration_report,
    )

    rows = [(1, 1, 0), (1, 1, 0)]  # p=1.0, never positive
    df = spark.createDataFrame(rows, "num long, den long, y long")
    (r,) = calibration_report(
        df, F.col("num"), F.col("den"), F.col("y"), n_bins=10
    ).collect()
    assert r.bin == 9  # clamped, not bin 10
    assert r.mean_pred == 1.0 and r.frac_pos == 0.0
    assert r.ece == 1.0


def test_calibration_zero_denominator_excluded(spark):
    import pytest
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.operators.features import (
        calibration_report,
    )

    rows = [(1, 2, 1), (0, 0, 1), (3, None, 0)]
    df = spark.createDataFrame(rows, "num long, den long, y long")
    out = calibration_report(
        df, F.col("num"), F.col("den"), F.col("y")
    ).collect()
    assert len(out) == 1 and out[0].n == 1  # only the defined score
    with pytest.raises(ValueError):
        calibration_report(
            df, F.col("num"), F.col("den"), F.col("y"), n_bins=0
        )


def test_dup_multiplicity_hand_case(spark):
    from ods_to_datalake_spark.operators.dedup import (
        dup_multiplicity_histogram,
    )

    rows = [
        (1, "a"), (2, "a"), (3, "a"),  # one group at multiplicity 3
        (4, "b"), (5, "b"),            # one at 2
        (6, "c"),                      # one at 1
        (7, None), (8, None),          # NULL-hash group at 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.multiplicity: r
        for r in dup_multiplicity_histogram(
            df, "doc_id", "text"
        ).collect()
    }
    assert out[3].n_groups == 1 and out[3].n_docs == 3
    assert out[2].n_groups == 2 and out[2].n_docs == 4
    assert out[1].n_groups == 1
    assert abs(out[3].doc_share - 3 / 8) < 1e-15
    assert sum(r.n_docs for r in out.values()) == 8


def test_token_entropy_hand_cases(spark):
    """Uniform 4 distinct tokens → exactly 2 bits; all-same → 0;
    NULL/empty → NULL (no distribution is not zero entropy)."""
    from ods_to_datalake_spark.operators.quality import token_entropy

    rows = [
        (1, "a b c d"),
        (2, "x x x x x"),
        (3, None),
        (4, ""),
        (5, "a a b b"),  # uniform 2 -> exactly 1 bit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in token_entropy(df, "doc_id", "text").collect()
    }
    assert out[1].entropy_bits == 2.0 and out[1].n_types == 4
    assert out[2].entropy_bits == 0.0 and out[2].n_types == 1
    assert out[3].entropy_bits is None and out[3].n_tokens == 0
    assert out[4].entropy_bits is None
    assert out[5].entropy_bits == 1.0


# --- per-source KL divergence (x87) ------------------------------------------


def test_source_kl_known_two_source_value(spark):
    """A:{a,a} vs B:{b,b}: each source's ratio is exactly 2, so KL =
    quantize6(ln 2) = 0.693147 on both sides; a source matching the
    mix reads EXACTLY 0 (q = quantize6(ln 1) = 0)."""
    from ods_to_datalake_spark.operators.quality import (
        source_kl_divergence,
    )

    df = spark.createDataFrame(
        [("A", "a a"), ("B", "b b")], "source string, text string"
    )
    got = {
        r.source: (r.n_tokens, r.n_types, r.kl_nats)
        for r in source_kl_divergence(df, "source", "text").collect()
    }
    assert got == {"A": (2, 1, 0.693147), "B": (2, 1, 0.693147)}

    uniform = spark.createDataFrame(
        [("A", "a b"), ("B", "a b")], "source string, text string"
    )
    got = {
        r.source: r.kl_nats
        for r in source_kl_divergence(
            uniform, "source", "text"
        ).collect()
    }
    assert got == {"A": 0.0, "B": 0.0}


def test_source_kl_null_source_is_a_group(spark):
    """NULL source is a mixture fact, not a dropped row (window keys,
    not join keys); NULL/whitespace texts contribute nothing and an
    all-NULL-text source is absent."""
    from ods_to_datalake_spark.operators.quality import (
        source_kl_divergence,
    )

    df = spark.createDataFrame(
        [(None, "a a"), ("B", "b b"), ("C", None), ("C", "   ")],
        "source string, text string",
    )
    got = {
        r.source: r.n_tokens
        for r in source_kl_divergence(df, "source", "text").collect()
    }
    assert got == {None: 2, "B": 2}


def test_term_burstiness_ratio_floor_and_tiebreak(spark):
    from ods_to_datalake_spark.operators.quality import (
        term_burstiness,
    )

    # 'the' appears once in each of 6 docs (ratio 1.0);
    # 'zebra' appears 3x in each of 2 docs (ratio 3.0) but df=2
    # misses the floor at min_df=3; 'burst' 2x in 3 docs -> 2.0
    docs = spark.createDataFrame(
        [
            (1, "the burst burst zebra zebra zebra"),
            (2, "the burst burst zebra zebra zebra"),
            (3, "the burst burst"),
            (4, "the"), (5, "the"), (6, "the"),
        ],
        "doc_id long, text string",
    )
    rows = term_burstiness(
        docs, "doc_id", "text", min_df=3, k=10
    ).collect()
    got = {r.token: (r.cf, r.df, r.burstiness) for r in rows}
    assert "zebra" not in got  # df floor
    assert got["burst"] == (6, 3, 2.0)
    assert got["the"] == (6, 6, 1.0)
    # ordering: burstiest first, token ASC on ties
    assert [r.token for r in rows] == ["burst", "the"]
