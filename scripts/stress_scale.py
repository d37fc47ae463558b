#!/usr/bin/env python
"""Scale-stress harness: synthesize N× the sf0.1 tables (distinct keys
per replica, multi-file parquet so scans parallelize like real datasets)
and time the engine's heavy operators on them.

This is the "would the plan survive a scale-up" measurement loop —
run with different SCALE values and check timings grow ~linearly (scan/
map/fold) or ~n·log n (joins/aggs), not quadratically.

The amplified directory uses the standard testdata layout
(`<workdir>/<table>.parquet`), so the timed queries are the REGISTERED
suite queries themselves (plans/suite*.py) — the same plans the oracle
gate validates, not reimplementations that could drift.

Each cell is the MEDIAN of ``$SPARK_GRAFT_BENCH_REPS`` (default 3 here
— these queries run seconds-to-minutes at 100×) timed repetitions after
one untimed warmup, the same treatment bench.py got in r04: single-shot
cells swung enough on first-touch JIT/IO order to fake a regression
(x23's r04 19.6s cell — VERDICT r4 item 2).

Usage: python scripts/stress_scale.py [SCALE=10] [WORKDIR=/tmp/stress]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

from pyspark.sql import functions as F

AMPLIFIED = {  # table -> key columns shifted per replica
    # l_partkey (r9): the basket/graph family (x69-x72, g03, g05)
    # builds the part co-purchase graph from lineitem. With only
    # l_orderkey offset, replicas SHARE the part catalog — the graph
    # densifies with scale (per-node degree ∝ scale) instead of
    # growing, and super-linear wedge/pair cells would measure a
    # degree-structure change, not a data scale-up (the id-slicing
    # trap's graph cousin: check what the replica scheme does to the
    # DISTRIBUTION before trusting a cell). Offsetting l_partkey too
    # makes each replica an isomorphic disjoint copy — degrees
    # preserved exactly, the "catalog grows with the corpus" model.
    # No stress query joins lineitem to the (copied) part table.
    "lineitem": ["l_orderkey", "l_partkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # events: offsetting user_id too multiplies the KEY population
    # (not per-key density) — the honest scale-up for per-user
    # window/spine shapes like e11
    "events": ["event_id", "user_id"],
    # customer (r8): the similarity-join family (x61/u13) works on
    # customer names/fields; a copied table would make those cells
    # flat by construction. Replicas also get distinct c_name values
    # (TPC-H derives the name from the key — replica names must grow
    # the VOCABULARY, or x61's distinct() collapses the scale-up; see
    # the id-slicing trap in CLAUDE.md)
    "customer": ["c_custkey"],
}
COPIED = ["region", "nation", "supplier", "part"]

# registered queries to time (name -> why it's a stress shape)
SUITE_QUERIES = [
    "q01_pricing_summary",  # selective scan + decimal agg
    "a02_document_fold",  # ObjectHashAggregate wide fold
    "q21_waiting_suppliers",  # EXISTS + NOT EXISTS self-joins
    "x04_minhash_lsh_candidates",  # shingle explode + band self-join
    "x23_tfidf_top_terms",  # corpus explode + 3-way join + top-k
    "x31_incremental_dedup",  # cross-corpus hash + band anti-joins
    "x34_duplicate_spans",  # span explode + window count on span hash
    "x37_block_dedup",  # keep-first via skew-safe agg+join (r6 de-skew)
    "x38_lm_perplexity",  # bigram model joins (model tables at scale)
    "x47_dsir_weights",  # bounded-bucket models: broadcast feature join
    "x51_gopher_repetition",  # doc-local explode + 3 per-doc aggs
    "x07_cosine_topk",  # brute-force ANN baseline: linear corpus scan
    "x35_pq_encode",  # PQ encode: map-only argmin over plan-literal books
    "x08_ivf_ann",  # IVF ANN: partition-pruned probe of a built index
    "x52_hll_vocab",  # sketch build: fixed-state agg over token stream
    "x55_inverted_index",  # two-shuffle posting-list fold
    "x56_bm25_topk",  # term-filtered scoring + corpus dl pass
    "u07_incremental_agg",  # IVM delta merge vs fact re-aggregate
    "u08_snapshot_diff",  # null-safe full-outer snapshot compare
    "x58_histogram_quantiles",  # fixed-grid sketch build over orders
    "u09_incremental_join",  # join IVM: anti-join + batch-vs-dim at volume
    "e11_gap_fill",  # per-user resample + spine + fill window
    "g01_pagerank",  # iterative: distinct pair build + 5 checkpointed rounds
    "x64_cms_join_size",  # two key-grid builds over amplified facts
    "x67_bpe_merges",  # corpus->vocab pass + vocab-sized merge rounds
    # round-8: the similarity-join family (the one r7 family without
    # scale numbers; x60 carries the skew-fix design question).
    # Amplified replicas are EXACT text copies, so x60's qualifying
    # OUTPUT is quadratic in scale (every replica of a near-dup pair
    # qualifies) — the same data artifact as the x04 LSH cell; the
    # interesting signal is the candidate/verify pipeline cost, and
    # the README row says so.
    "x60_set_similarity_join",  # prefix-filtered exact similarity join
    "x61_fuzzy_name_match",  # blocked vocabulary join + Levenshtein
    "u13_golden_record",  # melted-stream survivorship merge
    # round-9: the candidate-generating plans round 8 added (the two
    # whose cost is super-linear in a skewed distribution — r8
    # verdict ask #2). Replica part-graphs are DISJOINT isomorphic
    # copies (l_partkey offset above), so ~linear medians mean the
    # plan scales and anything super-linear is a plan defect, not a
    # density artifact.
    "g03_triangle_count",  # wedge self-join over the oriented graph
    "x70_association_rules",  # basket self-join + rule arithmetic
    "x71_also_bought_topk",  # WindowGroupLimit serving table
    "g05_k_core",  # iterative peel: per-round degree agg + semi-joins
    "g07_link_prediction",  # unoriented wedge fan-out + pair agg +
    # anti-join (the round-9 candidate generator; C(deg,2) per center)
    # round-10: the one round-9 iterative plan without a cell (VERDICT
    # r9 ask #5) — per-round neighbor join + min-struct argmax over the
    # bidirectional edge table, same scale shape as PageRank
    "g06_label_propagation",
    # round-10: HITS — two joins + two 1-row max broadcasts per round
    # over the directed purchase graph
    "g09_hits",
    # round-10: multi-source BFS — per-round frontier join +
    # visited anti-join over the trade graph (fixed-nodes regime,
    # like g09)
    "g10_bfs_layers",
    # round-10: the containment join's stress cell is the CAPPED
    # custom form (x82_capped in CUSTOM): the uncapped registered
    # query is non-viable on amplified corpora by construction —
    # the container index holds corpus-wide tokens, so replica-0
    # prefixes hit quadratic buckets (10x GC-thrashed the VM)
    # round-11 (VERDICT r10 ask #7): the two round-10 additions that
    # window the full stream per key. e17 orders every user's events
    # (user_id amplified → key population grows, the honest per-key
    # regime); u16 is the OPPOSITE regime by construction — 5 fixed
    # o_orderpriority groups over an amplified fact, so each group's
    # order statistics land in ONE window partition and the cell
    # measures the skew ceiling of the order-statistic median design
    "e17_interarrival_stats",
    "u16_robust_outliers",
    # round-11: the new wide-agg correlation panel (pure scan + one
    # map-side-combinable aggregate — the cell pins scan-bound
    # linearity) and the per-node triangle attribution (g03's wedge
    # join + a corner explode tripling the triangle stream; disjoint
    # replica graphs, so ~linear medians mean the plan scales)
    "u19_correlation_profile",
    "g13_clustering_coefficient",
    # round-12 (VERDICT r11 ask #2): the three round-11 operators that
    # move corpus-scale streams. All PERTURB-gated (see the skip list
    # below): the base corpus's FIXED 31-word vocabulary is the
    # degenerate regime for shingle/token operators — x86's novelty
    # table and x92's pair vocabulary stay O(1) on exact copies (the
    # cell would measure a saturated-vocabulary artifact, not a
    # growing corpus), and x89 runs x04's LSH candidate funnel, whose
    # candidate stream goes quadratic on exact-copy replicas (every
    # cross-replica pair is a J=1 true dup — the x60 artifact class).
    "x86_shingle_novelty",  # distinct (doc,shingle) explode + min fold
    "x92_skipgram_pmi",  # w zip-shift pair streams + marginal joins
    "x89_minhash_calibration",  # LSH candidates + exact-J verify join
    # round-12: the new corpus-moving plans. u26 ranks the whole fact
    # inside 3 fixed l_returnflag window partitions — the u16
    # skew-ceiling regime ON PURPOSE (global-ish rank windows are the
    # operator's scale boundary; the cell measures where it is). x95
    # is corpus-linear tokenization + a (source,score) pre-agg that
    # collapses to a domain-sized value frame (no PERTURB needed:
    # the fixed vocabulary concentrates scores into FEWER distinct
    # values, which only shrinks the window side). g15 iterates over
    # disjoint replica trade graphs (the g01 regime).
    "u26_spearman_correlation",  # 5 rank windows in 3 partitions
    "x95_score_auc",  # tokenize + (source,score) pre-agg + cum window
    "g15_katz_centrality",  # 4 checkpointed rounds over DISK_ONLY edges
]


def main() -> int:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress"
    src = "/root/testdata/sf0.1"

    sys.path.insert(0, ".")
    from ods_to_datalake_spark.plans.suite import load_all
    from ods_to_datalake_spark.runcond import run_conditions
    from ods_to_datalake_spark.session import build_session

    queries = load_all()
    # Shuffle partitions scale with the data (AQE coalesces the excess)
    # — a real cluster sizes partitions ∝ input volume, target ≤ ~256MB
    # each. NOTE: the round-6 "x51 spill" hypothesis this setting was
    # introduced for was DISPROVEN by the r7 32/128/320 A/B (partition-
    # insensitive; the real cause was an explode+distinct, fixed in
    # operators/quality.py) — the scaled setting stays because it is
    # the right default for every cell, not because of x51.
    shuffle_parts = int(
        os.environ.get("SPARK_GRAFT_STRESS_PARTITIONS", 0)
    ) or 32 * max(1, scale // 10)
    spark = build_session(
        app_name="stress", shuffle_partitions=shuffle_parts
    )
    print(f"shuffle partitions: {shuffle_parts}")
    spark.sparkContext.setLogLevel("ERROR")

    reuse = os.environ.get("SPARK_GRAFT_STRESS_REUSE") and os.path.isdir(
        f"{workdir}/lineitem.parquet"
    )
    if not reuse:
        shutil.rmtree(workdir, ignore_errors=True)

    t0 = time.perf_counter()
    # Replica keys are OFFSET (key + r*10^7), not interleaved
    # (key*scale + r): replica 0 keeps the ORIGINAL ids, so queries
    # that select by id VALUE — x07/x08's query vectors (vec_id < 8),
    # x35's codebook seed rows, x47's benchmark slice (doc_id < 10) —
    # see the original distinct rows instead of `scale` copies of
    # row 0 (the interleaved form made every ANN query vector and PQ
    # codeword a clone of base vector 0). One offset for every table
    # keeps the lineitem⋈orders key relation intact across replicas.
    offset = 10_000_000
    amplified = AMPLIFIED if not reuse else {}
    for table, key_cols in amplified.items():
        if table == "events":
            # events MUST go through the catalog (CLAUDE.md): raw
            # reads break when the driver regenerates the parquet
            # with a different timestamp physicality; the amplified
            # copy is then written in normalized micros
            from ods_to_datalake_spark.catalog import load_testdata

            df = load_testdata(spark, src).table("events")
        else:
            df = spark.read.parquet(f"{src}/{table}.parquet")
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(scale - 1)))
        )
        for c in key_cols:
            rep = rep.withColumn(
                c, F.col(c) + F.col("__r").cast("long") * F.lit(offset)
            )
        if table == "customer":
            # replica 0 keeps the original names (the offset-key
            # rule); later replicas get key-derived fresh names so
            # the deduplicated vocabulary grows with the data
            rep = rep.withColumn(
                "c_name",
                F.when(F.col("__r") == 0, F.col("c_name")).otherwise(
                    F.concat_ws("#", F.col("c_name"), F.col("__r"))
                ),
            )
        if table == "documents" and os.environ.get(
            "SPARK_GRAFT_STRESS_PERTURB_DOCS"
        ):
            # exact-copy replicas make EVERY cross-replica doc pair a
            # true near-dup (J=1): x60's qualifying output — and its
            # candidate stream — go QUADRATIC in scale (the 30x cell
            # filled the disk with true positives; same artifact class
            # as the x04/LSH note, but output-fatal for an exact
            # join). Tagging a hash-selected 1/8 of each replica's
            # tokens caps cross-replica Jaccard at 7/9 ≈ 0.78 < 0.9,
            # so near-dup density per doc stays CONSTANT as scale
            # grows — the shape of a real growing corpus. The tag is
            # POSITION-SALTED (token_r<replica>_<hash mod 64>): the
            # base corpus has a FIXED 31-word vocabulary, i.e. no
            # rare tokens at all, which is PPJoin's documented worst
            # case (every prefix bucket is corpus-wide — a 30× run
            # stalled on one straggler bucket); real corpora are
            # Zipfian with a long rare tail, and the salted tags give
            # each replica exactly that: ~n/8 low-df discriminative
            # tokens per doc for the prefix filter to anchor on.
            # Opt-in: the historical README rows were measured on
            # exact copies.
            rep = rep.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.expr(
                        "array_join(transform(split(text, '\\\\s+'),"
                        " (t, i) -> CASE WHEN pmod(xxhash64(t, i), 8)"
                        " = pmod(__r, 8) THEN concat(t, '_r', __r,"
                        " '_', pmod(xxhash64(t, i, __r), 64))"
                        " ELSE t END), ' ')"
                    )
                ),
            )
        rep.drop("__r").repartition(32).write.parquet(
            f"{workdir}/{table}.parquet"
        )
    for table in COPIED if not reuse else []:
        shutil.copy(f"{src}/{table}.parquet", f"{workdir}/{table}.parquet")
    print(f"amplify x{scale}: {time.perf_counter() - t0:.1f}s")

    li = spark.read.parquet(f"{workdir}/lineitem.parquet")
    docs = spark.read.parquet(f"{workdir}/documents.parquet")
    print(f"lineitem rows: {li.count():,}  documents: {docs.count():,}")

    # Run-condition provenance (VERDICT r9, Missing #1): stress cells
    # on this shared VM have swung 3.5× on cross-session interference
    # alone (x34, CLAUDE.md) — bracket the matrix with load/memory/probe
    # snapshots so a suspicious cell can be triaged from the artifact.
    cond_start = run_conditions(spark)

    timings: dict[str, float] = {}
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    # queries whose heavy work runs at PLAN-BUILD time (driver-looped
    # iterations materialized via localCheckpoint / per-round collect):
    # the noop write of the final frame re-reads a checkpoint, so the
    # timed region must include mk() itself
    BUILD_TIMED = {
        "g01_pagerank",
        "x67_bpe_merges",
        "g05_k_core",
        "g06_label_propagation",
        "g09_hits",
        "g10_bfs_layers",
        "g15_katz_centrality",
    }

    def bench(name, mk):
        # The timed action is a `noop`-format write, NOT .count():
        # count() lets Catalyst ELIMINATE a unique-key outer join and
        # everything under it (measured: x34/x38's whole span/LM
        # pipeline pruned away, 500k-doc "timings" of 0.25s), and
        # prunes every non-count column from any plan. The noop sink
        # evaluates every row of every column end-to-end — the honest
        # full-query cost. The untimed first run doubles as warmup and
        # supplies the row count for the report.
        df = mk()
        n = df.count()
        samples = []
        for _ in range(reps):
            t = time.perf_counter()
            if name in BUILD_TIMED:
                mk().write.mode("overwrite").format("noop").save()
            else:
                df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t)
        timings[name] = round(statistics.median(samples), 2)
        print(
            f"{name}: median {timings[name]}s of "
            f"{[round(s, 2) for s in samples]} ({n:,} rows)"
        )

    orders = spark.read.parquet(f"{workdir}/orders.parquet")
    from ods_to_datalake_spark.operators.profile import table_profile

    # cells that are NOT registered queries:
    # - fact_join: the raw shuffle-join primitive, both sides amplified
    # - u11_profile_hll: table_profile's approx-distinct face on the
    #   widest amplified fact — the 100-TB profiling path (one wide
    #   aggregate, HLL registers instead of exact count_distinct); no
    #   registered query exercises it because HLL estimates have no
    #   exact cross-engine oracle
    # - x60_capped: the GUARDED set-similarity join (max_prefix_bucket
    #   — the 100-TB operating mode whose candidate stream is bounded
    #   by construction; the registered x60 stays uncapped and exact,
    #   so this is a custom cell). Capped recall is a lower bound —
    #   the oversized_prefix_tokens report is the other half of the
    #   contract; the cell exists to give the family a measured upper
    #   scale point on a machine whose scratch the uncapped candidate
    #   stream exhausts (45x fits, 60x did not).
    from ods_to_datalake_spark.operators.matching import (
        set_similarity_join,
    )
    from ods_to_datalake_spark.operators.matching import (
        containment_join,
    )
    from ods_to_datalake_spark.plans.suite_match import (
        CONT_DEN,
        CONT_NUM,
        SSJ_DEN,
        SSJ_NUM,
    )

    CUSTOM = {
        "fact_join": lambda: li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ),
        "u11_profile_hll": lambda: table_profile(
            li, exact_distinct=False
        ),
        "x60_capped": lambda: set_similarity_join(
            docs, "doc_id", "text", SSJ_NUM, SSJ_DEN,
            max_prefix_bucket=2000,
        ),
        # x82_capped: the GUARDED containment join (max_token_bucket)
        # — the registered x82 stays uncapped/exact, but the UNCAPPED
        # form is non-viable on amplified corpora BY CONSTRUCTION,
        # worse than x60: the container side indexes ALL tokens, so
        # every replica-0 (unperturbed) doc's prefix hits a
        # corpus-wide container bucket (10x uncapped GC-thrashed this
        # VM; see README). The capped form is the 100-TB operating
        # mode; recall is a LOWER bound read with
        # oversized_container_tokens.
        "x82_capped": lambda: containment_join(
            docs, "doc_id", "text", CONT_NUM, CONT_DEN,
            max_token_bucket=2000,
        ),
        # x89_sampled: the calibration audit's 100-TB operating mode
        # (sample_mod slices the candidate pairs 1/16 BEFORE the
        # exact-verify joins). The registered x89 stays full/exact;
        # its uncapped stress trend is quadratic BY LSH CONSTRUCTION
        # (candidates 0.73M at 10× → 6.3M at 30×, 8.6× on 3× docs —
        # banding collides at J≈0.78 perturbed-replica similarity,
        # far below the 0.9 verify threshold), so the sampled cell is
        # the one whose trend should track the CANDIDATE-GENERATION
        # cost rather than the quadratic verify volume.
        "x89_sampled": lambda: _mk_x89_sampled(docs),
    }

    def _mk_x89_sampled(docs):
        from ods_to_datalake_spark.operators.dedup import (
            minhash_calibration_report,
        )
        from ods_to_datalake_spark.plans.sql_fragments import (
            LSH_BANDS,
            LSH_ROWS,
            MINHASH_K,
            SHINGLE_N,
        )

        return minhash_calibration_report(
            docs, "doc_id", "text", SHINGLE_N, MINHASH_K,
            LSH_BANDS, LSH_ROWS, sample_mod=16,
        )

    # isolate suspicious cells (cross-query GC interference — CLAUDE.md):
    # SPARK_GRAFT_STRESS_QUERIES="x51_gopher_repetition" runs one cell
    only = os.environ.get("SPARK_GRAFT_STRESS_QUERIES")
    selected = (
        only.split(",") if only else list(CUSTOM) + SUITE_QUERIES
    )
    for name in selected:
        if name in (
            "x60_set_similarity_join",
            "x82_containment_join",
            # the CAPPED custom forms too: a cap bounds candidate
            # buckets, not TRUE output — exact-copy replicas make
            # every cross-replica pair qualify, so output itself is
            # quadratic without the perturbation
            "x60_capped",
            "x82_capped",
            # round-12: x89 inherits x04's LSH candidate funnel —
            # quadratic candidates on exact copies; x86/x92 don't
            # blow up but measure a saturated 31-word vocabulary
            # (novelty/pair tables O(1) in scale) instead of a
            # growing corpus — meaningless trend either way
            "x86_shingle_novelty",
            "x92_skipgram_pmi",
            "x89_minhash_calibration",
            "x89_sampled",
        ) and not os.environ.get("SPARK_GRAFT_STRESS_PERTURB_DOCS"):
            # on exact-copy replicas every cross-replica pair is a
            # TRUE near-dup: the cell's output/candidates go quadratic
            # and the 30x run filled the disk — never run it unguarded
            print(
                f"skip {name}: set "
                "SPARK_GRAFT_STRESS_PERTURB_DOCS=1 (exact-copy "
                "replicas make its output quadratic; see README)"
            )
            continue
        if name in CUSTOM:
            bench(name, CUSTOM[name])
        else:
            q = queries[name]
            bench(name, lambda q=q: q.fn(spark, workdir))

    print(
        {
            "scale": scale,
            "timings": timings,
            "reps": reps,
            "conditions": {
                "start": cond_start,
                "end": run_conditions(spark),
            },
        }
    )
    if not os.environ.get("SPARK_GRAFT_STRESS_REUSE"):
        # keep the amplified dir only when the operator opted into
        # reuse — the flag is useless if this cleanup always runs
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
