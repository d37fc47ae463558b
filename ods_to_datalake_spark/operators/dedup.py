"""Deduplication operators (charter LLM-pipeline extensions).

Four tiers, cheapest-first — the standard large-corpus dedup funnel:

1. `exact_dedup` — content-hash groupBy. One shuffle on the hash.
2. `minhash_lsh_candidates` — MinHash + LSH banding. Map-side signature,
   explode to (band, key), one shuffle on band keys, self-join within
   buckets. Candidate count ≈ true-near-dup pairs + tunable noise; never
   the O(n²) cross product.
3. `jaccard_pairs` — exact n-gram Jaccard, computed ONLY for candidate
   pairs (shuffle on doc_id to attach shingle sets, then a per-pair
   intersect — bounded by candidate count).
4. `simhash_signatures` + `simhash_band_pairs` — 32-bit SimHash with
   banded Hamming search: signature chunks bucket candidates (guaranteed
   recall below `n_bands` differing bits by pigeonhole), exact bit-level
   Hamming verifies the bound. Registered as x21.

All operators are pure built-in expressions (md5-based hash family) so
they have exact ANSI-SQL oracles and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel as _SL

# Candidate/truth pair frames are corpus-scale: memory-resident
# localCheckpoint blocks are never freed across rounds/reps (the 30×
# g03 OOM — CLAUDE.md), so every corpus-scale checkpoint here pins
# DISK_ONLY like operators/graph.py and operators/basket.py.
_DISK_ONLY = _SL.DISK_ONLY

from ods_to_datalake_spark.functions import text as X


def spread_small_input(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition when the input likely has far fewer splits than cores.

    A tiny/unsplittable file (one parquet row group) scans as ONE task,
    serializing any heavy per-row compute placed above it. At real scale
    inputs arrive in many splits and this is a no-op; locally it costs a
    shuffle of the raw rows — cheap next to hash/shingle work.

    The split estimate comes from plan metadata (input file list +
    optimizer size stats), NOT ``df.rdd`` — converting to an RDD just to
    count partitions forces analysis plus a Java RDD handle on every
    dedup call.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    digits = "".join(ch for ch in str(raw) if ch.isdigit())
    max_split = int(digits or "134217728")
    try:
        files = df.inputFiles()
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes().toString()
        )
        est_splits = max(len(files), -(-size // max_split)) if files else 1
    except Exception:  # non-file source / connect — assume small
        est_splits = 1
    if est_splits * min_factor <= target:
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Duplicate clusters by exact content hash: (hash, n_copies, keep_id)."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias(f"keep_{id_col}"),
        )
        .filter(F.col("n_copies") > 1)
    )


def minhash_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    k: int,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signature table.

    Relational formulation: explode shingles → groupBy(id) with k min()
    aggregates over seeded md5. This beats the per-row higher-order-
    function variant (functions/text.py minhash_signature) by a wide
    margin AND is the 100-TB shape: HOFs are interpreted expression
    trees that Catalyst re-evaluates per reference (no CSE, and
    CollapseProject re-inlines them), while min() aggregates get
    whole-stage codegen and map-side partial aggregation — the shuffle
    carries k hashes per doc, not the shingle set. Each md5 is computed
    exactly once per (doc, shingle, seed).

    Docs with zero shingles (fewer than `shingle_n` tokens) drop out,
    matching the explicit emptiness filter of the HOF path.
    """
    tok = X.tokens(text_col)
    sh = X.shingles(tok, shingle_n)
    exploded = spread_small_input(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(sh).alias("__shingle")
    )
    # Carter-Wegman hash family over ONE md5 per shingle: two 56-bit
    # values (a, b) from the digest halves, h_s = (a + s*b) mod p.
    # Standard MinHash practice (one strong hash + k affine maps) at a
    # quarter of the hash cost of k seeded digests; codegen CSE computes
    # the md5 once per row.
    digest = F.md5(F.col("__shingle"))
    a = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long")
    b = F.conv(F.substring(digest, 15, 14), 16, 10).cast("long")
    hashed = exploded.select(
        F.col(id_col), a.alias("__a"), b.alias("__b")
    )
    aggs = [
        F.min(
            (F.col("__a") + F.lit(s) * F.col("__b")) % F.lit(X.MINHASH_PRIME)
        ).alias(f"mh_{s}")
        for s in range(k)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
) -> DataFrame:
    """(id, band_idx, band_key) LSH band table: MinHash signature →
    md5 of each band's row group. The shared indexing step of the
    self-join (`minhash_lsh_candidates`) and the cross-corpus
    (`incremental_dedup`) paths; zero-shingle docs drop out with the
    signature."""
    assert bands * rows == k, "signature length must equal bands*rows"
    sig = minhash_table(df, id_col, text_col, shingle_n, k)
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"mh_{b * rows + r}") for r in range(rows)],
                )
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        id_col, F.posexplode(band_keys).alias("band_idx", "band_key")
    )


def oversized_buckets(
    banded: DataFrame,
    max_bucket: int,
    keys: tuple[str, ...] = ("band_idx", "band_key"),
) -> DataFrame:
    """(keys..., n_docs) for every candidate bucket wider than
    ``max_bucket`` — the skew report that accompanies `cap_bucket_width`.
    A bucket with B members emits B² candidate pairs, so one degenerate
    key (templated boilerplate hashing every doc into the same band)
    turns a bounded LSH join quadratic; at scale this report is what a
    pipeline logs/alerts on instead of silently stalling a stage."""
    return (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def cap_bucket_width(
    banded: DataFrame,
    max_bucket: int,
    keys: tuple[str, ...] = ("band_idx", "band_key"),
) -> DataFrame:
    """Drop every row belonging to a bucket wider than ``max_bucket``
    BEFORE the candidate self-join, bounding its output at
    max_bucket² per bucket. One aggregation + one semi-join, both on
    the same keys the self-join shuffles on. Docs in an overflowing
    bucket usually share their OTHER bands with the same near-dups, so
    recall loss is confined to pairs similar in only the degenerate
    band; use `oversized_buckets` on the same frame to report what was
    spilled (a capped pipeline must say so, not read as full coverage).
    """
    counts = banded.groupBy(*keys).agg(F.count("*").alias("__n"))
    return banded.join(
        counts.filter(F.col("__n") <= max_bucket).drop("__n"),
        list(keys),
        "left_semi",
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
    max_bucket: int | None = None,
    band_table: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    Plan shape: map (signature) → explode bands → shuffle on
    (band_idx, band_key) → per-bucket self-join → distinct pairs.
    A bucket with B docs emits B², so a degenerate key (e.g. all-empty
    docs) is the skew risk — empty-shingle docs are filtered out first,
    and ``max_bucket`` bounds any residual degenerate key (boilerplate
    corpora): oversized buckets are excluded from pairing — report them
    via `oversized_buckets(lsh_banded(...), max_bucket)`.

    The band table feeds BOTH sides of the self-join; when the
    optimizer broadcasts one side (band tables are k-hashes-per-doc
    small) there is no common Exchange for ReuseExchange to dedup, so
    the shingle→md5→min pipeline runs once per side. An in-query
    localCheckpoint was A/B-measured at sf0.1 and does NOT pay for
    itself here (1.20s vs 1.24s median — the materialization round-trip
    offsets the saved recompute), unlike jaccard_pairs' three-branch
    reuse. The real cross-QUERY saving is ``band_table``: a persisted
    `lsh_banded` frame read from the lake — the same artifact
    `incremental_dedup` materializes incrementally — computed once per
    corpus snapshot and shared by every candidate/verify query over it.
    """
    banded = (
        lsh_banded(df, id_col, text_col, shingle_n, k, bands, rows)
        if band_table is None
        else band_table
    )
    if max_bucket is not None:
        banded = cap_bucket_width(banded, max_bucket)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def incremental_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
) -> DataFrame:
    """Admit only the rows of a NEW snapshot that duplicate nothing in
    the already-ingested corpus — the "corpus v2 arrives after v1 was
    trained on" step every continuously-collected training set needs.

    Two rejection tiers, cheapest first (same funnel as the batch
    dedup operators, but cross-corpus instead of self-join):

    1. exact: content hash (over null-coalesced text, so null and
       empty documents behave identically cross-engine) anti-joined
       against the seen corpus's distinct hashes;
    2. near: any shared LSH band key with a seen document rejects the
       newcomer (candidate-level, deliberately conservative — chain a
       `jaccard_pairs` verify on the rejected set where borderline
       recall matters).

    Returns the admitted new rows as (id, content_hash).

    Scale: the seen side reduces to its distinct hash set and band
    table — at 100 TB both are materialized incrementally (append each
    admitted batch's hashes/bands) instead of recomputed, and both
    joins shuffle on the hash/band key only; the new batch is never
    cross-joined against the corpus. Within-batch duplicates are
    x01/x04's job — run them on the admitted set.
    """
    content = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    seen_hashes = seen_df.select(content.alias("__h")).distinct()
    fresh = (
        new_df.select(F.col(id_col), F.col(text_col), content.alias("__h"))
        .join(seen_hashes, "__h", "left_anti")
    )
    near_ids = (
        lsh_banded(fresh, id_col, text_col, shingle_n, k, bands, rows)
        .join(
            lsh_banded(seen_df, id_col, text_col, shingle_n, k, bands, rows),
            ["band_idx", "band_key"],
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return fresh.join(near_ids, id_col, "left_anti").select(
        id_col, F.col("__h").alias("content_hash")
    )


def shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh array<string>) distinct-shingle sets per document —
    the side artifact `jaccard_pairs` verifies against. At corpus scale
    persist this once to the lake (it's pure map work, one pass) and
    hand it to every downstream verify via ``shingle_table=`` instead
    of re-shingling per query. Empty-shingle docs drop out, matching
    the candidate generators."""
    tok = X.tokens(text_col)
    return (
        spread_small_input(df.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.array_distinct(X.shingles(tok, shingle_n)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.0,
    shingle_table: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate (id_a, id_b) pairs.

    Attaches each side's distinct-shingle set size, counts the shingle
    intersection via an exploded join, and keeps pairs with
    jaccard >= threshold. Cost is bounded by the candidate list — the LSH
    pre-filter is what makes this viable at corpus scale. Thin final
    projection over `jaccard_counts` (the exact integer i/u table the
    x89 calibration audit also consumes)."""
    counts = jaccard_counts(
        df, candidates, id_col, text_col, shingle_n, shingle_table
    )
    out = counts.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_inter") / F.col("n_union"), 6
        ).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= threshold)


def jaccard_counts(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    shingle_table: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, n_inter, n_union) — the exact INTEGER shingle
    intersection/union sizes behind `jaccard_pairs`, split out so the
    estimator-calibration audit (x89) reads the same counts the verify
    step divides (one definition).

    The shingle-set table feeds THREE join branches (sizes ×2 and the
    exploded intersection); without materialization Spark re-tokenizes
    and re-shingles the corpus per branch (no cross-branch CSE, no
    ReusedExchange — the branches differ). localCheckpoint computes it
    once (27% faster at sf0.1, measured; same pattern as
    connected_components) — lazily (eager=False), so plan-only paths
    (explain, schema inspection) don't trigger a materialization job.
    Caveat: checkpointed blocks have no lineage, so an executor loss
    mid-query fails the query instead of recomputing — at extreme scale
    pass ``shingle_table`` instead: a persisted `shingle_sets` frame
    (read from the lake) that skips both the re-shingling and the
    checkpoint, and is shared by every verify query over the corpus.
    """
    sh_set = (
        shingle_sets(df, id_col, text_col, shingle_n).localCheckpoint(
            eager=False
        )
        if shingle_table is None
        else shingle_table.select(
            F.col(id_col), F.col("sh")
        )
    )

    sizes = sh_set.select(id_col, F.size("sh").alias("n_sh"))
    exploded = sh_set.select(id_col, F.explode("sh").alias("shingle"))

    ea = exploded.alias("ea")
    eb = exploded.alias("eb")
    inter = (
        candidates.alias("c")
        .join(ea, F.col("c.id_a") == F.col(f"ea.{id_col}"))
        .join(
            eb,
            (F.col("c.id_b") == F.col(f"eb.{id_col}"))
            & (F.col("ea.shingle") == F.col("eb.shingle")),
        )
        .groupBy("c.id_a", "c.id_b")
        .agg(F.count("*").alias("n_inter"))
    )

    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    counts = (
        candidates.alias("c")
        .join(sa, F.col("c.id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("c.id_b") == F.col(f"sb.{id_col}"))
        .join(
            inter.alias("i"),
            (F.col("c.id_a") == F.col("i.id_a"))
            & (F.col("c.id_b") == F.col("i.id_b")),
            "left",
        )
        .select(
            F.col("c.id_a").alias("id_a"),
            F.col("c.id_b").alias("id_b"),
            F.coalesce(F.col("i.n_inter"), F.lit(0))
            .cast("long")
            .alias("n_inter"),
            (
                F.col("sa.n_sh")
                + F.col("sb.n_sh")
                - F.coalesce(F.col("i.n_inter"), F.lit(0))
            )
            .cast("long")
            .alias("n_union"),
        )
    )
    return counts


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash32 bitstring) per document."""
    return df.select(
        F.col(id_col), X.simhash32(X.tokens(text_col)).alias("simhash")
    )


def simhash_band_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bands: int = 4,
    max_hamming: int = 6,
    sig_bits: int = 32,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded Hamming near-dup search over SimHash bitstrings:
    (id_a, id_b, hamming) for every candidate pair within
    ``max_hamming``, found without an all-pairs comparison.

    The signature splits into ``n_bands`` equal chunks; docs shuffle
    once on (band_idx, band_value) and pair up only inside equal-band
    buckets, then the exact bit-level Hamming distance verifies the
    bound. Pigeonhole guarantee: a pair differing in h bits differs in
    at most h bands, so every pair with h < n_bands shares at least one
    identical band and is guaranteed found; for n_bands <= h <=
    max_hamming recall is high but probabilistic (the differing bits
    must spread across ALL bands to evade every bucket). Same
    candidate-generation shape as `lsh_banded`, applied to signature
    chunks — O(bucket²) work bounded by true near-dup density, never
    O(n²).

    Pure built-in expressions (substring bands, zip_with Hamming), so
    the whole search has an exact ANSI oracle (see x21). ``max_bucket``
    bounds a degenerate band value's B² candidate blowup exactly like
    the MinHash face — report spills with
    `oversized_buckets(..., keys=("band_idx", "band"))`.
    """
    if sig_bits % n_bands:
        raise ValueError(f"{n_bands} bands must divide {sig_bits} bits")
    width = sig_bits // n_bands
    spans = [(1 + i * width, width) for i in range(n_bands)]
    banded = sig.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(
            F.array(*[F.substring(sig_col, s, l) for s, l in spans])
        ).alias("band_idx", "band"),
    )
    if max_bucket is not None:
        banded = cap_bucket_width(
            banded, max_bucket, keys=("band_idx", "band")
        )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{sig_col}").alias("sh_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{sig_col}").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("sh_a"), ""),
                F.split(F.col("sh_b"), ""),
                lambda x, y: x != y,
            ),
            lambda v: v,
        )
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster near-duplicate pairs into components: (id, cluster_id)
    where cluster_id is the minimum id reachable through the pair
    graph. The step after LSH+verify in the dedup funnel — keep one
    representative per cluster (`id == cluster_id`) instead of
    dropping one side of each pair (which over-deletes on chains
    A~B, B~C).

    Min-label propagation: each iteration joins labels across edges
    and keeps the per-node minimum; converges in O(diameter)
    iterations. Near-dup clusters are shallow (a handful of docs,
    diameter ≲ 5), so 2-4 rounds in practice — the driver only runs
    the loop, all data stays distributed. Each round localCheckpoints
    to cut the growing plan lineage (iterative DataFrame loops
    otherwise re-plan the full history each round). For web-scale
    graphs with deep components, switch to the large-star/small-star
    variant (Kiveris et al., "Connected Components in MapReduce"),
    which converges in O(log n) rounds.
    """
    edges = (
        pairs.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .union(
            pairs.select(
                F.col(dst).alias("e_src"), F.col(src).alias("e_dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(
        F.col("e_src").alias("id"), F.col("e_src").alias("label")
    ).distinct()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["e_dst"] == labels["id"])
            .groupBy("e_src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(
                neighbor_min, labels["id"] == neighbor_min["e_src"], "left"
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    return_rounds: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """(id, cluster_id) by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    ACM SoCC 2014) — converges in O(log n) rounds independent of
    component diameter, vs `connected_components`' O(diameter)
    min-label propagation. The right loop for deep components:
    templated/boilerplate corpora chain near-dups into long paths
    where label propagation crawls one hop per round.

    Per round, over the edge list oriented large→small:
      large-star — every node connects its strictly-larger neighbors
        to its minimum neighbor (including itself);
      small-star — every node connects its smaller neighbors and
        itself to their minimum.
    Each phase is one groupBy + one self-join on the edge list; all
    data stays distributed (the driver sees only a convergence
    checksum). At the fixed point the edges form stars rooted at each
    component's minimum id — which is exactly the label set. Rounds
    localCheckpoint like `connected_components` (iterative plans
    otherwise re-plan the whole history); convergence = edge-set
    checksum (count + order-independent xxhash64 sum) unchanged.

    With ``return_rounds`` the round count comes back too (the
    convergence-speed tests use it).
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
    ).localCheckpoint()

    def orient(df: DataFrame) -> DataFrame:
        """Each undirected edge once, as (larger, smaller); no loops."""
        return (
            df.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"),
            )
            .distinct()
        )

    edges = orient(e).localCheckpoint()

    def checksum(df: DataFrame) -> tuple[int, int]:
        # order-independent set digest; decimal sum — ANSI mode makes a
        # bigint sum of 64-bit hashes an overflow error, not a wrap
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return int(row.n), int(row.h)

    prev = checksum(edges)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: m(u) = min(Γ(u) ∪ {u}); emit (v, m) for v > u
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        edges = orient(large)
        # small-star on large→small edges: m(u) = min(Γ⁻(u));
        # emit (v, m) for the other small neighbors plus (u, m)
        smin = edges.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            edges.join(smin, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select("u", F.col("m").alias("v")))
        )
        edges = orient(small).localCheckpoint()
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur
    labels = edges.select(
        F.col("u").alias("id"), F.col("v").alias("cluster_id")
    )
    out = nodes.join(labels, nodes["u"] == labels["id"], "left").select(
        F.col("u").alias("id"),
        F.coalesce(F.col("cluster_id"), F.col("u")).alias("cluster_id"),
    )
    return (out, rounds) if return_rounds else out


def cluster_canonical(
    clusters: DataFrame,
    meta: DataFrame,
    id_col: str,
    quality_col: str,
) -> DataFrame:
    """Pick the best-quality member of each near-dup cluster instead of
    the arbitrary min-id representative: (cluster_id,
    canonical_doc_id, canonical_quality, cluster_size) where the
    canonical doc maximizes ``quality_col`` (smallest id wins ties).
    The curation step after clustering — keep-first deletes a random
    side of every dup group; keep-BEST retains the longest / cleanest
    copy (the CCNet/RefinedWeb convention).

    ``clusters`` is (id, cluster_id) from `connected_components` /
    `connected_components_star`; ``meta`` carries (id_col,
    quality_col) — any integer quality signal (n_chars, token count,
    a quantized score). The id must be NUMERIC: the min-id tie-break
    rides the argmax struct as a negated id (string/UUID ids would
    need a two-stage max-quality-then-min-id aggregation instead).

    Scale: one corpus join on id (both sides id-partitioned) and ONE
    partial-aggregated groupBy(cluster_id) — the argmax travels as a
    single struct per group, max(struct(quality, -id)), so a
    corpus-wide mega-cluster still combines map-side; no window over
    the cluster key (the keep-first skew seam this repo removed in
    round 6).
    """
    joined = clusters.join(
        meta.select(
            F.col(id_col).alias("id"),
            F.col(quality_col).cast("long").alias("__q"),
        ),
        "id",
    )
    agg = joined.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("__q").alias("q"), (-F.col("id")).alias("neg_id")
            )
        ).alias("best"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return agg.select(
        "cluster_id",
        (-F.col("best.neg_id")).cast("long").alias("canonical_doc_id"),
        F.col("best.q").alias("canonical_quality"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# exact-substring span dedup (Lee et al. 2022) + keep-first block rewrite
# ---------------------------------------------------------------------------


def span_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    span_n: int,
) -> DataFrame:
    """(id, n_spans, n_dup_spans, dup_ratio): per-document duplicated
    exact-substring coverage — the curation signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), which
    removes verbatim n-token spans that repeat anywhere in the corpus.
    A span instance counts as duplicated when its token n-gram occurs
    more than once corpus-wide (cross-doc or within-doc).

    Plan: tokenize → n-gram explode (map-side) → partial-aggregated
    groupBy (id, span-hash) → corpus-wide totals per hash attached by
    a JOIN, not a window (a window over the hash partition puts every
    instance of a corpus-wide boilerplate span in ONE reducer and
    cannot be split; the aggregate+join form gives AQE's skew-join a
    seam, at the cost of one extra hash-keyed exchange of tiny
    (id, two-long hash, count) rows) → per-doc rollup → left join back
    so span-less docs (< n tokens) report zeros. The explode never
    materializes the span *text* past its 128-bit key. At 100 TB this is the
    suffix-array workload's relational approximation: O(total tokens)
    rows, uniformly hash-partitioned — no suffix sort, no driver
    state.
    """
    sp = docs.select(
        F.col(id_col),
        F.explode(X.shingles(X.tokens(text_col), span_n)).alias("__s"),
    )
    # internal span key: a PAIR of seeded xxhash64 longs (128 collision
    # bits), not an md5 hex string — pure codegen long math with no
    # per-span string allocation, and the two shuffles keyed on it
    # carry 16 bytes instead of a 32-char UTF8 string (measured 15%
    # on the 30× stress cell; outputs are counts, so any
    # collision-safe key is semantics-preserving)
    per = sp.groupBy(
        F.col(id_col),
        F.xxhash64("__s").alias("__h1"),
        F.xxhash64(F.lit(1), F.col("__s")).alias("__h2"),
    ).agg(F.count("*").alias("__c"))
    totals = per.groupBy("__h1", "__h2").agg(F.sum("__c").alias("__g"))
    tot = per.join(totals, ["__h1", "__h2"])
    st = tot.groupBy(id_col).agg(
        F.sum("__c").alias("n_spans"),
        F.sum(F.when(F.col("__g") > 1, F.col("__c")).otherwise(0)).alias(
            "n_dup_spans"
        ),
    )
    return docs.select(id_col).join(st, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.when(F.coalesce("n_spans", F.lit(0)) == 0, F.lit(0.0))
        .otherwise(
            F.col("n_dup_spans").cast("double") / F.col("n_spans")
        )
        .alias("dup_ratio"),
    )


def span_rewrite(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    span_n: int,
) -> DataFrame:
    """(id, n_tokens, n_removed, clean_text): token-level duplicate-span
    REMOVAL — the rewrite half of Lee et al. 2022's ExactSubstr dedup
    (`span_stats` is the signal half). Every ``span_n``-token window
    whose verbatim n-gram occurs again anywhere in the corpus keeps
    only its corpus-first occurrence (ordered by (doc id, position));
    a token is deleted when a NON-first span instance covers it; the
    document is re-assembled from surviving tokens in order.

    Variable-length duplicates come out by composition: a duplicated
    run of L ≥ span_n tokens is covered by its L − span_n + 1
    duplicated windows, so the WHOLE run disappears at every
    non-canonical site — no fixed-block boundary artifacts
    (`block_dedup` removes only block-aligned repeats; this removes
    any repeat of length ≥ span_n at token granularity).

    Plan: tokenize → n-gram posexplode (map-side, zip_with shingles) →
    skew-safe keep-first (`_keep_first_flag`: partial-agg on the span
    hash + join back on unique (id, pos)) → duplicate instances
    explode to their ≤ span_n covered positions → distinct removed
    (id, pos) set → anti-join the token stream → per-doc refold
    (position-sorted struct collect, the flagship fold's footprint).
    Everything shuffles on uniform keys ((id, pos) composites or the
    partially-aggregated span hash); a corpus-wide boilerplate span
    never lands in one reducer.
    """
    toks = X.tokens(text_col)
    tok_rows = docs.select(
        F.col(id_col), F.posexplode(toks).alias("tok_pos", "__tok")
    )
    spans = docs.select(
        F.col(id_col),
        F.posexplode(X.shingles(toks, span_n)).alias(
            "block_idx", "__block"
        ),
    )
    removed = (
        _keep_first_flag(spans, id_col)
        .filter(~F.col("__kept"))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.col("block_idx"),
                    F.col("block_idx") + F.lit(span_n - 1),
                )
            ).alias("tok_pos"),
        )
        .distinct()
    )
    refold = (
        tok_rows.join(removed, [id_col, "tok_pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("__n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("tok_pos"), F.col("__tok"))
                        )
                    ),
                    lambda s: s.getField("__tok"),
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        docs.select(F.col(id_col), F.size(toks).alias("__n_tokens"))
        .join(refold, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__n_tokens").cast("long").alias("n_tokens"),
            (
                F.col("__n_tokens") - F.coalesce("__n_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def _keep_first_flag(blocks: DataFrame, id_col: str) -> DataFrame:
    """Attach ``__kept`` (boolean) to an exploded
    ``(id, block_idx, __block)`` frame: true iff this instance is the
    corpus-wide first occurrence of its block, ordered by
    (id, block_idx).

    Skew-safe keep-first: ``groupBy(hash128(block)).agg(min(struct(id,
    idx)))`` partially aggregates map-side — a block repeated across
    every document in the corpus collapses to one row per input
    partition before the exchange — and the kept keys join back on
    the unique (id, idx) composite, which is uniformly distributed by
    construction. The equivalent `row_number` window over the block
    hash funnels every instance of a hot block into a single reducer
    partition that AQE cannot split (VERDICT r5 item 2).
    """
    kept_keys = (
        # same two-long xxhash64 key as span_stats: the group key only
        # partitions blocks, never surfaces in output, so the cheaper
        # allocation-free key is semantics-preserving
        blocks.groupBy(
            F.xxhash64("__block").alias("__h1"),
            F.xxhash64(F.lit(1), F.col("__block")).alias("__h2"),
        )
        .agg(
            F.min(
                F.struct(F.col(id_col), F.col("block_idx"))
            ).alias("__first")
        )
        .select(
            F.col("__first")[id_col].alias(id_col),
            F.col("__first")["block_idx"].alias("block_idx"),
            F.lit(True).alias("__kept"),
        )
    )
    return (
        blocks.join(kept_keys, [id_col, "block_idx"], "left")
        .withColumn("__kept", F.coalesce("__kept", F.lit(False)))
    )


def block_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    block_tokens: int,
) -> DataFrame:
    """(id, n_blocks, n_kept, clean_text): corpus-wide keep-first block
    dedup — the paragraph-dedup shape of CCNet (Wenzek et al. 2020)
    applied to disjoint ``block_tokens``-token blocks: every block's
    first occurrence (ordered by (doc id, block position)) survives,
    every later verbatim repeat — in the same doc or any other — is
    dropped, and each document is re-assembled from its surviving
    blocks in order. Boilerplate (headers, license banners, navigation
    chrome) collapses to a single corpus-wide copy.

    Plan: token-slice blocks (map-side, same chunker as x16) →
    keep-first via ``groupBy(hash128(block)).agg(min(struct(id, idx)))``
    — partially aggregated map-side, so a corpus-wide boilerplate
    block (license banners across 10⁹ docs — the exact workload block
    dedup exists for) collapses to one row per hash BEFORE the
    exchange — → join the kept (id, idx) keys back on the UNIQUE,
    uniform (id, idx) composite (no skew possible) → per-doc re-fold
    (shuffle on id) → left join back so fully-deduped docs emit ''.
    A `row_number over (partition by block-hash)` window would put
    every instance of a hot block in ONE reducer partition that AQE
    cannot split; the agg+join form is the same answer with a
    skew-splittable plan (guarded by
    tests/test_dedup.py::test_block_dedup_degenerate_corpus_plan).
    The re-fold collects (position, block) structs — bounded by the
    document length, the same footprint as the flagship document
    fold. For newline-structured corpora split on the real paragraph
    delimiter instead via ``paragraph_dedup``.
    """
    toks = X.tokens(text_col)
    n_blocks = F.ceil(F.size(toks) / F.lit(block_tokens)).cast("long")
    block_list = F.transform(
        F.sequence(F.lit(1), F.greatest(n_blocks, F.lit(1))),
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * block_tokens + 1, block_tokens), " "
        ),
    )
    blocks = docs.select(
        F.col(id_col),
        F.posexplode(block_list).alias("block_idx", "__block"),
    )
    flagged = _keep_first_flag(blocks, id_col)
    refold = (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(
                F.when(F.col("__kept"), 1).otherwise(0)
            ).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__kept"),
                                F.struct(
                                    F.col("block_idx"), F.col("__block")
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("__block"),
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return docs.select(id_col).join(refold, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str = "\n\n",
) -> DataFrame:
    """(id, n_blocks, n_kept, clean_text): `block_dedup` semantics over
    REAL paragraph boundaries — split on ``delimiter`` instead of fixed
    token blocks, keep each paragraph's first corpus-wide occurrence,
    re-join survivors with the same delimiter. The form CCNet actually
    runs on web text; the testdata corpus has no newlines, so the
    registered query face (x37) uses the token-block variant and this
    is exercised on synthetic newline docs in tests. Keep-first is the
    same skew-safe agg+join as ``block_dedup`` (`_keep_first_flag`)."""
    paras = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit(delimiter).cast("string"))
        ).alias("block_idx", "__block"),
    )
    flagged = _keep_first_flag(paras, id_col)
    refold = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_blocks"),
        F.sum(F.when(F.col("__kept"), 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__kept"),
                            F.struct(F.col("block_idx"), F.col("__block")),
                        )
                    )
                ),
                lambda s: s.getField("__block"),
            ),
            delimiter,
        ).alias("clean_text"),
    )
    return docs.select(id_col).join(refold, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def lsh_recall_audit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    rows: int = 2,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """One row — (n_true_pairs, n_candidates, n_hits, recall,
    precision): how well the MinHash/LSH candidate layer recovers the
    EXACT shingle-Jaccard >= t_num/t_den pairs, and how much of its
    candidate stream is noise. The measure-don't-guess audit for the
    dedup stack: LSH's recall is a probability (1 − (1 − J^rows)^bands
    per pair), and a pipeline that tunes bands/rows without measuring
    realized recall on ITS corpus is guessing — shingle-length and
    skew move the curve. Run at a sampled scale, then trust (or fix)
    the banding at full scale.

    Ground truth is the prefix-filtered exact set-similarity join
    (`matching.set_similarity_join`) over the SAME shingle sets the
    MinHash signatures hash (`token_sets` — the quantity LSH
    estimates), so there is no tokenizer drift between the layers.
    Counts are exact BIGINTs; recall = hits/true and precision =
    hits/candidates are ONE IEEE division each, CASE-guarded when the
    denominator is 0 (an empty corpus has no recall, not recall 0).

    Scale: the candidate leg is x04's banded self-join, the truth leg
    x60's prefix join — both candidate-bounded, never all-pairs; the
    hit test is one (a, b)-keyed equi-join; each pair frame feeds two
    legs (hit join + its count) so both are localCheckpointed."""
    from ods_to_datalake_spark.functions import text as X
    from ods_to_datalake_spark.operators.matching import (
        set_similarity_join,
    )

    cands = minhash_lsh_candidates(
        df, id_col, text_col,
        shingle_n=shingle_n, k=k, bands=bands, rows=rows,
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    # no .distinct() here: set_similarity_join dedups its token_sets
    # input itself, and a second corpus-scale distinct of the exploded
    # shingle stream would not collapse across the interposed project
    sh_sets = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            X.shingles(X.tokens(text_col), shingle_n)
        ).alias("sh"),
    )
    truth = set_similarity_join(
        df, id_col, text_col, t_num, t_den, token_sets=sh_sets
    ).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    hits = cands.join(truth, ["id_a", "id_b"])
    nt = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs")
    )
    nc = cands.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        nt.crossJoin(nc)
        .crossJoin(nh)
        .select(
            "n_true_pairs",
            "n_candidates",
            "n_hits",
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_true_pairs").cast("double"),
            ).alias("recall"),
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_candidates").cast("double"),
            ).alias("precision"),
        )
    )


def dup_multiplicity_histogram(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(multiplicity, n_groups, n_docs, doc_share) — the exact-dup
    multiplicity spectrum: how many content-hash groups exist at each
    copy count, and what fraction of the CORPUS sits at that
    multiplicity — the "how duplicated is this crawl, and how" panel
    read before paying for dedup (a corpus that is 40% multiplicity-2
    wants exact dedup and nothing else; a long multiplicity tail
    means boilerplate; multiplicity-1 share is the unique mass that
    survives x01 untouched). x01 lists the duplicate groups; this is
    their distribution.

    Exactness: groups by md5(text) (NULL text is one NULL-hash group
    in both engines — a corpus of missing text IS duplicated
    missingness); counts exact BIGINTs, doc_share ONE IEEE division.
    Scale: one content-hash shuffle (x01's), one multiplicity-keyed
    rollup over the GROUP table, a 1-row total broadcast — the
    histogram is at most max-multiplicity rows."""
    groups = (
        docs.select(F.md5(F.col(text_col)).alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    return dup_spectrum_from_group_sizes(groups, "__n")


def dup_spectrum_from_group_sizes(
    groups: DataFrame, size_col: str
) -> DataFrame:
    """Histogram derivation shared by batch `dup_multiplicity_histogram`
    and the streaming face (`streaming/dup_spectrum.read_dup_spectrum`
    folds per-batch hash counts into the same group-size frame): one
    definition, so stream and batch cannot drift (the zipf_from_counts
    contract). ``groups`` is one row per content-hash group with its
    exact copy count in ``size_col``."""
    hist = groups.groupBy(F.col(size_col).alias("multiplicity")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups")
    ).localCheckpoint()  # ≤ max-multiplicity rows; feeds the total
    # agg AND the report (uncheckpointed, each leg re-runs the
    # corpus hash agg — the x25 rule)
    tot = hist.agg(
        F.coalesce(
            F.sum(F.col("multiplicity") * F.col("n_groups")),
            F.lit(0),
        )
        .cast("long")
        .alias("__t")
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "multiplicity",
        "n_groups",
        (F.col("multiplicity") * F.col("n_groups"))
        .cast("long")
        .alias("n_docs"),
        F.when(
            F.col("__t") > 0,
            (F.col("multiplicity") * F.col("n_groups")).cast("double")
            / F.col("__t").cast("double"),
        ).alias("doc_share"),
    )


def shingle_novelty(
    docs: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty_share) — per-document
    first-occurrence attribution over word n-gram shingles: of each
    document's DISTINCT shingles, how many did THIS document introduce
    to the corpus (no smaller doc_id contains them)? The per-document
    Heaps-law face: a crawl batch whose novelty_share sags is
    re-reading the web (x84 says how duplicated whole documents are;
    this says how derivative the REST is — near-dup boilerplate that
    exact hashing never groups), and 'keep the high-novelty tail' is a
    standard curation move before paying for MinHash.

    Determinism: the introducing document is min(doc_id) per shingle —
    a total order, no ties; a repeated shingle within one document
    counts once (distinct (doc, shingle)); documents with NULL id or
    fewer than ``shingle_n`` tokens have no shingles and are absent
    (the u16 no-evidence rule). novelty_share is ONE raw
    BIGINT/BIGINT IEEE division (n_shingles ≥ 1 by construction).

    Scale: explode + distinct is ONE (doc, shingle)-keyed shuffle; the
    min-attribution table is vocabulary-sized (the Heaps artifact — it
    grows sublinearly on real corpora) and joins back on the SAME
    shingle key before one doc-keyed count. Nothing is all-pairs; the
    corpus-wide state is the shingle→first map, which is exactly the
    mergeable artifact an incremental ingest maintains (min is
    associative — today's batch folds against yesterday's map)."""
    sh = X.shingles(X.tokens(text_col), shingle_n)
    pairs = (
        docs.where(F.col(id_col).isNotNull())
        .select(F.col(id_col), F.explode(sh).alias("__s"))
        .distinct()
    )
    first = pairs.groupBy("__s").agg(
        F.min(id_col).alias("__first")
    )
    return (
        pairs.join(first, "__s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(id_col) == F.col("__first"), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("novelty_share"),
        )
    )


def minhash_calibration_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    k: int,
    bands: int,
    rows: int,
    sample_mod: int | None = None,
) -> DataFrame:
    """(n_pairs, mean_est, mean_exact, mean_abs_err, max_abs_err) —
    calibration audit of the MinHash Jaccard ESTIMATOR itself, over
    the LSH candidate pairs: Ĵ = (matching signature coordinates)/k
    against the exact shingle-set Jaccard the verify step computes.
    x78 audits the CANDIDATE layer (did LSH find the true near-dups);
    this audits the ESTIMATE (when a pipeline trusts Ĵ instead of
    paying for exact verification — the standard k-budget decision —
    how wrong is it, on THIS corpus at THIS k?). The answer prices k:
    E[|Ĵ−J|] ~ √(J(1−J)/k), so doubling signature width buys √2
    accuracy at 2× shuffle weight — a measured mean_abs_err is the
    number that justifies (or kills) that spend.

    Cross-engine arithmetic: matches m and the exact (i, u) counts
    are integers (`jaccard_counts` — the SAME counts x05 divides, one
    definition); Ĵ = m/k is EXACT in binary for power-of-two k; J =
    i/u and the error |Ĵ−J| are correctly-rounded IEEE on identical
    operands — identical doubles in both engines. The per-pair J and
    error are quantized to DECIMAL(18,12) for the MEAN folds (a
    double sum is partition-order-dependent; the decimal sum is
    exact — the x38 per-term rule; the oracle VARCHAR-hops its casts
    per the u17 rule), then ONE raw division by n each;
    max_abs_err is an order-free max over identical doubles, left
    raw. Zero candidate pairs → zero counts, NULL means (CASE
    guard).

    Scale: the candidate pair frame is corpus-scale lineage feeding
    the counts join AND the signature join — checkpointed DISK_ONLY
    (the x25/r9 rule); everything after is one pair-keyed join pair
    and a 1-row aggregate. At 100 TB run it with ``sample_mod=M`` —
    a deterministic hash-mod slice of the candidate PAIRS (pair keys
    hashed, so the slice is stable across runs and engines; pairs
    survive with probability 1/M) — because on a dup-heavy corpus the
    candidate stream itself is quadratic BY LSH CONSTRUCTION (banding
    collides at signature similarity, far below any verify threshold:
    measured on the 30× perturbed stress corpus, J≈0.78 cross-replica
    pairs band-collide at p≈0.98 — 0.73M candidates at 10× → 6.3M at
    30×, 8.6× on 3× the docs). The estimator's error is a binomial
    proportion — hundreds of pairs bound it, exactly like the x80
    recall audit; the verify-join cost drops by the same 1/M."""
    cands = minhash_lsh_candidates(
        docs, id_col, text_col, shingle_n, k, bands, rows
    )
    if sample_mod is not None and sample_mod > 1:
        # sample BEFORE the checkpoint/verify joins — bounding the
        # expensive exact-Jaccard work is the point of the slice
        cands = cands.where(
            F.pmod(
                F.xxhash64(F.col("id_a"), F.col("id_b")),
                F.lit(int(sample_mod)),
            )
            == 0
        )
    cands = cands.localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    counts = jaccard_counts(docs, cands, id_col, text_col, shingle_n)
    sig = minhash_table(docs, id_col, text_col, shingle_n, k)
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh_{s}").alias(f"a_{s}") for s in range(k)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh_{s}").alias(f"b_{s}") for s in range(k)],
    )
    m = F.lit(0)
    for s in range(k):
        m = m + F.when(F.col(f"a_{s}") == F.col(f"b_{s}"), 1).otherwise(0)
    per_pair = (
        counts.join(cands.join(sa, "id_a").join(sb, "id_b"),
                    ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            m.cast("long").alias("m"),
            "n_inter",
            "n_union",
        )
        .select(
            (F.col("m").cast("double") / F.lit(float(k))).alias("est"),
            (
                F.col("n_inter").cast("double")
                / F.col("n_union").cast("double")
            ).alias("exact"),
            F.col("m"),
        )
        .select(
            "m",
            "est",
            "exact",
            F.abs(F.col("est") - F.col("exact")).alias("err"),
        )
    )
    d12 = "decimal(18,12)"
    agg = per_pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("__sm"),
        F.sum(F.col("exact").cast(d12)).alias("__se"),
        F.sum(F.col("err").cast(d12)).alias("__serr"),
        F.max("err").alias("max_abs_err"),
    )
    return agg.select(
        "n_pairs",
        F.when(
            F.col("n_pairs") > 0,
            F.col("__sm").cast("double")
            / (F.lit(int(k)) * F.col("n_pairs")).cast("double"),
        ).alias("mean_est"),
        F.when(
            F.col("n_pairs") > 0,
            F.col("__se").cast("double")
            / F.col("n_pairs").cast("double"),
        ).alias("mean_exact"),
        F.when(
            F.col("n_pairs") > 0,
            F.col("__serr").cast("double")
            / F.col("n_pairs").cast("double"),
        ).alias("mean_abs_err"),
        "max_abs_err",
    )
