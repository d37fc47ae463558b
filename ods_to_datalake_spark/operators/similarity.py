"""Similarity search over embedding columns (charter LLM extensions).

Two tiers:

- `brute_force_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus, per-group top-k via WindowGroupLimit. Cost is
  |queries| × |corpus| map work + one shuffle on query_id; the baseline
  and the verifier for the ANN path.
- `ivf_topk` — IVF-style ANN: corpus pre-clustered (here by an existing
  cluster/label column; k-means would supply one in a real pipeline),
  each query probes only the `nprobe` nearest cluster centroids. Corpus
  scan work drops by ~n_clusters/nprobe. Centroids are tiny → broadcast;
  the corpus side is filtered by a broadcast semi-join on cluster id
  before any distance math — the scale path for 100-TB embedding stores.

Centroid determinism: components are summed as DECIMAL(28,10), then
divided as doubles — decimal sums are order-independent, so Spark and the
SQL oracle agree bit-for-bit (float sums would differ by task order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ods_to_datalake_spark.functions import vectors as V

# kmeans_assign embeds k*dim literals in the argmin expression; beyond
# this the Catalyst plan itself is the bottleneck and assignment
# switches to the Arrow-batched numpy argmin (see _assign_pandas).
MAX_PLAN_K = 512


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors per query row.

    `queries` must carry (query_id, vec_col). Ranking uses the rounded
    cosine plus the neighbor id as tiebreaker — fully deterministic.
    Self-matches (same id) are excluded.
    """
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    q = queries.select(
        F.col(query_id), V.to_double(vec_col).alias("__qv")
    ).withColumn("__qn", V.norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col), V.to_double(vec_col).alias("__cv")
    ).withColumn("__cn", V.norm(F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id) != F.col(id_col))
        .select(
            query_id,
            id_col,
            V.cosine_rounded_prenorm(
                F.col("__qv"),
                F.col("__cv"),
                F.col("__qn"),
                F.col("__cn"),
            ).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("cosine").desc(), F.col(id_col)],
        k,
    )


def brute_force_topk_l2(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact SQUARED-L2 top-k neighbors per query row — the L2-metric
    sibling of `brute_force_topk` (ranking by d² ascending, id
    tiebreak, self-matches excluded): the exact truth leg for auditing
    an L2-ranked index (PQ's ADC is squared L2 — x83). The d² fold is
    the SAME zip_with diff-square + left-fold the PQ/k-means paths
    use, so both engines and both legs share one IEEE order."""
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    q = queries.select(
        F.col(query_id), V.to_double(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col), V.to_double(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id) != F.col(id_col))
        .select(
            query_id,
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col("__qv"),
                    F.col("__cv"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("d2").asc(), F.col(id_col)],
        k,
    )


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries_local: list[tuple],
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Throughput variant of `brute_force_topk`: Arrow-batched mapInPandas
    with a numpy matmul per batch (one BLAS call scores a whole corpus
    batch against every query) — 10-100× the per-row expression fold at
    wide dims. The exact HOF variant stays the oracle-checked baseline;
    this is the path a production scorer takes (and where a GPU would
    plug in).

    `queries_local`: [(query_id, vector), ...] — small, shipped in the
    closure (≡ broadcast). Map-only over the corpus; the final per-query
    top-k reduction shuffles only |corpus-partitions| × |queries| × k
    candidate rows.
    """
    import numpy as np

    from ods_to_datalake_spark.operators.agg import top_k_per_group

    qids = [int(q) for q, _ in queries_local]
    qmat = np.asarray([v for _, v in queries_local], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    out_schema = f"query_id long, {id_col} long, cosine double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            cmat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            sims = (cmat @ qmat.T) / (
                np.linalg.norm(cmat, axis=1)[:, None] * qnorm[None, :]
            )
            n_q = len(qids)
            frames = []
            # per-partition pre-cut: keep only each query's local top-k.
            # Rounding must match Spark's F.round (HALF_UP — away from
            # zero), not numpy's half-even, and the cut must use the SAME
            # tiebreak as the final reducer (cosine desc, id asc) or a
            # boundary tie could drop the row the reducer would pick.
            for j in range(n_q):
                raw = sims[:, j]
                col = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
                keep = np.lexsort((ids, -col))[: k + 1]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[j],
                            id_col: ids[keep],
                            "cosine": col[keep],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, out_schema)
        .filter(F.col("query_id") != F.col(id_col))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("cosine").desc(), F.col(id_col)], k
    )


def hyperplane_weights(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5: component i of
    plane j = nibble_i(md5(f"h{j}|{block}")) - 7.5. Zero-mean, exactly
    representable halves, reproducible in ANSI SQL by inlining the
    constants — no RNG state to ship."""
    import hashlib

    planes = []
    for j in range(n_planes):
        nibbles: list[int] = []
        block = 0
        while len(nibbles) < dim:
            h = hashlib.md5(f"h{j}|{block}".encode()).hexdigest()
            nibbles.extend(int(c, 16) for c in h)
            block += 1
        planes.append([n - 7.5 for n in nibbles[:dim]])
    return planes


def _tag_hyperplane_buckets(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
) -> DataFrame:
    """(id, __v, __vn, __bucket): sign-bit bucket of the fixed
    hyperplane projections — map-only, the shared indexing step of the
    self-join and cross-corpus near-dup paths. ``__vn`` = norm(__v),
    computed once per VECTOR here so the per-PAIR cosine verify
    downstream never re-folds it (cosine_rounded_prenorm)."""
    from ods_to_datalake_spark.functions import vectors as V

    planes = hyperplane_weights(dim, n_planes)
    v = V.to_double(vec_col)
    bucket = F.concat(
        *[
            F.when(
                V.dot(v, F.array(*[F.lit(w) for w in plane])) > 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for plane in planes
        ]
    )
    return corpus.select(
        F.col(id_col), v.alias("__v"), bucket.alias("__bucket")
    ).withColumn("__vn", V.norm(F.col("__v")))


def incremental_embedding_dedup(
    new_df: DataFrame,
    seen_df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """Admit only the new vectors with NO near-duplicate (rounded
    cosine >= threshold) in the already-ingested corpus — the embedding
    face of `dedup.incremental_dedup`, for pipelines that dedup on
    semantic similarity instead of text.

    Both corpora bucket map-side on the same hyperplane sign bits;
    candidates form only where a new vector shares a bucket with a seen
    vector (one shuffle on the bucket key — the new batch is never
    cross-joined against the corpus), then verify the exact cosine.
    Exact duplicates project identically, land in the same bucket at
    cosine 1.0, and are always rejected — no separate hash tier needed.
    ANN caveat as in `hyperplane_lsh_pairs`: a near-dup straddling a
    hyperplane is missed; raise `n_planes` bands for recall. At scale
    the seen side's (id, bucket, vector) table is materialized
    incrementally, not recomputed.
    """
    from ods_to_datalake_spark.functions import vectors as V

    new_t = _tag_hyperplane_buckets(new_df, id_col, vec_col, dim, n_planes)
    seen_t = _tag_hyperplane_buckets(
        seen_df, id_col, vec_col, dim, n_planes
    )
    near_ids = (
        new_t.alias("n")
        .join(
            seen_t.alias("s"),
            F.col("n.__bucket") == F.col("s.__bucket"),
        )
        .filter(
            V.cosine_rounded_prenorm(
                F.col("n.__v"),
                F.col("s.__v"),
                F.col("n.__vn"),
                F.col("s.__vn"),
            )
            >= threshold
        )
        .select(F.col(f"n.{id_col}").alias(id_col))
        .distinct()
    )
    return new_df.select(id_col).join(near_ids, id_col, "left_anti")


def hyperplane_lsh_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 4,
    threshold: float = 0.35,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH.

    Bucket = sign bits of `n_planes` fixed hyperplane projections
    (map-only); candidate pairs form within buckets only (one shuffle on
    the bucket key — never the O(n²) cross product); candidates are
    verified against the exact rounded cosine threshold. ANN by
    construction: pairs straddling a hyperplane are missed — raise
    `n_planes` probes/bands for recall, or run the exact variant on the
    LSH-reduced candidate set.

    ``max_bucket`` bounds the B² blowup of a degenerate sign bucket
    (e.g. a mass of near-zero vectors landing in one cell): wider
    buckets are excluded from pairing — report them with
    `dedup.oversized_buckets(_tag_hyperplane_buckets(...), max_bucket,
    keys=("__bucket",))` so the spill is visible, never silent.
    """
    tagged = _tag_hyperplane_buckets(corpus, id_col, vec_col, dim, n_planes)
    if max_bucket is not None:
        from ods_to_datalake_spark.operators.dedup import cap_bucket_width

        tagged = cap_bucket_width(tagged, max_bucket, keys=("__bucket",))
    a, b = tagged.alias("a"), tagged.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        V.cosine_rounded_prenorm(
            F.col("a.__v"),
            F.col("b.__v"),
            F.col("a.__vn"),
            F.col("b.__vn"),
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def centroids(
    corpus: DataFrame, cluster_col: str, vec_col: str
) -> DataFrame:
    """Per-cluster mean vector, decimal-exact (see module docstring).

    Plan: posexplode → groupBy (cluster, pos) decimal-sum → re-assemble
    ordered arrays. Two shuffles over (n_clusters × dim) rows — trivial
    relative to the corpus.

    Domain: DECIMAL(28,10) bounds per-cell component sums to |Σx| <
    1e18 — twenty orders of magnitude above real encoder outputs
    (O(1) floats) but NOT the full float32 range; a corpus of
    ~1e38-magnitude vectors overflows the exact sum (ANSI error, not
    silent wrap). That is the price of order-independent bit-exact
    means; normalize such a corpus first.
    """
    exploded = corpus.select(
        F.col(cluster_col),
        F.posexplode(V.to_double(vec_col)).alias("pos", "val"),
    )
    per_dim = exploded.groupBy(cluster_col, "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
            / F.count("*")
        ).alias("mean_val")
    )
    return per_dim.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("mean_val")))
            ),
            lambda s: s.getField("mean_val"),
        ).alias("centroid")
    )


def _assign_pandas(
    tagged: DataFrame,
    vec_col: str,
    cents: list[list[float]],
    out_col: str,
) -> DataFrame:
    """Arrow-batched argmin assignment for large k: centroids ship in
    the closure (k × dim doubles), each batch computes all squared
    distances vectorized and argmins — map-only, no shuffle, plan size
    independent of k (the expression path embeds k×dim literals and the
    Catalyst tree itself becomes the bottleneck past MAX_PLAN_K).

    Bit-identical to `assign_expr`: distances accumulate dimension-by-
    dimension in a left-to-right fold (one vectorized numpy op per dim,
    NOT numpy's pairwise-summed `sum`) — the exact IEEE operation order
    of F.aggregate's fold — and np.argmin breaks ties toward the lowest
    index, matching the lexicographic struct-min. Identical inputs +
    identical op order → identical floats → identical labels, which the
    property tests assert.
    """
    import numpy as np

    from pyspark.sql import types as T

    C = np.asarray(cents, dtype=np.float64)
    out_schema = T.StructType(
        list(tagged.schema.fields)
        + [T.StructField(out_col, T.IntegerType(), False)]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: []})
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            acc = np.zeros((len(pdf), C.shape[0]))
            for d in range(C.shape[1]):
                diff = X[:, d, None] - C[None, :, d]
                acc += diff * diff
            yield pdf.assign(
                **{out_col: np.argmin(acc, axis=1).astype("int32")}
            )

    return tagged.mapInPandas(run, out_schema)


def assign_to_centroids(
    src: DataFrame,
    vec_col: str,
    cents: list[list[float]],
    out_col: str = "__cluster",
) -> DataFrame:
    """src + (out_col int): nearest-centroid index against a FIXED
    centroid list, by squared euclidean distance with lowest-index
    tie-break. Map-only either way: a codegen expression argmin below
    MAX_PLAN_K (k × dim literals in the plan), the Arrow-batched numpy
    argmin above it (plan size k-independent, bit-identical labels —
    see `_assign_pandas`). The shared assignment primitive of
    `kmeans_assign` (per-iteration + final labeling) and
    `ivf_index_append` (labeling new vectors against a frozen index)."""
    if len(cents) > MAX_PLAN_K:
        return _assign_pandas(src, vec_col, cents, out_col)
    # pre-project the float→double cast ONCE per row: passed inline it
    # is re-evaluated inside every one of the k interpreted d² folds
    # (no CSE across HOF references — the u19 inlining trap; Catalyst
    # keeps the multi-referenced non-cheap alias in its own Project,
    # plan-verified k casts → 1). The distance expression itself is
    # unchanged — same cast values through the same IEEE fold — so
    # labels stay bit-identical to _assign_pandas and the oracles.
    pre = src.withColumn("__acv", V.to_double(vec_col))
    best = nearest_centroid(F.col("__acv"), cents)
    return pre.withColumn(out_col, best.getField("j").cast("int")).drop(
        "__acv"
    )


def nearest_centroid(v, cents: list[list[float]]):
    """struct(d double, j int) of the nearest centroid to vector
    expression ``v`` (array<double>) by squared euclidean distance,
    lowest-index tie-break (lexicographic struct array_min).

    The exact IEEE op order — ((0 + d0²) + d1²) + … sequential fold of
    (a-b)·(a-b) — is load-bearing: `_assign_pandas` and the DuckDB
    oracles (list_dot_product over an element-wise diff list) replay it
    op-for-op, so identical inputs give bit-identical distances and
    therefore identical argmins with no rounding epsilon. Changing this
    expression requires changing both in lockstep (property-enforced).
    """
    choices = []
    for j, c in enumerate(cents):
        carr = F.array(*[F.lit(x) for x in c])
        diff = F.zip_with(v, carr, lambda a, b: (a - b) * (a - b))
        d2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
        choices.append(F.struct(d2.alias("d"), F.lit(j).alias("j")))
    return F.array_min(F.array(*choices))


def kmeans_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 3,
) -> DataFrame:
    """Deterministic Lloyd k-means, Spark-idiomatic: centroids live on
    the driver (k × dim floats — tiny), assignment is a map-only
    expression (argmin over k broadcast centroids via a lexicographic
    struct-min), means are decimal-exact aggregates. No MLlib
    dependency, no RDDs, reproducible across runs (seeds = the k
    lowest-id vectors).

    Scale: per iteration one scan + one (k × dim)-sized aggregate —
    the corpus is never shuffled for assignment. `iters` is fixed (not
    convergence-tested) to keep runs deterministic and bounded.

    Returns (id_col, cluster int) — feed to `ivf_topk` as cluster_col.

    Bound: the assignment expression materializes k × dim literals in
    the plan (one struct per centroid), so plan size grows linearly in
    k. Fine for IVF cell counts (k ≤ ~256, the intended use); past
    MAX_PLAN_K the Catalyst tree itself becomes the bottleneck, so
    assignment switches automatically to `_assign_pandas` — the Arrow-
    batched numpy argmin whose plan size is k-independent and whose
    labels are bit-identical to the expression path (same IEEE fold
    order; property-tested). A 100-TB IVF index wants thousands of
    cells; both paths stay map-only over the corpus.
    """
    seeds = [
        [float(x) for x in r[1]]
        for r in corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    ]
    if not seeds:
        raise ValueError("kmeans_assign: corpus is empty")
    if len(seeds) < k:
        k = len(seeds)  # fewer rows than clusters → one row per cluster
    cents: list[list[float]] = seeds

    def assign_df(cents_local: list[list[float]]) -> DataFrame:
        return assign_to_centroids(
            corpus.select(id_col, vec_col), vec_col, cents_local
        )

    for _ in range(iters):
        new_cents = {
            r[0]: list(r[1])
            for r in centroids(
                assign_df(cents), "__cluster", vec_col
            ).collect()
        }
        # empty clusters keep their previous centroid
        cents = [new_cents.get(j, cents[j]) for j in range(k)]

    return assign_df(cents).select(
        id_col, F.col("__cluster").alias("cluster")
    )


def _probe_clusters(
    q: DataFrame,
    cents: DataFrame,
    cluster_col: str,
    nprobe: int,
    query_id: str,
) -> DataFrame:
    """(query_id, cluster) — the `nprobe` clusters whose centroids are
    nearest each query by rounded cosine; centroids are broadcast
    (k × dim, tiny), tie-broken on cluster id."""
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    probe_scores = (
        q.withColumn("__qn", V.norm(F.col("__qv")))
        .crossJoin(
            F.broadcast(
                cents.withColumn("__kn", V.norm(F.col("centroid")))
            )
        )
        .select(
            query_id,
            cluster_col,
            V.cosine_rounded_prenorm(
                F.col("__qv"),
                F.col("centroid"),
                F.col("__qn"),
                F.col("__kn"),
            ).alias("c_cos"),
        )
    )
    return top_k_per_group(
        probe_scores,
        [query_id],
        [F.col("c_cos").desc(), F.col(cluster_col)],
        nprobe,
    ).select(query_id, cluster_col)


def _score_probed(
    corpus: DataFrame,
    probes: DataFrame,
    q: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    k: int,
    query_id: str,
) -> DataFrame:
    """Exact top-k over the probed clusters only. Probes and queries
    broadcast; corpus rows join only against queries probing their
    cluster — the corpus is never shuffled."""
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    c = corpus.select(
        F.col(id_col), F.col(cluster_col), V.to_double(vec_col).alias("__cv")
    ).withColumn("__cn", V.norm(F.col("__cv")))
    qn = q.withColumn("__qn", V.norm(F.col("__qv")))
    scored = (
        c.join(F.broadcast(probes), on=cluster_col)
        .filter(F.col(query_id) != F.col(id_col))
        .join(F.broadcast(qn), on=query_id)
        .select(
            query_id,
            id_col,
            V.cosine_rounded_prenorm(
                F.col("__qv"),
                F.col("__cv"),
                F.col("__qn"),
                F.col("__cn"),
            ).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("cosine").desc(), F.col(id_col)],
        k,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    k: int,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF ANN: probe the `nprobe` clusters whose centroids are nearest
    each query (by rounded cosine), then exact top-k within those
    clusters only."""
    cents = centroids(corpus, cluster_col, vec_col)
    q = queries.select(F.col(query_id), V.to_double(vec_col).alias("__qv"))
    probes = _probe_clusters(q, cents, cluster_col, nprobe, query_id)
    return _score_probed(
        corpus, probes, q, id_col, vec_col, cluster_col, k, query_id
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    path: str,
    iters: int = 3,
) -> None:
    """Build and persist an IVF index to the lake:

    - ``<path>/corpus`` — the corpus rewritten hive-partitioned by its
      k-means cluster id, so probe-time reads PRUNE to the nprobe
      probed partitions (partition pruning at the scan, the physical
      trick that makes IVF an index rather than a filter);
    - ``<path>/centroids`` — the (cluster, centroid) table, tiny.

    Build cost: the k-means passes (map-only per iteration) + ONE
    shuffle to attach labels and one clustered write — paid once; every
    subsequent `ivf_topk_indexed` query scans only probed cells. This
    is the 100-TB shape: the embedding store lives clustered on disk,
    queries touch nprobe/k of it, and re-clustering is an offline
    rebuild, not a query-time cost.
    """
    assignment = kmeans_assign(corpus, id_col, vec_col, k, iters)
    tagged = corpus.select(id_col, vec_col).join(assignment, id_col)
    tagged.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/corpus"
    )
    # centroids from the layout just WRITTEN, not from `tagged`: the
    # latter would re-execute the assignment join over the whole corpus
    # a second time — at index scale that's a full extra corpus pass
    centroids(
        corpus.sparkSession.read.parquet(f"{path}/corpus"),
        "cluster",
        vec_col,
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF ANN against a `build_ivf_index` layout: centroids load from
    the index (no per-query centroid recompute), probed cluster ids —
    at most |queries| × nprobe, driver-sized by construction — prune
    the partitioned corpus scan to the probed cells only. Results equal
    `ivf_topk` over the same assignment (tested); only the I/O shape
    differs: unprobed cells are never read at all."""
    cents = spark.read.parquet(f"{index_path}/centroids")
    q = queries.select(F.col(query_id), V.to_double(vec_col).alias("__qv"))
    probes = _probe_clusters(q, cents, "cluster", nprobe, query_id)
    probed = [
        r.cluster for r in probes.select("cluster").distinct().collect()
    ]
    corpus = spark.read.parquet(f"{index_path}/corpus").filter(
        F.col("cluster").isin(probed)
    )
    return _score_probed(
        corpus, probes, q, id_col, vec_col, "cluster", k, query_id
    )


def ivf_index_append(
    spark,
    index_path: str,
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
) -> None:
    """Add new vectors to an existing `build_ivf_index` layout WITHOUT
    a rebuild: each new vector is labeled with its nearest FROZEN
    centroid (map-only — `assign_to_centroids`, k × dim centroids from
    the driver) and appended to that cell's partition. Centroids are
    deliberately not recomputed — standard IVF practice: cell means
    drift slowly under appends, and re-clustering is an offline rebuild
    decision, not an ingest-path cost. At 100 TB this is the difference
    between touching |new batch| rows and rewriting the store.

    Missing-cell note: centroids persist only for non-empty cells, so
    labels map through the stored cluster ids (a flat k-int literal
    array — plan-cheap even at large k).
    """
    rows = sorted(
        (r.cluster, [float(x) for x in r.centroid])
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    )
    cluster_ids = [cid for cid, _ in rows]
    cents = [c for _, c in rows]
    tagged = assign_to_centroids(
        new_df.select(id_col, vec_col), vec_col, cents
    ).withColumn(
        "cluster",
        F.element_at(
            F.array(*[F.lit(cid) for cid in cluster_ids]),
            F.col("__cluster") + 1,
        ),
    ).drop("__cluster")
    tagged.write.mode("append").partitionBy("cluster").parquet(
        f"{index_path}/corpus"
    )


def ivf_cell_balance(
    assignment: DataFrame, cluster_col: str
) -> DataFrame:
    """(cluster, n_vecs, vec_share, size_rank, cum_share) — IVF
    cell-size concentration audit: one row per non-empty cell, largest
    first, with its corpus share and the running share of the top
    ``size_rank`` cells. The missing face of the ANN audit family
    (recall x80, quantization x83, estimator bias x89): probed-cell
    recall decays SILENTLY as an index grows imbalanced — a query's
    nprobe cells cover a shrinking corpus fraction when appends pile
    into few cells (`ivf_index_append` never moves frozen centroids),
    and a mega-cell makes its probes scan-expensive while starved
    cells waste k. cum_share at rank m IS "share of the corpus in the
    top m cells"; a healthy layout reads cum_share ≈ m/k along the
    curve, a skewed one front-loads it (tests pin both regimes).

    Determinism: exact BIGINT counts; ordering n_vecs DESC with
    cluster id tiebreak (total order); shares are single IEEE
    divisions of BIGINTs, produced only when the total is positive
    (empty input → empty frame, no division evaluated).

    Scale: ONE cluster-keyed count shuffle (map-side combinable) over
    the assignment; everything after runs on the k-sized cell frame —
    checkpointed (it feeds the total AND the ranked output; the x25
    rule) — with a single-partition window over ≤ k rows. Audit an
    on-disk layout via `ivf_index_cell_balance` (reads ONLY the
    partition column, so the scan is footer/metadata work, not data)."""
    from pyspark.sql import Window

    sizes = (
        assignment.groupBy(F.col(cluster_col).alias("cluster"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .localCheckpoint()
    )
    tot = sizes.agg(
        F.coalesce(F.sum("n_vecs"), F.lit(0)).cast("long").alias("__t")
    )
    w = Window.orderBy(F.col("n_vecs").desc(), F.col("cluster"))
    return sizes.crossJoin(F.broadcast(tot)).select(
        "cluster",
        "n_vecs",
        F.when(
            F.col("__t") > 0,
            F.col("n_vecs").cast("double") / F.col("__t").cast("double"),
        ).alias("vec_share"),
        F.row_number().over(w).cast("long").alias("size_rank"),
        F.when(
            F.col("__t") > 0,
            F.sum("n_vecs").over(w).cast("double")
            / F.col("__t").cast("double"),
        ).alias("cum_share"),
    )


def ivf_index_cell_balance(spark, index_path: str) -> DataFrame:
    """`ivf_cell_balance` over a persisted `build_ivf_index` layout,
    INCLUDING empty cells (a stored centroid whose partition holds no
    vectors reads n_vecs=0 — starved cells are precisely the wasted-k
    signal an assignment-frame audit cannot see). Reads only the
    corpus partition column plus the tiny centroids table."""
    sizes = ivf_cell_balance(
        spark.read.parquet(f"{index_path}/corpus").select("cluster"),
        "cluster",
    )
    cells = spark.read.parquet(f"{index_path}/centroids").select(
        F.col("cluster").cast(sizes.schema["cluster"].dataType)
    )
    missing = cells.join(sizes.select("cluster"), "cluster", "left_anti")
    return sizes.unionByName(
        missing.select(
            "cluster",
            F.lit(0).cast("long").alias("n_vecs"),
            F.lit(0.0).alias("vec_share"),
            F.lit(None).cast("long").alias("size_rank"),
            F.lit(None).cast("double").alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ compression tier)
# ---------------------------------------------------------------------------


def pq_seed_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    ks: int,
) -> list[list[list[float]]]:
    """Deterministic seed codebooks: the m sub-vectors of the ks
    lowest-id corpus rows — codebooks[sub][code] is a (dim/m)-float
    codeword. The oracle-replicable stand-in for `pq_train` (which
    refines these by per-subspace k-means): seeding from data rows is
    how Lloyd initializes anyway, and a fixed id-ordered seed makes the
    whole encode reproducible across engines. Driver-sized collect:
    ks rows × dim floats."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(ks).collect()
    )
    return [
        [
            [float(x) for x in r[vec_col][mm * sub : (mm + 1) * sub]]
            for r in rows
        ]
        for mm in range(m)
    ]


def pq_train(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    m: int,
    ks: int,
    n_iter: int = 5,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd refinement of `pq_seed_codebooks` — the real
    PQ training step (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): split every vector into m sub-vectors,
    k-means each subspace independently to ks codewords.

    Scale shape: each iteration is one map-only assignment (codeword
    literals broadcast in the plan) + one decimal-exact `centroids`
    agg over (ks × dim/m) cells — the corpus is scanned, never
    shuffled on id. At 100 TB you train on a sample (PQ codebooks
    converge on ~1e5-1e6 vectors); pass `corpus.sample(...)` or a
    deterministic slice for that (see `build_ivf_pq_index`).

    Seeds are CONTENT-ordered, not scan-ordered: the ks sub-vectors
    that sort first by md5 of their rendered value (a deterministic
    pseudo-random spread — pure value-order would seed all ks
    codewords in one corner of the subspace). An unordered `limit`
    takes whatever rows the scan yields first, so the "deterministic
    Lloyd" guarantee would hold only per partition layout (VERDICT r5
    item 3); md5-order makes codebooks a pure function of the corpus
    CONTENTS (TakeOrderedAndProject: per-partition top-ks, no full
    sort). Partition-invariance is property-tested in
    tests/test_determinism.py.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    v = V.to_double(vec_col)
    books: list[list[list[float]]] = []
    for mm in range(m):
        piece = corpus.select(
            F.slice(v, mm * sub + 1, sub).alias("__sv")
        )
        cents = [
            [float(x) for x in r["__sv"]]
            for r in piece.orderBy(
                F.md5(F.col("__sv").cast("string")), "__sv"
            )
            .limit(ks)
            .collect()
        ]
        for _ in range(n_iter):
            tagged = assign_to_centroids(piece, "__sv", cents, "__c")
            new = {
                r["__c"]: [float(x) for x in r["centroid"]]
                for r in centroids(tagged, "__c", "__sv").collect()
            }
            # empty cells keep their previous codeword (standard Lloyd)
            cents = [new.get(j, cents[j]) for j in range(ks)]
        books.append(cents)
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    with_error: bool = True,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, passthrough..., code_0..code_{m-1} int, recon_d2 double):
    per-subspace
    nearest-codeword indices — the PQ compressed representation, m×8
    bits per vector instead of dim×32 — plus the total squared
    reconstruction error (sum over subspaces of the chosen codeword's
    distance, the quantization-quality signal).

    Map-only: the codebooks ride in the plan as literals (m × ks ×
    dim/m doubles; ks ≤ 256 by 8-bit-code construction, far under the
    MAX_PLAN_K plan-size cliff), no shuffle, no UDF. Tie-break and
    float determinism per `nearest_centroid`.
    """
    m = len(codebooks)
    if not m or not codebooks[0]:
        # empty-corpus seeding (no codewords) → nothing to encode;
        # schema-stable empty result, kept lazy
        out = (
            [F.col(id_col)]
            + [F.col(c) for c in passthrough]
            + [
                F.lit(0).cast("int").alias(f"code_{mm}")
                for mm in range(m)
            ]
        )
        if with_error:
            out.append(F.lit(0.0).alias("recon_d2"))
        return df.select(*out).where(F.lit(False))
    sub = len(codebooks[0][0])
    v = V.to_double(vec_col)
    picks = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        *[
            nearest_centroid(
                F.slice(v, mm * sub + 1, sub), codebooks[mm]
            ).alias(f"__b{mm}")
            for mm in range(m)
        ],
    )
    out = (
        [F.col(id_col)]
        + [F.col(c) for c in passthrough]
        + [
            F.col(f"__b{mm}").getField("j").cast("int").alias(f"code_{mm}")
            for mm in range(m)
        ]
    )
    if with_error:
        err = F.col("__b0").getField("d")
        for mm in range(1, m):
            err = err + F.col(f"__b{mm}").getField("d")
        out.append(err.alias("recon_d2"))
    return picks.select(*out)


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int,
    exclude_self: bool = False,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over a PQ-encoded
    corpus: for each query, distance ≈ Σ_m lut_m[code_m] where lut_m
    holds the exact squared distances from the query's m-th sub-vector
    to every codeword — the query stays full-precision, the corpus
    stays 8-bit codes.

    Plan: queries (small) broadcast-cross the encoded corpus; each
    corpus row costs m array lookups instead of dim multiplies — the
    whole point of PQ at 100 TB: the scan reads m bytes per vector,
    not dim×4, and distance math drops ~dim/m×. One shuffle (query_id)
    for the per-query top-k via WindowGroupLimit; compose with an IVF
    cell filter (`ivf_topk_indexed`) to prune the scan itself.

    Returns (query_id, id, approx_d2, rn) for rn ≤ k, ties broken by
    corpus id. Exactness property: approx_d2 equals the true squared
    distance to the *reconstructed* (codeword-concatenated) vector.
    ``exclude_self`` drops rows where the corpus id equals the query
    id BEFORE ranking (the audit convention — x80/x83's truth legs
    exclude self-matches, so the approx leg must rank without them).
    """
    from pyspark.sql import Window

    m = len(codebooks)
    if not m or not codebooks[0]:
        # empty-corpus seeding (no codewords) → nothing to rank;
        # schema-stable empty result, kept lazy (pq_encode's rule —
        # caught by the empty-tables tier running x83 end-to-end)
        return queries.select(
            F.col(query_id_col).alias("query_id"),
            F.lit(None).cast("long").alias(id_col),
            F.lit(0.0).alias("approx_d2"),
            F.lit(0).alias("rn"),
        ).where(F.lit(False))
    sub = len(codebooks[0][0])
    qv = V.to_double(query_vec_col)
    luts = queries.select(
        F.col(query_id_col).alias("query_id"),
        *[
            F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.slice(qv, mm * sub + 1, sub),
                            F.array(*[F.lit(x) for x in code]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    for code in codebooks[mm]
                ]
            ).alias(f"__lut{mm}")
            for mm in range(m)
        ],
    )
    d2 = F.element_at(F.col("__lut0"), F.col("code_0") + 1)
    for mm in range(1, m):
        d2 = d2 + F.element_at(
            F.col(f"__lut{mm}"), F.col(f"code_{mm}") + 1
        )
    scored = encoded.crossJoin(F.broadcast(luts)).select(
        "query_id", F.col(id_col), d2.alias("approx_d2")
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy("approx_d2", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def ann_recall_audit(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    approx: DataFrame,
    query_id: str = "query_id",
    truth: DataFrame | None = None,
) -> DataFrame:
    """One-row quality report for an ANN layer: realized recall@k and
    precision@k of `approx` — the (query_id, id) neighbor set any
    approximate method produced (`ivf_topk`, `pq_topk`, hyperplane
    LSH…) — against the EXACT brute-force cosine top-k truth on the
    same queries. Pass ``truth`` (a (query_id, id) frame) to audit
    against a different exact metric — a PQ index ranks by squared
    L2, so its audit supplies the exact-L2 top-k truth; measuring an
    L2 index against cosine truth would conflate quantization loss
    with metric mismatch (x83 vs x80). The x78 contract applied to the vector index family
    (VERDICT r9 ask #4): an IVF/PQ index trades recall for bytes and
    probes, and a pipeline that picks nprobe/codebook size without
    measuring realized recall on ITS vectors is guessing. This is the
    measured number an index ships with.

    Columns: (n_true_pairs, n_approx_pairs, n_hits, recall, precision)
    — counts exact BIGINTs over (query, neighbor) pairs; recall =
    hits/truth and precision = hits/approx are ONE IEEE division each,
    CASE-guarded on empty denominators (no queries → NULL, not 0).
    With both lists of length k, precision@k == recall@k; they diverge
    when the approx layer returns < k (probed cells smaller than k).

    Scale: the truth leg is ONE exact pass over the corpus per query
    batch — run the audit on a SAMPLED query set (hundreds of queries,
    not the corpus), which estimates recall as tightly as a binomial
    proportion needs; the approx leg is whatever the index already
    does. Both result frames are |queries| × k rows — driver-tiny —
    but carry corpus-scale lineage feeding two legs each (hit join +
    count), so both are eagerly checkpointed (tiny frames: memory
    residency is fine here, unlike the corpus-scale pair frames in
    dedup/graph).
    """
    if truth is None:
        truth = brute_force_topk(
            corpus, queries, id_col, vec_col, k, query_id
        )
    truth = truth.select(query_id, id_col).localCheckpoint(eager=True)
    appx = (
        approx.select(query_id, id_col).localCheckpoint(eager=True)
    )
    hits = appx.join(truth, [query_id, id_col])
    nt = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs")
    )
    na = appx.agg(
        F.count(F.lit(1)).cast("long").alias("n_approx_pairs")
    )
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        nt.crossJoin(na)
        .crossJoin(nh)
        .select(
            "n_true_pairs",
            "n_approx_pairs",
            "n_hits",
            F.when(
                F.col("n_true_pairs") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_true_pairs").cast("double"),
            ).alias("recall"),
            F.when(
                F.col("n_approx_pairs") > 0,
                F.col("n_hits").cast("double")
                / F.col("n_approx_pairs").cast("double"),
            ).alias("precision"),
        )
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style clustered embedding dedup)
# ---------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[list[float]],
    threshold: float,
    max_cluster: int | None = None,
) -> DataFrame:
    """(id, cluster int, kept int 0/1): SemDeDup-shaped semantic dedup
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): assign every embedding to its
    nearest centroid, compare pairs ONLY within a cluster, and drop any
    vector that has a lower-id neighbor at cosine ≥ threshold (lowest
    id in each near-dup group survives — a deterministic stand-in for
    the paper's keep-farthest-from-centroid policy).

    Scale shape: the assignment is map-only (centroid literals or the
    Arrow argmin past MAX_PLAN_K), the pair generation shuffles once on
    cluster id and is O(Σ cluster²) instead of O(n²) — exactly the IVF
    trick applied to dedup. With k sized so clusters hold ~√n vectors
    the pair cost is ~n^1.5 spread over k buckets. ``max_cluster``
    opts into the same width guard as the LSH joins (oversized
    clusters contribute no pairs and should be re-clustered finer —
    cap, don't quadratically explode).
    """
    if not cents:
        # no centroids (empty-corpus seeding) → no assignments;
        # schema-stable empty result, kept lazy
        return df.select(
            F.col(id_col),
            F.lit(0).cast("int").alias("cluster"),
            F.lit(1).alias("kept"),
        ).where(F.lit(False))
    tagged = assign_to_centroids(
        df.select(id_col, vec_col), vec_col, cents, "cluster"
    ).select(
        F.col(id_col), "cluster", V.to_double(vec_col).alias("__v")
    ).withColumn("__vn", V.norm(F.col("__v")))
    if max_cluster is not None:
        from ods_to_datalake_spark.operators.dedup import (
            cap_bucket_width,
        )

        pair_src = cap_bucket_width(tagged, max_cluster, keys=("cluster",))
    else:
        pair_src = tagged
    a, b = pair_src.alias("a"), pair_src.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            V.cosine_rounded_prenorm(
                F.col("a.__v"),
                F.col("b.__v"),
                F.col("a.__vn"),
                F.col("b.__vn"),
            )
            >= threshold
        )
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return (
        tagged.join(
            dropped.withColumn("__dropped", F.lit(1)), id_col, "left"
        )
        .select(
            F.col(id_col),
            "cluster",
            F.when(F.col("__dropped").isNotNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ: cell-pruned scan over PQ codes + exact re-rank
# ---------------------------------------------------------------------------


def build_ivf_pq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    path: str,
    dim: int,
    m: int,
    ks: int,
    iters: int = 3,
    pq_iters: int = 3,
    train_rows: int | None = None,
) -> None:
    """IVF-PQ index (Jégou et al. 2011 composed with the IVF layout of
    `build_ivf_index`): the corpus persists hive-partitioned by k-means
    cell WITH its PQ codes alongside the full vector —

    - ``<path>/corpus`` — (id, vec, code_0..code_{m-1}) partitioned by
      ``cluster``;
    - ``<path>/centroids`` — (cluster, centroid), tiny;
    - ``<path>/codebooks`` — (m, code, codeword), m × ks rows.

    The two approximations compose multiplicatively at query time:
    partition pruning reads only nprobe/k of the store, and within the
    probed cells the ADC stage reads ONLY the m code bytes per vector
    (parquet column pruning skips the vec column entirely) — a 100-TB
    embedding store answers a query by scanning a few GB of codes.
    ``train_rows`` bounds the PQ training sample (codebooks converge on
    ~1e5 vectors; never train on the full store). The sample is the
    ``train_rows`` ids that sort first by md5(id) — a deterministic
    pseudo-random slice, invariant to partition layout (an unordered
    `limit` is not), so rebuilding the index from the same corpus
    yields the same codebooks.
    """
    spark = corpus.sparkSession
    train_src = (
        corpus.orderBy(
            F.md5(F.col(id_col).cast("string")), id_col
        ).limit(train_rows)
        if train_rows
        else corpus
    )
    books = pq_train(train_src, vec_col, dim, m, ks, pq_iters)
    assignment = kmeans_assign(corpus, id_col, vec_col, k, iters)
    tagged = corpus.select(id_col, vec_col).join(assignment, id_col)
    encoded = pq_encode(
        tagged,
        id_col,
        vec_col,
        books,
        with_error=False,
        passthrough=(vec_col, "cluster"),
    )
    encoded.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/corpus"
    )
    centroids(
        spark.read.parquet(f"{path}/corpus"), "cluster", vec_col
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    book_rows = [
        (mm, code, books[mm][code])
        for mm in range(m)
        for code in range(ks)
    ]
    spark.createDataFrame(
        book_rows, "m int, code int, codeword array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_pq_codebooks(spark, path: str) -> list[list[list[float]]]:
    """codebooks[m][code] from a `build_ivf_pq_index` layout —
    driver-sized (m × ks × dim/m doubles)."""
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = 1 + max(r["m"] for r in rows)
    ks = 1 + max(r["code"] for r in rows)
    books: list[list[list[float]]] = [[None] * ks for _ in range(m)]
    for r in rows:
        books[r["m"]][r["code"]] = [float(x) for x in r["codeword"]]
    return books


def ivf_pq_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    refine: int = 50,
    query_id: str = "query_id",
) -> DataFrame:
    """Two-stage ANN against a `build_ivf_pq_index` layout:

    1. probe: nprobe cells per query by centroid cosine (broadcast);
    2. ADC shortlist: scan ONLY the code columns of the probed cells
       (partition pruning on cluster + parquet column pruning — the
       full vectors in those cells are never read here), rank by the
       ADC lookup-table distance, keep ``refine`` candidates/query;
    3. exact re-rank: read the full vectors of the probed cells
       semi-joined to the (broadcast, |queries| × refine) shortlist,
       exact rounded cosine, top-k with the brute-force tiebreak.

    With nprobe = k and refine ≥ cell sizes this degrades gracefully to
    the exact `brute_force_topk` answer (tested); shrinking either knob
    trades recall for scan bytes. ADC ranks by L2 while the re-rank
    uses cosine — coherent when the store holds unit-normalized
    vectors, which is how a cosine-ANN corpus should be stored anyway.
    """
    from pyspark.sql import Window

    from ods_to_datalake_spark.operators.agg import top_k_per_group

    books = load_pq_codebooks(spark, index_path)
    m = len(books)
    sub = len(books[0][0])
    cents = spark.read.parquet(f"{index_path}/centroids")
    q = queries.select(F.col(query_id), V.to_double(vec_col).alias("__qv"))
    probes = _probe_clusters(q, cents, "cluster", nprobe, query_id)
    probed = [
        r.cluster for r in probes.select("cluster").distinct().collect()
    ]

    # stage 2: ADC over codes only — vec_col pruned out of the scan
    luts = q.select(
        query_id,
        *[
            F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.slice(F.col("__qv"), mm * sub + 1, sub),
                            F.array(*[F.lit(x) for x in code]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    for code in books[mm]
                ]
            ).alias(f"__lut{mm}")
            for mm in range(m)
        ],
    )
    codes = (
        spark.read.parquet(f"{index_path}/corpus")
        .filter(F.col("cluster").isin(probed))
        .select(id_col, "cluster", *[f"code_{mm}" for mm in range(m)])
    )
    d2 = F.element_at(F.col("__lut0"), F.col("code_0") + 1)
    for mm in range(1, m):
        d2 = d2 + F.element_at(
            F.col(f"__lut{mm}"), F.col(f"code_{mm}") + 1
        )
    adc = (
        codes.join(F.broadcast(probes), on="cluster")
        .join(F.broadcast(luts), on=query_id)
        .filter(F.col(query_id) != F.col(id_col))
        .select(query_id, id_col, d2.alias("approx_d2"))
    )
    w = Window.partitionBy(query_id).orderBy("approx_d2", id_col)
    shortlist = (
        adc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= refine)
        .select(query_id, id_col)
    )

    # stage 3: exact re-rank of the shortlist only
    vecs = (
        spark.read.parquet(f"{index_path}/corpus")
        .filter(F.col("cluster").isin(probed))
        .select(F.col(id_col), V.to_double(vec_col).alias("__cv"))
        .join(F.broadcast(shortlist), on=id_col)
        .withColumn("__cn", V.norm(F.col("__cv")))
    )
    rescored = vecs.join(
        F.broadcast(q.withColumn("__qn", V.norm(F.col("__qv")))),
        on=query_id,
    ).select(
        query_id,
        id_col,
        V.cosine_rounded_prenorm(
            F.col("__qv"),
            F.col("__cv"),
            F.col("__qn"),
            F.col("__cn"),
        ).alias("cosine"),
    )
    return top_k_per_group(
        rescored,
        [query_id],
        [F.col("cosine").desc(), F.col(id_col)],
        k,
    )
