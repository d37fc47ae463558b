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
    )
    c = corpus.select(F.col(id_col), V.to_double(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id) != F.col(id_col))
        .select(
            query_id,
            id_col,
            V.cosine_rounded(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("cosine").desc(), F.col(id_col)],
        k,
    )


def centroids(
    corpus: DataFrame, cluster_col: str, vec_col: str
) -> DataFrame:
    """Per-cluster mean vector, decimal-exact (see module docstring).

    Plan: posexplode → groupBy (cluster, pos) decimal-sum → re-assemble
    ordered arrays. Two shuffles over (n_clusters × dim) rows — trivial
    relative to the corpus.
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
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    cents = centroids(corpus, cluster_col, vec_col)
    q = queries.select(F.col(query_id), V.to_double(vec_col).alias("__qv"))

    probe_scores = q.crossJoin(F.broadcast(cents)).select(
        query_id,
        cluster_col,
        V.cosine_rounded(F.col("__qv"), F.col("centroid")).alias("c_cos"),
    )
    probes = top_k_per_group(
        probe_scores,
        [query_id],
        [F.col("c_cos").desc(), F.col(cluster_col)],
        nprobe,
    ).select(query_id, cluster_col)

    c = corpus.select(
        F.col(id_col), F.col(cluster_col), V.to_double(vec_col).alias("__cv")
    )
    # broadcast the (query, probed-cluster) list; corpus rows join only
    # against queries probing their cluster — corpus is never shuffled.
    scored = (
        c.join(F.broadcast(probes), on=cluster_col)
        .filter(F.col(query_id) != F.col(id_col))
        .join(F.broadcast(q), on=query_id)
        .select(
            query_id,
            id_col,
            V.cosine_rounded(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("cosine").desc(), F.col(id_col)],
        k,
    )
