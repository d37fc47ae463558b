"""Deterministic corpus sampling (training-data curation).

Random `df.sample()` is reproducible only per partitioning (the seed is
applied per-partition), which breaks the reproducibility contract a
training-data pipeline needs: the SAME document set must come out
regardless of cluster size, file splits, or engine. These operators
sample by content hash instead — a pure function of the row key — so
results are stable across runs, partitionings, and engines (md5 is the
one hash DuckDB shares with Spark; see plans/suite.py determinism
rules).

Scale: hash sampling is a stateless map — no shuffle, fully pushed into
the scan stage; the rate lookup is a literal CASE decode (no join).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(id_col: str | Column, buckets: int = HASH_BUCKETS) -> Column:
    """Stable per-row bucket in [0, buckets): first 8 md5 hex chars of
    the stringified key (32 bits — safely inside int64, cf. the 14-hex
    rule for the MinHash digest halves)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def deterministic_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """(id, shard, shard_pos): reproducible global training order — the
    distributed equivalent of "shuffle the dataset once, then shard
    it", as a pure function of the row keys. Shard membership is the
    content-stable `hash_bucket`; the position within a shard orders
    by (md5(id), id) — a deterministic pseudo-random permutation, so
    feeding shards round-robin replays the identical example order
    across runs, partitionings, cluster sizes, and engines (rand()
    and df.sample() are only seed-stable per partitioning).

    Scale: one shuffle on the shard key; the per-shard row_number
    window parallelizes across shards — pick n_shards ≥ executor
    cores (thousands at 100 TB) and every reducer partition stays
    bounded at corpus/n_shards. There is deliberately NO global
    row_number (a single-partition window) anywhere.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy("shard").orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        df.select(F.col(id_col))
        .withColumn("shard", hash_bucket(id_col, n_shards))
        .withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    keep_per_10k: Mapping[str, int],
    default_per_10k: int = HASH_BUCKETS,
) -> DataFrame:
    """Downsample over-represented strata to integer per-10k rates.

    `keep_per_10k` maps stratum value → rows kept per 10 000 (e.g.
    {"web": 3000} keeps 30%). Integer thresholds avoid float-rate
    boundary ambiguity across engines. Rows whose stratum is absent
    from the map keep `default_per_10k`.
    """
    rate: Column = F.lit(default_per_10k)
    for value, keep in keep_per_10k.items():
        rate = F.when(F.col(strata_col) == value, F.lit(keep)).otherwise(
            rate
        )
    return df.filter(hash_bucket(id_col) < rate)
