"""Cached parquet footer-schema reads.

The timestamp-physicality normalization (Catalog._fix_timestamps,
streaming.events._ts_physicality) needs the parquet footer's view of
each timestamp column — per QUERY that is one tiny metadata read, but
the engine resolves the same tables over and over (a suite run touches
`events.parquet` dozens of times, a real deployment thousands), and at
lake scale a footer read is a remote round-trip. Cache the arrow schema
per (realpath, mtime_ns, size): a regenerated file (the driver rewrites
testdata between rounds, producers rewrite partitions) changes the stat
signature and misses the cache, so the answer is always current without
ever re-reading an unchanged footer.

Only successful reads are cached — errors must stay visible on every
call (a transient storage failure should not pin a wrong answer).

Granularity caveat: a file rewritten IN-PROCESS with identical size
within one mtime tick would serve the old schema. mtime_ns is
nanosecond-resolution on this platform, cross-round regenerations run
in fresh processes (the cache is per-process), and a physicality flip
changes encoded sizes — so the hole is theoretical; noted for
completeness.
"""

from __future__ import annotations

import os

_SCHEMA_CACHE: dict[tuple[str, str, int, int], "object"] = {}


def _cached(kind: str, path: str, loader):
    st = os.stat(path)
    key = (kind, os.path.realpath(path), st.st_mtime_ns, st.st_size)
    value = _SCHEMA_CACHE.get(key)
    if value is None:
        value = loader(path)
        _SCHEMA_CACHE[key] = value
    return value


def read_schema_cached(path: str):
    """`pyarrow.parquet.read_schema(path)`, cached on the file's stat
    signature. Raises exactly what read_schema/os.stat raise."""
    import pyarrow.parquet as pq

    return _cached("schema", path, pq.read_schema)


def first_part_file(path: str) -> str:
    """Resolve a parquet dataset path — a single file, a flat
    directory, or a nested/hive-partitioned directory — to ONE part
    file whose footer is authoritative for the dataset's schema. The
    shared resolver for every footer-sniffing site (batch and stream
    faces must agree on physicality, so they must resolve the same
    way). Raises FileNotFoundError when no parquet file exists — the
    only condition callers may treat as a silent fallback."""
    import glob

    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        parts = sorted(
            glob.glob(os.path.join(path, "*.parquet"))
        ) or sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if parts:
            return parts[0]
    raise FileNotFoundError(path)


def read_metadata_cached(path: str):
    """`pyarrow.parquet.read_metadata(path)`, cached the same way. The
    parquet-level schema (vs the arrow view) is needed wherever the
    PHYSICAL type matters: arrow reports both INT96 and INT64-nanos
    timestamps as `timestamp[ns]`, but engines read them completely
    differently."""
    import pyarrow.parquet as pq

    return _cached("metadata", path, pq.read_metadata)
