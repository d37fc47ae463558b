"""Pipeline observability: in-flight metrics with zero extra scans.

The reference pipelines log row counts by re-counting DataFrames — a
second full scan per metric (the pattern in its notebook logs). At
100 TB a `df.count()` for logging costs as much as the job itself.
`DataFrame.observe` attaches aggregate metrics to the SAME action that
materializes the data: the write both writes and measures, one pass.

Use from the orchestrator's job wrappers: attach before the sink, read
the Observation after the action returns, ship to the job-control /
audit table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_ingest_metrics(
    df: DataFrame,
    null_cols: list[str] | None = None,
    name: str = "ingest_metrics",
) -> tuple[DataFrame, Observation]:
    """Attach row-count and per-column null-count metrics.

    Returns (observed_df, observation). Run ANY action on the returned
    DataFrame (write, count, foreachBatch), then `observation.get`
    yields `{"n_rows": ..., "null_<col>": ...}` — computed during that
    action, not by a second scan. Complements x17_profile_table (a
    standalone profiling job) for the in-flight case.
    """
    obs = Observation(name)
    cols = null_cols if null_cols is not None else df.columns
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.isnull(c).cast("long")).alias(f"null_{c}") for c in cols
    ]
    return df.observe(obs, *metrics), obs
