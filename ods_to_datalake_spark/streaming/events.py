"""Event-stream operators: batch/stream-symmetric windowed aggregation.

Design rule: every streaming transformation here is written against a
plain DataFrame so the SAME function serves `spark.read` (backfill /
oracle-checked batch) and `spark.readStream` (incremental) — the
lambda-architecture killer Structured Streaming enables. Watermarks are
applied only on streaming inputs (`df.isStreaming`).

Scale: windowed aggs shuffle on (window, keys); state store size is
bounded by the watermark horizon. Session windows use the built-in
`session_window` on the stream path; the batch path uses the equivalent
lag+cumsum formulation which also serves as the ANSI-SQL oracle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Back-compat export (nanos-as-long layout); read_event_stream now
# detects the actual physicality from the parquet footer instead.
EVENT_SCHEMA = _event_schema(T.LongType())


def _ts_physicality(sf_dir: str) -> str:
    """'ns' | 'ntz' | 'ltz' per the events.parquet footer — the same
    authoritative signal Catalog uses (a readStream needs an explicit
    schema, so we must know how Spark will surface the column).

    Decides from the PARQUET schema, not the arrow view: arrow reports
    both INT96 and INT64-nanos as `timestamp[ns]`, but Spark surfaces
    INT96 as TimestampType while INT64-nanos is only readable as long
    under the legacy conf — conflating them reads garbage."""
    import json
    import os

    from ods_to_datalake_spark.parquet_meta import (
        first_part_file,
        read_metadata_cached,
    )

    try:
        # file, flat directory, or nested/hive layout — the shared
        # resolver keeps the stream face agreeing with the batch face
        path = first_part_file(os.path.join(sf_dir, "events.parquet"))
        sch = read_metadata_cached(path).schema
    except FileNotFoundError:
        # only the no-parquet-exists case falls back; any other
        # footer-read failure must surface — guessing "ltz" over nanos
        # data would silently read garbage instead of raising clearly
        return "ltz"
    col = next(
        (
            sch.column(i)
            for i in range(len(sch))
            if sch.column(i).name == "ts"
        ),
        None,
    )
    if col is None:
        raise ValueError(f"{path}: no 'ts' column in the parquet schema")
    if col.physical_type == "INT96":
        return "ltz"  # legacy impala/hive timestamps → TimestampType
    # structured logical-type fields, not the debug repr (unstable API)
    lt = json.loads(col.logical_type.to_json())
    if lt.get("timeUnit") == "nanoseconds":
        # INT64 nanos — naive or UTC-adjusted, the legacy conf
        # longifies both; values are ns epochs either way
        return "ns"
    return "ltz" if lt.get("isAdjustedToUTC") else "ntz"


def read_event_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream over the testdata layout, normalized to
    the SAME session-TZ TimestampType the batch face (Catalog.table)
    produces — whatever physicality the lake wrote: TIMESTAMP(NANOS)
    (read as long under the legacy conf, integer-div to micros),
    naive micros/millis (TIMESTAMP_NTZ → cast, legal and wall-clock
    preserving in the UTC session), or instant-adjusted micros
    (passthrough)."""
    import os

    kind = _ts_physicality(sf_dir)
    if kind == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema, fix = EVENT_SCHEMA, F.expr("timestamp_micros(ts div 1000)")
    elif kind == "ntz":
        schema = _event_schema(T.TimestampNTZType())
        fix = F.col("ts").cast("timestamp")
    else:
        schema, fix = _event_schema(T.TimestampType()), F.col("ts")
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        # directory layout: stream the part files directly —
        # pathGlobFilter matches LEAF file names, so filtering the
        # parent dir for "events.parquet" would silently match nothing
        raw = reader.parquet(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(
            sf_dir
        )
    return raw.withColumn("ts", fix)


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) counts and value sums.

    Streaming: watermark bounds state; late rows beyond it are dropped.
    Batch: identical result via the same expression (no watermark).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window_size).alias("win"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Batch sessionization: gaps-and-islands via lag + running sum —
    one shuffle on user_id, windows reuse the partitioning. This exact
    formulation is the SQL oracle for the streaming `session_window`
    variant below."""
    gap_sec = {"30 minutes": 1800}.get(gap)
    if gap_sec is None:
        raise ValueError(f"unsupported gap {gap!r}")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp, not cast-to-long: Spark 4 forbids TIMESTAMP_NTZ →
    # BIGINT casts, and unix_timestamp works on every timestamp flavor
    # with identical (floor-to-second) semantics.
    epoch = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731
    marked = events.withColumn(
        "__new_session",
        F.when(
            epoch("ts") - F.lag(epoch("ts")).over(w) > gap_sec,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_seq",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )
    return marked.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization with the built-in session_window (state
    merges windows closer than `gap`; watermark finalizes sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def purchase_attribution(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's clicks within the preceding `attribution_window`.

    Streaming: both sides watermarked; the time-bound condition lets the
    state store evict rows older than watermark + window, so state is
    bounded. Batch: the identical join expression (no watermark needed).
    One shuffle per side on user_id.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("p_user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def stream_to_lakehouse(
    stream_df: DataFrame,
    path: str,
    date_value: str,
    checkpoint: str,
    partition_col: str = "transactiondate_index",
) -> "StreamingQuery":
    """Streaming → lakehouse sink: each micro-batch appends a
    run-indexed partition `<date>_<batch_id>` via foreachBatch — the
    same layout the batch writers produce (O5), so downstream readers
    (`read_latest_run`, partition pruning) are agnostic to whether data
    arrived by batch or by stream. Checkpointing makes delivery
    exactly-once per batch id (a replayed batch rewrites the same
    partition value, not a new one).
    """
    from ods_to_datalake_spark.sources.writer import write_run_indexed

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_run_indexed(
            batch_df,
            path,
            date_value,
            int(batch_id),
            partition_col=partition_col,
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def running_user_stats(
    events: DataFrame, timeout_mins: int | None = None
) -> DataFrame:
    """Custom stateful operator: per-user running counters via
    applyInPandasWithState — the escape hatch for semantics windowed
    aggs can't express (cross-batch custom state machines).

    Arrow-batched; state is one small tuple per user. Pass
    ``timeout_mins`` in long-running deployments to evict idle users and
    bound state. NB: with a processing-time timeout the query schedules
    timer batches forever, so `processAllAvailable()` never drains —
    keep it None for finite/backfill runs and tests.
    """
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_mins is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if timeout_mins is not None and state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_mins is not None:
            state.setTimeoutDuration(timeout_mins * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout_conf,
    )


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event delivery over an at-least-once source: drop
    duplicate events by key.

    Streaming: `dropDuplicatesWithinWatermark` — the state store keeps
    each key only within the watermark horizon, so state is bounded by
    (arrival rate × horizon) instead of growing with the whole stream;
    a replayed event whose twin has already been evicted is older than
    the watermark and would be dropped by it anyway. At 100 TB/day this
    is the difference between a fixed-size state store and an
    unbounded one. Batch face: plain `dropDuplicates` (which row of a
    duplicate group survives is nondeterministic in both faces — only
    use with keys whose payload is identical across duplicates, the
    redelivery case).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def daily_count_stats(events: DataFrame) -> DataFrame:
    """Per-event-type EXACT integer sums over daily counts — ``nn``
    (days observed), ``s1`` (Σn), ``s2`` (Σn²) — the frozen baseline
    for anomaly scoring. Integer sums rather than mean/std so the
    artifact composes losslessly and the float ops happen once, at
    scoring time (see `score_daily_counts`)."""
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )


def build_daily_baseline(events: DataFrame, path: str) -> None:
    """Freeze the per-type daily-count baseline as a lake artifact —
    the same train-offline/score-on-ingest pattern as `build_lm` /
    `build_dsir`: the anomaly bar must not drift with each batch."""
    daily_count_stats(events).write.mode("overwrite").parquet(path)


def score_daily_counts(
    counts: DataFrame, stats: DataFrame, z_threshold: float = 2.0
) -> DataFrame:
    """Sample z-score of each (event_type, day) count against the
    baseline stats. Variance from exact integer sums (nn·s2 − s1²);
    the only float ops are two divides, a subtract and an IEEE
    correctly-rounded sqrt — bit-stable cross-engine (e10's oracle
    pins this). Single-day / zero-variance types CASE-guard to NULL z
    before any division. The stats side is one row per event type —
    broadcast, so the counts side never shuffles for the join."""
    j = counts.join(F.broadcast(stats), "event_type")
    var_num = F.col("nn") * F.col("s2") - F.col("s1") * F.col("s1")
    mean = F.col("s1").cast("double") / F.col("nn")
    std = F.when(
        (F.col("nn") >= 2) & (var_num > 0),
        F.sqrt(
            var_num.cast("double")
            / (F.col("nn") * (F.col("nn") - 1)).cast("double")
        ),
    )
    z = F.when(
        std.isNotNull(), (F.col("n").cast("double") - mean) / std
    )
    return j.select(
        "event_type",
        "day",
        "n",
        z.alias("z"),
        F.when(std.isNotNull() & (F.abs(z) > z_threshold), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_anomaly"),
    )


def daily_anomaly_batch(
    events: DataFrame, stats: DataFrame | None = None
) -> DataFrame:
    """Batch face (e10): score each day against the corpus's own
    stats, or against a frozen baseline when ``stats`` is given."""
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return score_daily_counts(
        daily, stats if stats is not None else daily_count_stats(events)
    )


def daily_anomaly_stream(
    stream: DataFrame,
    baseline_path: str,
    watermark: str = "1 day",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Streaming face: watermarked 1-day tumbling counts scored
    against the FROZEN baseline at ``baseline_path`` — `window('1
    day').start` equals `date_trunc('day')` under the UTC session
    timezone, so stream and batch faces key days identically. The
    baseline join is broadcast per micro-batch; state is bounded by
    the watermark."""
    spark = stream.sparkSession
    counts = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "event_type", F.col("win.start").alias("day"), "n"
        )
    )
    return score_daily_counts(
        counts, spark.read.parquet(baseline_path), z_threshold
    )
