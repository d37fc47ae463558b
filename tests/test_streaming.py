"""Structured Streaming tests: the stream faces must agree with their
batch faces (which are oracle-checked in the parity suite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.streaming.events import (
    read_event_stream,
    running_user_stats,
    sessionize_stream,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_tumbling_stream_matches_batch(spark):
    stream = read_event_stream(spark, SF)
    assert stream.isStreaming
    _run_to_memory(tumbling_counts(stream), "tumbling_mem", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("tumbling_mem").collect()
    }
    batch = tumbling_counts(load_testdata(spark, SF).table("events"))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want


def test_session_stream_runs(spark):
    stream = read_event_stream(spark, SF)
    _run_to_memory(
        sessionize_stream(stream, "30 minutes"), "sessions_mem", "append"
    )
    rows = spark.table("sessions_mem").collect()
    assert len(rows) > 0
    assert all(r.session_end >= r.session_start for r in rows)


def test_stateful_user_stats(spark):
    stream = read_event_stream(spark, SF)
    _run_to_memory(running_user_stats(stream), "userstats_mem", "update")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.table("userstats_mem").collect()
    }
    batch = (
        load_testdata(spark, SF)
        .table("events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
    )
    want = {r.user_id: (r.n, round(r.t, 2)) for r in batch.collect()}
    assert got == want


def test_stream_to_lakehouse_run_indexed(spark, tmp_path):
    """Stream → foreachBatch → run-indexed parquet: same layout as the
    batch writer, one partition per micro-batch, exactly-once."""
    from ods_to_datalake_spark.sources.reader import list_run_indexes
    from ods_to_datalake_spark.streaming.events import stream_to_lakehouse

    path = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, SF)
    q = stream_to_lakehouse(stream, path, "20260123", ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    runs = list_run_indexes(path)
    assert runs and all(d == "2026-01-23" for d, _ in runs)
    back = spark.read.parquet(path)
    src_count = load_testdata(spark, SF).table("events").count()
    assert back.count() == src_count
    assert "transactiondate_index" in back.columns


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream interval join produces the same pairs
    as the batch face (oracle-checked in the parity suite)."""
    from ods_to_datalake_spark.streaming.events import purchase_attribution

    stream = read_event_stream(spark, SF)
    _run_to_memory(
        purchase_attribution(stream), "attrib_mem", "append"
    )
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.table("attrib_mem").collect()
    }
    batch = purchase_attribution(
        load_testdata(spark, SF).table("events")
    )
    want = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_incremental_multibatch_matches_batch(spark, tmp_path):
    """True incremental processing: events split across 5 files, one
    file per trigger → 5 micro-batches; the final windowed state must
    equal the single-shot batch result."""
    src_dir = str(tmp_path / "evsrc")
    cat = load_testdata(spark, SF)
    events = cat.table("events")
    events.repartition(5).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = tumbling_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_mem")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 5  # genuinely incremental, not one big batch

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("inc_mem").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_counts(events).collect()
    }
    assert got == want


def test_stream_dedup_bounded_state(spark, tmp_path):
    """At-least-once replay: the same event file delivered twice across
    micro-batches must come out exactly once downstream
    (dropDuplicatesWithinWatermark — state bounded by the horizon)."""
    from ods_to_datalake_spark.streaming.events import dedup_events

    src_dir = str(tmp_path / "dupsrc")
    events = load_testdata(spark, SF).table("events")
    events.coalesce(1).write.mode("append").parquet(src_dir)
    events.coalesce(1).write.mode("append").parquet(src_dir)  # replay

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    _run_to_memory(
        dedup_events(stream).select("event_id"), "dedup_mem", "append"
    )
    got = [r.event_id for r in spark.table("dedup_mem").collect()]
    want = {r.event_id for r in dedup_events(events).collect()}
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


@pytest.mark.parametrize("flavor", ["ns", "ns_ltz", "us_ntz", "us_ltz", "int96"])
def test_read_event_stream_physicality_matrix(spark, tmp_path, flavor):
    """The stream face must agree with the batch face for EVERY parquet
    timestamp flavor a producer might write (the round-3 regeneration
    flipped nanos→micros-NTZ and broke the pinned stream schema; the
    schema is now footer-derived)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = load_testdata(spark, SF).table("events").limit(200)
    pdf = src.toPandas()
    typ = {
        "ns": pa.timestamp("ns"),
        "ns_ltz": pa.timestamp("ns", tz="UTC"),  # adjusted nanos: longified too
        "us_ntz": pa.timestamp("us"),
        "us_ltz": pa.timestamp("us", tz="UTC"),
        "int96": pa.timestamp("ns"),  # physical INT96 (Spark writer default)
    }[flavor]
    table = pa.Table.from_pandas(pdf)
    idx = table.schema.get_field_index("ts")
    table = table.set_column(
        idx, pa.field("ts", typ), table.column("ts").cast(typ)
    )
    pq.write_table(
        table,
        str(tmp_path / "events.parquet"),
        version="2.6",
        coerce_timestamps=None,
        use_deprecated_int96_timestamps=(flavor == "int96"),
    )

    stream = read_event_stream(spark, str(tmp_path))
    assert dict(stream.dtypes)["ts"] == "timestamp", flavor
    _run_to_memory(
        tumbling_counts(stream), f"phys_{flavor}_mem", "complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(f"phys_{flavor}_mem").collect()
    }
    batch = tumbling_counts(
        load_testdata(spark, str(tmp_path)).table("events")
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want and len(want) > 0, flavor


def test_streaming_ingest_admission_matches_batch(spark, tmp_path):
    """Streaming incremental-ingestion tier 1: the admitted CONTENT set
    from the stream face (in-stream dedup + stream-static anti-join
    against the seen corpus's hash set) equals the batch face computed
    on the same split."""
    from ods_to_datalake_spark.streaming.ingest import (
        admit_new_stream,
        seen_content_hashes,
    )

    docs = load_testdata(spark, SF).table("documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    src = str(tmp_path / "newdocs")
    new.repartition(3).write.parquet(src)

    hashes = seen_content_hashes(seen)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    admitted = admit_new_stream(stream, hashes)
    q = (
        admitted.writeStream.format("memory")
        .queryName("ingest_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.h
        for r in spark.table("ingest_mem")
        .select(F.md5(F.coalesce("text", F.lit(""))).alias("h"))
        .collect()
    }
    want = {
        r.h
        for r in admit_new_stream(new, hashes)
        .select(F.md5(F.coalesce("text", F.lit(""))).alias("h"))
        .collect()
    }
    assert got == want and len(want) > 0
    # nothing admitted twice (in-stream dedup held across micro-batches)
    n_rows = spark.table("ingest_mem").count()
    assert n_rows == len(got)


def test_ts_physicality_errors_propagate(tmp_path):
    """Only a MISSING events.parquet falls back to 'ltz' (ADVICE r4);
    a present-but-unreadable footer must raise, not silently guess a
    physicality that could misread nanos-as-long data."""
    from ods_to_datalake_spark.streaming.events import _ts_physicality

    assert _ts_physicality(str(tmp_path)) == "ltz"  # no file → fallback
    (tmp_path / "events.parquet").write_bytes(b"not a parquet footer")
    with pytest.raises(Exception) as exc:
        _ts_physicality(str(tmp_path))
    assert not isinstance(exc.value, FileNotFoundError)


def test_streaming_ingest_near_dup_tier_end_to_end(spark, tmp_path):
    """Both admission tiers end-to-end (VERDICT r4 item 8): tier 1
    drops an exact duplicate of the seen corpus in-stream; tier 2's
    foreachBatch LSH drops a near-duplicate of the seen corpus AND —
    because each admitted batch appends its bands to the state table —
    a near-duplicate of a document admitted in an EARLIER micro-batch.
    Texts are fixed so their LSH band collisions are deterministic
    (md5-based hash family, no RNG)."""
    import os
    import time

    from ods_to_datalake_spark.streaming.ingest import (
        ingest_with_near_dup_tier,
    )

    base_a = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    base_n = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    seen = spark.createDataFrame(
        [(1, base_a)], "doc_id long, text string"
    )
    batch0 = [
        (10, base_a),                              # exact dup → tier 1
        (11, base_a.replace("upsilon", "phi")),    # near-dup of seen → tier 2
        (12, base_n),                              # novel → admitted
    ]
    batch1 = [
        (13, base_n.replace("eighteen", "nineteen")),  # near-dup of 12 → tier 2 (cross-batch)
        (14, "completely different unrelated content about weather patterns today"),  # novel
    ]
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate([batch0, batch1]):
        f = str(src / f"part-{i}.parquet")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "admitted")
    q = ingest_with_near_dup_tier(
        stream,
        seen,
        out_dir,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    }
    assert admitted == {12, 14}

    # the state table grew: seed bands + admitted docs' bands
    state_ids = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "state")).collect()
    }
    assert state_ids == {1, 12, 14}


def test_streaming_embedding_admission_end_to_end(spark, tmp_path):
    """Embedding face of streaming admission: an exact duplicate of the
    seen corpus is rejected (cosine 1.0 in the same bucket), a novel
    vector is admitted, and a near-duplicate of a vector admitted in an
    EARLIER micro-batch is rejected through the growing bucket-table
    state. Hyperplanes are md5-derived, so bucketing is deterministic."""
    import os
    import time

    from ods_to_datalake_spark.streaming.ingest import (
        ingest_embeddings_stream,
    )

    a = [1.0, 0.5, -0.25, 0.75]
    b = [-1.0, -0.5, 0.25, -0.75]          # cosine(a, b) = -1 → novel
    b_near = [-1.0, -0.5, 0.25, -0.74]     # ~b → rejected cross-batch
    c = [0.1, -0.9, 0.8, 0.2]              # unrelated direction → novel
    seen = spark.createDataFrame(
        [(1, a)], "vec_id long, embedding array<double>"
    )
    batches = [[(10, a), (11, b)], [(12, b_near), (13, c)]]
    src = tmp_path / "vecstream"
    src.mkdir()
    for i, rows in enumerate(batches):
        f = str(src / f"part-{i}.parquet")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "admitted_vecs")
    q = ingest_embeddings_stream(
        stream,
        seen,
        out_dir,
        str(tmp_path / "vec_state"),
        str(tmp_path / "vec_ckpt"),
        dim=4,
        threshold=0.9,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r.vec_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {11, 13}

    state_ids = {
        r.vec_id
        for r in spark.read.parquet(str(tmp_path / "vec_state")).collect()
    }
    assert state_ids == {1, 11, 13}


def test_streaming_embedding_admission_cold_start(spark, tmp_path):
    """Empty seen corpus: the first batch's vectors are all novel and
    admitted; a near-dup arriving in the NEXT batch is still rejected
    against the state grown from batch one."""
    import os
    import time

    from ods_to_datalake_spark.streaming.ingest import (
        ingest_embeddings_stream,
    )

    b = [-1.0, -0.5, 0.25, -0.75]
    seen = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    batches = [[(11, b)], [(12, [-1.0, -0.5, 0.25, -0.74])]]
    src = tmp_path / "coldvecs"
    src.mkdir()
    for i, rows in enumerate(batches):
        f = str(src / f"part-{i}.parquet")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "cold_admitted")
    q = ingest_embeddings_stream(
        stream,
        seen,
        out_dir,
        str(tmp_path / "cold_state"),
        str(tmp_path / "cold_ckpt"),
        dim=4,
        threshold=0.9,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r.vec_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {11}


def test_ts_physicality_directory_layout(spark, tmp_path):
    """events.parquet as a DIRECTORY of part files (writer output /
    amplified testdata): the physicality comes from a part file's
    footer — not a blind fallback, not an error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ods_to_datalake_spark.streaming.events import _ts_physicality

    d = tmp_path / "events.parquet"
    d.mkdir()
    table = pa.table(
        {"ts": pa.array([1, 2], type=pa.timestamp("ns"))}
    )
    pq.write_table(table, str(d / "part-000.parquet"))
    assert _ts_physicality(str(tmp_path)) == "ns"

    empty = tmp_path / "empty_case"
    (empty / "events.parquet").mkdir(parents=True)
    assert _ts_physicality(str(empty)) == "ltz"


def test_streaming_embedding_admission_restart_keeps_state(spark, tmp_path):
    """A checkpoint restart must RESUME with the grown state, not wipe
    it back to the seed: batch 0 admits a novel vector in run one; run
    two (same checkpoint + state dir) sees a near-dup of it in batch 1
    and rejects it — which only happens if the state survived."""
    import os
    import time

    from ods_to_datalake_spark.streaming.ingest import (
        ingest_embeddings_stream,
    )

    b = [-1.0, -0.5, 0.25, -0.75]
    seen = spark.createDataFrame(
        [(1, [1.0, 0.5, -0.25, 0.75])],
        "vec_id long, embedding array<double>",
    )
    src = tmp_path / "restartvecs"
    src.mkdir()

    def write_batch(i, rows):
        f = str(src / f"part-{i}.parquet")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))

    out_dir = str(tmp_path / "restart_admitted")
    args = dict(
        out_dir=out_dir,
        state_dir=str(tmp_path / "restart_state"),
        checkpoint=str(tmp_path / "restart_ckpt"),
        dim=4,
        threshold=0.9,
    )

    def run_once():
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(src / "*"))
        )
        q = ingest_embeddings_stream(stream, seen, **args)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_batch(0, [(11, b)])
    run_once()
    assert {
        r.vec_id for r in spark.read.parquet(out_dir).collect()
    } == {11}

    write_batch(1, [(12, [-1.0, -0.5, 0.25, -0.74])])  # near-dup of 11
    run_once()
    admitted = {r.vec_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {11}, "restart wiped the grown state"


def test_read_event_stream_directory_layout(spark, tmp_path):
    """events.parquet written as a DIRECTORY of part files must stream
    its rows (pathGlobFilter matches leaf names, so the single-file
    option would silently match nothing) and agree with the batch face."""
    src = load_testdata(spark, SF).table("events").limit(300)
    d = str(tmp_path / "events.parquet")
    src.repartition(3).write.parquet(d)

    stream = read_event_stream(spark, str(tmp_path))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    _run_to_memory(tumbling_counts(stream), "dirlayout_mem", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("dirlayout_mem").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling_counts(
            load_testdata(spark, str(tmp_path)).table("events")
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_ingest_text_restart_keeps_state(spark, tmp_path):
    """Text-face mirror of the embedding restart test: run one admits a
    novel doc; run two over the same checkpoint sees a near-dup of it
    and rejects it — proof the band-table state survived the restart."""
    import os
    import time

    from ods_to_datalake_spark.streaming.ingest import (
        ingest_with_near_dup_tier,
    )

    base_n = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    seen = spark.createDataFrame(
        [(1, "completely different seed corpus text about weather")],
        "doc_id long, text string",
    )
    src = tmp_path / "restartdocs"
    src.mkdir()

    def write_batch(i, rows):
        f = str(src / f"part-{i}.parquet")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f)
        t = time.time() + i * 10
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))

    out_dir = str(tmp_path / "restart_docs_admitted")
    args = dict(
        out_dir=out_dir,
        state_dir=str(tmp_path / "restart_docs_state"),
        checkpoint=str(tmp_path / "restart_docs_ckpt"),
    )

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(src / "*"))
        )
        q = ingest_with_near_dup_tier(stream, seen, **args)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_batch(0, [(12, base_n)])
    run_once()
    assert {
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    } == {12}

    write_batch(1, [(13, base_n.replace("eighteen", "nineteen"))])
    run_once()
    admitted = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {12}, "restart wiped the grown band state"


def test_ts_physicality_nested_directory(spark, tmp_path):
    """A hive-partitioned events.parquet directory (part files nested
    under partition dirs) still resolves its physicality from a part
    file's footer — never a blind fallback over nanos data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ods_to_datalake_spark.streaming.events import _ts_physicality

    d = tmp_path / "events.parquet" / "date=2024-01-01"
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ns"))}),
        str(d / "part-000.parquet"),
    )
    assert _ts_physicality(str(tmp_path)) == "ns"


def test_streaming_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch redelivers the same batch_id after a crash between
    the sink's two writes (parquet has no atomic multi-dir commit).
    The per-batch ``ingest_batch=<id>`` overwrite layout must make the
    replay a no-op: identical out/state contents, and the replayed
    batch must NOT see its own previously-committed state (else it
    would reject every one of its own docs as their own near-dups) —
    VERDICT r5 item 3."""
    from ods_to_datalake_spark.operators.dedup import lsh_banded
    from ods_to_datalake_spark.streaming.ingest import (
        _near_dup_sink,
        _seed_state_if_absent,
    )

    def banded(df):
        return lsh_banded(df, "doc_id", "text", 3, 8, 4, 2)

    base_a = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    base_n = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    seen = spark.createDataFrame([(1, base_a)], "doc_id long, text string")
    state_dir = str(tmp_path / "replay_state")
    out_dir = str(tmp_path / "replay_out")
    _seed_state_if_absent(banded(seen), state_dir)
    sink = _near_dup_sink(banded, out_dir, state_dir, "doc_id")

    batch0 = spark.createDataFrame(
        [
            (11, base_a.replace("upsilon", "phi")),  # near-dup of seen
            (12, base_n),  # novel → admitted
        ],
        "doc_id long, text string",
    )
    sink(batch0, 0)

    def snapshot():
        out = sorted(
            r.doc_id for r in spark.read.parquet(out_dir).collect()
        )
        state = sorted(
            (r.doc_id, r.band_idx, r.band_key)
            for r in spark.read.parquet(state_dir).collect()
        )
        return out, state

    first = snapshot()
    assert first[0] == [12]
    # crash-replay: the SAME batch_id redelivered with the same rows
    sink(batch0, 0)
    assert snapshot() == first, "replay duplicated rows or flipped a decision"
    # the grown state still rejects a later near-dup of the admitted doc
    batch1 = spark.createDataFrame(
        [(13, base_n.replace("eighteen", "nineteen"))],
        "doc_id long, text string",
    )
    sink(batch1, 1)
    out_ids, state_ids = snapshot()
    assert out_ids == [12]
    assert {s[0] for s in state_ids} == {1, 12}


def test_ingest_state_partial_seed_self_heals(spark, tmp_path):
    """A state dir left behind by a CRASHED seed write (files but no
    _SUCCESS marker) must not disable seeding: the next run reseeds
    with overwrite and the stream admits/rejects correctly."""
    import os
    import time

    from ods_to_datalake_spark.streaming.ingest import (
        ingest_embeddings_stream,
    )

    state_dir = tmp_path / "healed_state"
    seed_part = state_dir / "ingest_batch=seed"
    seed_part.mkdir(parents=True)
    # simulate a torn seed write: stray part file, no _SUCCESS
    (seed_part / "part-junk.parquet").write_bytes(b"torn")

    a = [1.0, 0.5, -0.25, 0.75]
    seen = spark.createDataFrame(
        [(1, a)], "vec_id long, embedding array<double>"
    )
    src = tmp_path / "healvecs"
    src.mkdir()
    f = str(src / "part-0.parquet")
    spark.createDataFrame(
        [(10, a), (11, [-1.0, -0.5, 0.25, -0.75])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(f)
    t = time.time()
    for root, _, files in os.walk(f):
        for name in files:
            os.utime(os.path.join(root, name), (t, t))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "healed_admitted")
    q = ingest_embeddings_stream(
        stream,
        seen,
        out_dir,
        str(state_dir),
        str(tmp_path / "healed_ckpt"),
        dim=4,
        threshold=0.9,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r.vec_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {11}  # exact dup of seen rejected → state seeded


def test_streaming_quality_gate_end_to_end(spark, tmp_path):
    """Full streaming curation face: tier-1 exact dup and tier-2
    near-dup reject in-stream/per-batch, the token gate drops a
    too-short doc, the frozen-LM band drops an out-of-distribution doc
    (every bigram unseen → max cross-entropy = ln V), and every
    rejected row lands in the quarantine dir with its reason."""
    import math

    from ods_to_datalake_spark.operators.lm import build_lm
    from ods_to_datalake_spark.streaming.ingest import (
        ingest_with_quality_gate,
    )

    base_a = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    in_dist = (
        "alpha beta gamma delta epsilon zeta beta gamma delta theta "
        "alpha beta gamma epsilon zeta eta theta beta gamma delta"
    )
    seen = spark.createDataFrame(
        [(1, base_a), (2, in_dist)], "doc_id long, text string"
    )
    lm_path = str(tmp_path / "lm")
    build_lm(seen, "text", lm_path)
    # the LM band: anything scoring above ~90% of the unseen-text
    # ceiling ln(V) is out-of-distribution
    v = spark.read.parquet(f"{lm_path}/vocab").collect()[0]["v"]
    band = (0.0, 0.9 * math.log(v))

    batch = [
        (10, base_a),                       # exact dup → tier 1
        (11, base_a.replace("upsilon", "phi")),  # near-dup → tier 2
        (12, "too short"),                  # < min_tokens
        (13, "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh"),  # OOD → lm_xent
        # in-distribution novel: seen-bigram loop, but its 3-shingle
        # set is distinct enough that no LSH band collides (measured)
        (14, "alpha beta gamma alpha beta gamma alpha beta gamma "
             "alpha beta gamma"),
    ]
    src = tmp_path / "qsrc"
    src.mkdir()
    spark.createDataFrame(
        batch, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "q_admitted")
    rej_dir = str(tmp_path / "q_rejected")
    q = ingest_with_quality_gate(
        stream,
        seen,
        lm_path,
        out_dir,
        str(tmp_path / "q_state"),
        str(tmp_path / "q_ckpt"),
        min_tokens=5,
        xent_band=band,
        reject_dir=rej_dir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {14}
    rejected = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(rej_dir).collect()
    }
    # doc 10 never reaches the batch tiers (tier 1 is in-stream)
    assert rejected == {
        11: "near_dup", 12: "min_tokens", 13: "lm_xent"
    }


def test_streaming_dsir_gate_rejects_off_target(spark, tmp_path):
    """The DSIR tier of the streaming quality face: a frozen
    `build_dsir` artifact gates each micro-batch — target-like docs
    admit, source-like docs land in quarantine with reason 'dsir',
    and an unscorable (< 2 token) doc is rejected rather than passed
    on a sentinel score."""
    from ods_to_datalake_spark.operators.lm import build_dsir
    from ods_to_datalake_spark.streaming.ingest import (
        ingest_with_quality_gate,
    )

    target = spark.createDataFrame(
        [(100, "delta epsilon zeta eta theta iota kappa lamda")],
        "doc_id long, text string",
    )
    source = spark.createDataFrame(
        [(200, "qq ww ee rr tt yy uu ii oo pp")],
        "doc_id long, text string",
    )
    dsir_path = str(tmp_path / "dsir")
    build_dsir(target, source, "text", dsir_path)

    seen = spark.createDataFrame(
        [(1, "completely unrelated seen doc about spark engines")],
        "doc_id long, text string",
    )
    batch = [
        (10, "delta epsilon zeta eta theta kappa"),  # target-like
        (11, "qq ww ee rr tt uu ii oo"),             # source-like
        (12, "solo"),                                # unscorable
    ]
    src = tmp_path / "dsrc"
    src.mkdir()
    spark.createDataFrame(
        batch, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "d_admitted")
    rej_dir = str(tmp_path / "d_rejected")
    q = ingest_with_quality_gate(
        stream,
        seen,
        str(tmp_path / "unused_lm"),  # xent_band None → LM never read
        out_dir,
        str(tmp_path / "d_state"),
        str(tmp_path / "d_ckpt"),
        dsir_path=dsir_path,
        dsir_min=0.0,
        reject_dir=rej_dir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert admitted == {10}
    rejected = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(rej_dir).collect()
    }
    assert rejected == {11: "dsir", 12: "dsir"}


def test_streaming_rule_gates_reject_and_rewrite(spark, tmp_path):
    """Tier-0 rule gates on the streaming face: a C4-failing doc is
    quarantined with reason 'c4', a Gopher-failing doc with 'gopher'
    (rule reasons take precedence over near_dup, mirroring the batch
    tier order), and an admitted doc lands with its text REWRITTEN to
    the C4-kept lines."""
    from ods_to_datalake_spark.streaming.ingest import (
        ingest_with_quality_gate,
    )

    good = (
        "The quick brown fox jumps over the lazy dog today and it "
        "was glad to be here with all of that in mind. "
        "Every sentence in this document ends with a terminal mark "
        "and it has more than five words in every line. "
        "The corpus needs at least fifty words of mean length between "
        "three and ten so this line keeps adding plain words. "
        "That should be enough words to have the filter pass now."
    )
    seen = spark.createDataFrame(
        [(1, "completely unrelated seen doc about spark engines")],
        "doc_id long, text string",
    )
    batch = [
        # junk line is dropped by C4, the rest passes Gopher → text
        # rewritten on admit
        (10, "- junk bullet line\n" + good),
        # all lines bullet/short → no kept lines → reason 'c4'
        (11, "- bullet\n* other bullet\nshort line."),
        # passes C4 but < 50 words → reason 'gopher'
        (12, "Five plain words sit here. Another line of five "
             "words. One more sentence with the needed words."),
    ]
    src = tmp_path / "rsrc"
    src.mkdir()
    spark.createDataFrame(
        batch, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "r_admitted")
    rej_dir = str(tmp_path / "r_rejected")
    q = ingest_with_quality_gate(
        stream,
        seen,
        str(tmp_path / "unused_lm"),  # xent_band None → LM never read
        out_dir,
        str(tmp_path / "r_state"),
        str(tmp_path / "r_ckpt"),
        c4_rules=True,
        gopher_rules=True,
        reject_dir=rej_dir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {
        r.doc_id: r.text for r in spark.read.parquet(out_dir).collect()
    }
    assert set(admitted) == {10}
    assert admitted[10] == good  # bullet line removed by the rewrite
    rejected = {
        r.doc_id: r.reject_reason
        for r in spark.read.parquet(rej_dir).collect()
    }
    assert rejected == {11: "c4", 12: "gopher"}


def test_streaming_admission_report(spark, tmp_path):
    """report_dir: one (outcome, n) summary row family per batch —
    admitted + each reject reason — partitioned by ingest_batch so a
    replayed batch rewrites its own report rows."""
    from ods_to_datalake_spark.streaming.ingest import (
        ingest_with_quality_gate,
    )

    seen = spark.createDataFrame(
        [(1, "completely unrelated seen doc about spark engines")],
        "doc_id long, text string",
    )
    batch = [
        (10, "brand new document with plenty of fresh words inside"),
        (11, "tiny"),  # < min_tokens
        (12, "wee"),   # < min_tokens
    ]
    src = tmp_path / "repsrc"
    src.mkdir()
    spark.createDataFrame(
        batch, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src / "*"))
    )
    report_dir = str(tmp_path / "rep_report")
    q = ingest_with_quality_gate(
        stream,
        seen,
        str(tmp_path / "unused_lm"),
        str(tmp_path / "rep_admitted"),
        str(tmp_path / "rep_state"),
        str(tmp_path / "rep_ckpt"),
        min_tokens=3,
        report_dir=report_dir,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(report_dir).collect()
    report = {(r.ingest_batch, r.outcome): r.n for r in rows}
    assert report == {(0, "admitted"): 1, (0, "min_tokens"): 2}


def test_streaming_daily_anomaly_matches_batch(spark, tmp_path):
    """The streaming anomaly face scored against a FROZEN baseline
    equals the batch face scored against the same artifact —
    window('1 day').start keys days identically to date_trunc under
    the UTC session timezone."""
    from ods_to_datalake_spark.streaming.events import (
        build_daily_baseline,
        daily_anomaly_batch,
        daily_anomaly_stream,
        read_event_stream,
    )

    batch_events = load_testdata(spark, SF).table("events")
    baseline = str(tmp_path / "an_baseline")
    build_daily_baseline(batch_events, baseline)

    stream = read_event_stream(spark, SF)
    _run_to_memory(
        daily_anomaly_stream(stream, baseline), "anomaly_mem", "complete"
    )
    got = {
        (r.event_type, r.day): (r.n, r.z, r.is_anomaly)
        for r in spark.table("anomaly_mem").collect()
    }
    want = {
        (r.event_type, r.day): (r.n, r.z, r.is_anomaly)
        for r in daily_anomaly_batch(
            batch_events, spark.read.parquet(baseline)
        ).collect()
    }
    assert got == want and len(want) > 0
