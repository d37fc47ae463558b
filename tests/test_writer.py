"""Writer-layout tests (SURVEY §2.1 S3-S6, §2.10 O5): run-indexed
partition append, file-count/row-cap policy, JSON doc sink with hash id,
read-back verification (the S5 pattern made into real asserts)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.sources.writer import (
    write_json_documents,
    write_partitioned_parquet,
    write_run_indexed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def products(spark):
    # the reference demo table (pyspark_add_index_on_s3.py:20-25), with a
    # mixed int/string transactiondate
    return spark.createDataFrame(
        [
            (1, "widget", 10, "20260123"),
            (2, "gadget", 20, "20260123"),
            (3, "gizmo", 30, "20260124"),
        ],
        "id int, product string, amount int, transactiondate string",
    )


def test_run_indexed_append_new_partition_per_run(spark, products, tmp_path):
    """Reruns append a NEW partition value instead of overwriting (O5)."""
    path = str(tmp_path / "ds")
    v1 = write_run_indexed(products, path, "20260123", 1)
    v2 = write_run_indexed(products, path, "20260123", 2)
    assert v1 == "2026-01-23_1" and v2 == "2026-01-23_2"
    parts = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{path}/transactiondate_index=*")
    )
    assert parts == [
        "transactiondate_index=2026-01-23_1",
        "transactiondate_index=2026-01-23_2",
    ]
    back = spark.read.parquet(path)
    assert back.count() == 6  # both runs present


def test_run_indexed_derived_per_row(spark, products, tmp_path):
    """Per-row derived partition key (pyspark_add_index_on_s3.py:31-41)."""
    path = str(tmp_path / "ds2")
    write_run_indexed(
        products, path, "ignored", 1, date_col="transactiondate"
    )
    parts = sorted(
        os.path.basename(p)
        for p in glob.glob(f"{path}/transactiondate_index=*")
    )
    assert parts == [
        "transactiondate_index=2026-01-23_1",
        "transactiondate_index=2026-01-24_1",
    ]


def test_bad_date_fails_fast_on_driver(spark, products, tmp_path):
    """Driver-literal variant fails fast on a malformed date — no Spark
    job launched (links.txt rationale, all_from_gemini.txt:399-448)."""
    with pytest.raises(ValueError):
        write_run_indexed(products, str(tmp_path / "x"), "2026-01-23", 1)


def test_max_records_per_file_splits_output(spark, tmp_path):
    path = str(tmp_path / "cap")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    write_partitioned_parquet(
        df, path, max_records_per_file=30, target_files=1
    )
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 4  # 100 rows / 30-row cap → 4 files
    assert spark.read.parquet(path).count() == 100


def test_json_documents_with_hash_id(spark, tmp_path):
    path = str(tmp_path / "docs")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "k int, payload string"
    )
    write_json_documents(df, path, target_files=1)
    back = spark.read.json(path)
    rows = {r.k: r for r in back.collect()}
    assert len(rows[1].id) == 64
    # content-addressed: same content → same id across writes
    path2 = str(tmp_path / "docs2")
    write_json_documents(df, path2, target_files=1)
    back2 = {r.k: r for r in spark.read.json(path2).collect()}
    assert rows[1].id == back2[1].id and rows[2].id == back2[2].id


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Co-located bucketed tables join with zero Exchange nodes."""
    import contextlib
    import io
    import re

    from ods_to_datalake_spark.sources.writer import write_bucketed_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 4,
                         sort_by=["o_orderkey"])
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 4,
                         sort_by=["l_orderkey"])

    # at test scale the planner would broadcast (which also skips the
    # shuffle but proves nothing about bucketing) — disable it so the
    # plan shows the bucketed sort-merge join a 100-TB fact⋈fact gets
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        jj = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem")["l_orderkey"]
            == spark.table("b_orders")["o_orderkey"],
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            jj.explain("formatted")
        p = buf.getvalue()
        assert len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M)) == 0
        assert "SortMergeJoin" in p
        assert "Bucketed: true" in p
        assert jj.count() == 6000  # every lineitem matched
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_schema_contract_readers(spark, tmp_path):
    from ods_to_datalake_spark.sources.reader import read_csv, read_parquet

    csv_path = str(tmp_path / "in.csv")
    with open(csv_path, "w") as f:
        f.write("id,amount,d\n1,10.50,2026-01-23\n2,bad,2026-01-24\n")
    ok = read_csv(
        spark, csv_path, "id int, amount double, d date", mode="PERMISSIVE"
    )
    rows = ok.collect()
    assert rows[0].amount == 10.5 and rows[1].amount is None  # bad → null
    import pytest as _pytest

    strict = read_csv(spark, csv_path, "id int, amount double, d date")
    with _pytest.raises(Exception):  # FAILFAST surfaces the bad record
        strict.collect()

    # parquet contract: prune surplus, pin types
    pq = str(tmp_path / "p")
    spark.createDataFrame(
        [(1, "x", 9.9)], "id long, extra string, v double"
    ).write.parquet(pq)
    out = read_parquet(spark, pq, "id int, v string")
    assert out.columns == ["id", "v"]
    assert out.collect()[0].v == "9.9"


def test_read_latest_run_snapshot(spark, tmp_path):
    from ods_to_datalake_spark.sources.reader import (
        list_run_indexes,
        read_latest_run,
    )
    from ods_to_datalake_spark.sources.writer import write_run_indexed

    path = str(tmp_path / "snap")
    df1 = spark.createDataFrame([(1, "old")], "k int, v string")
    df2 = spark.createDataFrame([(1, "new"), (2, "x")], "k int, v string")
    write_run_indexed(df1, path, "20260123", 1)
    write_run_indexed(df2, path, "20260123", 2)
    assert list_run_indexes(path) == [("2026-01-23", 1), ("2026-01-23", 2)]
    snap = {r.k: r.v for r in read_latest_run(spark, path).collect()}
    assert snap == {1: "new", 2: "x"}  # only the newest run visible


def test_overwrite_partitions_selective(spark, tmp_path):
    """Dynamic overwrite replaces only the partitions in the new frame."""
    from ods_to_datalake_spark.sources.writer import (
        overwrite_partitions,
        write_partitioned_parquet,
    )

    path = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3)], "d string, v int"
    )
    write_partitioned_parquet(base, path, partition_by=["d"], mode="overwrite")
    fix = spark.createDataFrame([("d1", 99)], "d string, v int")
    overwrite_partitions(fix, path, ["d"])
    got = {(r.d, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("d1", 99), ("d2", 3)}  # d2 untouched, d1 replaced


def test_compact_dataset_reduces_files(spark, tmp_path):
    import glob

    from ods_to_datalake_spark.sources.writer import compact_dataset

    path = str(tmp_path / "frag")
    df = spark.range(1000).withColumn(
        "d", (F.col("id") % 2).cast("string")
    )
    # fragment: 16 files per partition
    df.repartition(16).write.partitionBy("d").parquet(path)
    frag = len(glob.glob(f"{path}/d=*/part-*.parquet"))
    assert frag >= 20
    compact_dataset(spark, path, ["d"], target_files_per_partition=1)
    compacted = len(glob.glob(f"{path}/d=*/part-*.parquet"))
    assert compacted == 2  # one file per partition
    assert spark.read.parquet(path).count() == 1000


def test_orc_roundtrip_with_contract(spark, tmp_path):
    """ORC sink/source parity with the parquet path: partitioned write,
    contract-enforced read-back, identical rows."""
    from ods_to_datalake_spark.sources.reader import read_orc
    from ods_to_datalake_spark.sources.writer import write_partitioned_orc

    src = load_testdata(spark, SF).table("orders").limit(200)
    path = str(tmp_path / "orc_orders")
    write_partitioned_orc(src, path, partition_by=["o_orderstatus"])
    back = read_orc(
        spark, path,
        "o_orderkey bigint, o_totalprice double, o_orderstatus string",
    )
    assert back.count() == 200
    assert [f.name for f in back.schema.fields] == [
        "o_orderkey", "o_totalprice", "o_orderstatus",
    ]
    a = {r.o_orderkey: r.o_totalprice for r in back.collect()}
    b = {r.o_orderkey: r.o_totalprice for r in src.collect()}
    assert a == b


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on the hive-partition column must prune at planning
    time (PartitionFilters in the scan) — at 100 TB this is the
    difference between reading one day and reading the lake."""
    import contextlib
    import io

    path = str(tmp_path / "pruned")
    src = load_testdata(spark, SF).table("orders")
    write_partitioned_parquet(
        src, path, partition_by=["o_orderstatus"], mode="overwrite"
    )
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    p = buf.getvalue()
    import re

    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert pf and re.search(r"o_orderstatus#\d+ = F", pf[0])
    # partition columns prune at planning time — they must NOT appear
    # as data-filters pushed into the parquet reader (with the partition
    # predicate consumed, no data filter remains at all here)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert not pushed or "o_orderstatus" not in pushed[0]


def test_clustered_write_yields_disjoint_file_ranges(spark, tmp_path):
    """write_clustered_parquet must produce files whose min/max ranges
    on the cluster key are disjoint (that's what makes row-group stats
    prune); an unclustered write of the same data must NOT have this
    property (every file spans ~the whole range)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from ods_to_datalake_spark.sources.writer import write_clustered_parquet

    src = load_testdata(spark, SF).table("orders")

    def file_ranges(path):
        out = []
        for f in sorted(_glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema
                    == "o_orderkey"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    clustered = str(tmp_path / "clustered")
    write_clustered_parquet(
        src, clustered, ["o_orderkey"], target_files=4
    )
    ranges = file_ranges(clustered)
    assert len(ranges) >= 3
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint: file N's max <= file N+1's min

    plain = str(tmp_path / "plain")
    src.repartition(4).write.parquet(plain)
    overlapping = sum(
        hi > lo
        for (_, hi), (lo, _) in zip(
            file_ranges(plain), file_ranges(plain)[1:]
        )
    )
    assert overlapping > 0  # hash-shuffled files all span the range


def test_delete_keys_rewrites_only_affected_partitions(spark, tmp_path):
    """GDPR-style delete: only partitions containing doomed keys are
    rewritten; other partition directories keep their original files."""
    import glob as _glob

    from ods_to_datalake_spark.sources.writer import delete_keys

    path = str(tmp_path / "lake")
    src = load_testdata(spark, SF).table("orders")
    write_partitioned_parquet(
        src, path, partition_by=["o_orderpriority"], mode="overwrite"
    )
    before = {
        d: set(_glob.glob(f"{d}/*.parquet"))
        for d in _glob.glob(f"{path}/o_orderpriority=*")
    }
    # doom two customers that only appear in some partitions? customers
    # appear broadly — use specific orderkeys instead (each in exactly
    # one partition)
    doomed_rows = src.filter(F.col("o_orderpriority") == "5-LOW").limit(3)
    doomed = doomed_rows.select("o_orderkey")
    n_doomed = doomed.count()
    n_before = spark.read.parquet(path).count()
    n_rewritten = delete_keys(
        spark, path, doomed, "o_orderkey", "o_orderpriority"
    )
    assert n_rewritten == 1  # all doomed keys live in 5-LOW
    after = spark.read.parquet(path)
    assert after.count() == n_before - n_doomed
    assert (
        after.join(doomed, after["o_orderkey"] == doomed["o_orderkey"],
                   "left_semi").count() == 0
    )
    # untouched partitions keep their exact original files
    for d, files in before.items():
        if "5-LOW" not in d:
            assert set(_glob.glob(f"{d}/*.parquet")) == files


def test_read_run_time_travel(spark, products, tmp_path):
    """Every historical run stays readable; missing snapshots fail
    fast instead of returning an empty frame."""
    from ods_to_datalake_spark.sources.reader import read_run

    path = str(tmp_path / "tt")
    write_run_indexed(products, path, "20260123", 1)
    write_run_indexed(products.limit(1), path, "20260123", 2)
    assert read_run(spark, path, "2026-01-23", 1).count() == 3
    assert read_run(spark, path, "2026-01-23", 2).count() == 1
    with pytest.raises(FileNotFoundError):
        read_run(spark, path, "2026-01-24", 1)


def test_json_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE JSON ingestion quarantines malformed lines into the
    corrupt-record column instead of failing the batch — the ingest-QA
    pattern for semi-trusted feeds (count them via observe/metrics,
    route them to a dead-letter sink)."""
    from ods_to_datalake_spark.sources.reader import read_json

    path = str(tmp_path / "feed.jsonl")
    with open(path, "w") as f:
        f.write('{"k": 1, "v": "good"}\n')
        f.write('{"k": 2, "v": BROKEN}\n')
        f.write('{"k": 3, "v": "also good"}\n')
    df = read_json(
        spark,
        path,
        "k int, v string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.k for r in good} == {1, 3}
    assert len(bad) == 1 and "BROKEN" in bad[0]._corrupt_record


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Additive schema evolution: later appends carry a new column;
    mergeSchema reads the union (old rows null-filled), and the
    schema-contract reader pins the final shape."""
    from ods_to_datalake_spark.sources.reader import read_parquet

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "k int, v string")
    v1.write.parquet(path)
    v2 = spark.createDataFrame(
        [(2, "b", "extra")], "k int, v string, w string"
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "v", "w"}
    by_k = {r.k: r for r in merged.collect()}
    assert by_k[1].w is None and by_k[2].w == "extra"

    # contract read pins the evolved shape for downstream consumers —
    # a plain (non-merged) read resolves from whichever footer wins and
    # can miss `w` entirely, which is exactly why the contract read
    # must merge footers first
    pinned = read_parquet(
        spark, path, "k int, v string, w string", mergeSchema="true"
    )
    assert pinned.columns == ["k", "v", "w"]
    assert pinned.count() == 2


def test_read_text_documents_whole_and_lines(spark, tmp_path):
    from ods_to_datalake_spark.sources.reader import read_text_documents

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("hello world\nsecond line")
    (d / "b.txt").write_text("hello world\nsecond line")  # exact dup file
    (d / "c.txt").write_text("unique doc")

    whole = read_text_documents(spark, str(d)).collect()
    assert len(whole) == 3
    assert {r.text for r in whole} == {
        "hello world\nsecond line", "unique doc"
    }
    # content-hash identity: identical files share doc_id, paths differ
    by_id = {}
    for r in whole:
        by_id.setdefault(r.doc_id, set()).add(r.doc_path)
    dup_paths = next(v for k, v in by_id.items() if len(v) == 2)
    assert len(by_id) == 2 and len(dup_paths) == 2
    assert all(r.doc_path.endswith(".txt") for r in whole)

    lines = read_text_documents(spark, str(d), whole_files=False).collect()
    assert sorted(r.text for r in lines) == [
        "hello world", "hello world", "second line", "second line",
        "unique doc",
    ]


def test_prune_runs_keeps_newest_snapshots(spark, tmp_path):
    import pytest as _pytest

    from ods_to_datalake_spark.sources.reader import (
        list_run_indexes,
        read_latest_run,
    )
    from ods_to_datalake_spark.sources.writer import (
        prune_runs,
        write_run_indexed,
    )

    d = str(tmp_path / "runs")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    for date, idx in [("20240101", 1), ("20240101", 2), ("20240102", 1),
                      ("20240103", 1)]:
        write_run_indexed(df, d, date, idx)
    assert len(list_run_indexes(d)) == 4

    doomed = prune_runs(d, keep_last=2)
    assert doomed == [("2024-01-01", 1), ("2024-01-01", 2)]
    assert list_run_indexes(d) == [("2024-01-02", 1), ("2024-01-03", 1)]
    # the surviving latest snapshot still reads
    assert read_latest_run(spark, d).count() == 2

    # pruning below one snapshot is refused; keep_last >= n is a no-op
    with _pytest.raises(ValueError, match=">= 1"):
        prune_runs(d, keep_last=0)
    assert prune_runs(d, keep_last=10) == []
    assert len(list_run_indexes(d)) == 2


def test_zordered_write_skips_on_both_columns(spark, tmp_path):
    """Z-order must bound EVERY z-column's per-file range, where
    single-column clustering bounds only its own: the per-file
    (max-min)/global-span averaged over files should be well under 1
    for BOTH z-columns, and the linear-clustered control must leave
    its second column unbounded (~the full range in every file)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from ods_to_datalake_spark.sources.writer import (
        write_clustered_parquet,
        write_zordered_parquet,
    )

    src = load_testdata(spark, SF).table("orders")

    def avg_span_frac(path, col):
        spans, los, his = [], [], []
        for f in sorted(_glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            spans.append(max(maxs) - min(mins))
            los.append(min(mins))
            his.append(max(maxs))
        globl = max(his) - min(los)
        return sum(spans) / len(spans) / globl, len(spans)

    zpath = str(tmp_path / "zorder")
    write_zordered_parquet(
        src, zpath, ["o_custkey", "o_totalprice"], target_files=16
    )
    zc, nfiles = avg_span_frac(zpath, "o_custkey")
    zt, _ = avg_span_frac(zpath, "o_totalprice")
    assert nfiles >= 8
    assert zc < 0.6, zc  # every file bounded on custkey
    assert zt < 0.6, zt  # AND on totalprice — the z-order property

    lpath = str(tmp_path / "linear")
    write_clustered_parquet(
        src, lpath, ["o_custkey"], target_files=16
    )
    lc, _ = avg_span_frac(lpath, "o_custkey")
    lt, _ = avg_span_frac(lpath, "o_totalprice")
    assert lc < 0.2  # linear clustering: its own column is tight...
    assert lt > 0.8  # ...but the second column spans ~everything
    # and both writes hold the same rows
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(lpath).count()
    )


def test_zorder_guards(spark, tmp_path):
    """Review findings, round 6: interleave positions must fit a
    signed long (raise, never silently alias mod 64); derived ranges
    on degenerate input raise a clear error; NULL z-values cluster in
    bucket 0 and survive the write."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ods_to_datalake_spark.sources.writer import (
        write_zordered_parquet,
        zorder_key,
    )

    with _pytest.raises(ValueError, match="signed long"):
        zorder_key([F.lit(1)] * 6, bits=12)

    empty = spark.createDataFrame([], "a double, b double")
    with _pytest.raises(ValueError, match="ranges"):
        write_zordered_parquet(
            empty, str(tmp_path / "e"), ["a", "b"]
        )
    nulls = spark.createDataFrame(
        [(None, 1.0)] * 3, "a double, b double"
    )
    with _pytest.raises(ValueError, match="ranges"):
        write_zordered_parquet(
            nulls, str(tmp_path / "n"), ["a", "b"]
        )

    # NULL values (with explicit ranges) land in bucket 0, not dropped
    mixed = spark.createDataFrame(
        [(None, 5.0), (1.0, 6.0), (2.0, None)], "a double, b double"
    )
    p = str(tmp_path / "m")
    write_zordered_parquet(
        mixed, p, ["a", "b"],
        ranges={"a": (0.0, 10.0), "b": (0.0, 10.0)}, target_files=1,
    )
    assert spark.read.parquet(p).count() == 3

    # six z-columns auto-shrink bits instead of corrupting the key
    six = spark.createDataFrame(
        [tuple(float(i + j) for j in range(6)) for i in range(20)],
        ", ".join(f"c{j} double" for j in range(6)),
    )
    p6 = str(tmp_path / "six")
    write_zordered_parquet(six, p6, [f"c{j}" for j in range(6)])
    assert spark.read.parquet(p6).count() == 20


def test_compact_run_snapshot_atomic_and_lossless(spark, tmp_path):
    """Compaction rewrites the latest run as run+1 with right-sized
    files; content is identical, the old run stays time-travelable,
    a leftover _compacting temp dir is invisible to readers, and a
    rerun self-heals it."""
    import os as _os

    from ods_to_datalake_spark.sources.reader import (
        read_latest_run,
        read_run,
    )
    from ods_to_datalake_spark.sources.writer import (
        compact_run_snapshot,
        write_run_indexed,
    )

    src = load_testdata(spark, SF).table("orders")
    n = src.count()
    path = str(tmp_path / "runs")
    # 40 pre-shuffled input partitions → 40 small files in the run
    write_run_indexed(src.repartition(40), path, "20240301", 1)
    before = read_latest_run(spark, path).drop(
        "transactiondate_index"
    )
    # simulate a crashed earlier compaction attempt
    _os.makedirs(str(tmp_path / "runs" / "_compacting_2024-03-01_2"))
    assert read_latest_run(spark, path).count() == n  # invisible

    report = compact_run_snapshot(spark, path, target_records=5000)
    assert report["snapshot"] == ("2024-03-01", 2)
    assert report["files_before"] >= 20
    assert report["files_after"] == 1
    after = read_latest_run(spark, path)
    assert (
        after.select(F.col("transactiondate_index")).distinct().collect()
    )[0][0] == "2024-03-01_2"
    a = sorted(map(tuple, before.collect()))
    b = sorted(
        map(tuple, after.drop("transactiondate_index").collect())
    )
    assert a == b  # lossless
    # time travel to the uncompacted snapshot still works
    assert read_run(spark, path, "2024-03-01", 1).count() == n
