#!/usr/bin/env python
"""Scale-stress harness: synthesize N× the sf0.1 tables (distinct keys
per replica, multi-file parquet so scans parallelize like real datasets)
and time the engine's heavy operators on them.

This is the "would the plan survive a scale-up" measurement loop —
run with different SCALE values and check timings grow ~linearly (scan/
map/fold) or ~n·log n (joins/aggs), not quadratically.

Usage: python scripts/stress_scale.py [SCALE=10] [WORKDIR=/tmp/stress]
"""

from __future__ import annotations

import shutil
import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress"
    src = "/root/testdata/sf0.1"

    sys.path.insert(0, ".")
    from ods_to_datalake_spark.session import build_session

    spark = build_session(app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(workdir, ignore_errors=True)

    def amplify(table: str, key_cols: list[str]) -> str:
        """Replicate `scale`× with shifted keys, written as many files."""
        df = spark.read.parquet(f"{src}/{table}.parquet")
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(scale - 1)))
        )
        for c in key_cols:
            rep = rep.withColumn(
                c, F.col(c) * scale + F.col("__r")
            )
        out = f"{workdir}/{table}"
        rep.drop("__r").repartition(32).write.parquet(out)
        return out

    t0 = time.perf_counter()
    li_path = amplify("lineitem", ["l_orderkey"])
    ord_path = amplify("orders", ["o_orderkey"])
    doc_path = amplify("documents", ["doc_id"])
    print(f"amplify x{scale}: {time.perf_counter() - t0:.1f}s")

    li = spark.read.parquet(li_path)
    orders = spark.read.parquet(ord_path)
    docs = spark.read.parquet(doc_path)
    n_li, n_doc = li.count(), docs.count()
    print(f"lineitem rows: {n_li:,}  documents: {n_doc:,}")

    timings: dict[str, float] = {}

    def bench(name, fn):
        t = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t, 2)
        print(f"{name}: {timings[name]}s ({n:,} rows)")

    # q01 shape: selective scan + decimal agg
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    bench(
        "q01_scan_agg",
        lambda: li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sq"),
            F.count("*").alias("n"),
        )
        .count(),
    )

    # a02 shape: document fold (ObjectHashAggregate memory behavior)
    element = F.struct(
        F.col("l_linenumber").cast("int"),
        dec("l_extendedprice"),
        F.col("l_returnflag"),
    )
    bench(
        "a02_document_fold",
        lambda: li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(element)).alias("periods"))
        .count(),
    )

    # fact ⋈ fact join at volume
    bench(
        "fact_join",
        lambda: li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).count(),
    )

    # minhash LSH over the amplified corpus
    from ods_to_datalake_spark.operators.dedup import minhash_lsh_candidates

    bench(
        "minhash_lsh",
        lambda: minhash_lsh_candidates(docs, "doc_id", "text").count(),
    )

    print({"scale": scale, "timings": timings})
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
