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

    # q21 shape: EXISTS + NOT EXISTS self-joins on the fact key — the
    # heaviest relational self-join; must stay ~n·log n (all three
    # branches share the l_orderkey shuffle key)
    from ods_to_datalake_spark.operators import joins as join_ops

    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    same_order = F.col("l2.l_orderkey") == F.col("l1.l_orderkey")
    other_supp = F.col("l2.l_suppkey") != F.col("l1.l_suppkey")
    base = join_ops.semi_join(l1, l2, same_order & other_supp)
    sole = join_ops.anti_join(
        base,
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
    )
    bench("q21_semi_anti_self_join", lambda: sole.count())

    # x23 shape: corpus TF-IDF — explode-heavy, one (doc,word) agg
    # feeding three joins + window top-k
    words = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("word"),
    )
    wc = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dl = wc.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    dfreq = wc.groupBy("word").agg(F.count("*").alias("df"))
    nn = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        wc.join(dl, "doc_id")
        .join(dfreq, "word")
        .join(F.broadcast(nn))
        .select(
            "doc_id",
            "word",
            (
                F.col("tf").cast("double") / F.col("doc_len").cast("double")
                * F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                )
            ).alias("score"),
        )
    )
    from ods_to_datalake_spark.operators.agg import top_k_per_group

    bench(
        "tfidf_topk",
        lambda: top_k_per_group(
            scored,
            ["doc_id"],
            [F.col("score").desc(), F.col("word").asc()],
            3,
        ).count(),
    )

    print({"scale": scale, "timings": timings})
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
