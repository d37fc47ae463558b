"""The flagship document pipeline (SURVEY §3.1), generalized.

The reference's `ordinary_payment_aggregation`
(ibs_ordinary_payment_utilities.py:21-309) builds a nested per-payment
document: source-select → child pre-fold → attach → window-sequence →
document fold → dimension decorate → surrogate key → final projection.

Two faces here:

- `build_payment_documents(...)`: the generalized pipeline over IBS-shaped
  inputs (schemas per FIXTURES.md) — exercised by the golden-doc tests.
- `order_documents(spark, sf_dir)`: the same operator composition mapped
  onto the testdata star schema (orders=headers, lineitem=periods,
  customer/nation=dims) — the driver's `entry()` flagship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.functions.timefmt import iso_ts_string
from ods_to_datalake_spark.operators import joins as join_ops
from ods_to_datalake_spark.operators import nest, windows

D182 = T.DecimalType(18, 2)


def order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested order documents: one row per order with a sorted
    array-of-struct `periods` column, dimension decodes, and a
    content-hash id — the A2 fold in its real nested form."""
    cat = load_testdata(spark, sf_dir)
    orders, li = cat.table("orders"), cat.table("lineitem")
    cust, nation = cat.table("customer"), cat.table("nation")

    # child sequence within each document (W2) then fold (A2/A5):
    seq = windows.sequence(
        li,
        ["l_orderkey"],
        ["l_shipdate", "l_linenumber"],
        out_col="period_seq",
    )
    folded = nest.fold_to_array(
        seq,
        ["l_orderkey"],
        [
            # first field = sort key (lexicographic struct compare)
            F.lpad(F.col("period_seq").cast("string"), 4, "0").alias("seq"),
            F.col("l_linenumber").cast("int").alias("line_number"),
            F.col("l_quantity").cast(D182).alias("quantity"),
            F.col("l_extendedprice").cast(D182).alias("extended_price"),
            F.col("l_returnflag").alias("return_flag"),
            iso_ts_string(
                F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd")
            ).alias("ship_ts"),
        ],
        out_col="periods",
        extra_aggs=[F.count("*").alias("n_periods")],
    )

    # header + child attach (J2), customer/nation decode (J3, broadcast):
    doc = join_ops.left_attach(
        orders, folded, orders["o_orderkey"] == folded["l_orderkey"]
    )
    doc = join_ops.left_attach(
        doc, cust, doc["o_custkey"] == cust["c_custkey"], broadcast=True
    )
    doc = join_ops.left_attach(
        doc, nation, cust["c_nationkey"] == nation["n_nationkey"],
        broadcast=True,
    )

    # surrogate key (W3) and content-hash id (S6):
    doc = windows.surrogate_key(
        doc,
        "ORD_KAL_",
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        out_col="refer_code",
    )
    return doc.select(
        "o_orderkey",
        F.col("refer_code"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("nation_name"),
        F.col("o_totalprice").cast(D182).alias("total_price"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.coalesce("n_periods", F.lit(0)).alias("n_periods"),
        F.coalesce(
            "periods",
            F.array().cast(doc.schema["periods"].dataType),
        ).alias("periods"),
        nest.doc_id("o_orderkey", "refer_code", "periods").alias("id"),
    )
