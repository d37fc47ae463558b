"""Core relational suite: SURVEY §2 operators mapped onto the testdata.

Table-role mapping (testdata ⟷ reference IBS schema):
- `orders`   plays the payment-header fact (`ibs_t_policy_payment_transaction`)
- `lineitem` plays the child/period rows folded into documents
- `customer`/`nation`/`region` play the policy master + md_ref dimensions

Each query's docstring cites the reference site whose semantics it
generalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.functions.decode import value_map_decode
from ods_to_datalake_spark.operators import agg as agg_ops
from ods_to_datalake_spark.operators import joins as join_ops
from ods_to_datalake_spark.operators import nest, windows
from ods_to_datalake_spark.plans.money import D182, D384, D386, _dec
from ods_to_datalake_spark.plans.suite import REGISTRY, register


# ---------------------------------------------------------------------------
# S/P layer — scans, projection, predicates
# ---------------------------------------------------------------------------


@register(
    "p01_projection_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    """,
    doc="S1+P1: catalog scan with column projection "
    "(ibs_ordinary_payment_utilities.py:25-26, :97). Column pruning must "
    "reach the parquet scan (ReadSchema shows 3 of 6 columns).",
)
def p01_projection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return cat.table("orders").select("o_orderkey", "o_custkey", "o_orderstatus")


@register(
    "p06_range_filter",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    """,
    doc="P6: half-open date-range predicate directly above the scan "
    "(ibs_ordinary_payment_utilities.py:27-29) — pushed to parquet "
    "row-group stats.",
)
def p06_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    lo, hi = F.lit("1995-01-01").cast("timestamp"), F.lit("1996-01-01").cast("timestamp")
    return (
        cat.table("orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
    )


@register(
    "p03_derive_drop_rename",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_orderstatus,
           CONCAT(o_orderstatus, '/', o_orderpriority) AS status_detail
    FROM orders
    """,
    doc="P3+P4+P5: withColumn derive, drop helper column, rename "
    "(ibs_ordinary_payment_utilities.py:27-29 date_cleaned pattern, "
    ":128-141 renames) — all collapse into one Project in the plan.",
)
def p03_derive_drop_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return (
        cat.table("orders")
        .withColumn(
            "status_detail",
            F.concat(F.col("o_orderstatus"), F.lit("/"), F.col("o_orderpriority")),
        )
        .withColumn("helper", F.upper(F.col("o_orderpriority")))
        .drop("helper", "o_totalprice", "o_orderdate", "o_custkey",
              "o_orderpriority")
        .withColumnRenamed("o_orderkey", "order_id")
    )


@register(
    "p07_isin_filter",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    doc="P7: IN-list predicate (pstu isin, ibs_ordinary_payment_utilities.py:33).",
)
def p07_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return (
        cat.table("orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "p08_not_isin_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus NOT IN ('F', 'O')
    """,
    doc="P8: negated IN-list (ibs_ordinary_payment_utilities.py:46).",
)
def p08_not_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return (
        cat.table("orders")
        .filter(~F.col("o_orderstatus").isin("F", "O"))
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "p10_trim_compound_filter",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE TRIM(c_mktsegment) = 'BUILDING' AND TRIM(c_name) <> ''
    """,
    doc="P10: compound predicate with trim-normalization "
    "(ibs_ordinary_payment_utilities.py:127,133,139).",
)
def p10_trim_compound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return (
        cat.table("customer")
        .filter(
            (F.trim(F.col("c_mktsegment")) == "BUILDING")
            & (F.trim(F.col("c_name")) != "")
        )
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "f08_case_decode",
    oracle="""
    SELECT o_orderkey,
           CASE
             WHEN TRIM(o_orderpriority) = '1-URGENT' THEN '01'
             WHEN TRIM(o_orderpriority) = '2-HIGH' THEN '02'
             WHEN TRIM(o_orderpriority) = '3-MEDIUM' THEN '03'
             ELSE '99'
           END AS priority_code
    FROM orders
    """,
    doc="F8: data-driven CASE decode table — the payment-channel decode "
    "pattern (ibs_ordinary_payment_utilities.py:221-241) incl. the '99' "
    "fallback.",
)
def f08_case_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    code = value_map_decode(
        "o_orderpriority",
        {"1-URGENT": "01", "2-HIGH": "02", "3-MEDIUM": "03"},
        default="99",
    )
    return cat.table("orders").select(
        "o_orderkey", code.alias("priority_code")
    )


@register(
    "f_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date_iso,
           CONCAT('ORD_', CAST(o_orderkey AS VARCHAR), '_',
                  CAST(o_custkey AS VARCHAR)) AS business_key,
           CONCAT_WS('_', o_orderstatus, o_orderpriority) AS status_priority,
           PRINTF('%s_%d', STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d'), 7)
             AS run_index_key,
           CONCAT(STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d'),
                  'T00:00:00+07:00') AS order_ts_iso
    FROM orders
    """,
    doc="F1-F5,F7,F9: to_date/date_format/concat/concat_ws/format_string/"
    "lit/cast, incl. the fixed-offset ISO timestamp-string build "
    "(ibs_ordinary_payment_utilities.py:191-210) and the run-index "
    "partition key (pyspark_add_index_on_s3.py:31-41).",
)
def f_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions.timefmt import iso_ts_string

    cat = load_testdata(spark, sf_dir)
    d = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    return cat.table("orders").select(
        "o_orderkey",
        d.alias("order_date_iso"),
        F.concat(
            F.lit("ORD_"),
            F.col("o_orderkey").cast("string"),
            F.lit("_"),
            F.col("o_custkey").cast("string"),
        ).alias("business_key"),
        F.concat_ws("_", "o_orderstatus", "o_orderpriority").alias(
            "status_priority"
        ),
        F.format_string("%s_%d", d, F.lit(7)).alias("run_index_key"),
        iso_ts_string(d).alias("order_ts_iso"),
    )


# ---------------------------------------------------------------------------
# J layer — joins
# ---------------------------------------------------------------------------


@register(
    "j01_semi_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
    doc="J1+P2: source-selection semi-join — the reference's inner-join + "
    "select(left['*']) (ibs_ordinary_payment_utilities.py:37-42) done as "
    "a true left_semi.",
)
def j01_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li, orders = cat.table("lineitem"), cat.table("orders")
    inforce = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return join_ops.semi_join(
        li, inforce, li["l_orderkey"] == inforce["o_orderkey"]
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "j01b_anti_join",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """,
    doc="Generalized NOT-IN as left_anti (SURVEY §2.3 'not present' row).",
)
def j01b_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders, li = cat.table("orders"), cat.table("lineitem")
    keys = li.select("l_orderkey")
    return join_ops.anti_join(
        orders, keys, orders["o_orderkey"] == keys["l_orderkey"]
    ).select("o_orderkey", "o_orderstatus")


@register(
    "j02_left_attach_preagg",
    double_cols=['total_qty'],
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           COALESCE(l.item_count, 0) AS item_count,
           CAST(COALESCE(l.total_qty, 0) AS DECIMAL(18,2)) AS total_qty
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS item_count,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
    doc="J2: left attach of a pre-aggregated child — fold BEFORE the join "
    "so no group holds a cross-product "
    "(ibs_ordinary_payment_utilities.py:99-107).",
)
def j02_left_attach_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders, li = cat.table("orders"), cat.table("lineitem")
    pre = li.groupBy("l_orderkey").agg(
        F.count("*").alias("item_count"),
        F.sum(_dec("l_quantity")).cast(D182).alias("total_qty"),
    )
    joined = join_ops.left_attach(
        orders, pre, orders["o_orderkey"] == pre["l_orderkey"]
    )
    return joined.select(
        "o_orderkey",
        "o_orderstatus",
        F.coalesce("item_count", F.lit(0)).alias("item_count"),
        F.coalesce(F.col("total_qty"), F.lit(0).cast(D182))
        .cast(D182)
        .alias("total_qty"),
    )


@register(
    "j03_broadcast_dim_decode",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="J3: chained broadcast dimension decodes "
    "(ibs_ordinary_payment_utilities.py:255-261) with explicit "
    "F.broadcast — the fact side is never shuffled.",
)
def j03_broadcast_dim_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust, nation, region = (
        cat.table("customer"),
        cat.table("nation"),
        cat.table("region"),
    )
    step1 = join_ops.left_attach(
        cust,
        nation,
        cust["c_nationkey"] == nation["n_nationkey"],
        broadcast=True,
    )
    step2 = join_ops.left_attach(
        step1,
        region,
        F.col("n_regionkey") == region["r_regionkey"],
        broadcast=True,
    )
    return step2.select(
        "c_custkey",
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


@register(
    "j04_range_join",
    oracle="""
    SELECT o.o_orderkey, b.bucket_name
    FROM orders o
    JOIN (
      SELECT * FROM (VALUES
        ('small',  0.0,      100000.0),
        ('medium', 100000.0, 300000.0),
        ('large',  300000.0, 1e18)
      ) AS t(bucket_name, lo, hi)
    ) b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    doc="Generalized range join (point-in-interval) via broadcast — "
    "SURVEY §2.3 'not present' row; small interval dim ⇒ BNLJ broadcast.",
)
def j04_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    buckets = spark.createDataFrame(
        [
            ("small", 0.0, 100000.0),
            ("medium", 100000.0, 300000.0),
            ("large", 300000.0, 1e18),
        ],
        "bucket_name string, lo double, hi double",
    )
    joined = join_ops.range_join(
        orders, F.broadcast(buckets), "o_totalprice", "lo", "hi"
    )
    return joined.select("o_orderkey", "bucket_name")


# ---------------------------------------------------------------------------
# A layer — aggregations & folds
# ---------------------------------------------------------------------------


@register(
    "a01_fold_sorted_array",
    oracle="""
    SELECT l_orderkey,
           STRING_AGG(
             CONCAT(LPAD(CAST(l_linenumber AS VARCHAR), 2, '0'), ':',
                    CAST(CAST(COALESCE(l_quantity, 0) AS DECIMAL(18,2))
                         AS VARCHAR)),
             '|' ORDER BY
               CONCAT(LPAD(CAST(l_linenumber AS VARCHAR), 2, '0'), ':',
                      CAST(CAST(COALESCE(l_quantity, 0) AS DECIMAL(18,2))
                           AS VARCHAR))
           ) AS items
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="A1+A5: child fold to a deterministically SORTED array "
    "(sort_array(collect_list(struct(...))), "
    "ibs_ordinary_payment_utilities.py:99-101) — compared via its "
    "delimited-string form; note string sort order is the golden-file "
    "behavior ('_1,_10,_2').",
)
def a01_fold_sorted_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions import nulls

    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    # required-field null policy (reference :71-78): a null amount folds
    # as 0.00 — and keeps concat semantics engine-independent (Spark
    # nulls the whole element; SQL CONCAT skips the null part)
    element = F.concat(
        F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
        F.lit(":"),
        nulls.req("l_quantity", "dec").cast("string"),
    )
    return nest.fold_to_sorted_strings(
        li, ["l_orderkey"], element, out_col="items"
    )


@register(
    "a02_document_fold",
    double_cols=['total_price'],
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(o.o_totalprice AS DECIMAL(18,2)) AS total_price,
           COALESCE(l.periods, '') AS periods,
           COALESCE(l.n_periods, 0) AS n_periods
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_periods,
             STRING_AGG(
               CONCAT(LPAD(CAST(l_linenumber AS VARCHAR), 2, '0'), ':',
                      CAST(CAST(COALESCE(l_extendedprice, 0)
                                AS DECIMAL(18,2)) AS VARCHAR),
                      ':', COALESCE(l_returnflag, ''), ':',
                      COALESCE(STRFTIME(CAST(l_shipdate AS DATE),
                                        '%Y-%m-%d')
                               || 'T00:00:00+07:00', '')),
               '|' ORDER BY
                 CONCAT(LPAD(CAST(l_linenumber AS VARCHAR), 2, '0'), ':',
                        CAST(CAST(COALESCE(l_extendedprice, 0)
                                  AS DECIMAL(18,2)) AS VARCHAR),
                        ':', COALESCE(l_returnflag, ''), ':',
                        COALESCE(STRFTIME(CAST(l_shipdate AS DATE),
                                          '%Y-%m-%d')
                                 || 'T00:00:00+07:00', ''))
             ) AS periods
      FROM lineitem GROUP BY l_orderkey
    ) l ON o.o_orderkey = l.l_orderkey
    """,
    doc="A2: the defining document-fold — header + sorted nested periods "
    "with pinned casts and ISO-offset timestamp strings "
    "(ibs_ordinary_payment_utilities.py:144-253), flattened to its "
    "hash-stable string form. The real nested variant is "
    "plans.ordinary_payment / entry().",
    headline=True,
)
def a02_document_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions.timefmt import iso_ts_string

    from ods_to_datalake_spark.functions import nulls

    cat = load_testdata(spark, sf_dir)
    orders, li = cat.table("orders"), cat.table("lineitem")
    key = F.lpad(F.col("l_linenumber").cast("string"), 2, "0")
    # required-field null policy on every concat part (see a01 note)
    element = F.concat(
        key,
        F.lit(":"),
        nulls.req("l_extendedprice", "dec").cast("string"),
        F.lit(":"),
        F.coalesce(F.col("l_returnflag"), F.lit("")),
        F.lit(":"),
        F.coalesce(
            iso_ts_string(
                F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd")
            ),
            F.lit(""),
        ),
    )
    folded = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_periods"),
        F.array_join(F.sort_array(F.collect_list(element)), "|").alias(
            "periods"
        ),
    )
    # Catalyst's post-aggregation size estimate for `folded` is far
    # below its real size (one array-joined periods string per order),
    # so the planner auto-BROADCASTS the array-heavy fold — wrong at
    # both ends: locally the driver collects+ships the widest frame in
    # the plan, and at 100 TB an order-scale fold can never broadcast.
    # Hint a shuffled-hash join BUILT ON THE NARROW orders side
    # (guide §3.1): folded reuses its aggregation exchange (same key,
    # same partition count → zero extra shuffles of the arrays), no
    # sort touches the payload, and the hash table holds only narrow
    # order rows. Measured at sf0.1: 3.21s → see OPTIMIZATION_r12.md.
    joined = orders.hint("shuffle_hash").join(
        folded, orders["o_orderkey"] == folded["l_orderkey"], "left"
    )
    return joined.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(D182).alias("total_price"),
        F.coalesce("periods", F.lit("")).alias("periods"),
        F.coalesce("n_periods", F.lit(0)).alias("n_periods"),
    )


@register(
    "a03_conditional_sum",
    double_cols=['sum_f_price', 'sum_o_price', 'sum_total_price'],
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2))
             AS sum_f_price,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2))
             AS sum_o_price,
           CAST(SUM(CASE WHEN l_linestatus IN ('F','O')
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2))
             AS sum_total_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="A3: conditional sum / pivot-by-hand (pyspark_sum_function:25-41) "
    "— decimal-exact, single hash-aggregate with map-side partials.",
)
def a03_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        agg_ops.conditional_sum(
            "l_extendedprice", F.col("l_linestatus") == "F"
        ).cast(D182).alias("sum_f_price"),
        agg_ops.conditional_sum(
            "l_extendedprice", F.col("l_linestatus") == "O"
        ).cast(D182).alias("sum_o_price"),
        agg_ops.conditional_sum(
            "l_extendedprice", F.col("l_linestatus").isin("F", "O")
        ).cast(D182).alias("sum_total_price"),
    )


@register(
    "a04_pivot",
    double_cols=['F', 'O'],
    oracle="""
    SELECT l_returnflag,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0)
                AS DECIMAL(18,2)) AS F,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0)
                AS DECIMAL(18,2)) AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="A4: pivot with explicit value whitelist + na.fill "
    "(all_from_gemini.txt:560-570) — no distinct-values pre-job, pinned "
    "schema.",
)
def a04_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    out = agg_ops.pivot_sum(
        li,
        ["l_returnflag"],
        "l_linestatus",
        ["F", "O"],
        "l_quantity",
        fill=None,
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0).cast(D182)).cast(D182).alias("F"),
        F.coalesce(F.col("O"), F.lit(0).cast(D182)).cast(D182).alias("O"),
    )


@register(
    "a06_rollup",
    double_cols=['sum_qty'],
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Grouping-set generalization (SURVEY §2.4 'not present' row): "
    "rollup over two keys — one shuffle, Expand-based.",
)
def a06_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    return agg_ops.grouped(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.count("*").alias("n_rows"),
            F.sum(_dec("l_quantity")).cast(D182).alias("sum_qty"),
        ],
        mode="rollup",
    )


@register(
    "a09_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group (linear interpolation, "
    "bit-identical across engines). Scale note: exact percentile sorts "
    "each group; at 100 TB switch to approx_percentile (t-digest, "
    "mergeable map-side sketch) — same call shape, bounded error.",
)
def a09_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return (
        cat.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
            F.percentile("o_totalprice", F.lit(0.50)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.90)).alias("p90"),
        )
    )


@register(
    "a07_distinct_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Distinct aggregate generalization — Spark plans a two-phase "
    "partial-distinct expand; exact, scalable.",
)
def a07_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return (
        cat.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# W layer — windows
# ---------------------------------------------------------------------------


@register(
    "w01_sequence",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_shipdate, l_linenumber
           ) AS INT) AS row_num
    FROM lineitem
    """,
    doc="W1: per-group row_number sequence ordered by date with unique "
    "tiebreaker (ibs_ordinary_payment_utilities.py:84-94).",
)
def w01_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    return windows.sequence(
        li, ["l_orderkey"], ["l_shipdate", "l_linenumber"], out_col="row_num"
    ).select("l_orderkey", "l_linenumber", "row_num")


@register(
    "w02_multikey_sequence",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY l_orderkey, l_returnflag
             ORDER BY l_shipdate, l_extendedprice, l_linenumber
           ) AS INT) AS period_seq
    FROM lineitem
    """,
    doc="W2: composite-partition, composite-order sequencing "
    "(ibs_ordinary_payment_utilities.py:110-122).",
)
def w02_multikey_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    return windows.sequence(
        li,
        ["l_orderkey", "l_returnflag"],
        ["l_shipdate", "l_extendedprice", "l_linenumber"],
        out_col="period_seq",
    ).select("l_orderkey", "l_partkey", "l_linenumber", "period_seq")


@register(
    "w03_surrogate_key",
    oracle="""
    SELECT o_orderkey,
           CONCAT('ORD_KAL_', CAST(o_custkey AS VARCHAR), '_',
                  CAST(ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                  ) AS VARCHAR)) AS refer_code
    FROM orders
    """,
    doc="W3: surrogate business key via windowed row_number + concat "
    "(pmt_refer_code_of_company, ibs_ordinary_payment_utilities.py:262-266).",
)
def w03_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    return windows.surrogate_key(
        orders,
        "ORD_KAL_",
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
        out_col="refer_code",
    ).select("o_orderkey", "refer_code")


@register(
    "w05_running_total",
    double_cols=['running_spend'],
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
           / COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS moving_avg_3
    FROM orders
    """,
    doc="Aggregate-over-window generalization (SURVEY §2.5 'not present' "
    "row): running decimal sum + 3-row moving average with explicit "
    "rowsBetween frames — one shuffle on the partition key, frames "
    "evaluated in a single WindowExec pass.",
)
def w05_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast(D182)
    return cat.table("orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(price)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(D182)
        .alias("running_spend"),
        # exact decimal sum ÷ count, divided as doubles: avg(decimal)
        # would round its widened scale differently per engine
        (
            F.sum(price)
            .over(w.rowsBetween(-2, Window.currentRow))
            .cast("double")
            / F.count(F.lit(1)).over(w.rowsBetween(-2, Window.currentRow))
        ).alias("moving_avg_3"),
    )


@register(
    "w04_dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey
    FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    doc="Window-dedup: keep first row per key under explicit order "
    "(the reference's dedup substitute, SURVEY §2.5 note) — Spark "
    "rewrites to WindowGroupLimit.",
)
def w04_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    return windows.dedup_keep_first(
        orders, ["o_custkey"], ["o_orderdate", "o_orderkey"]
    ).select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (SURVEY §2.6 generalization)
# ---------------------------------------------------------------------------


@register(
    "t01_top_k",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k — TakeOrderedAndProject (per-partition heap + driver "
    "merge, no global sort); unique tiebreaker pins ties.",
)
def t01_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return agg_ops.top_k(
        cat.table("orders"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    ).select("o_orderkey", "o_totalprice")


@register(
    "t02_top_k_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Per-group top-k via rank window — WindowGroupLimit pushes the "
    "limit map-side before the shuffle.",
)
def t02_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return agg_ops.top_k_per_group(
        cat.table("orders"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice")


@register(
    "u01_set_ops",
    oracle="""
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ) EXCEPT SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
    doc="Set-op generalization (SURVEY §2.6): union-distinct + except.",
)
def u01_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders, cust = cat.table("orders"), cat.table("customer")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    c = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("k")
    )
    return a.union(b).distinct().exceptAll(c.distinct())


@register(
    "j05_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    doc="Skew-spread salted join (operators/skew.py): fact salt from "
    "within-key-varying columns, dim replicated n_salt times, join on "
    "(key, salt) — row-identical to the plain join (this oracle), with "
    "each hot key spread over n tasks.",
)
def j05_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.skew import salted_join

    cat = load_testdata(spark, sf_dir)
    li, orders = cat.table("lineitem"), cat.table("orders")
    return salted_join(
        li,
        orders.select("o_orderkey", "o_orderstatus"),
        "l_orderkey",
        "o_orderkey",
        salt_src=["l_linenumber", "l_partkey"],
        n_salt=8,
    ).select("l_orderkey", "l_linenumber", "o_orderstatus")


@register(
    "a08_two_phase_agg",
    double_cols=['sum_qty'],
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Salted two-phase aggregation for skewed group keys "
    "(operators/skew.py): partials on (key, salt), merge on key — "
    "decimal-exact so phases compose losslessly; result equals the "
    "direct group-by (this oracle).",
)
def a08_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.skew import two_phase_agg

    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    out = two_phase_agg(
        li,
        ["l_returnflag"],
        sums={"sum_qty": _dec("l_quantity")},
        counts=["n_rows"],
        salt_src=["l_orderkey", "l_linenumber"],
        n_salt=8,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast(D182).alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@register(
    "u03_upsert_snapshot",
    oracle="""
    SELECT o_custkey, o_orderkey, src FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY src DESC, o_orderdate DESC, o_orderkey
      ) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, 'current' AS src
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_custkey, o_orderkey, o_orderdate, 'update' AS src
        FROM orders WHERE o_orderkey % 3 = 0
      )
    ) WHERE rn = 1
    """,
    doc="SCD-1 snapshot upsert (operators/windows.py upsert_snapshot): "
    "union current+updates, keep the winner per key (updates preferred, "
    "then recency, then a unique tiebreaker) — the ODS refresh "
    "primitive; pairs with run-indexed append + read_latest_run for "
    "overwrite-free snapshots.",
)
def u03_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.windows import upsert_snapshot

    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    current = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_custkey", "o_orderkey", "o_orderdate", F.lit("current").alias("src")
    )
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_custkey", "o_orderkey", "o_orderdate", F.lit("update").alias("src")
    )
    out = upsert_snapshot(
        current,
        updates,
        keys=["o_custkey"],
        order_by=[
            F.col("src").desc(),
            F.col("o_orderdate").desc(),
            F.col("o_orderkey"),
        ],
    )
    return out.select("o_custkey", "o_orderkey", "src")


@register(
    "u04_union_by_name",
    oracle="""
    SELECT o_orderkey, o_orderstatus, src FROM (
      SELECT o_orderkey, o_orderstatus, 'a' AS src
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL BY NAME
      SELECT 'b' AS src, o_orderstatus, o_orderkey
      FROM orders WHERE o_orderstatus = 'O'
    )
    """,
    doc="Schema-evolution append: unionByName aligns by column NAME not "
    "position — the safe form for evolving ODS extracts (positional "
    "union silently scrambles reordered columns).",
)
def u04_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus", F.lit("a").alias("src")
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.lit("b").alias("src"), "o_orderstatus", "o_orderkey"
    )
    return a.unionByName(b)


@register(
    "f02_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 10, 5) AS name_mid,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
           CAST(length(c_name) AS BIGINT) AS name_len
    FROM customer
    """,
    doc="String-function surface (SURVEY §2.7 F13 substring + the "
    "generalized set): upper/substring/lpad/replace/instr/length — all "
    "codegen'd JVM expressions.",
)
def f02_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return cat.table("customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@register(
    "q18_large_orders",
    double_cols=['total_price', 'total_qty'],
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_totalprice AS DECIMAL(18,2)) AS total_price,
           CAST(l.qty AS DECIMAL(18,2)) AS total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    ) l ON o.o_orderkey = l.l_orderkey
    """,
    doc="TPC-H Q18-shaped HAVING-subquery: pre-aggregate + having filter "
    "BEFORE the join (the small filtered side drives the probe) — the "
    "large-order detection shape.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li, orders = cat.table("lineitem"), cat.table("orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 120)
    )
    return orders.join(
        big, orders["o_orderkey"] == big["l_orderkey"]
    ).select(
        "o_orderkey",
        F.col("o_totalprice").cast(D182).alias("total_price"),
        F.col("qty").cast(D182).alias("total_qty"),
    )


@register(
    "u02_intersect_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Set-op + grouping-set generalization: intersect feeding a cube "
    "(SURVEY §2.4/§2.6 'not present' rows) — Expand-based, one shuffle.",
)
def u02_intersect_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    both = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(
            orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
        )
    )
    filtered = orders.join(
        both, orders["o_custkey"] == both["o_custkey"], "left_semi"
    )
    return agg_ops.grouped(
        filtered,
        ["o_orderstatus", "o_orderpriority"],
        [F.count("*").alias("n")],
        mode="cube",
    )


# ---------------------------------------------------------------------------
# Flagship analytical queries (headline bench)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    double_cols=['sum_qty', 'sum_base_price', 'sum_disc_price', 'sum_charge'],
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DECIMAL(38,4)) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2))))
                AS DECIMAL(38,6)) AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary — the headline scan+agg; "
    "decimal-exact, single shuffle, map-side partials.",
    headline=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    price, disc, tax = (
        _dec("l_extendedprice"),
        _dec("l_discount"),
        _dec("l_tax"),
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast(D182).alias("sum_qty"),
            F.sum(price).cast(D182).alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast(D384).alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast(D386)
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    double_cols=['revenue'],
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DECIMAL(38,4)) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
    doc="TPC-H Q3-shaped join+agg: selective dim filter first, fact join "
    "on keys, decimal-exact revenue.",
    headline=True,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat.table("orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = cat.table("lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast(D384).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1995-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-shaped EXISTS: correlated subquery as a left_semi "
    "join (no duplication, right payload never materialized) + count.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = cat.table("lineitem")
    matched = join_ops.semi_join(
        orders,
        li,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q06_revenue_forecast",
    double_cols=['revenue'],
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-shaped selective scan+agg: every predicate pushed to "
    "the parquet scan, single global aggregate, decimal-exact.",
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast(D384)
            .alias("revenue")
        )
    )


@register(
    "q05_region_revenue",
    double_cols=['revenue'],
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DECIMAL(38,4)) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-shaped star join: facts shuffle on join keys once; "
    "nation/region/supplier broadcast.",
    headline=True,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust, orders, li = (
        cat.table("customer"),
        cat.table("orders"),
        cat.table("lineitem"),
    )
    supp, nation, region = (
        cat.table("supplier"),
        cat.table("nation"),
        cat.table("region"),
    )
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey", "n_name")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (supp["s_nationkey"] == cust["c_nationkey"]),
        )
        .join(
            F.broadcast(asia_nations),
            cust["c_nationkey"] == asia_nations["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast(D384).alias("revenue"))
        .select(F.col("n_name").alias("nation_name"), "revenue")
    )


@register(
    "u05_scd2_merge",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment
      FROM customer WHERE c_acctbal > 5000
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           CAST(1 AS INT) AS version,
           DATE '1900-01-01' AS valid_from,
           DATE '2026-02-01' AS valid_to
    FROM customer c
    WHERE c.c_custkey IN (SELECT c_custkey FROM updates)
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(1 AS INT), DATE '1900-01-01', CAST(NULL AS DATE)
    FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(2 AS INT), DATE '2026-02-01', CAST(NULL AS DATE)
    FROM updates
    """,
    doc="SCD type-2 dimension merge (operators/windows.scd2_apply): "
    "changed keys (acctbal>5000 get a new segment) produce a closed "
    "version-1 row + an open version-2 row; unchanged keys stay open. "
    "Semi-join + anti-join + union — history versioning without "
    "rewriting unchanged rows, the lakehouse dimension audit pattern.",
)
def u05_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    updates = (
        cat.table("customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            "c_custkey", "c_name", F.lit("UPDATED").alias("c_mktsegment")
        )
    )
    return windows.scd2_apply(
        cust, updates, "c_custkey", effective_date="2026-02-01"
    )


@register(
    "w06_lag_lead_delta",
    double_cols=['total_price', 'delta_prev', 'next_price'],
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DECIMAL(18,2)) AS total_price,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                - LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DECIMAL(18,2)) AS delta_prev,
           CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DECIMAL(18,2)) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    """,
    doc="LAG/LEAD window navigation: order-over-order price delta per "
    "customer (NULL on each partition edge). One shuffle on the "
    "partition key; the ordering ends in the unique o_orderkey so tie "
    "rows are deterministic cross-engine.",
)
def w06_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tp = _dec("o_totalprice")
    return cat.table("orders").select(
        "o_custkey",
        "o_orderkey",
        tp.alias("total_price"),
        (tp - F.lag(tp).over(w)).cast(D182).alias("delta_prev"),
        F.lead(tp).over(w).cast(D182).alias("next_price"),
    )


@register(
    "w07_ntile_quartiles",
    double_cols=['min_price', 'max_price'],
    oracle="""
    WITH t AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS tp,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey)
               AS quartile
      FROM orders
    )
    SELECT CAST(quartile AS INT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(tp) AS min_price,
           MAX(tp) AS max_price
    FROM t GROUP BY quartile
    """,
    doc="NTILE equal-frequency binning + per-bin profile. The global "
    "window is a single-partition sort — correct here, but the 100-TB "
    "form of this operator is approx_percentile cutpoints + a "
    "stateless bucket join (see a09_percentiles), which this query's "
    "quartile bounds validate against. Unique o_orderkey tiebreaker "
    "makes bin assignment deterministic.",
)
def w07_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = cat.table("orders").select(
        _dec("o_totalprice").alias("tp"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return t.groupBy(F.col("quartile").cast("int").alias("quartile")).agg(
        F.count("*").alias("n"),
        F.min("tp").alias("min_price"),
        F.max("tp").alias("max_price"),
    )


@register(
    "a10_grouping_sets",
    double_cols=['total'],
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,4)) AS total
    FROM orders
    GROUP BY GROUPING SETS (
      (o_orderstatus, o_orderpriority), (o_orderstatus), ()
    )
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube: a custom lattice "
    "subset) with a grouping_id disambiguating real NULLs from "
    "subtotal rows — via the catalog's SQL facade (register_views + "
    "spark.sql). One Expand + one shuffle, same as rollup.",
)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cat.register_views(("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT)
                 AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,4)) AS total
        FROM orders
        GROUP BY GROUPING SETS (
          (o_orderstatus, o_orderpriority), (o_orderstatus), ()
        )
        """
    )


_CDC_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
    "o_orderpriority"
)


def _cdc_fixture(cat) -> tuple[DataFrame, DataFrame]:
    """The synthesized CDC workload u06/u07 share: orders partitioned
    by key % 4 into unchanged / double-versioned update (+5 then +10,
    latest wins) / delete / insert — (base, changes)."""
    o = cat.table("orders").select(*_CDC_COLS.split(", "))
    k = F.col("o_orderkey")
    base = o.filter(k % 4 != 0)

    def tagged(df: DataFrame, op: str, ver: int) -> DataFrame:
        return df.withColumn("op", F.lit(op)).withColumn(
            "ver", F.lit(ver)
        )

    upd = o.filter(k % 4 == 1)
    changes = (
        tagged(
            upd.withColumn("o_totalprice", F.col("o_totalprice") + 5.0),
            "U", 1,
        )
        .unionByName(
            tagged(
                upd.withColumn(
                    "o_totalprice", F.col("o_totalprice") + 10.0
                ),
                "U", 2,
            )
        )
        .unionByName(tagged(o.filter(k % 4 == 0), "I", 1))
        .unionByName(tagged(o.filter(k % 4 == 2), "D", 1))
    )
    return base, changes


@register(
    "u06_cdc_apply",
    double_cols=["o_totalprice"],
    oracle=f"""
    WITH base AS (
      SELECT {_CDC_COLS} FROM orders WHERE o_orderkey % 4 <> 0
    ), ch AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 5.0 AS o_totalprice, o_orderdate,
             o_orderpriority, 'U' AS op, 1 AS ver
      FROM orders WHERE o_orderkey % 4 = 1
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice, o_orderdate,
             o_orderpriority, 'U' AS op, 2 AS ver
      FROM orders WHERE o_orderkey % 4 = 1
      UNION ALL
      SELECT {_CDC_COLS}, 'I' AS op, 1 AS ver
      FROM orders WHERE o_orderkey % 4 = 0
      UNION ALL
      SELECT {_CDC_COLS}, 'D' AS op, 1 AS ver
      FROM orders WHERE o_orderkey % 4 = 2
    ), latest AS (
      SELECT * FROM (
        SELECT ch.*, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY ver DESC
        ) AS rn FROM ch
      ) WHERE rn = 1
    )
    SELECT {_CDC_COLS} FROM base
    ANTI JOIN latest USING (o_orderkey)
    UNION ALL
    SELECT {_CDC_COLS} FROM latest WHERE op IN ('I', 'U')
    """,
    doc="CDC change application (the ODS→datalake sync core): apply an "
    "insert/update/delete batch — two versions for the updated keys — "
    "to a base snapshot via operators/cdc.cdc_apply. Keep-latest is a "
    "partial-aggregated max-struct per key (no window over the change "
    "stream); the base pays one anti-join on the touched keys plus a "
    "union. The synthesized batch partitions orders by key % 4: "
    "unchanged / double-versioned update (+5 then +10, latest wins; "
    "exact IEEE adds) / delete / insert.",
)
def u06_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.cdc import cdc_apply

    base, changes = _cdc_fixture(load_testdata(spark, sf_dir))
    return cdc_apply(
        base, changes, ["o_orderkey"], op_col="op", version_col="ver"
    )


@register(
    "u07_incremental_agg",
    oracle=None,  # assembled from u06's oracle below (single source
    # of truth for the applied snapshot — the IVM correctness claim IS
    # "delta merge == recompute over cdc_apply's output")
    doc="Incremental aggregate maintenance (IVM): refresh a "
    "materialized per-customer (count, non-null count, DECIMAL sum) "
    "aggregate from the u06 CDC batch WITHOUT re-aggregating the fact "
    "table — retractions from the touched keys' before-images (one "
    "semi-join: a key lookup, not a scan), additions from the latest "
    "I/U after-images, full-outer delta merge; groups reaching count "
    "0 drop, new groups appear, all-NULL-measure groups report SUM "
    "NULL exactly like a recompute (maintained non-null counts). The "
    "oracle recomputes the aggregate from u06's applied-snapshot SQL, "
    "so the gate checks the IVM identity itself: old_agg ⊕ delta == "
    "recompute. DECIMAL sums make retraction exact — a float sum "
    "would drift from the recompute one batch at a time.",
    headline=True,  # the IVM trend line (VERDICT r6 item 8)
)
def u07_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.incremental import (
        agg_snapshot,
        cdc_maintain_agg,
    )

    base, changes = _cdc_fixture(load_testdata(spark, sf_dir))
    old = agg_snapshot(base, ["o_custkey"], ["o_totalprice"])
    return cdc_maintain_agg(
        old,
        base,
        changes,
        key_cols=["o_orderkey"],
        group_cols=["o_custkey"],
        sum_cols=["o_totalprice"],
        op_col="op",
        version_col="ver",
    )


# the IVM oracle embeds u06's applied-snapshot SQL (the x25-wraps-x05
# pattern: engine and oracle can only agree if the delta merge equals
# a recompute over the SAME applied rows); u06's oracle arrives here
# already double_cols-wrapped, which is harmless as a subquery. The
# outer REPLACE mirrors register(double_cols=...) by hand since the
# oracle is assembled post-registration.
REGISTRY["u07_incremental_agg"].oracle = f"""
SELECT * REPLACE (CAST(CAST(sum_o_totalprice AS VARCHAR) AS DOUBLE)
                  AS sum_o_totalprice) FROM (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(o_totalprice) AS BIGINT) AS nn_o_totalprice,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_o_totalprice
  FROM ({REGISTRY["u06_cdc_apply"].oracle}) AS applied
  GROUP BY o_custkey
) AS _agg
"""


_CDC_DATA_COLS = [
    "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    "o_orderpriority",
]
_SQL_DIFF_ANY = " OR ".join(
    f"(o.{c} IS DISTINCT FROM n.{c})" for c in _CDC_DATA_COLS
)
_SQL_DIFF_VALS = ", ".join(
    f"CASE WHEN n.o_orderkey IS NULL THEN o.{c} ELSE n.{c} END AS {c}"
    for c in _CDC_DATA_COLS
)


@register(
    "u08_snapshot_diff",
    oracle=None,  # assembled from u06's applied-snapshot SQL below
    doc="Snapshot diff — the CAPTURE side of u06's cdc_apply: diff the "
    "base snapshot against the applied snapshot and emit exactly the "
    "effective change batch (op I/U/D per differing key, new-side "
    "values, old row on deletes; unchanged keys emit nothing). "
    "Null-safe per-column comparison, never row hashing (no "
    "cross-engine-stable rendering of doubles exists); ONE key join, "
    "co-located when the lake is bucketed. Property-tested round "
    "trip: cdc_apply(old, snapshot_diff(old, new)) == new — a lake "
    "without a change feed synthesizes one from consecutive ODS "
    "snapshots.",
)
def u08_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.cdc import cdc_apply, snapshot_diff

    base, changes = _cdc_fixture(load_testdata(spark, sf_dir))
    applied = cdc_apply(
        base, changes, ["o_orderkey"], op_col="op", version_col="ver"
    )
    return snapshot_diff(base, applied, ["o_orderkey"])


REGISTRY["u08_snapshot_diff"].oracle = f"""
SELECT * REPLACE (CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE)
                  AS o_totalprice) FROM (
  SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
         {_SQL_DIFF_VALS},
         CASE WHEN o.o_orderkey IS NULL THEN 'I'
              WHEN n.o_orderkey IS NULL THEN 'D'
              WHEN {_SQL_DIFF_ANY} THEN 'U'
         END AS op
  FROM (SELECT {_CDC_COLS} FROM orders WHERE o_orderkey % 4 <> 0) o
  FULL OUTER JOIN ({REGISTRY["u06_cdc_apply"].oracle}) n
    ON o.o_orderkey = n.o_orderkey
) AS _d WHERE op IS NOT NULL
"""


@register(
    "u09_incremental_join",
    oracle=None,  # assembled from u06's applied-snapshot SQL below —
    # the join-IVM correctness claim IS "old_join ⊕ delta == recompute
    # over cdc_apply's output ⋈ dim"
    doc="Incremental JOIN maintenance (join IVM): refresh a "
    "materialized orders ⋈ customer join from the u06 CDC batch "
    "WITHOUT re-joining the fact table — Δ(F⋈D) = (−touched keys) ∪ "
    "(latest I/U after-images ⋈ D). The old join pays ONE anti-join "
    "on the touched keys; only the change batch meets the (broadcast) "
    "dimension. Same max-struct keep-latest as the row-level apply, "
    "so apply-then-join and maintain-the-join provably resolve the "
    "same winners; the oracle recomputes the join over u06's applied "
    "snapshot.",
)
def u09_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.cdc import cdc_apply  # noqa: F401
    from ods_to_datalake_spark.operators.incremental import (
        cdc_maintain_join,
    )

    cat = load_testdata(spark, sf_dir)
    base, changes = _cdc_fixture(cat)
    dim = cat.table("customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    old_join = base.join(F.broadcast(dim), "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
    )
    return cdc_maintain_join(
        old_join,
        changes,
        key_cols=["o_orderkey"],
        dim=dim,
        dim_keys=["o_custkey"],
        op_col="op",
        version_col="ver",
    )


# join-IVM oracle: recompute over u06's applied snapshot (already
# double_cols-wrapped — o_totalprice arrives as DOUBLE, the exact
# VARCHAR round-trip both engines share)
REGISTRY["u09_incremental_join"].oracle = f"""
SELECT a.o_orderkey, a.o_custkey, a.o_totalprice, c.c_mktsegment
FROM ({REGISTRY["u06_cdc_apply"].oracle}) a
JOIN customer c ON a.o_custkey = c.c_custkey
"""


@register(
    "u10_point_in_time_join",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment
      FROM customer WHERE c_acctbal > 5000
    ),
    hist AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(1 AS INT) AS version,
             DATE '1900-01-01' AS valid_from,
             DATE '1995-06-01' AS valid_to
      FROM customer c
      WHERE c.c_custkey IN (SELECT c_custkey FROM updates)
      UNION ALL
      SELECT c_custkey, c_mktsegment, CAST(1 AS INT),
             DATE '1900-01-01', CAST(NULL AS DATE)
      FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
      UNION ALL
      SELECT c_custkey, c_mktsegment, CAST(2 AS INT),
             DATE '1995-06-01', CAST(NULL AS DATE)
      FROM updates
    )
    SELECT o.o_orderkey, o.o_custkey, h.version, h.c_mktsegment
    FROM orders o JOIN hist h
      ON o.o_custkey = h.c_custkey
     AND o.o_orderdate >= CAST(h.valid_from AS TIMESTAMP)
     AND (h.valid_to IS NULL
          OR o.o_orderdate < CAST(h.valid_to AS TIMESTAMP))
    """,
    doc="Point-in-time (temporal) join: each order attaches the SCD-2 "
    "customer version in force AT ITS ORDER DATE (mid-1995 effective "
    "date splits the order history across versions 1 and 2), via "
    "operators/joins.point_in_time_join over windows.scd2_apply "
    "output. Half-open validity intervals partition each key's "
    "timeline, so every fact matches exactly one version — the "
    "no-label-leakage temporal lookup; equi-key join with the "
    "interval as a post-filter, broadcast-able dimension history.",
)
def u10_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.joins import point_in_time_join
    from ods_to_datalake_spark.operators.windows import scd2_apply

    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    updates = (
        cat.table("customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            "c_custkey", "c_name", F.lit("UPDATED").alias("c_mktsegment")
        )
    )
    hist = scd2_apply(
        cust, updates, "c_custkey", effective_date="1995-06-01"
    )
    facts = cat.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    joined = point_in_time_join(
        facts,
        hist,
        on=facts["o_custkey"] == hist["c_custkey"],
        fact_ts="o_orderdate",
    )
    return joined.select(
        "o_orderkey", "o_custkey", "version", "c_mktsegment"
    )


@register(
    "w08_rising_runs",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             o_orderdate, o_orderkey
      FROM orders
    ),
    flagged AS (
      SELECT o_custkey, v,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
             ) AS rn,
             CASE WHEN v IS NOT NULL
                   AND LAG(v) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                   ) IS NOT NULL
                   AND v > LAG(v) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                   )
                  THEN 1 ELSE 0 END AS rise
      FROM o
    ),
    rid AS (
      SELECT o_custkey,
             rn - CAST(SUM(rise) OVER (
               PARTITION BY o_custkey ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS run_id
      FROM flagged
    ),
    runs AS (
      SELECT o_custkey, run_id, CAST(COUNT(*) AS BIGINT) AS len
      FROM rid GROUP BY o_custkey, run_id
    )
    SELECT o_custkey,
           CAST(SUM(len) AS BIGINT) AS n_rows,
           CAST(MAX(len) AS BIGINT) AS longest_rising_run,
           CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_runs_at_min
    FROM runs GROUP BY o_custkey
    """,
    doc="Maximal strictly-rising order-value runs per customer "
    "(escalating-spend pattern) — the ordered-pattern primitive "
    "(SQL:2016 MATCH_RECOGNIZE's core case) from plain windows via "
    "the gaps-and-islands monotone trick: rise flag, run id = "
    "row_number − running rise count (constant exactly while "
    "consecutive rows rise), per-run lengths, per-key rollup. Total "
    "order per key via (o_orderdate, o_orderkey — the w01 tiebreak "
    "rule); DECIMAL money comparisons exact; NULL values break runs "
    "(SQL comparison semantics, pinned by test). ONE customer "
    "shuffle reused by every window and the final agg. "
    "operators/windows.rising_runs.",
)
def w08_rising_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.windows import rising_runs

    cat = load_testdata(spark, sf_dir)
    return rising_runs(
        cat.table("orders"),
        "o_custkey",
        [F.col("o_orderdate"), F.col("o_orderkey")],
        F.col("o_totalprice").cast("decimal(18,2)"),
        min_run=3,
    )
