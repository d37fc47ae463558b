"""TPC-H completion suite: the 16 query shapes not already covered by
`suite_core` (q01/03/04/05/06/18 live there).

The reference repo is an ETL pipeline, not a benchmark suite — but its
charter (BASELINE.json north star: "same query capabilities ... analytics
engine") makes the full TPC-H shape inventory the natural completeness
bar for the relational surface: every shape here (correlated scalar
subqueries, multi-way join reordering, left-outer count distributions,
EXISTS/NOT EXISTS chains, disjunctive pushdown, scalar-subquery HAVING)
is a pattern an ODS→lakehouse consumer hits eventually.

The driver testdata is a trimmed TPC-H (no partsupp, no
shipmode/commitdate/comment columns — see TESTDATA.md), so queries that
need those columns are ADAPTED: the operator shape (what the optimizer
must do) is preserved; the predicate constants are remapped onto the
columns that exist. Each docstring states the adaptation.

Scale notes (100 TB): every query here keeps dimensions broadcast,
facts shuffled at most once on their join key, and aggregates partial
(map-side combine). Self-joins (q02/q15/q17/q20/q21) reuse one shuffle
of the fact on the correlation key where Spark allows; scalar-subquery
totals (q11/q14/q22) are computed as 1-row broadcast joins, never
driver collects.

Cross-engine determinism (see suite.py header): money through
Decimal(18,2) before summing; ratios = exact decimal sums cast to
double, divided, rounded; year() cast to int in both engines; double
MIN/MAX/equality are order-independent and therefore safe (sums of
raw doubles are not, and are never used).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.operators import joins as join_ops
from ods_to_datalake_spark.plans.money import D182, D384, _dec
from ods_to_datalake_spark.plans.suite import register

def _rev() -> F.Column:
    """Discounted revenue (needs an active session — built per query)."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


def _region_nations(cat, region_name: str) -> DataFrame:
    """nationkey+name slice of one region — always broadcast-sized."""
    nation, region = cat.table("nation"), cat.table("region")
    return nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "n_name")


@register(
    "q02_min_cost_supplier",
    double_cols=['supplier_balance'],
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CASE WHEN l_quantity <> 0
                 THEN l_extendedprice / l_quantity END) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), euro AS (
      SELECT n_nationkey, n_name FROM nation
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
    ), euro_costs AS (
      SELECT c.*, s.s_name, s.s_acctbal, e.n_name
      FROM costs c
      JOIN supplier s ON c.l_suppkey = s.s_suppkey
      JOIN euro e ON s.s_nationkey = e.n_nationkey
    )
    SELECT p.p_partkey, p.p_name, c.s_name, c.n_name,
           CAST(c.s_acctbal AS DECIMAL(18,2)) AS supplier_balance,
           c.unit_cost AS unit_cost
    FROM part p
    JOIN euro_costs c ON c.l_partkey = p.p_partkey
    WHERE p.p_size < 10 AND p.p_type = 'STANDARD'
      AND c.unit_cost = (
        SELECT MIN(c2.unit_cost) FROM euro_costs c2
        WHERE c2.l_partkey = p.p_partkey
      )
    """,
    doc="TPC-H Q2 shape (correlated scalar-MIN subquery picking the "
    "cheapest regional supplier per part). Adapted: no partsupp table, "
    "so the part⋈supplier bridge with unit cost is derived from "
    "lineitem (min observed unit price per pair); the correlated MIN "
    "becomes a window-min over the partition key — one shuffle on "
    "l_partkey serves both the agg and the correlation. Double MIN and "
    "double equality are order-independent → cross-engine safe; the "
    "output cost stays unrounded (see inline note — caught by the "
    "sf0.1 full-sweep, one midpoint hit among 574 rows).",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = load_testdata(spark, sf_dir)
    li, supp, part = (
        cat.table("lineitem"),
        cat.table("supplier"),
        cat.table("part"),
    )
    euro = _region_nations(cat, "EUROPE")
    # zero-quantity lines (free samples, data glitches) must NULL out
    # of the unit-cost MIN, not throw DIVIDE_BY_ZERO under ANSI — the
    # oracle carries the same CASE guard
    unit = F.when(
        F.col("l_quantity") != 0,
        F.col("l_extendedprice") / F.col("l_quantity"),
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit).alias("unit_cost")
    )
    euro_costs = costs.join(
        F.broadcast(
            supp.join(
                F.broadcast(euro),
                supp["s_nationkey"] == euro["n_nationkey"],
            ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
        ),
        costs["l_suppkey"] == F.col("s_suppkey"),
    )
    w = Window.partitionBy("l_partkey")
    cheapest = euro_costs.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).filter(F.col("unit_cost") == F.col("min_cost"))
    wanted = part.filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "STANDARD")
    )
    return cheapest.join(
        F.broadcast(wanted), cheapest["l_partkey"] == wanted["p_partkey"]
    ).select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        F.col("s_acctbal").cast(D182).alias("supplier_balance"),
        # raw double, deliberately NOT rounded: extendedprice/quantity
        # is a cents-exact value over an integer, which lands exactly on
        # decimal midpoints (e.g. 954.29875) where Spark (binary
        # expansion, half-up) and DuckDB (shortest repr, half-away)
        # round differently; the unrounded doubles are bit-identical
        "unit_cost",
    )


@register(
    "q07_volume_shipping",
    double_cols=['revenue'],
    oracle="""
    SELECT supp_nation, cust_nation, ship_year,
           CAST(SUM(volume) AS DECIMAL(38,4)) AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(YEAR(l.l_shipdate) AS INTEGER) AS ship_year,
             {rev} AS volume
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
          OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
    ) shipping
    GROUP BY supp_nation, cust_nation, ship_year
    """.format(rev=_REV_SQL),
    doc="TPC-H Q7 shape (volume shipping between two nations): "
    "symmetric nation-pair disjunction, two broadcast decodes of the "
    "same dimension under different roles, year bucketing. Fact "
    "tables shuffle once on their join keys; both nation joins and "
    "supplier are broadcast.",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders, cust, supp = (
        cat.table("orders"),
        cat.table("customer"),
        cat.table("supplier"),
    )
    nation = cat.table("nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(ns), supp["s_nationkey"] == F.col("ns_key")
        )
        .join(
            F.broadcast(nc), cust["c_nationkey"] == F.col("nc_key")
        )
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(_rev()).cast(D384).alias("revenue"))
    )


@register(
    "q08_market_share",
    oracle="""
    SELECT order_year,
           ROUND(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_8'
                           THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
             {rev} AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY order_year
    """.format(rev=_REV_SQL),
    doc="TPC-H Q8 shape (national market share): conditional share of a "
    "decimal volume, per year, inside a customer-region slice. The "
    "share ratio is exact-decimal sums cast to double then divided — "
    "order-independent, so safe cross-engine. Part/supplier/nation/"
    "region all broadcast; the 3 fact tables shuffle once each.",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    part = cat.table("part").filter(F.col("p_type") == "PROMO")
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust, supp = cat.table("customer"), cat.table("supplier")
    ns = cat.table("nation").select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    america = _region_nations(cat, "AMERICA")
    vol = _rev()
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(america),
            cust["c_nationkey"] == america["n_nationkey"],
        )
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(ns), supp["s_nationkey"] == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_8", vol
                    ).otherwise(F.lit(0).cast(D182))
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q09_product_profit",
    double_cols=['sum_profit'],
    oracle="""
    SELECT nation_name, order_year,
           CAST(SUM(amount) AS DECIMAL(38,4)) AS sum_profit
    FROM (
      SELECT n.n_name AS nation_name,
             CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
             {rev}
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(18,2))
               * CAST(0.1 AS DECIMAL(18,2)) AS amount
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation_name, order_year
    """.format(rev=_REV_SQL),
    doc="TPC-H Q9 shape (product-line profit by nation and year). "
    "Adapted: supply cost (ps_supplycost, no partsupp table) is proxied "
    "as 10%% of p_retailprice — the arithmetic shape (rev minus "
    "cost*qty, summed by nation/year) is unchanged. All-decimal "
    "arithmetic keeps the profit exact in both engines.",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li, orders, supp = (
        cat.table("lineitem"),
        cat.table("orders"),
        cat.table("supplier"),
    )
    part = cat.table("part").filter(F.col("p_name").like("%red%"))
    nation = cat.table("nation").select("n_nationkey", "n_name")
    amount = _rev() - (
        _dec("p_retailprice")
        * _dec("l_quantity")
        * F.lit(0.1).cast(D182)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.sum(amount).cast(D384).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    double_cols=['revenue', 'acctbal'],
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({rev}) AS DECIMAL(38,4)) AS revenue,
           CAST(c.c_acctbal AS DECIMAL(18,2)) AS acctbal,
           n.n_name AS nation_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    """.format(rev=_REV_SQL),
    doc="TPC-H Q10 shape (returned-item revenue per customer): "
    "fact⋈fact join narrowed by a returnflag filter pushed to the "
    "lineitem scan, wide group-by keys carrying customer attributes "
    "through the aggregate (grouping on the key + payload columns "
    "avoids a post-agg re-join).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer")
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = cat.table("lineitem").filter(F.col("l_returnflag") == "R")
    nation = cat.table("nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast(D384).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast(D182).alias("acctbal"),
            F.col("n_name").alias("nation_name"),
        )
    )


@register(
    "q11_important_values",
    double_cols=['part_value'],
    oracle="""
    WITH values_by_part AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2))) AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_4'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DECIMAL(38,4)) AS part_value
    FROM values_by_part
    WHERE 1000 * part_value > (
      SELECT SUM(part_value) FROM values_by_part
    )
    """,
    doc="TPC-H Q11 shape (important stock values): per-key value sums "
    "HAVING-filtered against a scalar fraction of the grand total. "
    "Adapted: value = extendedprice*quantity from lineitem (no "
    "partsupp). The scalar subquery is a 1-row broadcast cross-join — "
    "never a driver collect; the per-part agg is computed once and "
    "reused for both sides.",
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li, supp = cat.table("lineitem"), cat.table("supplier")
    nation = cat.table("nation").filter(F.col("n_name") == "NATION_4")
    nat_supp = supp.join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"]
    ).select("s_suppkey")
    by_part = (
        li.join(F.broadcast(nat_supp), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias(
                "part_value"
            )
        )
    )
    # 1000*value > total, NOT value > 0.001*total: the integer-scaled
    # decimal comparison is exact in both engines (0.001 as a double
    # literal can flip strict > at the exact-fraction boundary)
    total = by_part.agg(F.sum("part_value").alias("grand_total"))
    return (
        by_part.join(F.broadcast(total))
        .filter(F.lit(1000) * F.col("part_value") > F.col("grand_total"))
        .select("l_partkey", F.col("part_value").cast(D384).alias("part_value"))
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (shipmode vs priority matrix): join-predicate "
    "lateness filter (shipdate past orderdate — adapted from "
    "receipt/commit dates, which the testdata lacks) + dual "
    "conditional counts split by priority class, grouped by a lineitem "
    "attribute (returnflag standing in for shipmode).",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): "
    "left-outer join with an extra join-side predicate (priority "
    "exclusion adapted from the comment NOT LIKE filter), COUNT of the "
    "nullable side preserving zero-order customers, then a second "
    "aggregation over the counts — the canonical histogram-of-counts "
    "double shuffle.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer")
    orders = cat.table("orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN {rev} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({rev}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
    """.format(rev=_REV_SQL),
    doc="TPC-H Q14 shape (promotion revenue share): single-month scan, "
    "broadcast part join, conditional-share-of-total as exact decimal "
    "sums divided in double and rounded.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = cat.table("part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
                        F.lit(0).cast(D182)
                    )
                ).cast("double")
                / F.sum(_rev()).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    double_cols=['total_revenue'],
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({rev}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DECIMAL(38,4)) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """.format(rev=_REV_SQL),
    doc="TPC-H Q15 shape (top supplier via the revenue view): the "
    "quarter's per-supplier revenue computed once, the scalar MAX "
    "joined back as a 1-row broadcast (ties all kept, as in the spec). "
    "Exact-decimal revenue makes the MAX-equality safe cross-engine.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = cat.table("supplier").select("s_suppkey", "s_name")
    revenue = li.groupBy(
        F.col("l_suppkey").alias("supplier_no")
    ).agg(F.sum(_rev()).alias("total_revenue"))
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast(D384).alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT b.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
    JOIN part p ON b.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#25'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND b.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (supplier counts per part class): distinct "
    "part⋈supplier bridge (adapted from partsupp to observed lineitem "
    "pairs), negated predicates, NOT-IN subquery excluding "
    "blacklisted suppliers (acctbal<0 standing in for the complaints "
    "comment filter) as a broadcast anti-join, COUNT DISTINCT per "
    "3-attribute class.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    bridge = (
        cat.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = cat.table("part").filter(
        (F.col("p_brand") != "Brand#25")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = cat.table("supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        join_ops.anti_join(
            bridge, bad_supp, bridge["l_suppkey"] == bad_supp["s_suppkey"]
        )
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH thresholds AS (
      SELECT l_partkey,
             0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN thresholds t ON l.l_partkey = t.l_partkey
    WHERE p.p_brand = 'Brand#12' AND p.p_type = 'SMALL'
      AND l.l_quantity < t.qty_threshold
    """,
    doc="TPC-H Q17 shape (small-quantity order revenue): correlated "
    "AVG subquery per part — computed as a per-key mean joined back on "
    "the same shuffle key. The mean is exact-decimal-sum / count cast "
    "to double, so both engines derive the identical threshold "
    "(a raw double AVG would be summation-order-dependent).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    part = cat.table("part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "SMALL")
    )
    thresholds = li.groupBy(
        F.col("l_partkey").alias("t_partkey")
    ).agg(
        (
            F.lit(0.5)
            * F.sum(_dec("l_quantity")).cast("double")
            / F.count("*")
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(thresholds, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0),
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_predicates",
    double_cols=['revenue'],
    oracle="""
    SELECT CAST(SUM({rev}) AS DECIMAL(38,4)) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """.format(rev=_REV_SQL),
    doc="TPC-H Q19 shape (three-way disjunction of conjunctive "
    "brand/size/quantity ranges across the join): the OR-of-ANDs mixes "
    "columns from both sides, so it must evaluate post-join, but the "
    "single-side prefixes (brand+size on part, quantity envelope on "
    "lineitem) are derivable by the optimizer for pushdown. Shipmode/"
    "container predicates adapted to size/quantity (columns absent).",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li, part = cat.table("lineitem"), cat.table("part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(F.sum(_rev()).cast(D384).alias("revenue"))
    )


@register(
    "q20_part_promotion",
    oracle="""
    WITH pair_qty AS (
      SELECT l_partkey, l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                       AND l_shipdate <  TIMESTAMP '1996-01-01'
                      THEN CAST(l_quantity AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1995,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_1'
      AND s.s_suppkey IN (
        SELECT q.l_suppkey FROM pair_qty q
        WHERE q.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND 10 * q.qty_1995 > 3 * q.qty_all
      )
    """,
    doc="TPC-H Q20 shape (suppliers with excess availability of "
    "promoted parts): nested IN-subquery chain — parts by name prefix "
    "→ qualifying part⋈supplier pairs → suppliers — each level a "
    "semi-join, never duplicating rows. Adapted: availability "
    "(ps_availqty) becomes the pair's 1995 shipped share exceeding "
    "30%% of its all-time quantity, computed in one grouped pass with "
    "conditional sums (exact decimals both sides).",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    in_1995 = (
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    pair_qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.when(in_1995, _dec("l_quantity")).otherwise(
                F.lit(0).cast(D182)
            )
        ).alias("qty_1995"),
        F.sum(_dec("l_quantity")).alias("qty_all"),
    )
    small_parts = cat.table("part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    qualifying = join_ops.semi_join(
        # 10*q95 > 3*qall, NOT q95 > 0.3*qall: integer-scaled decimal
        # comparison stays exact in both engines (0.3 is not binary-
        # representable; a double threshold can flip strict > at exact
        # 30% boundaries, which integer quantities hit routinely)
        pair_qty.filter(
            F.lit(10) * F.col("qty_1995") > F.lit(3) * F.col("qty_all")
        ),
        small_parts,
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_suppkey")
    nation = cat.table("nation").filter(F.col("n_name") == "NATION_1")
    supp = cat.table("supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == nation["n_nationkey"],
    )
    return join_ops.semi_join(
        supp, qualifying, supp["s_suppkey"] == F.col("l_suppkey")
    ).select("s_suppkey", "s_name")


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
                   AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
                   AND n.n_name = 'NATION_5'
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (suppliers who alone held up an order): "
    "EXISTS + NOT EXISTS self-joins on the fact's own key with an "
    "inequality on the second attribute — a semi-join and an anti-join "
    "reusing the same l_orderkey shuffle. Lateness (receipt past "
    "commit date) adapted to returnflag='R'; the sole-blame logic is "
    "verbatim.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    orders = cat.table("orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    nation = cat.table("nation").filter(F.col("n_name") == "NATION_5")
    supp = (
        cat.table("supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation["n_nationkey"],
        )
        .select("s_suppkey", "s_name")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    base = (
        l1.join(orders, F.col("l1.l_orderkey") == orders["o_orderkey"])
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp["s_suppkey"])
    )
    with_other = join_ops.semi_join(
        base,
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
    )
    sole_blame = join_ops.anti_join(
        with_other,
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
    )
    return sole_blame.groupBy("s_name").agg(
        F.count("*").alias("numwait")
    )


@register(
    "q22_global_sales_opportunity",
    double_cols=['totacctbal'],
    oracle="""
    WITH eligible AS (
      SELECT CAST(c_custkey % 7 AS VARCHAR) AS cntrycode,
             c_custkey, c_acctbal
      FROM customer
      WHERE CAST(c_custkey % 7 AS VARCHAR) IN ('1','2','4','6')
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,4))
             AS totacctbal
    FROM eligible e
    WHERE e.c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = e.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape (idle wealthy customers by country code): "
    "scalar-AVG subquery threshold (exact decimal-sum/count, broadcast "
    "1-row join) + NOT EXISTS anti-join against orders + group-by a "
    "derived code. Country code adapted from phone-prefix (absent) to "
    "custkey mod 7; 'has no orders' adapted to 'no orders since "
    "2000-01-01' because every testdata customer has at least one "
    "order (the verbatim predicate validates vacuously on 0 rows).",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer")
    eligible = cust.withColumn(
        "cntrycode", (F.col("c_custkey") % 7).cast("string")
    ).filter(F.col("cntrycode").isin("1", "2", "4", "6"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    recent_orders = (
        cat.table("orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    rich = eligible.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = join_ops.anti_join(
        rich, recent_orders, rich["c_custkey"] == recent_orders["o_custkey"]
    )
    return idle.groupBy("cntrycode").agg(
        F.count("*").alias("numcust"),
        F.sum(_dec("c_acctbal")).cast(D384).alias("totacctbal"),
    )
