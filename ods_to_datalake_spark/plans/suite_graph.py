"""Graph & planning-estimate suite (round 7): exact-integer PageRank
over the supplier↔customer trade graph (g01) and count-min join-size
estimation (x64) — iterative graph analytics beyond connected
components, and the optimizer's join-cardinality oracle as a
mergeable lake artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.operators.graph import (
    PR_DEN,
    PR_NUM,
    PR_SCALE,
    pagerank_integer,
)
from ods_to_datalake_spark.operators.sketch import (
    cms_join_size,
    cms_sketch,
)
from ods_to_datalake_spark.plans.suite import register
from ods_to_datalake_spark.plans.suite_sketch import SQL_CMS_ROWS

PR_ITERATIONS = 5

# x64: the collision term of the inner-product bound is ~|A||B|/width,
# so a join-size sketch needs width >> distinct keys to be informative
# (the default 512-wide point-query grid would drown 60k true matches
# in ~1.8M collision mass at sf0.01); 2^16 cells is still a tiny,
# mergeable artifact
JOIN_CMS_WIDTH = 65536


def _pagerank_oracle(iterations: int) -> str:
    """Chained-CTE mirror of `pagerank_integer` (one CTE per
    iteration — the fixed-point loop unrolled; DuckDB `//` truncates
    like Spark `div` for the non-negative operands here)."""
    base = f"(({PR_DEN - PR_NUM} * {PR_SCALE}) // ({PR_DEN} * nn.n))"
    ctes = [
        f"""pairs AS (
      SELECT DISTINCT 2*l_suppkey AS src, 2*o_custkey+1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_suppkey IS NOT NULL AND o_custkey IS NOT NULL
    )""",
        """edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    )""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges) AS _u
    )""",
        """deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    )""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"""r0 AS (
      SELECT node, CAST({PR_SCALE} // nn.n AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
    )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""r{k} AS (
      SELECT nd.node,
             CAST({base} + ({PR_NUM} * COALESCE(s.sm, 0)) // {PR_DEN}
               AS BIGINT) AS r
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(rp.r // dg.outdeg) AS sm
        FROM edges e
        JOIN r{k - 1} rp ON e.src = rp.node
        JOIN deg dg ON dg.node = e.src
        GROUP BY e.dst
      ) s ON s.node = nd.node
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r FROM r{iterations}"
    )


@register(
    "g01_pagerank",
    oracle=_pagerank_oracle(PR_ITERATIONS),
    doc=f"Exact-integer PageRank ({PR_ITERATIONS} iterations, d=0.85 "
    "as an 85/100 integer split, ranks scaled by 1e12) over the "
    "symmetric supplier↔customer trade graph (distinct shipped-to "
    "pairs from lineitem ⋈ orders; node ids parity-namespaced "
    "2*suppkey / 2*custkey+1). Float PageRank sums in partition "
    "order — no cross-engine bit stability — so every contribution "
    "is truncating-integer `r div outdeg` and the BIGINT sum is "
    "exact and order-free (operators/graph.pagerank_integer); the "
    "deterministic truncation drip is ~1e-10 of total mass. Each "
    "iteration is one src-keyed join + one dst-keyed partial agg; "
    "at real scale the edge table is bucketed by src so every "
    "iteration's join is co-located, and ranks localCheckpoint "
    "every few rounds (the connected-components rule).",
)
def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        )
        .where(
            F.col("l_suppkey").isNotNull()
            & F.col("o_custkey").isNotNull()
        )
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.union(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    return pagerank_integer(edges, iterations=PR_ITERATIONS)


def _pagerank_dangling_oracle(iterations: int) -> str:
    """Unrolled-CTE mirror of `pagerank_integer(...,
    redistribute_dangling=True)` on the geo DAG: per round, the sink
    rank sum (nodes absent from deg) is a 1-row CTE cross-joined into
    the update — ``dsum // n`` with non-negative operands matches
    Spark's ``div`` (CLAUDE.md)."""
    base = f"(({PR_DEN - PR_NUM} * {PR_SCALE}) // ({PR_DEN} * nn.n))"
    ctes = [
        """edges AS (
      SELECT src, dst FROM (
        SELECT 4*c_custkey AS src, 4*c_nationkey+2 AS dst FROM customer
        UNION ALL
        SELECT 4*s_suppkey+1, 4*s_nationkey+2 FROM supplier
        UNION ALL
        SELECT 4*n_nationkey+2, 4*n_regionkey+3 FROM nation
      ) AS _p WHERE src IS NOT NULL AND dst IS NOT NULL
    )""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges) AS _u
    )""",
        """deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    )""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"""r0 AS (
      SELECT node, CAST({PR_SCALE} // nn.n AS BIGINT) AS r
      FROM nodes CROSS JOIN nn
    )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""d{k} AS (
      SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dsum
      FROM r{k - 1}
      WHERE node NOT IN (SELECT node FROM deg)
    )""")
        ctes.append(f"""r{k} AS (
      SELECT nd.node,
             CAST({base} + ({PR_NUM} *
                 (COALESCE(s.sm, 0) + d{k}.dsum // nn.n)) // {PR_DEN}
               AS BIGINT) AS r
      FROM nodes nd CROSS JOIN nn CROSS JOIN d{k}
      LEFT JOIN (
        SELECT e.dst AS node, SUM(rp.r // dg.outdeg) AS sm
        FROM edges e
        JOIN r{k - 1} rp ON e.src = rp.node
        JOIN deg dg ON dg.node = e.src
        GROUP BY e.dst
      ) s ON s.node = nd.node
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r FROM r{iterations}"
    )


@register(
    "g02_pagerank_dangling",
    oracle=_pagerank_dangling_oracle(PR_ITERATIONS),
    doc=f"Mass-conserving integer PageRank ({PR_ITERATIONS} "
    "iterations) over the DIRECTED customer/supplier→nation→region "
    "DAG (node ids namespaced mod 4) — the 5 region nodes are pure "
    "sinks, so without the dangling term ~all rank would drip out of "
    "the system by round 5 (the g01 simplified variant documents "
    "exactly this hazard; every real web/citation/follower graph has "
    "sinks on day one). The standard redistribution — every node "
    "also receives d·(Σ sink ranks)/N — stays integer-exact: the "
    "sink SET is loop-invariant (one anti-join, checkpointed once), "
    "its per-round rank sum is a 1-row broadcast crossJoin, and "
    "`dangling_sum div n` rides the same truncating arithmetic, so "
    "the unrolled-CTE oracle is bit-identical "
    "(operators/graph.pagerank_integer redistribute_dangling=True).",
)
def g02_pagerank_dangling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer").select(
        (F.col("c_custkey") * 4).alias("src"),
        (F.col("c_nationkey") * 4 + 2).alias("dst"),
    )
    supp = cat.table("supplier").select(
        (F.col("s_suppkey") * 4 + 1).alias("src"),
        (F.col("s_nationkey") * 4 + 2).alias("dst"),
    )
    nat = cat.table("nation").select(
        (F.col("n_nationkey") * 4 + 2).alias("src"),
        (F.col("n_regionkey") * 4 + 3).alias("dst"),
    )
    edges = cust.union(supp).union(nat)
    return pagerank_integer(
        edges,
        iterations=PR_ITERATIONS,
        redistribute_dangling=True,
    )


def _sql_cms(table: str, key: str) -> str:
    return f"""(
      SELECT cms_row,
             CAST(concat('0x', substring(md5(concat(
                 'cms', CAST(cms_row AS VARCHAR), ':',
                 CAST({key} AS VARCHAR))), 1, 8))
               AS BIGINT) % {JOIN_CMS_WIDTH} AS cms_bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table}, {SQL_CMS_ROWS}
      WHERE {key} IS NOT NULL
      GROUP BY 1, 2
    )"""


@register(
    "x64_cms_join_size",
    oracle=f"""
    WITH ska AS {_sql_cms("orders", "o_orderkey")},
    skb AS {_sql_cms("lineitem", "l_orderkey")},
    dots AS (
      SELECT r.cms_row,
             CAST(COALESCE(SUM(a.cnt * b.cnt), 0) AS BIGINT) AS dot
      FROM {SQL_CMS_ROWS.replace("AS _r", "AS r")}
      LEFT JOIN ska a ON a.cms_row = r.cms_row
      LEFT JOIN skb b ON b.cms_row = a.cms_row
       AND b.cms_bucket = a.cms_bucket
      GROUP BY r.cms_row
    )
    SELECT (SELECT CAST(MIN(dot) AS BIGINT) FROM dots)
             AS est_join_size,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM orders JOIN lineitem
                ON o_orderkey = l_orderkey) AS exact_join_size
    """,
    doc="Equi-join cardinality estimation from two count-min "
    "sketches on the join keys (Cormode & Muthukrishnan 2005 §4.2): "
    "per-row inner product of the orders/lineitem key grids, MIN "
    "over depth rows — a provable UPPER bound on |orders ⋈ "
    "lineitem|, audited in-row against the exact join count (est >= "
    "exact by construction; the exact leg exists only for the "
    "audit). The optimizer's join-size oracle as a lake artifact: "
    "both sketches are mergeable fixed-size tables built once per "
    "partition, so planning-time estimates never rescan the facts — "
    "the estimate itself joins two depth×width grids, driver-free "
    "and integer-exact (operators/sketch.cms_join_size).",
)
def x64_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    ska = cms_sketch(
        cat.table("orders"), "o_orderkey", width=JOIN_CMS_WIDTH
    )
    skb = cms_sketch(
        cat.table("lineitem"), "l_orderkey", width=JOIN_CMS_WIDTH
    )
    est = cms_join_size(ska, skb)
    orders = cat.table("orders")
    li = cat.table("lineitem")
    exact = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).agg(F.count(F.lit(1)).alias("exact_join_size"))
    return est.crossJoin(exact)


# x69/g03: distinct co-ordered part pairs — x69 registers the pair
# table (min_count=2 keeps the emitted matrix signal-bearing), g03
# closes triangles over the FULL pair graph (min_count=1), embedding
# x69's items CTE in its oracle (the x25-in-x66 single-source rule)
SQL_BASKET_ITEMS = """(
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    )"""


@register(
    "x69_part_cooccurrence",
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS}
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_baskets
    FROM items a JOIN items b
      ON a.basket = b.basket AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING COUNT(*) >= 2
    """,
    doc="Market-basket co-occurrence: part pairs appearing together "
    "in >= 2 orders — the 'bought X also bought Y' recommendation "
    "primitive and the edge-builder for the item graph (g03 "
    "consumes it). Distinct (order, part) pairs, one basket-keyed "
    "self-join emitting C(|basket|,2) ordered pairs (work bounded by "
    "BASKET width, never corpus size), one partial-aggregated count; "
    "a degenerate mega-basket is the skew hazard, so the operator "
    "takes an opt-in max_basket cap + oversized_baskets report (the "
    "dedup.cap_bucket_width contract; the registered query is "
    "uncapped — its oracle matches exactly). "
    "operators/basket.cooccurrence.",
)
def x69_part_cooccurrence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence

    cat = load_testdata(spark, sf_dir)
    return cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )


@register(
    "g03_triangle_count",
    headline=True,  # graph-family bench trend line (VERDICT r9 ask #6):
    # the headline set predated the graph/basket families entirely; the
    # degree-oriented wedge join is the family's heaviest registered
    # plan shape. Added round 10 — BENCH_r10 onward reports 13 queries;
    # keep the set stable so the series stays comparable.
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS},
    e AS (
      SELECT DISTINCT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) AS _u
      GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (da.d, e.a) < (db.d, e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN (da.d, e.a) < (db.d, e.b)
                  THEN e.b ELSE e.a END AS v,
             CASE WHEN (da.d, e.a) < (db.d, e.b)
                  THEN db.d ELSE da.d END AS dv
      FROM e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b
    ),
    w AS (
      SELECT o1.v AS v, o2.v AS w
      FROM o o1 JOIN o o2
        ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM w JOIN o ON o.u = w.v AND o.v = w.w
    """,
    doc="Exact triangle count over the part co-purchase graph "
    "(115k edges at sf0.01) via degree-ordered edge orientation "
    "(compact-forward, Schank & Wagner 2005): every edge points from "
    "its lower-(degree,id) endpoint to the higher, so wedge fan-out "
    "is bounded by O(sqrt(m)) per node on ANY graph — a celebrity "
    "node (degree 1e7 in a follower graph) emits thousands of "
    "wedges, not 1e14, which is the whole difference between "
    "triangle counting that finishes at 100 TB and one that doesn't. "
    "Each triangle is counted once at its lowest corner; the plan is "
    "a degree agg + two node-keyed equi-joins, no windows (a global "
    "degree RANK would be a single-partition sort — struct "
    "comparisons keep the order local). Both engines compare "
    "(degree, id) tuples lexicographically; counts are exact "
    "BIGINTs. operators/graph.triangle_count.",
)
def g03_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import triangle_count

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=1
    )
    # cooccurrence output is already one row per (a < b) pair (it IS a
    # groupBy over the pair), so the operator's dedup Exchange of the
    # full edge stream is skipped (assume_distinct — OPTIMIZATION_r12)
    return triangle_count(
        edges, "item_a", "item_b", assume_distinct=True
    )


def _ppr_oracle(iterations: int) -> str:
    """Unrolled-CTE mirror of personalized PageRank on the geo DAG:
    teleport base, initial mass, and the per-round sink redistribution
    all land on the SEED set (nation-0 customers); non-seeds receive
    only propagated mass. Same truncating arithmetic as g01/g02."""
    base = f"(({PR_DEN - PR_NUM} * {PR_SCALE}) // ({PR_DEN} * ss.s))"
    ctes = [
        """edges AS (
      SELECT src, dst FROM (
        SELECT 4*c_custkey AS src, 4*c_nationkey+2 AS dst FROM customer
        UNION ALL
        SELECT 4*s_suppkey+1, 4*s_nationkey+2 FROM supplier
        UNION ALL
        SELECT 4*n_nationkey+2, 4*n_regionkey+3 FROM nation
      ) AS _p WHERE src IS NOT NULL AND dst IS NOT NULL
    )""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges) AS _u
    )""",
        """deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY src
    )""",
        """sd AS (
      SELECT DISTINCT 4*c_custkey AS node FROM customer
      WHERE c_nationkey = 0 AND c_custkey IS NOT NULL
    )""",
        "ss AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM sd)",
        f"""r0 AS (
      SELECT n.node,
             CAST(CASE WHEN sj.node IS NOT NULL
                  THEN {PR_SCALE} // ss.s ELSE 0 END AS BIGINT) AS r
      FROM nodes n CROSS JOIN ss
      LEFT JOIN sd sj ON sj.node = n.node
    )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""d{k} AS (
      SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dsum
      FROM r{k - 1}
      WHERE node NOT IN (SELECT node FROM deg)
    )""")
        ctes.append(f"""r{k} AS (
      SELECT nd.node,
             CAST(CASE WHEN sj.node IS NOT NULL THEN {base}
                       ELSE 0 END
                  + ({PR_NUM} * (COALESCE(s.sm, 0)
                      + CASE WHEN sj.node IS NOT NULL
                             THEN d{k}.dsum // ss.s
                             ELSE 0 END)) // {PR_DEN}
               AS BIGINT) AS r
      FROM nodes nd CROSS JOIN ss CROSS JOIN d{k}
      LEFT JOIN sd sj ON sj.node = nd.node
      LEFT JOIN (
        SELECT e.dst AS node, SUM(rp.r // dg.outdeg) AS sm
        FROM edges e
        JOIN r{k - 1} rp ON e.src = rp.node
        JOIN deg dg ON dg.node = e.src
        GROUP BY e.dst
      ) s ON s.node = nd.node
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r FROM r{iterations}"
    )


@register(
    "g04_personalized_pagerank",
    oracle=_ppr_oracle(PR_ITERATIONS),
    doc=f"Personalized (seeded) integer PageRank ({PR_ITERATIONS} "
    "iterations) on the geo DAG, teleporting to the nation-0 "
    "customer cohort: the (1-d) base, the initial mass, AND the "
    "dangling redistribution all land uniformly on the SEED set, so "
    "ranks measure importance RELATIVE to the seeds — the "
    "similar-items / TrustRank / personalized-recommendation variant "
    "of g01's global walk. Non-seed nodes hold rank only while mass "
    "flows through them (their stationary share decays toward the "
    "propagated term alone). Same exact-integer arithmetic — seed "
    "gating is a CASE on a checkpointed loop-invariant flag column, "
    "`dangling_sum div |S|` replaces `div N` — so the unrolled-CTE "
    "oracle stays bit-identical; seeds=None reproduces g01's classic "
    "update bit-for-bit through the SAME code path (unit-tested). "
    "operators/graph.pagerank_integer(seeds=...).",
)
def g04_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    cust = cat.table("customer")
    supp = cat.table("supplier")
    nat = cat.table("nation")
    edges = (
        cust.select(
            (F.col("c_custkey") * 4).alias("src"),
            (F.col("c_nationkey") * 4 + 2).alias("dst"),
        )
        .union(
            supp.select(
                (F.col("s_suppkey") * 4 + 1).alias("src"),
                (F.col("s_nationkey") * 4 + 2).alias("dst"),
            )
        )
        .union(
            nat.select(
                (F.col("n_nationkey") * 4 + 2).alias("src"),
                (F.col("n_regionkey") * 4 + 3).alias("dst"),
            )
        )
    )
    seeds = cust.where(F.col("c_nationkey") == 0).select(
        (F.col("c_custkey") * 4).alias("node")
    )
    return pagerank_integer(
        edges,
        iterations=PR_ITERATIONS,
        redistribute_dangling=True,
        seeds=seeds,
    )


# x70/x71 share x69's pair base (min_count=2) — the Apriori trio and
# the serving-side top-k over the same co-occurrence artifact
SQL_PART_PAIRS = f"""(
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_baskets
      FROM {SQL_BASKET_ITEMS.strip()} a
      JOIN {SQL_BASKET_ITEMS.strip()} b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    )"""


@register(
    "x70_association_rules",
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS},
    pairs AS {SQL_PART_PAIRS.replace(SQL_BASKET_ITEMS.strip(), "items")},
    ic AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
      FROM items GROUP BY item
    ),
    tot AS (
      SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items
    )
    SELECT p.item_a, p.item_b, ia.n_item AS n_a, ib.n_item AS n_b,
           p.n_baskets,
           CAST(p.n_baskets AS DOUBLE) / CAST(tot.n AS DOUBLE)
             AS support,
           CAST(p.n_baskets AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
             AS confidence,
           CAST(CAST(CAST(p.n_baskets AS HUGEINT) * tot.n AS VARCHAR)
                AS DOUBLE)
           / CAST(CAST(CAST(ia.n_item AS HUGEINT) * ib.n_item
                       AS VARCHAR) AS DOUBLE) AS lift
    FROM pairs p
    JOIN ic ia ON ia.item = p.item_a
    JOIN ic ib ON ib.item = p.item_b
    CROSS JOIN tot
    """,
    doc="Association-rule mining over co-ordered part pairs: the "
    "Apriori trio — support n_ab/N, confidence(a→b) n_ab/n_a, lift "
    "(n_ab·N)/(n_a·n_b) — on every pair in >= 2 orders. Each ratio "
    "is ONE IEEE division of exact integers (the q02 raw-quotient "
    "rule); the lift operands are corpus-count PRODUCTS, so they "
    "ride DECIMAL(38,0)/HUGEINT (int64 overflows at ~1e10 baskets, "
    "the x68 rule) with the oracle's HUGEINT→DOUBLE cast "
    "round-tripped through VARCHAR. Plan: the basket-width-bounded "
    "pair join, an item-cardinality count joined to each side, a "
    "1-row basket-total broadcast — the rule table is a mergeable "
    "lake artifact extending x69's edges. "
    "operators/basket.association_rules.",
)
def x70_association_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import (
        association_rules,
    )

    cat = load_testdata(spark, sf_dir)
    return association_rules(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )


def _llr_term_sql(k: str, row_total: str, col_total: str) -> str:
    """One k·ln(k·N/(R·C)) contingency term, zero-cell-guarded, with
    the ln input built from VARCHAR-round-tripped HUGEINT products
    (bit-identical to Spark's DECIMAL(38,0)→DOUBLE path) and the ln
    output quantized to DECIMAL(18,6) BEFORE the exact-decimal
    multiply (the x38 transcendental rule)."""
    arg = (
        f"CAST(CAST(CAST(({k}) AS HUGEINT) * tot.n AS VARCHAR)"
        " AS DOUBLE)"
        f" / CAST(CAST(CAST(({row_total}) AS HUGEINT) * ({col_total})"
        " AS VARCHAR) AS DOUBLE)"
    )
    return (
        f"CASE WHEN ({k}) = 0 THEN CAST(0 AS DECIMAL(30,6))"
        f" ELSE CAST(CAST(({k}) AS DECIMAL(18,0))"
        f" * CAST(ln({arg}) AS DECIMAL(18,6)) AS DECIMAL(30,6)) END"
    )


@register(
    "x72_rule_information_scores",
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS},
    pairs AS {SQL_PART_PAIRS.replace(SQL_BASKET_ITEMS.strip(), "items")},
    ic AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
      FROM items GROUP BY item
    ),
    tot AS (
      SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items
    )
    SELECT p.item_a, p.item_b, ia.n_item AS n_a, ib.n_item AS n_b,
           p.n_baskets,
           CAST(ln(
             CAST(CAST(CAST(p.n_baskets AS HUGEINT) * tot.n AS VARCHAR)
                  AS DOUBLE)
             / CAST(CAST(CAST(ia.n_item AS HUGEINT) * ib.n_item
                         AS VARCHAR) AS DOUBLE)
           ) AS DECIMAL(18,6)) AS pmi,
           ({_llr_term_sql(
               "p.n_baskets", "ia.n_item", "ib.n_item")}
            + {_llr_term_sql(
               "ia.n_item - p.n_baskets", "ia.n_item",
               "tot.n - ib.n_item")}
            + {_llr_term_sql(
               "ib.n_item - p.n_baskets", "tot.n - ia.n_item",
               "ib.n_item")}
            + {_llr_term_sql(
               "tot.n - ia.n_item - ib.n_item + p.n_baskets",
               "tot.n - ia.n_item", "tot.n - ib.n_item")}) * 2
             AS llr
    FROM pairs p
    JOIN ic ia ON ia.item = p.item_a
    JOIN ic ib ON ib.item = p.item_b
    CROSS JOIN tot
    """,
    double_cols=["pmi", "llr"],
    doc="PMI and Dunning log-likelihood-ratio association scores over "
    "the >= 2-order part pairs — lift's log-scale and "
    "significance-weighted forms (Dunning 1993): PMI = ln(lift) "
    "measures association strength regardless of evidence volume; "
    "LLR = 2·Σ k_ij·ln(k_ij·N/(R_i·C_j)) over the 2×2 contingency "
    "table weights it by how much data backs it (the collocation / "
    "related-items ranking statistic that doesn't promote rare "
    "flukes). The transcendental-quantization exercise on x70's rule "
    "table: ln is NOT cross-engine bit-stable (1 ulp on ~6% of "
    "integer-ratio inputs, CLAUDE.md), so each ln input is ONE IEEE "
    "division of correctly-rounded exact products (Spark "
    "DECIMAL(38,0)→DOUBLE ≡ DuckDB HUGEINT→VARCHAR→DOUBLE), each ln "
    "output is quantized to DECIMAL(18,6) BEFORE the exact-decimal "
    "k_ij multiply and 4-term sum, zero cells are CASE-guarded to 0 "
    "(the x·ln x limit — unguarded they are an ANSI ln(0) crash), "
    "and the one decimal→double cast per output column rides the "
    "double_cols VARCHAR round-trip. Same plan as x70 "
    "(operators/basket.rule_information_scores via _pair_stats) — "
    "row-local arithmetic, nothing new shuffles.",
)
def x72_rule_information_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import (
        rule_information_scores,
    )

    cat = load_testdata(spark, sf_dir)
    return rule_information_scores(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )


@register(
    "x73_item_similarity",
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS},
    pairs AS {SQL_PART_PAIRS.replace(SQL_BASKET_ITEMS.strip(), "items")},
    ic AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
      FROM items GROUP BY item
    )
    SELECT p.item_a, p.item_b, ia.n_item AS n_a, ib.n_item AS n_b,
           p.n_baskets,
           CAST(p.n_baskets AS DOUBLE)
             / CAST(ia.n_item + ib.n_item - p.n_baskets AS DOUBLE)
             AS jaccard,
           CAST(p.n_baskets AS DOUBLE)
             / sqrt(CAST(CAST(CAST(ia.n_item AS HUGEINT) * ib.n_item
                             AS VARCHAR) AS DOUBLE)) AS cosine
    FROM pairs p
    JOIN ic ia ON ia.item = p.item_a
    JOIN ic ib ON ib.item = p.item_b
    """,
    doc="Item-item collaborative-filtering similarity (Sarwar 2001): "
    "Jaccard and binary cosine of each co-ordered pair's basket "
    "SETS — the bounded [0,1] neighborhood weights a recommender "
    "serves, where x70's lift / x72's PMI are unbounded association "
    "statistics. Bit-stable WITHOUT quantization: counts are exact "
    "BIGINTs (< 2^53, exact in DOUBLE), the cosine denominator "
    "product rides DECIMAL(38,0)/HUGEINT-via-VARCHAR (the x70 rule), "
    "and sqrt — unlike ln — is IEEE correctly rounded in both "
    "engines (the e10 z-score precedent), so each score is one IEEE "
    "division of identical doubles. Same _pair_stats plan as "
    "x70/x72; row-local arithmetic. "
    "operators/basket.item_similarity.",
)
def x73_item_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import item_similarity

    cat = load_testdata(spark, sf_dir)
    return item_similarity(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )


def _k_core_oracle(k: int, rounds: int) -> str:
    """Unrolled-CTE mirror of `graph.k_core` on the min_count=2
    co-purchase graph: per round, recompute degrees and keep edges
    whose BOTH endpoints still have degree >= k. Deletion is
    monotone, so rounds past the fixpoint are no-ops — the unroll
    depth only needs to exceed convergence (measured 10 rounds at
    sf0.01; pytest asserts the margin). Every e{{r}} is referenced 3×
    by round r+1, so each CTE is MATERIALIZED — left inlined, the
    expression tree grows 3^rounds (measured: DuckDB exhausted file
    handles re-opening the parquet before round 18)."""
    ctes = [
        f"items AS MATERIALIZED {SQL_BASKET_ITEMS}",
        f"""e0 AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
      SELECT node, COUNT(*) AS cd FROM (
        SELECT a AS node FROM e{r - 1}
        UNION ALL SELECT b FROM e{r - 1}) AS _u
      GROUP BY node
    )""")
        ctes.append(f"""e{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{r - 1} e
      JOIN d{r} da ON da.node = e.a AND da.cd >= {k}
      JOIN d{r} db ON db.node = e.b AND db.cd >= {k}
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
      SELECT a AS node FROM e{rounds}
      UNION ALL SELECT b FROM e{rounds}) AS _f
    GROUP BY node"""
    )


def _lpa_oracle(rounds: int) -> str:
    """Unrolled mirror of `graph.label_propagation` on the
    min_count=2 co-purchase graph: per synchronous round, neighbor
    labels via ONE join against the bidirectional edge table,
    (node, label) counts, (count DESC, label ASC) argmax. MATERIALIZED
    for the same 3^rounds inlining reason as the k-core oracle."""
    ctes = [
        f"items AS MATERIALIZED {SQL_BASKET_ITEMS}",
        """e0 AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    )""",
        """ee AS MATERIALIZED (
      SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
    )""",
        """l0 AS MATERIALIZED (
      SELECT DISTINCT a AS node, a AS label FROM ee
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""c{r} AS MATERIALIZED (
      SELECT ee.a AS node, l.label, COUNT(*) AS c
      FROM ee JOIN l{r - 1} l ON l.node = ee.b
      GROUP BY ee.a, l.label
    )""")
        ctes.append(f"""l{r} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label, ROW_NUMBER() OVER (
          PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM c{r}) AS _r
      WHERE rn = 1
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, label FROM l{rounds}"
    )


LPA_ROUNDS = 4


@register(
    "g06_label_propagation",
    oracle=_lpa_oracle(LPA_ROUNDS),
    doc=f"Synchronous label propagation ({LPA_ROUNDS} rounds, "
    "Raghavan 2007) over the >= 2-order co-purchase graph: labels "
    "start as node ids, each round every node adopts its neighbors' "
    "most frequent label with ties to the smallest — the "
    "community-detection baseline between connected components "
    "(which it degenerates to on disconnected cliques) and modularity "
    "methods. FIXED-round semantics on purpose: async LPA is "
    "update-order-dependent and sync LPA can oscillate on bipartite "
    "structures, so the deterministic object is the state after "
    "exactly R synchronous rounds — operator and unrolled oracle "
    "compute the same one. Per round: ONE node-keyed neighbor-label "
    "join + a (node,label) partial-agg count + a min-struct argmax "
    "(total order: count DESC, label ASC), labels localCheckpointed "
    "(the g01/components rule); the bidirectional edge table is "
    "loop-invariant, materialized once. All-integer — engine/"
    "partitioning-independent. operators/graph.label_propagation.",
)
def g06_label_propagation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import label_propagation

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )
    return label_propagation(
        edges, "item_a", "item_b", rounds=LPA_ROUNDS
    )


@register(
    "g07_link_prediction",
    oracle=f"""
    WITH items AS MATERIALIZED {SQL_BASKET_ITEMS},
    e AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    adj AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM e
      UNION ALL SELECT b, a FROM e
    ),
    deg AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM adj GROUP BY node
    ),
    cand AS (
      SELECT x.nb AS node_a, y.nb AS node_b,
             CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             SUM(CAST(CAST(1 AS DOUBLE)
                 / CAST(CAST(ln(CAST(dw.d AS DOUBLE))
                        AS DECIMAL(18,6)) AS DOUBLE)
                 AS DECIMAL(18,12))) AS adamic_adar
      FROM adj x
      JOIN adj y ON x.node = y.node AND x.nb < y.nb
      JOIN deg dw ON dw.node = x.node
      GROUP BY x.nb, y.nb
    ),
    nonedge AS (
      SELECT c.* FROM cand c
      LEFT JOIN e ON e.a = c.node_a AND e.b = c.node_b
      WHERE e.a IS NULL
    )
    SELECT n.node_a, n.node_b, da.d AS deg_a, db.d AS deg_b,
           n.common_neighbors,
           CAST(n.common_neighbors AS DOUBLE)
             / CAST(da.d + db.d - n.common_neighbors AS DOUBLE)
             AS jaccard,
           n.adamic_adar,
           CAST(CAST(CAST(da.d AS HUGEINT) * db.d AS VARCHAR)
                AS DOUBLE) AS pref_attachment
    FROM nonedge n
    JOIN deg da ON da.node = n.node_a
    JOIN deg db ON db.node = n.node_b
    """,
    double_cols=["adamic_adar"],
    doc="Neighborhood link prediction (Liben-Nowell & Kleinberg 2003) "
    "over the >= 2-order co-purchase graph: for every NON-adjacent "
    "part pair at distance 2, the four classic scores — "
    "common-neighbor count, Jaccard of the neighborhoods, Adamic-Adar "
    "(hub-discounted: each shared neighbor w contributes 1/ln(deg w)), "
    "and preferential attachment deg_a·deg_b (the null model) — the "
    "'customers who bought these will meet at X' / graph-completion "
    "table. Candidates generate at wedge CENTERS (each common "
    "neighbor emits its C(deg,2) pairs — unlike g03, every wedge is "
    "needed, so the hub bound is the opt-in max_degree cap + "
    "oversized_hubs report, not orientation), aggregate per pair, "
    "then anti-join the edge set. Adamic-Adar sums a transcendental, "
    "so each term rides the x38/x72 discipline end-to-end: ln "
    "quantized to DECIMAL(18,6) (deg >= 2 by construction — never "
    "ln(1)=0 in a denominator), one IEEE reciprocal of identical "
    "doubles, re-quantized to DECIMAL(18,12), decimal SUM — exact "
    "and partition-order-free in both engines; jaccard is one IEEE "
    "division (union >= 1 since cn >= 1), pref_attachment rides "
    "DECIMAL(38,0)/HUGEINT-via-VARCHAR (the x70 rule). "
    "operators/graph.link_prediction_scores.",
)
def g07_link_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import (
        link_prediction_scores,
    )

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )
    return link_prediction_scores(edges, "item_a", "item_b")


K_CORE_K = 3
K_CORE_ORACLE_ROUNDS = 18


@register(
    "g05_k_core",
    oracle=_k_core_oracle(K_CORE_K, K_CORE_ORACLE_ROUNDS),
    doc=f"{K_CORE_K}-core decomposition of the >= 2-order part "
    "co-purchase graph (Seidman 1983): iteratively peel nodes with "
    "degree < k until the maximal subgraph where EVERY node has >= k "
    "neighbors remains — the density filter behind community mining "
    "and bot-ring detection, and the graph quartet's fourth member "
    "(components, PageRank, triangles, cores). A one-shot degree "
    "filter is NOT the k-core: a node can be propped up entirely by "
    "about-to-be-peeled neighbors (sf0.01 cascades for 10 rounds, "
    "peeling 945 of 1880 nodes). Pure integer counting — "
    "partitioning/engine-independent by construction; the oracle "
    f"unrolls {K_CORE_ORACLE_ROUNDS} peel rounds (monotone deletion "
    "makes post-fixpoint rounds no-ops, the g01/x67 unroll rule; "
    "tests/test_graph.py asserts the convergence margin). Each round "
    "is one map-side-partial degree agg + two node-keyed semi-joins, "
    "localCheckpointed (the connected-components O(k²)-Exchange "
    "rule); the convergence probe is a 1-row count. "
    "operators/graph.k_core.",
)
def g05_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import k_core

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )
    return k_core(edges, "item_a", "item_b", k=K_CORE_K)


@register(
    "x71_also_bought_topk",
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS},
    pairs AS {SQL_PART_PAIRS.replace(SQL_BASKET_ITEMS.strip(), "items")},
    sym AS (
      SELECT item_a AS item, item_b AS neighbor, n_baskets FROM pairs
      UNION ALL
      SELECT item_b, item_a, n_baskets FROM pairs
    )
    SELECT item, neighbor, n_baskets, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY item
        ORDER BY n_baskets DESC, neighbor) AS BIGINT) AS rank
      FROM sym
    ) AS _r WHERE rank <= 5
    """,
    doc="Per-item 'customers also bought' top-5: symmetric closure "
    "of the >= 2-order co-occurrence pairs, ranked per item by "
    "(n_baskets DESC, neighbor ASC — unique tiebreak, the suite "
    "determinism rule). Spark executes the rank-then-filter as "
    "WindowGroupLimit (the x59 shape): every partition keeps a "
    "5-heap BEFORE the single exchange, so a blockbuster item moves "
    "5 rows per input partition, never its full neighbor list — the "
    "recommendation serving table at any catalog size. "
    "operators/basket.also_bought_topk.",
)
def x71_also_bought_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import also_bought_topk

    cat = load_testdata(spark, sf_dir)
    return also_bought_topk(
        cat.table("lineitem"), "l_orderkey", "l_partkey",
        k=5, min_count=2,
    )


# x75: ranking eval of x71's serving table against a stricter
# relevance set — the DCG gain/idcg literals are computed ONCE in
# Python (operators/basket.dcg_gain_table) and shared VERBATIM by the
# Spark plan and this oracle: no cross-engine log2 anywhere
RANK_K = 5
TRUTH_MIN = 3
from ods_to_datalake_spark.operators.basket import (  # noqa: E402
    dcg_gain_table,
)

_GAIN_ROWS = dcg_gain_table(RANK_K)
SQL_GAINS = ", ".join(
    f"({r}, CAST('{g}' AS DECIMAL(18,12)))" for r, g, _ in _GAIN_ROWS
)
SQL_IDCG = ", ".join(f"({r}, '{i}')" for r, _, i in _GAIN_ROWS)


@register(
    "x75_ranking_eval",
    oracle=f"""
    WITH items AS MATERIALIZED {SQL_BASKET_ITEMS},
    pairs AS MATERIALIZED (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_baskets
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    sym AS MATERIALIZED (
      SELECT item_a AS qid, item_b AS item, n_baskets FROM pairs
      UNION ALL
      SELECT item_b, item_a, n_baskets FROM pairs
    ),
    gains(rank, gain) AS (VALUES {SQL_GAINS}),
    idcgs(rank, idcg) AS (VALUES {SQL_IDCG}),
    r AS (
      SELECT qid, item, g.gain FROM (
        SELECT qid, item, ROW_NUMBER() OVER (
          PARTITION BY qid
          ORDER BY n_baskets DESC, item) AS rank
        FROM sym
      ) AS _r JOIN gains g USING (rank)
      WHERE rank <= {RANK_K}
    ),
    truth AS (
      SELECT qid, item FROM sym WHERE n_baskets >= {TRUTH_MIN}
    ),
    per_rec AS (
      SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rec
      FROM r GROUP BY qid
    ),
    per_truth AS (
      SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM truth GROUP BY qid
    ),
    h AS (
      SELECT r.qid, CAST(COUNT(*) AS BIGINT) AS hits,
             SUM(r.gain) AS dcg
      FROM r JOIN truth t ON r.qid = t.qid AND r.item = t.item
      GROUP BY r.qid
    ),
    base AS (
      SELECT COALESCE(pt.qid, pr.qid) AS qid,
             COALESCE(pr.n_rec, 0) AS n_rec,
             COALESCE(pt.n_rel, 0) AS n_rel,
             COALESCE(h.hits, 0) AS hits, h.dcg,
             LEAST(COALESCE(pt.n_rel, 0), {RANK_K}) AS clamped
      FROM per_truth pt
      FULL OUTER JOIN per_rec pr ON pt.qid = pr.qid
      LEFT JOIN h ON h.qid = COALESCE(pt.qid, pr.qid)
    )
    SELECT qid, n_rec, n_rel, hits,
           CAST(hits AS DOUBLE) / CAST({RANK_K} AS DOUBLE)
             AS precision_at_k,
           CASE WHEN n_rel > 0 THEN
             CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE)
           END AS recall_at_k,
           CASE WHEN n_rel > 0 THEN
             CAST(CAST(COALESCE(dcg, 0) AS VARCHAR) AS DOUBLE)
             / CAST(i.idcg AS DOUBLE)
           END AS ndcg_at_k
    FROM base LEFT JOIN idcgs i ON i.rank = base.clamped
    """,
    doc=f"Offline ranking evaluation (precision@{RANK_K}, "
    f"recall@{RANK_K}, NDCG@{RANK_K}) of the x71 also-bought serving "
    f"table against a stricter relevance set (pairs co-ordered >= "
    f"{TRUTH_MIN} times) — the recommender/retrieval eval loop, per "
    "query id. The DCG gains are a transcendental, so they are "
    "computed ONCE in driver Python (operators/basket.dcg_gain_table, "
    "quantized DECIMAL(18,12)) and shared VERBATIM as plan literals "
    "by both engines — no cross-engine log2 at all; per-qid DCG is an "
    "exact decimal SUM (order-free), IDCG joins the same k-row "
    "literal's exact prefix sum on the clamped relevant count, and "
    "NDCG is one IEEE division (the oracle's decimal operand "
    "round-trips through VARCHAR). Truth-only qids score all-miss "
    "zeros; rec-only qids emit NULL recall/ndcg (no relevance set — 0 "
    "would conflate 'nothing relevant' with 'missed everything'). "
    "Plan: the checkpointed pair table feeds BOTH the rec and truth "
    "legs; one (qid, item) hit join + qid-keyed partial aggs — "
    "metric frames are query-set sized. "
    "operators/basket.ranking_metrics.",
)
def x75_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import (
        also_bought_topk,
        cooccurrence,
        ranking_metrics,
    )

    cat = load_testdata(spark, sf_dir)
    from ods_to_datalake_spark.operators.basket import _DISK_ONLY

    li = cat.table("lineitem")
    # corpus-scale pair table shared by the rec and truth legs: DISK_ONLY
    # like every graph/basket-scale checkpoint (the r9 OOM rule) —
    # memory-resident checkpoint blocks are never freed across reps
    pairs = cooccurrence(
        li, "l_orderkey", "l_partkey", min_count=2
    ).localCheckpoint(eager=True, storageLevel=_DISK_ONLY)
    recs = also_bought_topk(
        li, "l_orderkey", "l_partkey", k=RANK_K, min_count=2,
        pairs=pairs,
    ).select("item", "neighbor", "rank")
    sym = pairs.select(
        F.col("item_a").alias("qid"),
        F.col("item_b").alias("item"),
        "n_baskets",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("qid"),
            F.col("item_a").alias("item"),
            "n_baskets",
        )
    )
    truth = sym.where(F.col("n_baskets") >= TRUTH_MIN).select(
        "qid", "item"
    )
    return ranking_metrics(recs, truth, k=RANK_K)


@register(
    "g08_degree_assortativity",
    oracle=f"""
    WITH items AS MATERIALIZED {SQL_BASKET_ITEMS},
    e AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    adj AS MATERIALIZED (
      SELECT a AS node, b AS nb FROM e
      UNION ALL SELECT b, a FROM e
    ),
    deg AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM adj GROUP BY node
    ),
    j AS (
      SELECT dx.d AS x, dy.d AS y
      FROM adj a
      JOIN deg dx ON dx.node = a.node
      JOIN deg dy ON dy.node = a.nb
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS m,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM j
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           CASE WHEN m * sxx - sx * sx <> 0 THEN
             CAST(CAST(m * sxy - sx * sx AS VARCHAR) AS DOUBLE)
             / CAST(CAST(m * sxx - sx * sx AS VARCHAR) AS DOUBLE)
           END AS assortativity
    FROM s
    """,
    doc="Degree assortativity (Newman 2002) of the >= 2-order "
    "co-purchase graph: the Pearson correlation of endpoint degrees "
    "over the symmetric edge list — positive means hubs link to hubs "
    "(social nets), negative means hubs link to leaves (retail "
    "co-purchase, technological nets); the one scalar that says which "
    "regime a graph is in before trusting any degree-based plan "
    "bound. r = (M·Σxy − (Σx)²)/(M·Σx² − (Σx)²) with every sum an "
    "exact DECIMAL(38,0)/HUGEINT (degree products overflow int64 near "
    "1e9 degrees; M·Σxy ~ 1e30 fits precision 38), both exact integer "
    "operands round-tripped through VARCHAR, ONE IEEE division; a "
    "degree-regular graph has zero variance — denominator 0 is "
    "CASE-guarded to NULL (the cosine/zero-norm rule). Plan: degree "
    "agg + two node-keyed joins decorating edges with endpoint "
    "degrees + ONE global aggregate, adjacency/degree tables "
    "checkpointed (the x25 rule) — no windows, no driver state. "
    "operators/graph.degree_assortativity.",
)
def g08_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import (
        degree_assortativity,
    )

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    )
    return degree_assortativity(edges, "item_a", "item_b")


HITS_ITERS = 4


def _hits_oracle(iterations: int, scale: int) -> str:
    """Unrolled-CTE mirror of `hits_integer` on the directed
    customer→supplier purchase graph (g01 unroll discipline: every
    step integer-exact; DuckDB `//` matches `div` on these
    non-negative sums; HUGEINT sums recast to BIGINT; chained CTEs
    MATERIALIZED — edges is referenced 2·iterations times and DuckDB
    inlines by default, the g05 3^rounds blowup)."""
    g1 = "GREATEST(CAST(1 AS BIGINT), m // " + str(scale) + ")"
    ctes = [
        """edges AS MATERIALIZED (
      SELECT DISTINCT 2*o.o_custkey AS s, 2*l.l_suppkey+1 AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_suppkey IS NOT NULL AND o.o_custkey IS NOT NULL
    )""",
        """nodes AS MATERIALIZED (
      SELECT s AS node FROM edges UNION SELECT d FROM edges
    )""",
        f"""h0 AS (
      SELECT node, CAST({scale} AS BIGINT) AS score FROM nodes
    )""",
    ]
    prev_h = "h0"
    for r in range(1, iterations + 1):
        ctes.append(
            f"""a{r}_raw AS MATERIALIZED (
      SELECT e.d AS node, CAST(SUM(h.score) AS BIGINT) AS raw
      FROM edges e JOIN {prev_h} h ON h.node = e.s GROUP BY e.d
    )"""
        )
        ctes.append(f"a{r}m AS (SELECT MAX(raw) AS m FROM a{r}_raw)")
        ctes.append(
            f"""a{r} AS MATERIALIZED (
      SELECT node, CAST(raw // {g1} AS BIGINT) AS score
      FROM a{r}_raw CROSS JOIN a{r}m
    )"""
        )
        ctes.append(
            f"""h{r}_raw AS MATERIALIZED (
      SELECT e.s AS node, CAST(SUM(a.score) AS BIGINT) AS raw
      FROM edges e JOIN a{r} a ON a.node = e.d GROUP BY e.s
    )"""
        )
        ctes.append(f"h{r}m AS (SELECT MAX(raw) AS m FROM h{r}_raw)")
        ctes.append(
            f"""h{r} AS MATERIALIZED (
      SELECT node, CAST(raw // {g1} AS BIGINT) AS score
      FROM h{r}_raw CROSS JOIN h{r}m
    )"""
        )
        prev_h = f"h{r}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT n.node, CAST(COALESCE(h.score, 0) AS BIGINT) AS hub,
           CAST(COALESCE(a.score, 0) AS BIGINT) AS authority
    FROM nodes n
    LEFT JOIN h{iterations} h ON h.node = n.node
    LEFT JOIN a{iterations} a ON a.node = n.node
    """
    )


@register(
    "g09_hits",
    oracle=_hits_oracle(HITS_ITERS, 10**6),
    doc="HITS hubs & authorities (Kleinberg 1999) over the directed "
    "customer→supplier purchase graph, fixed 4 synchronous rounds in "
    "EXACT integer arithmetic: the float algorithm's L2 "
    "normalization is a partition-order-dependent float sum, so each "
    "half-step max-normalizes by INTEGER division instead — "
    "divide-FIRST (raw div max(1, m div scale)), because the naive "
    "(raw·scale) div m overflows BIGINT at weighted in-degree ~9e6; "
    "this form is safe to ~9e12 and bit-identical under any "
    "partitioning/engine. On the bipartite graph the hub side ranks "
    "buyers by quality-weighted supplier breadth, the authority side "
    "ranks suppliers by who buys from them; unreachable sides score "
    "0. Oracle = fully unrolled per-round CTEs (the g01 discipline; "
    "MATERIALIZED per the g05 inlining rule). Per round: two "
    "node-keyed joins + two partial aggs + two 1-row max broadcasts; "
    "per-round nodes-sized checkpoints, loop-invariant edge table "
    "DISK_ONLY. operators/graph.hits_integer.",
)
def g09_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.graph import hits_integer

    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(
            F.col("l_suppkey").isNotNull()
            & F.col("o_custkey").isNotNull()
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    return hits_integer(edges, iterations=HITS_ITERS)


BFS_HOPS = 6


def _bfs_oracle(hops: int) -> str:
    """Unrolled-CTE mirror of `bfs_layers` on the supplier↔customer
    trade graph, seeded at the nation-0 supplier cohort. Hop-limited
    semantics make the unroll EXACT by construction (a round past the
    eccentricity contributes zero rows — no fixpoint margin needed);
    d{r} is referenced twice (next frontier's anti filter + the
    union), so every chained CTE is MATERIALIZED (the g05 rule)."""
    ctes = [
        """pairs AS MATERIALIZED (
      SELECT DISTINCT 2*l_suppkey AS a, 2*o_custkey+1 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_suppkey IS NOT NULL AND o_custkey IS NOT NULL
    )""",
        """edges AS MATERIALIZED (
      SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
    )""",
        """f0 AS MATERIALIZED (
      SELECT DISTINCT 2*s_suppkey AS node FROM supplier
      WHERE s_nationkey = 0 AND s_suppkey IS NOT NULL
    )""",
        """d0 AS MATERIALIZED (
      SELECT node, CAST(0 AS BIGINT) AS dist FROM f0
    )""",
    ]
    for r in range(1, hops + 1):
        ctes.append(
            f"""f{r} AS MATERIALIZED (
      SELECT DISTINCT e.b AS node
      FROM edges e JOIN f{r - 1} f ON e.a = f.node
      WHERE e.b NOT IN (SELECT node FROM d{r - 1})
    )"""
        )
        ctes.append(
            f"""d{r} AS MATERIALIZED (
      SELECT node, dist FROM d{r - 1}
      UNION ALL
      SELECT node, CAST({r} AS BIGINT) FROM f{r}
    )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\n    SELECT node, dist FROM d{hops}"
    )


@register(
    "g10_bfs_layers",
    oracle=_bfs_oracle(BFS_HOPS),
    doc=f"Multi-source BFS hop distances (≤ {BFS_HOPS}) from the "
    "nation-0 supplier cohort over the undirected supplier↔customer "
    "trade graph — 'degrees of separation from a trusted set', the "
    "feature behind trust propagation, blast-radius analysis, and "
    "k-hop neighborhood extraction. HOP-LIMITED semantics on "
    "purpose: every emitted distance is exact and nodes farther "
    "than the limit are absent, so a truncated run is a correct "
    "k-hop query and the unrolled oracle is exact by construction "
    "(rounds past the seed set's eccentricity contribute zero rows — "
    "no fixpoint margin, unlike g05). Level-synchronous expansion: "
    "per round one node-keyed edge⋈frontier join + one visited "
    "anti-join, a 1-row emptiness probe ends the loop early; all "
    "integers, unique result under any partitioning. Per-round "
    "frontier/visited checkpoints, loop-invariant bidirectional edge "
    "table DISK_ONLY. operators/graph.bfs_layers.",
)
def g10_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.graph import bfs_layers

    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(
            F.col("l_suppkey").isNotNull()
            & F.col("o_custkey").isNotNull()
        )
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
    )
    seeds = (
        cat.table("supplier")
        .where(
            (F.col("s_nationkey") == 0)
            & F.col("s_suppkey").isNotNull()
        )
        .select((F.col("s_suppkey") * 2).alias("node"))
    )
    return bfs_layers(edges, seeds, max_hops=BFS_HOPS)


def _modularity_oracle() -> str:
    """g11: Newman modularity of the g06 LPA labels over the SAME
    ≥2-order co-purchase graph — the labels CTE embeds g06's full
    unrolled oracle verbatim (the x25 single-source rule). Integer
    numerators in HUGEINT; every HUGEINT→DOUBLE cast VARCHAR-hops
    (the u17 rule: operands cross 1e13)."""
    lpa = _lpa_oracle(LPA_ROUNDS)
    return f"""
    WITH lbl AS ({lpa}),
    items2 AS MATERIALIZED {SQL_BASKET_ITEMS},
    e2 AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items2 a JOIN items2 b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e2),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) AS _u
      GROUP BY n
    ),
    per_c AS (
      SELECT l.label AS community,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(deg.d) AS BIGINT) AS degree_sum
      FROM deg JOIN lbl l ON l.node = deg.n
      GROUP BY l.label
    ),
    internal AS (
      SELECT la.label AS community,
             CAST(COUNT(*) AS BIGINT) AS internal_edges
      FROM e2
      JOIN lbl la ON la.node = e2.a
      JOIN lbl lb ON lb.node = e2.b
      WHERE la.label = lb.label
      GROUP BY la.label
    ),
    scored AS (
      SELECT p.community, p.n_nodes,
             CAST(COALESCE(i.internal_edges, 0) AS BIGINT)
               AS internal_edges,
             p.degree_sum,
             4 * CAST(m.m AS HUGEINT)
               * CAST(COALESCE(i.internal_edges, 0) AS HUGEINT)
               - CAST(p.degree_sum AS HUGEINT)
               * CAST(p.degree_sum AS HUGEINT) AS num,
             4 * CAST(m.m AS HUGEINT) * CAST(m.m AS HUGEINT) AS den
      FROM per_c p LEFT JOIN internal i USING (community)
      CROSS JOIN m
    ),
    q AS (
      SELECT SUM(num) AS qn, MAX(den) AS qd FROM scored
    )
    SELECT s.community, s.n_nodes, s.internal_edges, s.degree_sum,
           CAST(CAST(s.num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(s.den AS VARCHAR) AS DOUBLE) AS contribution,
           CAST(CAST(q.qn AS VARCHAR) AS DOUBLE)
             / CAST(CAST(q.qd AS VARCHAR) AS DOUBLE) AS modularity
    FROM scored s CROSS JOIN q
    """


@register(
    "g11_modularity",
    oracle=_modularity_oracle(),
    doc=f"Newman–Girvan modularity of the g06 LPA partition over the "
    "SAME ≥2-order co-purchase graph — the eval-the-component "
    "contract (x78/x80's sibling for the graph family): per community "
    "Q_c = L_c/m − (D_c/2m)² and the total Q a community detector "
    "ships with (0 = random baseline; Newman 2004). Exact-integer "
    "formulation: Q_c = (4mL_c − D_c²)/(4m²) with DECIMAL(38,0)/"
    "HUGEINT numerators (D_c² crosses int64), numerators summed "
    "exactly (order-free), ONE IEEE division per value; every "
    "oracle-side HUGEINT→DOUBLE cast VARCHAR-hops (operands cross "
    "1e13 — the u17 rule). Labels CTE embeds g06's unrolled oracle "
    "verbatim (single-source); unlabeled endpoints are external by "
    "definition. Plan: normalized edge table checkpointed DISK_ONLY "
    "(3 legs), degree agg + two node-keyed label attachments, then "
    "community-sized arithmetic. operators/graph.modularity.",
)
def g11_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    ).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    labels = label_propagation(edges, rounds=LPA_ROUNDS)
    return modularity(edges, labels)


RC_KS = [1, 2, 4, 8, 16, 32]


@register(
    "g12_rich_club",
    oracle=f"""
    WITH items AS MATERIALIZED {SQL_BASKET_ITEMS},
    e AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    deg AS MATERIALIZED (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) AS _u
      GROUP BY n
    ),
    em AS MATERIALIZED (
      SELECT LEAST(da.d, db.d) AS m
      FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b
    ),
    spine(k) AS (
      SELECT CAST(unnest(ARRAY{RC_KS}) AS BIGINT)
    )
    SELECT s.k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE d > s.k)
             AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM em WHERE m > s.k)
             AS n_internal_edges,
           CASE WHEN (SELECT COUNT(*) FROM deg WHERE d > s.k) >= 2
             THEN CAST(2 * CAST((SELECT COUNT(*) FROM em
                                 WHERE m > s.k) AS HUGEINT) AS DOUBLE)
                  / CAST(CAST((SELECT COUNT(*) FROM deg WHERE d > s.k)
                           AS HUGEINT)
                         * (CAST((SELECT COUNT(*) FROM deg
                                  WHERE d > s.k) AS HUGEINT) - 1)
                         AS DOUBLE)
           END AS phi
    FROM spine s
    """,
    doc=f"Rich-club coefficient Φ(k) = 2·E_k/(N_k·(N_k−1)) at degree "
    f"thresholds {RC_KS} over the ≥2-order co-purchase graph (Zhou & "
    "Mondragón 2004): of the nodes with degree > k, what fraction of "
    "their possible mutual edges exist — 'do the hubs talk to each "
    "other', the structural audit g08's single correlation summarizes "
    "away. Exact BIGINT conditional counts; an edge is internal iff "
    "its MIN endpoint degree > k, so the whole spine folds in ONE "
    "pass over the degree-attached edge table (K conditional sums in "
    "one aggregate — zero per-k joins); denominator in "
    "DECIMAL(38,0)/HUGEINT, Φ one CASE-guarded IEEE division (N_k<2 "
    "→ NULL: no possible edges is no evidence). Edge table "
    "DISK_ONLY-checkpointed (3 legs). operators/graph.rich_club.",
)
def g12_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import rich_club

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    ).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    return rich_club(edges, RC_KS)


@register(
    "g13_clustering_coefficient",
    oracle=f"""
    WITH items AS MATERIALIZED {SQL_BASKET_ITEMS},
    e AS MATERIALIZED (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    deg AS MATERIALIZED (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) AS _u
      GROUP BY n
    ),
    o AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.a) < (db.d, e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN (da.d, e.a) < (db.d, e.b)
                  THEN e.b ELSE e.a END AS v,
             CASE WHEN (da.d, e.a) < (db.d, e.b)
                  THEN db.d ELSE da.d END AS dv
      FROM e
      JOIN deg da ON da.n = e.a
      JOIN deg db ON db.n = e.b
    ),
    tri AS (
      SELECT wj.u AS cu, wj.v AS cv, wj.w AS cw
      FROM (
        SELECT o1.u, o1.v, o2.v AS w
        FROM o o1 JOIN o o2
          ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
      ) wj
      JOIN o oc ON oc.u = wj.v AND oc.v = wj.w
    ),
    t AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS tn
      FROM (
        SELECT cu AS n FROM tri
        UNION ALL SELECT cv FROM tri
        UNION ALL SELECT cw FROM tri
      ) AS _c
      GROUP BY n
    )
    SELECT deg.n AS node, deg.d AS degree,
           CAST(COALESCE(t.tn, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.d >= 2 THEN
             CAST(2 * CAST(COALESCE(t.tn, 0) AS HUGEINT) AS DOUBLE)
             / CAST(CAST(deg.d AS HUGEINT)
                    * (CAST(deg.d AS HUGEINT) - 1) AS DOUBLE)
           END AS clustering
    FROM deg LEFT JOIN t ON t.n = deg.n
    """,
    doc="Per-node local clustering coefficient C(n) = "
    "2·T(n)/(d(n)·(d(n)−1)) over the ≥2-order co-purchase graph "
    "(Watts & Strogatz 1998): of each node's possible neighbor "
    "pairs, the fraction actually connected — 'is my neighborhood a "
    "clique or a star', the per-node face of g03's single global "
    "count (bot/spam rings are near-cliques; hubs with near-zero C "
    "are brokers). Triangle attribution reuses g03's degree-ordered "
    "compact-forward wedge join via the shared _degree_oriented "
    "helper (one definition — the O(sqrt m) fan-out bound is what "
    "survives a celebrity node at 100 TB); each closed triangle "
    "credits all three corners (explode, so sum(T) = 3·triangles); "
    "degree-1 nodes are NULL (no neighbor pairs is no evidence, not "
    "0 — rich_club's guard). Counts exact BIGINTs; denominator in "
    "DECIMAL(38,0)/HUGEINT; C one CASE-guarded IEEE division. "
    "operators/graph.clustering_coefficient.",
)
def g13_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import (
        clustering_coefficient,
    )

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    ).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    # cooccurrence pairs are distinct (a < b) by construction — skip
    # the operator's dedup Exchange (see g03)
    return clustering_coefficient(edges, assume_distinct=True)


@register(
    "g14_degree_histogram",
    oracle=f"""
    WITH items AS {SQL_BASKET_ITEMS},
    e AS (
      SELECT a.item AS a, b.item AS b
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) AS _u
      GROUP BY n
    ),
    hist AS (
      SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY d
    )
    SELECT degree, n_nodes,
           CAST(n_nodes AS DOUBLE)
           / CAST(CAST(SUM(n_nodes) OVER () AS BIGINT) AS DOUBLE)
             AS node_share,
           CAST(CAST(SUM(n_nodes) OVER (
                  ORDER BY degree DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM(n_nodes) OVER () AS BIGINT) AS DOUBLE)
             AS ccdf
    FROM hist
    """,
    doc="Degree distribution + complementary CDF of the ≥2-order "
    "co-purchase graph — the first plot read off any large graph "
    "(power-law tail? cutoff? hub count above each k) and the panel "
    "g08's single correlation and g12's thresholded Φ(k) summarize. "
    "Exact BIGINT buckets, one IEEE division per share; the ccdf "
    "suffix-sum windows over the HISTOGRAM (max-degree-sized, the "
    "e16 calendar-frame pattern), never the node table; DuckDB's "
    "HUGEINT window sums recast to BIGINT (the x28 rule). One degree "
    "agg + one degree-keyed rollup. "
    "operators/graph.degree_histogram.",
)
def g14_degree_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.basket import cooccurrence
    from ods_to_datalake_spark.operators.graph import degree_histogram

    cat = load_testdata(spark, sf_dir)
    edges = cooccurrence(
        cat.table("lineitem"), "l_orderkey", "l_partkey", min_count=2
    ).select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    )
    return degree_histogram(edges)


KZ_ITERATIONS = 4


def _katz_oracle(iterations: int) -> str:
    """Chained-CTE mirror of `katz_centrality` over the symmetric
    trade graph (one CTE per round, each referenced exactly once by
    the next — the g01 unroll shape, so no AS MATERIALIZED needed;
    DuckDB `//` matches Spark `div` on the non-negative ranks)."""
    from ods_to_datalake_spark.operators.graph import (
        KZ_DEN,
        KZ_NUM,
        KZ_SCALE,
    )

    ctes = [
        """pairs AS (
      SELECT DISTINCT 2*l_suppkey AS src, 2*o_custkey+1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_suppkey IS NOT NULL AND o_custkey IS NOT NULL
    )""",
        """edges AS (
      SELECT src, dst FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst FROM pairs
    )""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges) AS _u
    )""",
        f"""r0 AS (
      SELECT node, CAST({KZ_SCALE} AS BIGINT) AS r FROM nodes
    )""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""r{k} AS (
      SELECT nd.node,
             CAST({KZ_SCALE}
                  + ({KZ_NUM} * COALESCE(s.sm, 0)) // {KZ_DEN}
               AS BIGINT) AS r
      FROM nodes nd
      LEFT JOIN (
        SELECT e.dst AS node, SUM(CAST(rp.r AS HUGEINT)) AS sm
        FROM edges e
        JOIN r{k - 1} rp ON e.src = rp.node
        GROUP BY e.dst
      ) s ON s.node = nd.node
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r FROM r{iterations}"
    )


@register(
    "g15_katz_centrality",
    oracle=_katz_oracle(KZ_ITERATIONS),
    doc=f"Exact-integer truncated Katz centrality ({KZ_ITERATIONS} "
    "rounds, alpha = 1/8, beta = 1 at scale 1e9) over the symmetric "
    "supplier<->customer trade graph — the attenuated count of all "
    "walks ending at each node (Katz 1953): unlike PageRank a "
    "prolific hub passes FULL weight to every neighbor (no outdegree "
    "split), the influence measure for endorsement graphs and the "
    "eigenvector-centrality family member the g-suite lacked. "
    "Per-round in-neighbor fold sums scaled BIGINTs through "
    "DECIMAL(38,0)/HUGEINT (walk mass grows like (alpha*indeg)^t), "
    "one integer div per round, final BIGINT cast THROWS under ANSI "
    "on genuine overflow (loud, never silent). Oracle = the g01 "
    "unrolled-CTE shape, every round CTE referenced once. Edge list "
    "DISK_ONLY once; each round one src-keyed join + one dst-keyed "
    "partial agg; nodes-sized state localCheckpoints per round. "
    "operators/graph.katz_centrality.",
)
def g15_katz_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.graph import katz_centrality

    cat = load_testdata(spark, sf_dir)
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(
            F.col("l_suppkey").isNotNull()
            & F.col("o_custkey").isNotNull()
        )
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.union(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    return katz_centrality(edges, iterations=KZ_ITERATIONS)
