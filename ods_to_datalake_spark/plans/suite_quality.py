"""Data-quality suite (round 7): catalog-style table profiling (u11),
a declarative constraint/expectations audit (u12), and time-series
gap-fill / resampling over the event stream (e11).

These mechanize the reference's manual "verify the synced table" step
(ibs_ordinary_payment_utilities.py reads the written parquet back and
checks it by hand; `sources/reader.read_back_verify` already does the
count — this family does the rest): per-column statistics, declared
constraints with violation counts, and the regular-grid
last-observation-carried-forward fill that turns an irregular ODS
changelog into an analyzable series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.operators.profile import (
    check_foreign_key,
    check_functional_dependency,
    check_in_set,
    check_not_null,
    check_satisfies,
    check_unique,
    constraint_report,
    table_profile,
)
from ods_to_datalake_spark.operators.timeseries import gap_fill
from ods_to_datalake_spark.plans.suite import register

# u11: profiled columns — string-stable types only (BIGINT, VARCHAR,
# TIMESTAMP-at-midnight, DECIMAL-cast money); a raw DOUBLE's rendering
# is not engine-stable, so o_totalprice profiles through DECIMAL(18,2)
PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
    "o_totalprice_dec",
]


def _profile_leg(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(MIN({col}) AS VARCHAR) AS min_value,
           CAST(MAX({col}) AS VARCHAR) AS max_value
    FROM o
    """


@register(
    "u11_table_profile",
    oracle="WITH o AS (SELECT *, CAST(o_totalprice AS DECIMAL(18,2))"
    " AS o_totalprice_dec FROM orders)\n"
    + "\nUNION ALL\n".join(_profile_leg(c) for c in PROFILE_COLS),
    doc="Catalog-style table profile of `orders`: one row per column "
    "with row/null/exact-distinct counts and native-ordered min/max "
    "rendered as strings — ONE wide aggregate job for all columns "
    "(operators/profile.table_profile; the distinct counts ride "
    "Spark's Expand, everything else combines map-side). Money "
    "profiles through DECIMAL(18,2) because a raw DOUBLE's "
    "shortest-repr rendering is not engine-stable. At 100 TB the "
    "same operator runs with exact_distinct=False (HLL estimates) — "
    "the audit keeps exact counts because the oracle must match.",
)
def u11_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders").withColumn(
        "o_totalprice_dec",
        F.col("o_totalprice").cast("decimal(18,2)"),
    )
    return table_profile(orders, PROFILE_COLS)


@register(
    "u12_constraint_audit",
    oracle="""
    SELECT 'unique(o_orderkey)' AS constraint_name,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_checked,
           CAST(COALESCE(SUM(n), 0) - COUNT(*) AS BIGINT)
             AS n_violations,
           COALESCE(SUM(n), 0) - COUNT(*) = 0 AS passed
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderkey
    ) g
    UNION ALL
    SELECT 'not_null(o_custkey)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           COUNT(*) - COUNT(o_custkey) = 0
    FROM orders
    UNION ALL
    SELECT 'in_set(o_orderstatus:O,F,P)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderstatus IS NOT NULL
                   AND o_orderstatus NOT IN ('O','F','P')
                   THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN o_orderstatus IS NOT NULL
             AND o_orderstatus NOT IN ('O','F','P') THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'in_set(o_orderpriority:1-URGENT,2-HIGH)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderpriority IS NOT NULL
                   AND o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                   THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN o_orderpriority IS NOT NULL
             AND o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'satisfies(positive_totalprice)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                   THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
             THEN 1 END) = 0
    FROM orders
    UNION ALL
    SELECT 'foreign_key(o_custkey)',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_custkey IS NOT NULL),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND o.o_custkey NOT IN (
                 SELECT c_custkey FROM customer
                  WHERE c_custkey IS NOT NULL)),
           (SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND o.o_custkey NOT IN (
                 SELECT c_custkey FROM customer
                  WHERE c_custkey IS NOT NULL)) = 0
    UNION ALL
    SELECT 'foreign_key(l_orderkey)',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
             WHERE l_orderkey IS NOT NULL),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND l.l_orderkey NOT IN (
                 SELECT o_orderkey FROM orders
                  WHERE o_orderkey IS NOT NULL)),
           (SELECT COUNT(*) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND l.l_orderkey NOT IN (
                 SELECT o_orderkey FROM orders
                  WHERE o_orderkey IS NOT NULL)) = 0
    UNION ALL
    SELECT 'satisfies(quantity_1_to_50)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN NOT COALESCE(
                   l_quantity >= 1 AND l_quantity <= 50, FALSE)
                   THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN NOT COALESCE(
             l_quantity >= 1 AND l_quantity <= 50, FALSE)
             THEN 1 END) = 0
    FROM lineitem
    """,
    doc="Declarative data-quality audit (the Deequ/expectations "
    "pattern) over orders/lineitem/customer: uniqueness, "
    "not-null, enum membership, range, and two referential-integrity "
    "checks — one row per constraint with checked/violation counts "
    "and a pass flag (operators/profile.check_*). Deliberately "
    "includes failing constraints (priority enum subset) so the "
    "violation COUNTING path is exercised, not just zeros. Each "
    "check is a partial-aggregated count or ONE key anti-join "
    "(broadcast for the dim-sized parent, shuffle for the "
    "fact-to-fact lineitem→orders check); the report is a union of "
    "1-row frames — constraint count, not data size, bounds the "
    "plan. NULL semantics pinned: NULL never violates in_set/FK "
    "(not_null's job), but an unevaluable range predicate does "
    "(conservative audit reading).",
)
def u12_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    lineitem = cat.table("lineitem")
    customer = cat.table("customer")
    return constraint_report(
        [
            check_unique(orders, ["o_orderkey"]),
            check_not_null(orders, "o_custkey"),
            check_in_set(orders, "o_orderstatus", ["O", "F", "P"]),
            check_in_set(
                orders, "o_orderpriority", ["1-URGENT", "2-HIGH"]
            ),
            check_satisfies(
                orders,
                "positive_totalprice",
                F.col("o_totalprice") > 0,
            ),
            check_foreign_key(
                orders, "o_custkey", customer, "c_custkey"
            ),
            check_foreign_key(
                lineitem,
                "l_orderkey",
                orders,
                "o_orderkey",
                broadcast_parent=False,  # fact-to-fact: shuffle path
            ),
            check_satisfies(
                lineitem,
                "quantity_1_to_50",
                (F.col("l_quantity") >= 1)
                & (F.col("l_quantity") <= 50),
            ),
        ]
    )


@register(
    "e11_gap_fill",
    oracle="""
    WITH obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, date_trunc('hour', ts) AS bucket, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts IS NOT NULL
      ) AS _r WHERE rn = 1
    ),
    bounds AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM obs GROUP BY user_id
    ),
    spine AS (
      SELECT user_id,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS bucket
      FROM bounds
    )
    SELECT s.user_id, s.bucket,
           LAST_VALUE(o.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value,
           o.value IS NOT NULL AS observed
    FROM spine s
    LEFT JOIN obs o
      ON s.user_id = o.user_id AND s.bucket = o.bucket
    """,
    doc="Time-series gap-fill: resample each user's event stream onto "
    "an hourly grid (latest observation per bucket, (ts, event_id) "
    "tiebreak via max-struct — never a window over the raw stream) "
    "and forward-fill missing hours from the key's first to last "
    "observed bucket (operators/timeseries.gap_fill). The spine is "
    "sequence+explode per key — generated distributed, never on the "
    "driver — and the agg, bounds, join, and fill window all share "
    "one partitioning by user. Filled values are the carried DOUBLE "
    "bit-moved (no arithmetic), so cross-engine parity is exact; the "
    "`observed` flag marks real vs carried rows.",
)
def e11_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    return gap_fill(
        cat.table("events"),
        key="user_id",
        ts_col="ts",
        value_col="value",
        unit="hour",
        tiebreak="event_id",
    )


@register(
    "u13_golden_record",
    oracle="""
    WITH src AS (
      SELECT c_custkey % 500 AS cluster_id, c_name, c_mktsegment,
             c_acctbal
      FROM customer
    ),
    counts AS (
      SELECT cluster_id, field, value, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT cluster_id, 'c_mktsegment' AS field,
               c_mktsegment AS value
        FROM src WHERE c_mktsegment IS NOT NULL
        UNION ALL
        SELECT cluster_id, 'c_name', c_name
        FROM src WHERE c_name IS NOT NULL
      ) AS _m GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT cluster_id, field, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY cluster_id, field
          ORDER BY cnt DESC, value) AS rn
        FROM counts
      ) AS _r WHERE rn = 1
    ),
    modes AS (
      SELECT cluster_id,
             MIN(CASE WHEN field = 'c_mktsegment' THEN value END)
               AS c_mktsegment,
             MIN(CASE WHEN field = 'c_name' THEN value END) AS c_name
      FROM best GROUP BY cluster_id
    ),
    aggs AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
             MAX(c_acctbal) AS max_c_acctbal
      FROM src GROUP BY cluster_id
    )
    SELECT a.cluster_id, a.n_members, a.max_c_acctbal,
           m.c_mktsegment, m.c_name
    FROM aggs a LEFT JOIN modes m USING (cluster_id)
    """,
    doc="Golden-record survivorship (MDM): one merged record per "
    "entity cluster with per-FIELD rules — most-frequent segment "
    "(mode with (count DESC, value) tiebreak), lexicographic-first "
    "name on all-tie counts, max account balance, member count — "
    "completing the entity-resolution funnel (blocking x61 → "
    "clustering x25 → survivorship; keep-best x43 keeps one whole "
    "row, survivorship merges fields from different rows). ALL mode "
    "fields ride ONE melted stream (two field-keyed partial-agg "
    "shuffles regardless of column count, never a per-column join; "
    "operators/matching.survivorship_merge); the demo clusters "
    "customers by c_custkey % 500.",
)
def u13_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.matching import (
        survivorship_merge,
    )

    cat = load_testdata(spark, sf_dir)
    src = cat.table("customer").select(
        (F.col("c_custkey") % 500).alias("cluster_id"),
        "c_name",
        "c_mktsegment",
        "c_acctbal",
    )
    merged = survivorship_merge(
        src,
        "cluster_id",
        mode_cols=["c_mktsegment", "c_name"],
        max_cols=["c_acctbal"],
    )
    return merged.select(
        "cluster_id", "n_members", "max_c_acctbal",
        "c_mktsegment", "c_name",
    )


@register(
    "x68_target_encoding",
    oracle="""
    WITH lab AS (
      SELECT c_mktsegment AS category,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    per AS (
      SELECT category, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS hits
      FROM lab GROUP BY category
    ),
    g AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS gn,
             CAST(SUM(y) AS HUGEINT) AS gh
      FROM lab
    )
    SELECT category, n, hits,
           CAST(CAST(CAST(hits AS HUGEINT) * gn + 25 * gh AS VARCHAR)
                AS DOUBLE)
           / CAST(CAST((CAST(n AS HUGEINT) + 25) * gn AS VARCHAR)
                  AS DOUBLE) AS enc
    FROM per CROSS JOIN g
    """,
    doc="Smoothed target encoding (Micci-Barreca 2001) of the customer "
    "market segment against the urgent-order label: enc = (hits + "
    "m*global_rate)/(n + m) with m=25, computed as ONE double division "
    "of two exact cross-multiplied integers — (hits*N + m*H) / "
    "((n+m)*N) — in DECIMAL(38,0) (corpus-scale BIGINT products "
    "overflow int64 at ~1e10 rows; the oracle's HUGEINT operands "
    "round-trip through VARCHAR per the DECIMAL(38)->DOUBLE 1-ulp "
    "note). The high-cardinality-categorical featurizer: one "
    "partial-agg groupBy + a 1-row broadcast global — the encoder "
    "table is a category-sized mergeable lake artifact, like the "
    "DSIR/LM model tables. operators/features.target_encoding.",
    headline=True,
)
def x68_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.features import target_encoding

    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    cust = cat.table("customer")
    labeled = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        "c_mktsegment",
        (F.col("o_orderpriority") == "1-URGENT")
        .cast("long")
        .alias("is_urgent"),
    )
    return target_encoding(
        labeled, "c_mktsegment", "is_urgent", smoothing=25
    )


def _fd_leg_sql(det: list[str], dep: str, table: str) -> str:
    name = f"fd({','.join(det)}->{dep})"
    return f"""
    SELECT '{name}' AS constraint_name,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT)
             AS n_violations,
           COUNT(CASE WHEN nd > 1 THEN 1 END) = 0 AS passed
    FROM (
      SELECT COUNT(DISTINCT {dep})
               + MAX(CASE WHEN {dep} IS NULL THEN 1 ELSE 0 END) AS nd
      FROM {table} GROUP BY {", ".join(det)}
    ) AS _g"""


@register(
    "u15_fd_audit",
    oracle="\n    UNION ALL\n".join(
        [
            _fd_leg_sql(["l_orderkey"], "l_suppkey", "lineitem"),
            _fd_leg_sql(
                ["l_orderkey", "l_linenumber"],
                "l_quantity",
                "lineitem",
            ),
            _fd_leg_sql(["l_partkey"], "l_returnflag", "lineitem"),
            _fd_leg_sql(["o_custkey"], "o_orderpriority", "orders"),
            _fd_leg_sql(["n_nationkey"], "n_regionkey", "nation"),
        ]
    ),
    doc="Functional-dependency audit (lhs → rhs) over "
    "lineitem/orders/nation — the normalization/key-discovery "
    "counterpart of u12's row constraints: per declared FD, how many "
    "determinant GROUPS exist and how many map to more than one "
    "dependent value. Deliberately mixes holding FDs (the "
    "(l_orderkey, l_linenumber) key determines everything; nation → "
    "region is a true hierarchy) with violated ones (an order draws "
    "on several suppliers, a customer uses several priorities) so "
    "the violation-counting path is exercised. NULL semantics pinned: "
    "determinant NULLs group together (SQL GROUP BY both engines); "
    "the dependent's distinct count adds NULL back as one value via a "
    "MAX(is-null) flag (COUNT DISTINCT skips NULLs in both engines), "
    "so {x, NULL} IS a violation — the conservative audit reading. "
    "Each FD is two partial-aggregated shuffles on its determinant "
    "(the distinct ride Spark's Expand); the report is a union of "
    "1-row frames, constraint count bounds the plan. "
    "operators/profile.check_functional_dependency.",
)
def u15_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_testdata(spark, sf_dir)
    lineitem = cat.table("lineitem")
    orders = cat.table("orders")
    nation = cat.table("nation")
    return constraint_report(
        [
            check_functional_dependency(
                lineitem, ["l_orderkey"], "l_suppkey"
            ),
            check_functional_dependency(
                lineitem,
                ["l_orderkey", "l_linenumber"],
                "l_quantity",
            ),
            check_functional_dependency(
                lineitem, ["l_partkey"], "l_returnflag"
            ),
            check_functional_dependency(
                orders, ["o_custkey"], "o_orderpriority"
            ),
            check_functional_dependency(
                nation, ["n_nationkey"], "n_regionkey"
            ),
        ]
    )


def _drift_profile_sql(alias: str, src: str) -> str:
    legs = []
    for c in ("o_custkey", "o_orderstatus", "o_orderpriority"):
        legs.append(f"""
      SELECT '{c}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS {alias}_rows,
             CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS {alias}_nulls,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {alias}_distinct,
             CAST(MIN({c}) AS VARCHAR) AS {alias}_mn,
             CAST(MAX({c}) AS VARCHAR) AS {alias}_mx
      FROM {src}""")
    return "(" + "\n      UNION ALL".join(legs) + "\n    )"


@register(
    "u14_profile_drift",
    oracle=f"""
    WITH old_t AS (
      SELECT * FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01'
    ),
    new_t AS (
      SELECT * FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    ),
    po AS {_drift_profile_sql("old", "old_t")},
    pn AS {_drift_profile_sql("new", "new_t")}
    SELECT column_name, old_rows, new_rows, old_nulls, new_nulls,
           old_distinct, new_distinct,
           CASE WHEN old_rows > 0 AND new_rows > 0 THEN
             CAST(new_nulls AS DOUBLE) / CAST(new_rows AS DOUBLE)
             - CAST(old_nulls AS DOUBLE) / CAST(old_rows AS DOUBLE)
           END AS null_rate_delta,
           NOT (old_mn IS NOT DISTINCT FROM new_mn) AS min_changed,
           NOT (old_mx IS NOT DISTINCT FROM new_mx) AS max_changed
    FROM po JOIN pn USING (column_name)
    """,
    doc="Snapshot-over-snapshot profile drift (schema/statistics "
    "monitoring): per-column row/null/distinct counts of two order "
    "snapshots (pre/post 1996), the null-RATE delta (two raw "
    "BIGINT/BIGINT divisions + one subtract, same IEEE order in both "
    "engines — the e10 rule; CASE-guarded on empty snapshots), and "
    "null-safe min/max movement flags over the profile's "
    "string-rendered extrema (BIGINT/VARCHAR columns only — "
    "double→string rendering is NOT cross-engine-stable). Each "
    "snapshot pays ONE wide aggregate (the table_profile shape; "
    "exact_distinct=False swaps in HLL at 100 TB), the drift join "
    "moves column-count rows — and in steady state the profiles are "
    "persisted per snapshot, so drift is a join of two tiny stored "
    "tables. operators/profile.profile_drift.",
)
def u14_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import profile_drift

    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    pivot = F.lit("1996-01-01").cast("timestamp")
    return profile_drift(
        orders.where(F.col("o_orderdate") < pivot),
        orders.where(F.col("o_orderdate") >= pivot),
        ["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@register(
    "u16_robust_outliers",
    oracle="""
    WITH vals AS (
      SELECT o_orderpriority AS grp,
             -- through DECIMAL(18,2) first (the money rule): the raw
             -- double*100 rounds in DuckDB's double→BIGINT cast but
             -- TRUNCATES in Spark's (2997.58*100 = 299757.99…), a
             -- 1-cent drift that moved a median element (edge tier)
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS v
      FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    ranked AS (
      SELECT grp, v,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM vals
    ),
    med AS (
      SELECT grp, v AS median_v, n
      FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT d.grp, ABS(d.v - m.median_v) AS ad, m.median_v, m.n
      FROM vals d JOIN med m ON d.grp = m.grp
    ),
    dranked AS (
      SELECT grp, ad, median_v, n,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY ad) AS rn
      FROM dev
    ),
    mad AS (
      SELECT grp, ad AS mad_v FROM dranked WHERE rn = (n + 1) // 2
    )
    SELECT d.grp AS o_orderpriority,
           CAST(d.n AS BIGINT) AS n,
           CAST(0 AS BIGINT) AS n_null,
           d.median_v, m.mad_v,
           CAST(SUM(CASE WHEN d.ad > 3 * m.mad_v THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.grp = m.grp
    GROUP BY d.grp, d.n, d.median_v, m.mad_v
    """,
    doc="Per-priority robust outlier audit of order value: exact "
    "median and MAD over CENTS (the Decimal·100 rule) with the "
    "Hampel 3-MAD flag — the outlier count a mean±stddev audit gets "
    "wrong on exactly the data it exists for (an extreme order drags "
    "the mean AND inflates the stddev, masking itself; median and "
    "MAD have 50% breakdown). The median is the LOWER-MIDDLE order "
    "statistic ((n+1) div 2), an ELEMENT of the data, so every "
    "downstream quantity — deviations, MAD, the k·MAD comparison — "
    "is exact BIGINT with no float anywhere in either engine (DuckDB "
    "// truncation matches `div` on these non-negative ranks). One "
    "group-key shuffle, two in-partition sort passes (value ranks, "
    "then deviation ranks — same partitioning), group-count-sized "
    "median/MAD frames broadcast back; the exact sort is the honest "
    "cost of exact order statistics at scale — the approximate tier "
    "is the GK sketch (u03). "
    "operators/profile.robust_outlier_report.",
)
def u16_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        robust_outlier_report,
    )

    cat = load_testdata(spark, sf_dir)
    return robust_outlier_report(
        cat.table("orders"),
        ["o_orderpriority"],
        F.col("o_totalprice").cast("decimal(18,2)") * 100,
        k=3,
    )


def _benford_oracle() -> str:
    """u17: the Benford audit's SQL mirror. The nine expected shares
    are the SAME driver-Python literals the Spark plan uses
    (profile.benford_table — the x75 enumerable-domain rule: a 9-value
    transcendental domain never crosses engines); χ² terms fold
    through DECIMAL(28,12) like the x81 ECE."""
    from ods_to_datalake_spark.operators.profile import benford_table

    spine = ", ".join(f"({d}, {p})" for d, p in benford_table())
    return f"""
    WITH spine(digit, expected_share) AS (
      SELECT CAST(d AS BIGINT), CAST(p AS DECIMAL(18,12))
      FROM (VALUES {spine}) AS v(d, p)
    ),
    vals AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS v
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ),
    counts AS (
      SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
               AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM vals GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(n_obs), 0) AS BIGINT) AS n_total
      FROM counts
    ),
    per AS (
      SELECT s.digit,
             CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
             s.expected_share, t.n_total,
             CASE WHEN t.n_total > 0 THEN
               CAST(COALESCE(c.n_obs, 0) AS DOUBLE)
                 / CAST(t.n_total AS DOUBLE)
             END AS obs_share,
             CAST(s.expected_share AS DOUBLE)
               * CAST(t.n_total AS DOUBLE) AS exp_n
      FROM spine s LEFT JOIN counts c ON c.digit = s.digit
      CROSS JOIN tot t
    ),
    terms AS (
      SELECT digit, n_obs, obs_share, expected_share, n_total,
             CASE WHEN n_total > 0 THEN
               (CAST(n_obs AS DOUBLE) - exp_n)
                 * (CAST(n_obs AS DOUBLE) - exp_n) / exp_n
             END AS chi2_term
      FROM per
    ),
    chi AS (
      -- VARCHAR hop: DuckDB's double→DECIMAL cast rounds the EXACT
      -- binary expansion while Spark's rounds the shortest string
      -- repr (BigDecimal.valueOf) — they disagree when the shortest
      -- repr lands exactly on a rounding halfway point (…2445 vs
      -- …24446, found by u17's χ² fold); both engines' double→VARCHAR
      -- is the identical shortest round-trip string, so rounding THAT
      -- is engine-stable
      SELECT SUM(CAST(CAST(chi2_term AS VARCHAR) AS DECIMAL(28,12))) AS c FROM terms
    )
    SELECT t.digit, t.n_obs, t.obs_share,
           CAST(t.expected_share AS DOUBLE) AS expected_share,
           t.chi2_term, t.n_total,
           CAST(CAST(c.c AS VARCHAR) AS DOUBLE) AS chi2
    FROM terms t CROSS JOIN chi c
    """


@register(
    "u17_benford_audit",
    oracle=_benford_oracle(),
    doc="Benford first-digit audit of order value (Newcomb 1881 / "
    "Benford 1938) with the χ² statistic — the fraud/fabrication "
    "screen for financial data: organic multiplicative magnitudes "
    "are logarithmic in the leading digit, invented ones uniform-ish "
    "(TPC-H's synthetic uniform prices FAIL the test, which is the "
    "honest reading and exactly what the audit detects). Money as "
    "cents (×100 appends zeros, leading digit invariant); the digit "
    "is the first char of the BIGINT's decimal rendering — integer→"
    "string identical cross-engine, no float log10 extraction; the "
    "nine expected shares are driver-literal decimals shared "
    "verbatim by both engines (the x75 enumerable-domain rule — a "
    "transcendental on a 9-value domain never crosses engines); the "
    "nine χ² terms fold through DECIMAL(28,12) (the x81 ECE rule). "
    "All 9 digits always appear — zero observations is evidence "
    "(term N·p_d), not absence; empty input emits the spine with "
    "NULL shares (CASE-guarded). One 9-group partial agg over the "
    "fact, then 9-row arithmetic. "
    "operators/profile.benford_audit.",
)
def u17_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import benford_audit

    cat = load_testdata(spark, sf_dir)
    return benford_audit(
        cat.table("orders").where(F.col("o_totalprice") > 0),
        F.col("o_totalprice").cast("decimal(18,2)") * 100,
    )


U18_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"]


def _concentration_oracle() -> str:
    """u18: one UNION ALL block per profiled column, each the Gini/
    top-share arithmetic over that column's value counts. HUGEINT
    numerators VARCHAR-hop their DOUBLE casts (the u17 rule: N²
    crosses 1e13 at ~3e6 rows)."""
    blocks = []
    for c in U18_COLS:
        blocks.append(f"""
    SELECT '{c}' AS column_name,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           MIN(CASE WHEN rn = 1 THEN v END) AS top_value,
           CAST(MAX(CASE WHEN rn = 1 THEN n END) AS BIGINT)
             AS top_count,
           CASE WHEN SUM(n) > 0 THEN
             CAST(MAX(CASE WHEN rn = 1 THEN n END) AS DOUBLE)
               / CAST(SUM(n) AS DOUBLE)
           END AS top_share,
           CASE WHEN SUM(n) > 0 THEN
             CAST(CAST(CAST(SUM(n) AS HUGEINT) * CAST(SUM(n) AS HUGEINT)
                    - SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT))
                  AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(SUM(n) AS HUGEINT)
                    * CAST(SUM(n) AS HUGEINT) AS VARCHAR) AS DOUBLE)
           END AS gini_impurity
    FROM (
      SELECT v, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, v) AS rn
      FROM (
        SELECT COALESCE(CAST({c} AS VARCHAR), 'NULL') AS v,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
      ) AS _c
    ) AS _r""")
    return " UNION ALL ".join(blocks)


@register(
    "u18_concentration_profile",
    oracle=_concentration_oracle(),
    doc="Per-column value-concentration profile of orders: exact Gini "
    "impurity 1 − Σ(nᵢ/N)² and the modal value's share — the 'is "
    "this column a key, a category, or a constant' diagnostic u11's "
    "row/null counts don't answer, and the hot-key report every skew "
    "mitigation (operators/skew) wants named BEFORE the shuffle that "
    "hits it. Gini = (N² − Σnᵢ²)/N², ALL-integer numerator/"
    "denominator over DECIMAL(38,0)/HUGEINT (Σnᵢ² crosses int64 on a "
    "dominant value), ONE IEEE division per column with VARCHAR-"
    "hopped oracle casts (the u17 rule); top value by (count DESC, "
    "value ASC) — deterministic at ties; NULL profiles as the "
    "literal 'NULL' because a 99%-NULL column IS concentrated — "
    "that's the finding. One partial-agg groupBy per column, "
    "column-count-sized output. "
    "operators/profile.concentration_profile.",
)
def u18_concentration_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        concentration_profile,
    )

    cat = load_testdata(spark, sf_dir)
    return concentration_profile(cat.table("orders"), U18_COLS)


# u19: the four lineitem measures as exact cents/centi-units (the
# Decimal(18,2)·100 rule); Pearson r is scale-invariant, so the ×100
# only fixes the integer-exactness contract, never the result
U19_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _correlation_oracle() -> str:
    vals = ", ".join(
        f"CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS HUGEINT) AS v{i}"
        for i, c in enumerate(U19_COLS)
    )
    stats, arms = [], []
    for i in range(len(U19_COLS)):
        for j in range(i + 1, len(U19_COLS)):
            t = f"_{i}_{j}"
            both = f"v{i} IS NOT NULL AND v{j} IS NOT NULL"
            stats += [
                f"CAST(COUNT(*) FILTER (WHERE {both}) AS HUGEINT)"
                f" AS n{t}",
                f"COALESCE(SUM(v{i}) FILTER (WHERE {both}),"
                f" 0) AS sx{t}",
                f"COALESCE(SUM(v{j}) FILTER (WHERE {both}),"
                f" 0) AS sy{t}",
                f"COALESCE(SUM(v{i} * v{j}) FILTER (WHERE {both}),"
                f" 0) AS sxy{t}",
                f"COALESCE(SUM(v{i} * v{i}) FILTER (WHERE {both}),"
                f" 0) AS sxx{t}",
                f"COALESCE(SUM(v{j} * v{j}) FILTER (WHERE {both}),"
                f" 0) AS syy{t}",
            ]
            # VARCHAR-hop every HUGEINT→DOUBLE cast (the u17 rule:
            # DuckDB's direct wide-decimal→double cast is 1 ulp off
            # at ~1e13; the string parse is correctly rounded like
            # Spark's BigDecimal path)
            arms.append(f"""
      SELECT '{U19_COLS[i]}' AS col_x, '{U19_COLS[j]}' AS col_y,
             CAST(n{t} AS BIGINT) AS n_pairs,
             CASE WHEN n{t} * sxx{t} - sx{t} * sx{t} > 0
                   AND n{t} * syy{t} - sy{t} * sy{t} > 0 THEN
               CAST(CAST(n{t} * sxy{t} - sx{t} * sy{t} AS VARCHAR)
                    AS DOUBLE)
               / (sqrt(CAST(CAST(n{t} * sxx{t} - sx{t} * sx{t}
                                 AS VARCHAR) AS DOUBLE))
                  * sqrt(CAST(CAST(n{t} * syy{t} - sy{t} * sy{t}
                                   AS VARCHAR) AS DOUBLE)))
             END AS corr
      FROM s""")
    return (
        "WITH vals AS (SELECT " + vals + " FROM lineitem),\n"
        "s AS (SELECT " + ",\n ".join(stats) + " FROM vals)\n"
        + "\nUNION ALL".join(arms)
    )


@register(
    "u19_correlation_profile",
    oracle=_correlation_oracle(),
    doc="Exact Pearson correlation for every pair of the four "
    "lineitem measures (quantity/extendedprice/discount/tax as "
    "cents-exact integers): the feature-redundancy / leakage panel a "
    "training pipeline reads before fitting — |r| ≈ 1 means one "
    "column is the other in disguise. Per pair the six sufficient "
    "statistics fold over PAIRWISE-complete rows as exact DECIMAL "
    "sums (order-free); r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·"
    "√(nΣy²−(Σy)²)) with the three operands exact DECIMAL(38,0)/"
    "HUGEINT integers cast once to double (oracle VARCHAR-hops — the "
    "u17 rule). NO transcendental quantization needed: IEEE-754 sqrt "
    "is correctly rounded in both engines, unlike ln — identical "
    "integer operands → bit-identical r. Zero-variance columns are "
    "CASE-guarded NULL. Spark's own corr()/covar_pop() are float-"
    "summed and partition-order-dependent — unusable for the "
    "contract; this is ONE map-side-combinable aggregate computing "
    "all K(K−1)/2 pairs in a single pass + a 1-row explode (the "
    "rich_club wide-agg shape, zero per-pair scans). "
    "operators/profile.correlation_profile.",
)
def u19_correlation_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        correlation_profile,
    )

    cat = load_testdata(spark, sf_dir)
    return correlation_profile(
        cat.table("lineitem"),
        [
            (c, F.col(c).cast("decimal(18,2)") * 100)
            for c in U19_COLS
        ],
    )


U20_FKS = [  # (name, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]


def _referential_oracle() -> str:
    arms = []
    for name, child, ckey, parent, pkey in U20_FKS:
        arms.append(f"""
      SELECT '{name}' AS fk_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_rows,
             (SELECT CAST(COUNT(*) - COUNT({ckey}) AS BIGINT)
              FROM {child}) AS n_null_keys,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                SELECT {ckey} FROM {child} WHERE {ckey} IS NOT NULL
                GROUP BY {ckey}
              ) ck WHERE ck.{ckey} NOT IN (
                SELECT {pkey} FROM {parent} WHERE {pkey} IS NOT NULL
              )) AS n_orphan_keys,
             (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
                SELECT {ckey}, COUNT(*) AS n FROM {child}
                WHERE {ckey} IS NOT NULL GROUP BY {ckey}
              ) ck WHERE ck.{ckey} NOT IN (
                SELECT {pkey} FROM {parent} WHERE {pkey} IS NOT NULL
              )) AS n_orphan_rows""")
    shares = """
    SELECT fk_name, n_rows, n_null_keys, n_orphan_keys, n_orphan_rows,
           CASE WHEN n_rows - n_null_keys > 0 THEN
             CAST(n_orphan_rows AS DOUBLE)
             / CAST(n_rows - n_null_keys AS DOUBLE)
           END AS orphan_share
    FROM ("""
    return shares + "\nUNION ALL".join(arms) + ") AS _edges"


@register(
    "u20_referential_audit",
    oracle=_referential_oracle(),
    doc="Cross-table referential-integrity audit over the six schema "
    "FK edges: per edge, the child rows whose non-NULL key has no "
    "parent — the lake-health check u12's single-table constraints "
    "cannot answer, and the first question after any partial load / "
    "GDPR delete / compaction (joins silently DROP orphans, which is "
    "why they go unnoticed until a revenue number is short). NULL "
    "child keys counted separately (a null FK is a modeling fact, "
    "not an orphan); counts exact BIGINTs, one CASE-guarded IEEE "
    "division per edge. Per edge the child aggregates to DISTINCT "
    "key counts first (vocabulary-sized — the corpus never reaches "
    "the join) then ONE anti-join against the parent's keys "
    "(broadcast for dims). operators/profile.referential_audit.",
)
def u20_referential_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        referential_audit,
    )

    cat = load_testdata(spark, sf_dir)
    return referential_audit(
        [
            (name, cat.table(child), ckey, cat.table(parent), pkey)
            for name, child, ckey, parent, pkey in U20_FKS
        ]
    )


@register(
    "u21_ks_two_sample",
    oracle="""
    WITH rows_f AS (
      SELECT o_orderpriority = '1-URGENT' AS g,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS v
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        AND o_totalprice IS NOT NULL
        AND o_orderpriority IS NOT NULL
    ),
    per_v AS (
      SELECT v,
             CAST(COALESCE(SUM(CASE WHEN g THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS na,
             CAST(COALESCE(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS nb
      FROM rows_f GROUP BY v
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(na), 0) AS BIGINT) AS n_a,
             CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_b
      FROM per_v
    ),
    cum AS (
      SELECT v,
             CAST(SUM(na) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ca,
             CAST(SUM(nb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cb
      FROM per_v
    ),
    gap AS (
      SELECT t.n_a, t.n_b, c.v,
             abs(CAST(c.ca AS HUGEINT) * t.n_b
                 - CAST(c.cb AS HUGEINT) * t.n_a) AS num
      FROM cum c CROSS JOIN tot t
    )
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(n_a AS HUGEINT) * n_b AS VARCHAR)
                    AS DOUBLE)
           END AS ks_d,
           v AS at_value
    FROM gap
    ORDER BY num DESC, v ASC
    LIMIT 1
    """,
    doc="Exact two-sample Kolmogorov–Smirnov D between the URGENT and "
    "LOW order-priority total-price distributions — the distribution-"
    "drift test behind 'did the SHAPE change, not just the mean' "
    "(u14 diffs summary stats, e21 tests one proportion; KS sees "
    "every quantile — a variance doubling with equal means is "
    "invisible to both and maximal here; reject at .05 when D > "
    "1.358·√((n_a+n_b)/(n_a·n_b))). D found WITHOUT float CDFs: "
    "|c_a·n_b − c_b·n_a| is an exact DECIMAL(38,0)/HUGEINT integer at "
    "every distinct value, so the argmax is an exact comparison and "
    "ks_d is ONE final division (VARCHAR-hopped oracle casts); "
    "at_value = smallest argmax (deterministic ties). Cumulative "
    "windows run over the distinct-VALUE frame — bounded by the "
    "cents DOMAIN, not row count (the e16 argument, domain-sized). "
    "operators/profile.ks_two_sample.",
)
def u21_ks_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import ks_two_sample

    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    return ks_two_sample(
        orders,
        F.col("o_orderpriority") == "1-URGENT",
        F.col("o_totalprice").cast("decimal(18,2)") * 100,
    )


@register(
    "u22_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders
      WHERE o_orderstatus IS NOT NULL
        AND o_orderpriority IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS la,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS lb
      FROM cells
    ),
    terms AS (
      SELECT o,
             CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS r,
             CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS c
      FROM cells
    ),
    q AS (
      SELECT CAST(CAST(
               (CAST(CAST(CAST(o AS HUGEINT) * t.n
                          - CAST(r AS HUGEINT) * c AS VARCHAR)
                     AS DOUBLE)
                * CAST(CAST(CAST(o AS HUGEINT) * t.n
                            - CAST(r AS HUGEINT) * c AS VARCHAR)
                       AS DOUBLE))
               / CAST(CAST(CAST(t.n AS HUGEINT) * r * c AS VARCHAR)
                      AS DOUBLE)
             AS VARCHAR) AS DECIMAL(28,12)) AS term
      FROM terms CROSS JOIN tot t
    ),
    agg AS (
      SELECT (SELECT SUM(term) FROM q) AS chi_dec,
             n, la, lb
      FROM tot
    )
    SELECT n AS n_rows, la AS n_levels_a, lb AS n_levels_b,
           CASE WHEN n > 0 THEN
             CAST(CAST(chi_dec AS VARCHAR) AS DOUBLE)
           END AS chi2,
           CASE WHEN n > 0 AND LEAST(la, lb) - 1 > 0 THEN
             sqrt(CAST(CAST(chi_dec AS VARCHAR) AS DOUBLE)
                  / (CAST(n AS DOUBLE)
                     * CAST(LEAST(la, lb) - 1 AS DOUBLE)))
           END AS cramers_v
    FROM agg
    """,
    doc="Cramér's V association between order status and priority — "
    "the categorical twin of u19's numeric correlation panel (V ∈ "
    "[0,1]; 0 independent, 1 one column determines the other): the "
    "pre-fit screen for entangled categorical features and the drift "
    "test for a segment × outcome table. χ² per the u17 Benford "
    "pattern: each cell's (o·N − r·c) deviation exact in "
    "DECIMAL(38,0)/HUGEINT, the term dev²/(N·r·c) a fixed IEEE chain, "
    "quantized DECIMAL(28,12) before the fold (VARCHAR-hopped oracle "
    "casts), χ²/V one division + one exact IEEE √. NULL levels "
    "excluded (check_not_null's job); single-level → NULL V. One "
    "cell-count shuffle; totals are windows over the contingency "
    "table. operators/profile.cramers_v.",
)
def u22_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import cramers_v

    cat = load_testdata(spark, sf_dir)
    return cramers_v(
        cat.table("orders"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )


@register(
    "u23_weighted_median",
    oracle="""
    WITH rows_f AS (
      SELECT l_returnflag AS grp,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL AND l_quantity > 0
    ),
    per_v AS (
      SELECT grp, v, CAST(SUM(w) AS BIGINT) AS wv
      FROM rows_f GROUP BY grp, v
    ),
    cum AS (
      SELECT grp, v,
             CAST(SUM(wv) OVER (
               PARTITION BY grp ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS c,
             CAST(SUM(wv) OVER (PARTITION BY grp) AS BIGINT) AS t
      FROM per_v
    )
    SELECT grp AS l_returnflag,
           CAST(MAX(t) AS BIGINT) AS total_weight,
           CAST(MIN(v) AS BIGINT) AS weighted_median
    FROM cum WHERE 2 * c >= t
    GROUP BY grp
    """,
    doc="Exact lower weighted median of line price (cents) per return "
    "flag, weighted by quantity - 'the price at which half the UNITS "
    "trade': the volume-weighted center a plain median (u16) "
    "mis-states whenever line sizes vary; degenerates to u16's "
    "lower-middle order statistic at unit weights (property-tested). "
    "Pick condition 2*cumw >= totw is ALL-integer (the x42 boundary "
    "rule - never a float quantile fraction); ties on value merge "
    "into one cumulative step so the result is a value FROM the "
    "data; non-positive/NULL weights excluded; zero-weight groups "
    "absent. ONE group-keyed shuffle shared by the pre-agg, the "
    "cumulative window, and the pick (u16's shape); DuckDB's HUGEINT "
    "window sums recast (the x28 rule). "
    "operators/profile.weighted_median.",
)
def u23_weighted_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import weighted_median

    cat = load_testdata(spark, sf_dir)
    return weighted_median(
        cat.table("lineitem"),
        ["l_returnflag"],
        F.col("l_extendedprice").cast("decimal(18,2)") * 100,
        F.col("l_quantity"),
    )


@register(
    "u24_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders
      WHERE o_orderstatus IS NOT NULL
        AND o_orderpriority IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS la,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS lb
      FROM cells
    ),
    joint AS (
      SELECT o,
             CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS r,
             CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS c
      FROM cells
    ),
    mi_terms AS (
      SELECT CAST(o AS DECIMAL(18,0)) *
             CAST(CAST(ln(
               CAST(CAST(CAST(o AS HUGEINT) * t.n AS VARCHAR)
                    AS DOUBLE)
               / CAST(CAST(CAST(r AS HUGEINT) * c AS VARCHAR)
                      AS DOUBLE)
             ) AS VARCHAR) AS DECIMAL(18,6)) AS term
      FROM joint CROSS JOIN tot t
    ),
    ma AS (
      SELECT CAST(SUM(o) AS BIGINT) AS m FROM cells GROUP BY a
    ),
    mb AS (
      SELECT CAST(SUM(o) AS BIGINT) AS m FROM cells GROUP BY b
    ),
    ha_terms AS (
      SELECT CAST(m AS DECIMAL(18,0)) *
             CAST(CAST(ln(CAST(t.n AS DOUBLE) / CAST(m AS DOUBLE))
                  AS VARCHAR) AS DECIMAL(18,6)) AS term
      FROM ma CROSS JOIN tot t
    ),
    hb_terms AS (
      SELECT CAST(m AS DECIMAL(18,0)) *
             CAST(CAST(ln(CAST(t.n AS DOUBLE) / CAST(m AS DOUBLE))
                  AS VARCHAR) AS DECIMAL(18,6)) AS term
      FROM mb CROSS JOIN tot t
    ),
    agg AS (
      SELECT n, la, lb,
             (SELECT SUM(term) FROM mi_terms) AS mi_dec,
             (SELECT SUM(term) FROM ha_terms) AS ha_dec,
             (SELECT SUM(term) FROM hb_terms) AS hb_dec
      FROM tot
    )
    SELECT n AS n_rows, la AS n_levels_a, lb AS n_levels_b,
           CASE WHEN n > 0 THEN
             CAST(CAST(ha_dec AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE) END AS h_a,
           CASE WHEN n > 0 THEN
             CAST(CAST(hb_dec AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE) END AS h_b,
           CASE WHEN n > 0 THEN
             CAST(CAST(mi_dec AS VARCHAR) AS DOUBLE)
               / CAST(n AS DOUBLE) END AS mi_nats,
           CASE WHEN n > 0 AND LEAST(
                  CAST(CAST(ha_dec AS VARCHAR) AS DOUBLE)
                    / CAST(n AS DOUBLE),
                  CAST(CAST(hb_dec AS VARCHAR) AS DOUBLE)
                    / CAST(n AS DOUBLE)) > 0 THEN
             (CAST(CAST(mi_dec AS VARCHAR) AS DOUBLE)
                / CAST(n AS DOUBLE))
             / LEAST(CAST(CAST(ha_dec AS VARCHAR) AS DOUBLE)
                       / CAST(n AS DOUBLE),
                     CAST(CAST(hb_dec AS VARCHAR) AS DOUBLE)
                       / CAST(n AS DOUBLE))
           END AS nmi
    FROM agg
    """,
    doc="Shannon mutual information (nats) between order status and "
    "priority, with both marginal entropies and min-normalized NMI — "
    "u22's entanglement question on the COMPRESSION scale (how many "
    "nats of one label the other explains): the ranking quantity of "
    "information-gain feature selection, and the entropy-family "
    "member tying x85/x87 to the contingency table (MI = KL(joint || "
    "product of marginals), x72's geometry read as information). "
    "Per-term discipline: o*N and r*c exact DECIMAL(38,0)/HUGEINT "
    "cast via VARCHAR (1e24 magnitudes sit in DuckDB's 1-ulp "
    "direct-cast territory), ONE IEEE division, ln quantized "
    "DECIMAL(18,6) via the VARCHAR hop BEFORE the integer multiply "
    "(x72's rule), decimal folds, one read-back + one division by N "
    "per statistic. Observed cells only (o >= 1: no ln(0) by "
    "construction); single-level -> NULL nmi. "
    "operators/profile.mutual_information.",
)
def u24_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        mutual_information,
    )

    cat = load_testdata(spark, sf_dir)
    return mutual_information(
        cat.table("orders"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )


@register(
    "u25_gini_coefficient",
    oracle="""
    WITH f AS (
      SELECT o_orderpriority AS grp,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS v
      FROM orders
      WHERE o_totalprice IS NOT NULL
        AND CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT) >= 0
    ),
    per_v AS (
      SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM f GROUP BY grp, v
    ),
    cum AS (
      SELECT grp, v, c,
             CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
               AS BIGINT) AS cb
      FROM per_v
    ),
    agg AS (
      SELECT grp,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             SUM(CAST(v AS HUGEINT) * c) AS s,
             SUM(CAST(v AS HUGEINT)
                 * (2 * CAST(c AS HUGEINT) * cb
                    + CAST(c AS HUGEINT) * (c + 1))) AS t2
      FROM cum GROUP BY grp
    )
    SELECT grp AS o_orderpriority, n_rows,
           CAST(s AS BIGINT) AS total_value,
           CASE WHEN n_rows > 0 AND s > 0 THEN
             CAST(CAST(t2 - (CAST(n_rows AS HUGEINT) + 1) * s
                       AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(n_rows AS HUGEINT) * s AS VARCHAR)
                    AS DOUBLE)
           END AS gini
    FROM agg
    """,
    doc="Exact Gini coefficient of order value (cents) per priority — "
    "magnitude-dominance inequality (0 equal, ->1 one order carries "
    "everything), the whale-detection twin of u18's category "
    "concentration: computed WITHOUT sorting rows, from the "
    "per-distinct-value count frame via the closed-form tied-block "
    "rank sum 2T = sum v*(2c*cum_before + c*(c+1)) — note 2T "
    "directly, no halving, no fractional intermediate — G = "
    "(2T-(n+1)S)/(nS), everything DECIMAL(38,0)/HUGEINT until ONE "
    "IEEE division (VARCHAR-hopped oracle read-backs). "
    "Tie-permutation invariant by construction; negative values "
    "excluded (Gini is defined on a non-negative measure); "
    "zero-total groups NULL. One group-keyed shuffle + a "
    "domain-bounded cumulative window (the u23 shape). "
    "operators/profile.gini_coefficient.",
)
def u25_gini_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        gini_coefficient,
    )

    cat = load_testdata(spark, sf_dir)
    return gini_coefficient(
        cat.table("orders"),
        ["o_orderpriority"],
        F.col("o_totalprice").cast("decimal(18,2)") * 100,
    )


@register(
    "u26_spearman_correlation",
    oracle="""
    WITH rows_pc AS (
      SELECT l_returnflag AS grp,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    ranked AS (
      SELECT grp,
             -- 2*avg_rank = min asc rank + max asc rank, exact ints
             CAST(RANK() OVER (PARTITION BY grp ORDER BY x)
                  + COUNT(*) OVER (PARTITION BY grp)
                  - RANK() OVER (PARTITION BY grp ORDER BY x DESC)
                  + 1 AS HUGEINT) AS rx,
             CAST(RANK() OVER (PARTITION BY grp ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY grp)
                  - RANK() OVER (PARTITION BY grp ORDER BY y DESC)
                  + 1 AS HUGEINT) AS ry
      FROM rows_pc
    ),
    s AS (
      SELECT grp,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * ry) AS sxy,
             SUM(rx * rx) AS sxx,
             SUM(ry * ry) AS syy
      FROM ranked GROUP BY grp
    )
    SELECT grp AS l_returnflag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0 THEN
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR)
                          AS DOUBLE))
                * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR)
                            AS DOUBLE)))
           END AS rho
    FROM s
    """,
    doc="Exact tie-aware Spearman rank correlation of quantity vs "
    "extended price per return flag — the monotonic-association twin "
    "of u19's linear Pearson panel (y = x^3 reads rho = 1 here, "
    "r < 1 there) and the robust screen for heavy-tailed columns. "
    "Average ranks stay integral via the 2*rank trick (R2 = asc rank "
    "+ n - desc rank + 1 = min + max asc rank of the tie block; "
    "Pearson is affine-invariant so rho is unchanged); six "
    "sufficient statistics fold as exact DECIMAL(38,0)/HUGEINT sums; "
    "the u19 formula finishes with IEEE sqrt/division on "
    "VARCHAR-hopped operands — bit-identical, NO transcendental "
    "quantization. ONE group-keyed shuffle shared by all five rank "
    "windows (every window partitions by exactly the group) and the "
    "final agg; R2 pre-projected before the wide agg (u19 rule). "
    "operators/profile.spearman_correlation.",
)
def u26_spearman_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import (
        spearman_correlation,
    )

    cat = load_testdata(spark, sf_dir)
    return spearman_correlation(
        cat.table("lineitem"),
        ["l_returnflag"],
        F.col("l_quantity").cast("decimal(18,2)") * 100,
        F.col("l_extendedprice").cast("decimal(18,2)") * 100,
    )


@register(
    "u27_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             MAX(o_orderdate) AS last_dt,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(COALESCE(SUM(CAST(CAST(o_totalprice
                    AS DECIMAL(18,2)) * 100 AS BIGINT)), 0)
               AS BIGINT) AS cents
      FROM orders
      WHERE o_custkey IS NOT NULL
      GROUP BY o_custkey
      HAVING MAX(o_orderdate) IS NOT NULL
    ),
    anchor AS (SELECT MAX(last_dt) AS asof_dt FROM per_cust),
    rfm AS (
      SELECT cust,
             CAST(date_diff('day', CAST(last_dt AS DATE),
                            CAST(asof_dt AS DATE)) AS BIGINT) AS rec,
             freq, cents
      FROM per_cust CROSS JOIN anchor
    ),
    binned AS (
      SELECT CAST(NTILE(4) OVER (ORDER BY rec ASC, cust ASC)
               AS BIGINT) AS r_bin,
             CAST(NTILE(4) OVER (ORDER BY freq DESC, cust ASC)
               AS BIGINT) AS f_bin,
             CAST(NTILE(4) OVER (ORDER BY cents DESC, cust ASC)
               AS BIGINT) AS m_bin,
             cents
      FROM rfm
    )
    SELECT r_bin, f_bin, m_bin,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM binned GROUP BY r_bin, f_bin, m_bin
    """,
    doc="RFM segmentation grid (Hughes 1994) over orders: per "
    "customer, Recency (days since last order, from the dataset's "
    "own max date — reproducible), Frequency (order count), Monetary "
    "(cents) each NTILE'd into 4 bins with bin 1 = best, then the "
    "occupancy grid (n_customers + exact cents mass per cell) — the "
    "champions/at-risk/hibernating lifecycle panel, the multi-metric "
    "binning member of the profile family (u16/u23 cut ONE metric). "
    "Every NTILE carries the unique customer key tiebreak so tied "
    "metrics split identically cross-engine (earlier-buckets-get-"
    "the-extra-row is shared semantics); recency is an exact integer "
    "day diff of midnight dates. ONE customer-keyed shuffle, three "
    "NTILEs over the CUSTOMER-sized frame (dimension-scale; the "
    "docstring names the value-table rank swap for 1e9+ customers), "
    "4^3-bounded grid agg. operators/features.rfm_segments.",
)
def u27_rfm_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.features import rfm_segments

    cat = load_testdata(spark, sf_dir)
    return rfm_segments(
        cat.table("orders"),
        "o_custkey",
        "o_orderdate",
        F.col("o_totalprice"),
    )


@register(
    "u28_trend_regression",
    oracle="""
    WITH d0 AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS d0 FROM orders
    ),
    rows_pc AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', d0, CAST(o_orderdate AS DATE))
               AS HUGEINT) AS x,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS HUGEINT) AS y
      FROM orders CROSS JOIN d0
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    s AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM rows_pc GROUP BY o_orderpriority
    ),
    -- VARCHAR-hop every HUGEINT->DOUBLE read-back (the u17 rule)
    d AS (
      SELECT o_orderpriority,
             CAST(n AS BIGINT) AS n_rows,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
               AS numd,
             n * sxx - sx * sx AS dx_i,
             n * syy - sy * sy AS dy_i,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
               AS dxd,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)
               AS dyd
      FROM s
    )
    SELECT o_orderpriority, n_rows,
           CASE WHEN dx_i > 0 THEN numd / dxd END AS slope,
           CASE WHEN dx_i > 0 THEN
             (syd - (numd / dxd) * sxd) / nd
           END AS intercept,
           CASE WHEN dx_i > 0 AND dy_i > 0 THEN
             (numd * numd) / (dxd * dyd)
           END AS r2
    FROM d
    """,
    doc="Exact-arithmetic OLS trend fit of daily order value per "
    "priority: slope (cents/day), intercept (level at the dataset's "
    "first order date — x is days since the global min date, so the "
    "DECIMAL(38,0) product headroom holds; slope is shift-invariant "
    "so centering is free), and r-squared — u19 answers whether two "
    "measures move together, this fits the LINE a forecast or SLO "
    "burn-rate check consumes. Five sufficient statistics fold as "
    "exact DECIMAL(38,0)/HUGEINT sums; slope/intercept/r2 are a "
    "fixed IEEE chain over operands cast once (oracle VARCHAR-hops) "
    "— bit-identical, no transcendentals. Zero x-variance -> all "
    "NULL; zero y-variance -> exact 0-slope line with NULL r2 (0/0 "
    "has no fit quality). ONE map-side-combinable group aggregate "
    "(the u19 shape). operators/profile.trend_fit.",
)
def u28_trend_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.profile import trend_fit

    cat = load_testdata(spark, sf_dir)
    orders = cat.table("orders")
    d0 = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("__d0")
    )
    rows = orders.crossJoin(F.broadcast(d0))
    return trend_fit(
        rows,
        ["o_orderpriority"],
        F.datediff(F.to_date("o_orderdate"), F.col("__d0")),
        F.col("o_totalprice").cast("decimal(18,2)") * 100,
    )
