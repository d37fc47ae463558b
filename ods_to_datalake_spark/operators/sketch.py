"""Mergeable sketch primitives: HyperLogLog, count-min, Bloom filter.

The reference pipeline (santitee/ods_to_datalake, pyspark_utilities.py)
computes exact distincts and exact counts because its tables are
single-node sized. At 100 TB the exact forms shuffle the full key set;
the classic replacements are *mergeable sketches* whose state is a
fixed-size register table:

- HyperLogLog (Flajolet et al. 2007): distinct counts from 2^p
  max-registers. Partial states merge by ``max`` — associative and
  commutative, so map-side partials, cross-partition merges, and
  cross-corpus unions are all the same one-line aggregation.
- count-min (Cormode & Muthukrishnan 2005): frequency over-estimates
  from a depth×width counter grid. Merges by ``+``.
- Bloom filter (Bloom 1970): set membership with zero false negatives
  from a fixed bit set. Merges by union. A broadcastable prefilter
  that replaces a corpus-sized anti-join for incremental dedup.
- fixed-grid histogram: quantile upper bounds from an equi-width
  cents grid. Merges by ``+`` — the mergeable stand-in for exact
  percentiles (which sort) and approx_percentile (engine-private,
  unmergeable across persisted corpora).

Everything here is relational (groupBy/join over md5-derived integers;
no UDFs, no binary blobs), which buys three things at once:
1. the sketch state is an ordinary DataFrame — persistable to the lake,
   incrementally appendable, AQE-splittable;
2. the arithmetic is integer-only (bucket = hex-slice of md5, rho via
   ``length(bin(w))``, terms via ``shiftleft``) so Spark and DuckDB
   produce bit-identical sketches — every query here carries an exact
   value-hash oracle, unusual for "approximate" operators;
3. map-side partial aggregation applies automatically (max/sum/count),
   so building a sketch over 100 TB shuffles only 2^p rows per
   partition, not the data.

Spark's own approx_count_distinct is the production shortcut for the
HLL *estimate*; this module exists for the cases it can't serve: a
persisted register table you merge across days/corpora without
re-scanning, and an engine-portable definition you can verify.

Cross-engine determinism notes (CLAUDE.md rules applied):
- md5 is the only hash shared with DuckDB; integers are carved from
  hex slices via conv() ⟷ CAST(concat('0x',...) AS BIGINT).
- No transcendentals: the HLL face emits the *raw* estimate
  alpha·m²/Σ2^-M[j] whose Σ is computed as an exact BIGINT
  (Σ 2^(RHO_MAX-M[j]), every term a power of two) — the small-range
  linear-counting correction needs ln() and is deliberately left to
  the caller (see hll_estimate docstring).
- BIGINT→DOUBLE casts are correctly rounded in both engines (the 1-ulp
  DuckDB divergence is DECIMAL(38,x)→DOUBLE only).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 48 hash bits feed the rho computation (md5 hex chars 5..16); rho of
# an all-zero window is defined as RHO_MAX = 48 + 1.
HLL_HASH_BITS = 48
HLL_RHO_MAX = HLL_HASH_BITS + 1
# BIGINT budget: sum_term ≤ m · 2^RHO_MAX = 2^(p+49) must stay < 2^63.
HLL_MAX_P = 12
# default precision: 2^8 = 256 registers, ~6.5% standard error
HLL_P = 8

CMS_DEPTH = 4
CMS_WIDTH = 512

BLOOM_K = 7
BLOOM_M = 4096


def _hex_long(col: Column, start: int, length: int) -> Column:
    """BIGINT from a slice of an md5 hex digest (≤ 15 hex chars).

    DuckDB mirror: CAST(concat('0x', substring(h, start, length)) AS
    BIGINT). Both parse the same hex → same integer.
    """
    return F.conv(F.substring(col, start, length), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    by: list[str] | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Sparse HLL register table: (by..., hll_bucket, register).

    bucket = low p bits of md5 hex chars 1..4; the rho window (chars
    5..16, 48 bits) is disjoint from the bucket bits, as HLL requires.
    rho = leading zeros in the 48-bit window + 1 = RHO_MAX -
    length(bin(w)), with the all-zero window pinned to RHO_MAX.

    Absent buckets mean register 0 (sparse representation): at p=8 a
    register table is ≤ 256 rows per group no matter the input size,
    and the groupBy is map-side-partial — the shuffle moves registers,
    not data. Merge register tables with hll_merge (max is
    associative); estimate with hll_estimate.
    """
    if not 4 <= p <= HLL_MAX_P:
        raise ValueError(f"p must be in [4, {HLL_MAX_P}], got {p}")
    keys = list(by or [])
    h = F.md5(F.col(col).cast("string"))
    bucket = _hex_long(h, 1, 4) % (1 << p)
    w = _hex_long(h, 5, 12)
    rho = F.when(w == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(*keys, bucket.alias("hll_bucket"), rho.alias("rho"))
        .groupBy(*keys, "hll_bucket")
        .agg(F.max("rho").alias("register"), *(extra_aggs or []))
    )


def hll_merge(
    regs: list[DataFrame], by: list[str] | None = None
) -> DataFrame:
    """Merge HLL register tables (same p!) by per-bucket max.

    This is THE reason to persist registers instead of estimates: the
    union of yesterday's corpus sketch and today's increment is one
    256-row-per-group aggregation — no re-scan of either corpus.
    """
    keys = list(by or []) + ["hll_bucket"]
    union = reduce(lambda a, b: a.unionByName(b), regs)
    return union.groupBy(*keys).agg(F.max("register").alias("register"))


def _hll_alpha(m: int) -> float:
    """Flajolet 2007's bias-correction constant: the closed form
    0.7213/(1 + 1.079/m) is only valid for m >= 128; smaller register
    counts use the paper's tabulated values. Computed in Python so the
    Spark literal and the SQL mirror (repr) are the same IEEE double.
    """
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / float(m))


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    by: list[str] | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Raw HLL estimate per group: (by..., used_buckets, sum_term,
    hll_estimate_raw).

    sum_term = Σ_j 2^(RHO_MAX - M[j]) over all m buckets (absent
    sparse buckets contribute 2^RHO_MAX) — an exact BIGINT, every term
    a power of two, so the sum is order-independent and engine-exact.
    hll_estimate_raw = alpha_m · m² · 2^RHO_MAX / sum_term: one BIGINT
    →DOUBLE cast (correctly rounded in both engines), one divide.

    ``p`` MUST be the precision the registers were built with: a
    register table persisted at a larger p contains buckets >= m, and
    silently folding those in would produce a negative sum_term — the
    estimate raises at execution instead (the smaller-p direction; a
    table built at a SMALLER p than asked for is structurally
    indistinguishable from a sparse table and cannot be detected here —
    persist p next to the lake artifact).

    Deliberately NOT applied: the small-range linear-counting
    correction m·ln(m/V) — ln() is not bit-stable across engines
    (CLAUDE.md); callers that need it for small cardinalities can
    compute it from used_buckets. The raw estimate's relative error is
    the usual 1.04/√m for cardinalities ≳ 2.5·m.
    """
    m = 1 << p
    keys = list(by or [])
    # extra_aggs aliased like a reserved internal column (or a group
    # key) would be silently dropped/shadowed by the `known` filter
    # below — fail loudly instead (ADVICE r12)
    reserved = set(keys) | {"used_buckets", "sum_present", "_max_bucket"}
    for a in extra_aggs or []:
        alias = a._jc.toString().rsplit(" AS ", 1)[-1].strip("`")
        if alias in reserved:
            raise ValueError(
                f"hll_estimate extra_aggs alias {alias!r} collides with "
                f"a reserved column {sorted(reserved)}"
            )
    # F.shiftleft only takes a literal shift; the SQL form takes a column
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - register)"
    )
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("used_buckets"),
        F.sum(term).alias("sum_present"),
        F.max("hll_bucket").alias("_max_bucket"),
        *(extra_aggs or []),
    )
    top = F.lit(1 << HLL_RHO_MAX).cast("long")
    # executed guard, not a docstring promise: registers built with a
    # larger p surface as buckets >= m and would corrupt the estimate
    sum_term = F.when(
        F.col("_max_bucket") >= m,
        F.raise_error(
            F.concat(
                F.lit(f"hll_estimate(p={p}): register bucket "),
                F.col("_max_bucket").cast("string"),
                F.lit(f" >= m={m} — the table was built with a larger p"),
            )
        ).cast("long"),
    ).otherwise(
        F.col("sum_present")
        + (F.lit(m).cast("long") - F.col("used_buckets")) * top
    )
    alpha = F.lit(_hll_alpha(m))
    est = (
        alpha
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << HLL_RHO_MAX))
        / sum_term.cast("double")
    )
    known = set(keys) | {"used_buckets", "sum_present", "_max_bucket"}
    extra_cols = [c for c in agg.columns if c not in known]
    return agg.select(
        *keys,
        "used_buckets",
        sum_term.alias("sum_term"),
        est.alias("hll_estimate_raw"),
        *extra_cols,
    )


def sql_hll_registers(
    source_sql: str, value_sql: str, p: int = 8, by: str | None = None
) -> str:
    """DuckDB register-table SQL mirroring hll_registers exactly."""
    m = 1 << p
    keys = f"{by}, " if by else ""
    grp = f"{by}, hll_bucket" if by else "hll_bucket"
    return f"""
    SELECT {keys}hll_bucket, MAX(rho) AS register FROM (
      SELECT {keys}
        CAST(concat('0x', substring(h, 1, 4)) AS BIGINT) % {m}
          AS hll_bucket,
        CASE WHEN CAST(concat('0x', substring(h, 5, 12)) AS BIGINT) = 0
             THEN {HLL_RHO_MAX}
             ELSE {HLL_RHO_MAX} - length(bin(
                    CAST(concat('0x', substring(h, 5, 12)) AS BIGINT)))
        END AS rho
      FROM (SELECT {keys}md5(CAST({value_sql} AS VARCHAR)) AS h
            FROM {source_sql}
            WHERE {value_sql} IS NOT NULL) AS _h
    ) AS _b GROUP BY {grp}
    """


def sql_hll_estimate(
    registers_sql: str, p: int = 8, by: str | None = None
) -> str:
    """DuckDB estimate SQL mirroring hll_estimate exactly."""
    m = 1 << p
    top = 1 << HLL_RHO_MAX
    keys = f"{by}, " if by else ""
    grp = f" GROUP BY {by}" if by else ""
    # CAST ... AS BIGINT: DuckDB promotes SUM(BIGINT) to HUGEINT, which
    # lands as float64/object in pandas and hash-mismatches (CLAUDE.md)
    return f"""
    SELECT {keys}used_buckets,
           CAST(sum_present + ({m} - used_buckets)
                * CAST({top} AS BIGINT) AS BIGINT) AS sum_term,
           CAST({_hll_alpha(m)!r} AS DOUBLE)
             * {float(m)!r} * {float(m)!r} * {float(top)!r}
             / CAST(sum_present + ({m} - used_buckets)
                    * CAST({top} AS BIGINT) AS DOUBLE)
             AS hll_estimate_raw
    FROM (
      SELECT {keys}COUNT(*) AS used_buckets,
             CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - register))
                  AS BIGINT) AS sum_present
      FROM ({registers_sql}) AS _r{grp}
    ) AS _agg
    """


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _cms_bucket(value: Column, row: int, width: int) -> Column:
    """Row-i bucket: low bits of md5('cms{row}:' || value).

    The explicit cast('string') matches hll_registers' contract (and
    the CAST(... AS VARCHAR) every SQL mirror uses): without it a
    non-string key would ride Spark's implicit concat coercion, whose
    rendering (timestamps, doubles) can differ from DuckDB's cast.
    """
    h = F.md5(F.concat(F.lit(f"cms{row}:"), value.cast("string")))
    return _hex_long(h, 1, 8) % width


def cms_sketch(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min counter grid: (cms_row, cms_bucket, cnt).

    Each input row increments one bucket per sketch row; the build is
    a single map-side-partial groupBy over depth·width cells — fixed
    state no matter the input size, mergeable by summing cnt.
    depth independent hashes come from distinct md5 prefixes
    ('cms0:'..'cms{d-1}:'), the same seeding trick as the
    Carter-Wegman MinHash family (functions/text.py).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                _cms_bucket(F.col(col), i, width).alias("cms_bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("cell"))
        .select("cell.cms_row", "cell.cms_bucket")
        .groupBy("cms_row", "cms_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point queries against a count-min sketch: keys + cms_est.

    est(key) = min over rows of cnt[row, bucket_row(key)] — an upper
    bound on the true count, never an underestimate; absent cells
    count 0. The keys side is typically small (heavy-hitter
    candidates), so the join broadcasts; the sketch side is depth·width
    rows regardless of corpus size.
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cms_row"),
                        _cms_bucket(F.col(col), i, width).alias(
                            "cms_bucket"
                        ),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(*keys.columns, "cell.cms_row", "cell.cms_bucket")
    joined = probes.join(
        F.broadcast(sketch), ["cms_row", "cms_bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(*keys.columns).agg(
        F.min("cnt").alias("cms_est")
    )


def cms_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches
    built on the join keys (Cormode & Muthukrishnan 2005, §4.2): the
    per-row inner product Σ_bucket cntA·cntB upper-bounds
    |A ⋈ B| = Σ_key fA(key)·fB(key), and the MIN over the depth rows
    is the estimate — never an underestimate, within εN²  with the
    usual (ε, δ) width/depth guarantees.

    This is the optimizer's join-size oracle as a lake artifact: both
    sketches are depth·width-row mergeable tables (build once per
    partition/day, sum to combine), so planning-time estimates never
    rescan the fact tables. The estimate itself joins two fixed-size
    grids — driver-free, integer-exact, engine-independent.
    Returns one row: (est_join_size,). Sketches built with DIFFERENT
    (depth, width) must not be mixed — bucket ids would not align.
    """
    a = sketch_a.select(
        "cms_row", "cms_bucket", F.col("cnt").alias("__ca")
    )
    b = sketch_b.select(
        "cms_row", "cms_bucket", F.col("cnt").alias("__cb")
    )
    per_row = (
        a.join(b, ["cms_row", "cms_bucket"])  # absent cells are 0
        .groupBy("cms_row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__dot"))
    )
    # a sketch row can be entirely disjoint (dot 0 after the inner
    # join drops it): min over PRESENT rows only would overestimate —
    # re-seed the full row set so missing rows count as 0
    rows = per_row.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("cms_row")
    )
    return (
        rows.join(per_row, "cms_row", "left")
        .withColumn("__dot", F.coalesce(F.col("__dot"), F.lit(0)))
        .agg(F.min("__dot").cast("long").alias("est_join_size"))
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_positions(value: Column, k: int, m: int) -> Column:
    """Array of k bit positions from k seeded md5 hashes (value cast
    to string for the same cross-engine reason as _cms_bucket)."""
    return F.array(
        *[
            _hex_long(
                F.md5(
                    F.concat(F.lit(f"bloom{i}:"), value.cast("string"))
                ),
                1,
                8,
            )
            % m
            for i in range(k)
        ]
    )


def bloom_bits(
    df: DataFrame, col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """Set bit positions of a Bloom filter over df[col]: (bloom_bit).

    ≤ m rows regardless of input size; union-mergeable (it IS a set);
    persistable to the lake and broadcastable into any scan that wants
    a membership prefilter. distinct() is map-side-partial.
    """
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.explode(_bloom_positions(F.col(col), k, m)).alias(
                "bloom_bit"
            )
        )
        .distinct()
    )


def bloom_maybe_contains(
    bits: DataFrame,
    candidates: DataFrame,
    col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """candidates + bloom_maybe flag (true ⟺ all k bits set).

    Zero false negatives by construction — a true member always has
    all its bits set — so `bloom_maybe = false` rows can skip the
    exact (expensive) membership join entirely; the false-positive
    fraction is the only wasted exact work. The bits side broadcasts
    (≤ m rows); bit-matching runs over DISTINCT candidate values, not
    rows — a batch containing the same value twice must flag BOTH rows
    (probing per row would double-count bits_set past k and fabricate
    a false negative for true members, the one failure a Bloom filter
    may never have), and the distinct value set is the cheaper probe
    side anyway.
    """
    vals = candidates.select(col).where(F.col(col).isNotNull()).distinct()
    probes = vals.select(
        col,
        F.explode(_bloom_positions(F.col(col), k, m)).alias("bloom_bit"),
    )
    hits = (
        probes.join(F.broadcast(bits), "bloom_bit", "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("bits_set"))
    )
    return (
        candidates.join(hits, [col], "left")
        .withColumn(
            "bloom_maybe", F.coalesce(F.col("bits_set"), F.lit(0)) == k
        )
        .drop("bits_set")
    )


# ---------------------------------------------------------------------------
# fixed-grid histogram (mergeable quantile sketch)
# ---------------------------------------------------------------------------

HIST_BUCKETS = 256


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo_cents: int,
    hi_cents: int,
    buckets: int = HIST_BUCKETS,
    by: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram over a money column: (by..., hist_bucket,
    cnt) — the mergeable quantile member of the sketch family
    (a09's exact percentile sorts each group; approx_percentile's
    t-digest is engine-private — this grid is both mergeable AND
    engine-bit-identical).

    The grid is FIXED ([lo_cents, hi_cents) split into ``buckets``
    equal cells, values clamped into range), which is what makes
    partial histograms from different partitions, days, or corpora
    merge by plain ``+``. All arithmetic is BIGINT: the money double
    goes through DECIMAL(18,2)·100 (exact cents), and the bucket is an
    integer floor-division — DuckDB's truncating ``//`` equals Spark's
    ``div`` for the non-negative clamped operands (CLAUDE.md rule).
    The build is one map-side-partial groupBy over ≤ ``buckets`` cells
    per group, whatever the input size.
    """
    keys = list(by or [])
    lo, hi = int(lo_cents), int(hi_cents)
    span = hi - lo
    cents = (F.col(col).cast("decimal(18,2)") * 100).cast("long")
    clamped = F.greatest(
        F.lit(lo).cast("long"),
        F.least(F.lit(hi - 1).cast("long"), cents),
    )
    # `div` (integer division) exists only as a SQL operator — the
    # clamped cents land in a named column first so the expr can
    # reference them without string-splicing a Column
    staged = df.where(F.col(col).isNotNull()).select(
        *keys, clamped.alias("__cents")
    )
    bucket = F.expr(f"((__cents - {lo}) * {int(buckets)}) div {span}")
    return (
        staged.select(*keys, bucket.cast("long").alias("hist_bucket"))
        .groupBy(*keys, "hist_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    quantiles: list[tuple[str, int, int]],
    lo_cents: int,
    hi_cents: int,
    buckets: int = HIST_BUCKETS,
    by: list[str] | None = None,
) -> DataFrame:
    """Quantile upper bounds from a histogram sketch: (by..., q_label,
    hist_bucket, est_upper_cents) — for each (label, num, den) the
    smallest bucket whose cumulative count reaches num/den of the
    group total, and that bucket's upper edge in cents.

    Integer-only: rank positions compare via cross-multiplication
    (cum·den >= total·num — never a float fraction, CLAUDE.md
    sampling-boundary rule), and the edge is lo + (b+1)·span div
    buckets. The window/self-join run over SKETCH rows (≤ buckets per
    group) — driver-sized work no matter the corpus. Estimates are
    upper bounds off by at most one bucket width; tighten with more
    buckets, never with floats.
    """
    from pyspark.sql.window import Window

    keys = list(by or [])
    w = (
        Window.partitionBy(*keys).orderBy("hist_bucket")
        if keys
        else Window.orderBy("hist_bucket")
    )
    wtot = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    )
    cum = sketch.select(
        *keys,
        "hist_bucket",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(wtot).cast("long").alias("total"),
    )
    qs = F.array(
        *[
            F.struct(
                F.lit(label).alias("q_label"),
                F.lit(int(num)).cast("long").alias("num"),
                F.lit(int(den)).cast("long").alias("den"),
            )
            for label, num, den in quantiles
        ]
    )
    probed = cum.select(
        *keys, "hist_bucket", "cum", "total", F.explode(qs).alias("q")
    ).where(
        F.col("cum") * F.col("q.den") >= F.col("total") * F.col("q.num")
    )
    span = int(hi_cents) - int(lo_cents)
    picked = probed.groupBy(*keys, "q.q_label").agg(
        F.min("hist_bucket").alias("hist_bucket")
    )
    edge = F.expr(
        f"{int(lo_cents)} + ((hist_bucket + 1) * {span}) "
        f"div {int(buckets)}"
    )
    return picked.select(
        *keys,
        "q_label",
        "hist_bucket",
        edge.cast("long").alias("est_upper_cents"),
    )


def hll_pairwise_overlap(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """(source_a, source_b, exact_a, exact_b, exact_common,
    est_a_raw, est_b_raw, est_union_raw, est_inter_raw) — pairwise
    distinct-value overlap between groups via HLL register algebra,
    WITH its own exact calibration columns (the x89 rule: never ship
    an estimator face without the number that audits it): HLL
    registers are a SEMILATTICE under per-bucket max, so the union
    cardinality of two groups is estimated by merging their register
    tables and re-reading the estimate — the set-operation trick that
    makes 256-row sketches answer "how much vocabulary do these two
    corpora share" without ever joining the corpora — and the
    intersection follows by inclusion–exclusion:
        |A∩B|̂ = est(A) + est(B) − est(A ∪ B).
    The panel behind source-mixture planning ("are these two scrapes
    the same crawl") at 100-TB scale, where the exact columns are the
    ones you drop (x52's contract; keep them at audit SF).

    Determinism: registers/estimates are the repo's exact-arithmetic
    HLL (md5 slices, power-of-two BIGINT sums, one correctly-rounded
    cast + divide — engine bit-identical); est_inter_raw is two IEEE
    additions on identical doubles. Inclusion–exclusion AMPLIFIES the
    1.04/√m noise (three estimates, so small true overlaps can read
    NEGATIVE) — the raw value is reported unclamped, exactly so the
    exact_common column can calibrate it. NULL group rows are
    excluded (pairs need an order); NULL values carry no identity
    (the register rule). Pairs are unordered (a < b), only groups
    present in ``rows`` appear.

    Scale: per-group register build is ONE map-side-partial agg (the
    x52 shape); the pair merge is model⋈model — groups²·2^p rows,
    never the corpus; exact_common is one token-keyed join of the
    distinct (group, value) table with itself (drop the exact legs at
    scale and the corpus is touched exactly once)."""
    ga, gb = "source_a", "source_b"
    base = rows.where(F.col(group_col).isNotNull())
    regs = hll_registers(
        base, value_col, p=p, by=[group_col]
    ).localCheckpoint()  # groups·2^p rows; read by 3 legs (x25 rule)
    ests = hll_estimate(regs, p=p, by=[group_col]).select(
        F.col(group_col), F.col("hll_estimate_raw")
    )
    dv = (
        base.select(F.col(group_col), F.col(value_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
        .localCheckpoint()  # (group, value) — read by 2 legs
    )
    exact = dv.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__exact")
    )
    pairs = (
        exact.select(
            F.col(group_col).alias(ga),
            F.col("__exact").alias("exact_a"),
        )
        .join(
            exact.select(
                F.col(group_col).alias(gb),
                F.col("__exact").alias("exact_b"),
            ),
            F.col(ga) < F.col(gb),
        )
    )
    common = (
        dv.select(F.col(group_col).alias(ga), "__v")
        .join(
            dv.select(F.col(group_col).alias(gb), "__v"),
            ["__v"],
        )
        .where(F.col(ga) < F.col(gb))
        .groupBy(ga, gb)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_common"))
    )
    side_a = pairs.select(ga, gb).join(
        regs.select(
            F.col(group_col).alias(ga), "hll_bucket", "register"
        ),
        ga,
    )
    side_b = pairs.select(ga, gb).join(
        regs.select(
            F.col(group_col).alias(gb), "hll_bucket", "register"
        ),
        gb,
    )
    union_regs = (
        side_a.select(ga, gb, "hll_bucket", "register")
        .unionByName(side_b.select(ga, gb, "hll_bucket", "register"))
        .groupBy(ga, gb, "hll_bucket")
        .agg(F.max("register").alias("register"))
    )
    union_est = hll_estimate(union_regs, p=p, by=[ga, gb]).select(
        ga, gb, F.col("hll_estimate_raw").alias("est_union_raw")
    )
    return (
        pairs.join(
            ests.select(
                F.col(group_col).alias(ga),
                F.col("hll_estimate_raw").alias("est_a_raw"),
            ),
            ga,
        )
        .join(
            ests.select(
                F.col(group_col).alias(gb),
                F.col("hll_estimate_raw").alias("est_b_raw"),
            ),
            gb,
        )
        .join(common, [ga, gb], "left")
        .join(union_est, [ga, gb])
        .select(
            ga,
            gb,
            "exact_a",
            "exact_b",
            F.coalesce(F.col("exact_common"), F.lit(0))
            .cast("long")
            .alias("exact_common"),
            "est_a_raw",
            "est_b_raw",
            "est_union_raw",
            (
                F.col("est_a_raw")
                + F.col("est_b_raw")
                - F.col("est_union_raw")
            ).alias("est_inter_raw"),
        )
    )
