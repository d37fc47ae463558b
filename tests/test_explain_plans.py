"""Physical-plan assertions (the 100-TB design checks, SURVEY §4):
pushdown reaches the scan, dims broadcast instead of shuffling the fact,
per-group top-k uses WindowGroupLimit, global top-k avoids a full sort,
and the whole relational suite stays off row-at-a-time Python."""

from __future__ import annotations

import pytest

from ods_to_datalake_spark.plans.suite import load_all

QUERIES = load_all()
SF = "/root/testdata/sf0.001"


def plan(spark, name: str) -> str:
    import contextlib
    import io

    df = QUERIES[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_column_pruning_reaches_scan(spark):
    p = plan(spark, "p01_projection_scan")
    scan = p[p.index("Scan parquet"):]
    assert "o_orderkey" in scan and "o_orderstatus" in scan
    assert "o_totalprice" not in scan  # pruned column never read


def test_predicate_pushdown_reaches_scan(spark):
    p = plan(spark, "p06_range_filter")
    assert "PushedFilters" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    assert "o_orderdate" in pushed and "IsNotNull" in pushed


def _shuffle_exchanges(p: str) -> int:
    """Count shuffle Exchange nodes in the detail section (broadcast
    exchanges excluded)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange$", p, flags=re.M))


def test_dim_decode_broadcasts(spark):
    p = plan(spark, "j03_broadcast_dim_decode")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # fact side never shuffled for dims
    assert _shuffle_exchanges(p) == 0  # zero shuffles end-to-end


def test_semi_join_is_left_semi(spark):
    p = plan(spark, "j01_semi_join")
    assert "LeftSemi" in p


def test_top_k_uses_partial_limits(spark):
    assert "TakeOrderedAndProject" in plan(spark, "t01_top_k")
    assert "WindowGroupLimit" in plan(spark, "t02_top_k_per_group")


def test_flagship_fold_shape(spark):
    """The document fold groups once; riders pre-folded before the join
    (no rider cross-product through the wide aggregate).

    r12 shape change: the orders attach is a SHUFFLED-HASH join built
    on the narrow orders side, not a broadcast of the fold. Catalyst's
    size estimate after the aggregation is tiny, so it used to
    auto-broadcast the array-heavy folded table — the widest frame in
    the plan collected to the driver, and a plan that cannot exist at
    scale (an order-scale fold never fits a broadcast). Two shuffles
    end-to-end: lineitem exchanges once on l_orderkey for the fold
    (whose partitioning the join then REUSES — the arrays never move
    again), and orders exchanges once on o_orderkey (narrow rows)."""
    p = plan(spark, "a02_document_fold")
    assert "ObjectHashAggregate" in p  # collect_list fold
    assert "ShuffledHashJoin" in p
    # the folded (array) side must never be the broadcast side
    assert "BroadcastHashJoin" not in p
    assert _shuffle_exchanges(p) == 2


# The ONLY queries allowed to show Python in their plans: the media
# decode family, whose whole point is the Arrow-batched Python decode
# boundary (mapInPandas decoders + pandas_udf payload synthesizers).
# Everything relational/dedup/text stays 100% JVM-side.
DECODE_BOUNDARY = {
    "x12_media_features",
    "x26_image_decode",
    "x27_audio_decode",
    "x30_video_frames",
}


def test_no_python_udfs_in_relational_suite(spark):
    """Reference policy (SURVEY §2.9): zero Python in the hot path for
    every relational/dedup/text query. Only the DECODE_BOUNDARY media
    queries may evaluate Python (by design: SURVEY §2.9's 'Arrow only
    at the decode boundary')."""
    for name in QUERIES:
        if name in DECODE_BOUNDARY:
            continue
        p = plan(spark, name)
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_whole_stage_codegen_covers_headline_scan(spark):
    """AQE shows codegen spans only in the final plan — execute first."""
    import contextlib
    import io

    df = QUERIES["q01_pricing_summary"].fn(spark, SF)
    df.collect()  # count() would plan a different query; collect
    # executes THIS plan so AQE finalizes it
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # formatted mode marks codegen'd operators with '*' / 'codegen id'
    assert "codegen id" in p
    assert "* HashAggregate" in p  # scan→filter→partial-agg fused
    assert "ObjectHashAggregate" not in p  # no object-hash fallback here


def test_q19_disjunction_derives_single_side_pushdown(spark):
    """The OR-of-ANDs mixes columns from both join sides, yet Catalyst
    must derive the per-side envelopes and push them into BOTH parquet
    scans (otherwise a 100-TB lineitem is read in full)."""
    p = plan(spark, "q19_disjunctive_predicates")
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    li_pushed = [ln for ln in pushed if "l_quantity" in ln]
    part_pushed = [ln for ln in pushed if "p_brand" in ln]
    assert li_pushed and "Or(" in li_pushed[0]
    assert part_pushed and "Or(" in part_pushed[0]


def test_q21_exists_chain_is_semi_plus_anti(spark):
    """EXISTS/NOT EXISTS self-joins must plan as semi/anti joins (row
    preserving), never inner joins with dedup."""
    p = plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in p and "LeftAnti" in p


def test_q02_correlation_reuses_agg_shuffle(spark):
    """The correlated MIN is a window over the same l_partkey
    partitioning the aggregate produced — at most 2 shuffles end-to-end
    (pair agg + window repartition), not one per subquery."""
    p = plan(spark, "q02_min_cost_supplier")
    assert _shuffle_exchanges(p) <= 2


def test_q09_dims_all_broadcast(spark):
    """Five-way join: part/supplier/nation broadcast; facts shuffle at
    most once each."""
    p = plan(spark, "q09_product_profit")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert _shuffle_exchanges(p) <= 2


def test_aqe_coalesces_shuffle_partitions(spark):
    """AQE must be live: after execution, the final plan coalesces the
    32 configured shuffle partitions down to what the data needs —
    the runtime re-planning a 100-TB job relies on (skew splitting,
    dynamic broadcast) hangs off the same machinery."""
    import contextlib
    import io

    df = QUERIES["q01_pricing_summary"].fn(spark, SF)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "AdaptiveSparkPlan" in p and "isFinalPlan=true" in p
    assert "AQEShuffleRead" in p
    assert "coalesced" in p.lower()
