"""Registration-order guard.

The driver's correctness gate records evidence for the FIRST 50
registered queries only, so `load_all()`'s import order is load-bearing
(see the comment there). The never-green set is DERIVED from the
accumulated CORRECTNESS_r*.json evidence via scripts/window_plan.py —
not hand-pinned (round 3 hand-pinned a phantom query and the gate went
red on its own artifact).
"""

from __future__ import annotations

from scripts.window_plan import latest_status, load_rounds, never_green

from ods_to_datalake_spark.plans.suite import load_all

DRIVER_WINDOW = 50


def test_driver_window_covers_never_green():
    """Every registered query with no driver-green row ever must sit
    inside the evidence window, else it can never earn one."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    missing = never_green(names) - window
    assert not missing, sorted(missing)


def test_driver_window_covers_currently_red():
    """Queries whose LATEST driver row is red/error (e.g. x28's r03
    hash fail) must be re-checked, so they belong in the window too."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    red = {
        n
        for n, (_, status) in latest_status(load_rounds()).items()
        if status in ("red", "error") and n in set(names)
    }
    assert red <= window, sorted(red - window)


# Queries whose driver evidence is allowed to slip one round because a
# never-green (new) query displaced them from the window. Must stay
# small and deliberate; everything here is still covered by validate.py.
SLIPPED_THIS_ROUND: set[str] = {
    # displaced by the five new never-green round-5 queries (x33-x37);
    # all r03-green and validate-covered — round-6 window head
    "w07_ntile_quartiles",
    "a10_grouping_sets",
    "u05_scd2_merge",
    "u02_intersect_cube",
    "w06_lag_lead_delta",
    "q06_revenue_forecast",
}


def test_driver_window_composition():
    """Round-5 rotation plan (VERDICT r4 item 1): the 50 stale queries
    — suite_llm (24, r02 evidence) + suite_tpch (16, r02) + the 10
    suite_core rows outside the r04 window (r03) — fill the window,
    r02-stale first. New never-green queries displace the fill tail
    (tracked in SLIPPED_THIS_ROUND). Assert the composition by COUNT
    and membership, not just the edge, so the test still constrains the
    window when the evidence sets are empty (post-green-round)."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    llm = {
        n
        for n in names
        if n.startswith("x") and n[1:3].isdigit() and int(n[1:3]) <= 25
        and not n.startswith("x12")
    }
    tpch = {n for n in names if n.startswith("q") and n != "q18_large_orders"}
    assert len(llm) == 24, sorted(llm)
    assert len(tpch) == 21, sorted(tpch)  # q01-q06 live in suite_core
    assert llm <= window, sorted(llm - window)
    assert (tpch - SLIPPED_THIS_ROUND) <= window, sorted(
        (tpch - SLIPPED_THIS_ROUND) - window
    )
    r03_stale_core = {
        "a10_grouping_sets",
        "u05_scd2_merge",
        "u02_intersect_cube",
        "w06_lag_lead_delta",
        "w07_ntile_quartiles",
    }
    assert (r03_stale_core - SLIPPED_THIS_ROUND) <= window, sorted(
        (r03_stale_core - SLIPPED_THIS_ROUND) - window
    )
    new_round5 = {
        "x33_dedup_clusters_star",
        "x34_duplicate_spans",
        "x35_pq_encode",
        "x36_semantic_dedup",
        "x37_block_dedup",
        "x38_lm_perplexity",
    }
    assert new_round5 <= window, sorted(new_round5 - window)
    assert names[DRIVER_WINDOW - 1] == "q05_region_revenue"


def test_window_covers_all_stale_except_slipped():
    """Every stale-evidence query (green, but last driver row predates
    the newest round) must be in the window unless deliberately
    slipped — the rotation's whole point is refreshing them."""
    from scripts.window_plan import stale

    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    must_cover = (stale() & set(names)) - SLIPPED_THIS_ROUND
    missing = must_cover - window
    assert not missing, sorted(missing)


def test_registry_names_unique_and_complete():
    names = list(load_all())
    assert len(names) == len(set(names))
    # every suite is loaded (spot keys from each module)
    for probe in (
        "x01_exact_dedup",
        "q02_min_cost_supplier",
        "e08_trailing_window",
        "x12_media_features",
        "x30_video_frames",
        "a02_document_fold",
    ):
        assert probe in names, probe
