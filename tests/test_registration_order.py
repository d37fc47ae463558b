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


# Queries whose driver evidence is allowed to slip one round because
# the stale set (56) exceeds the 50-slot window. Must stay small and
# deliberate; everything here is still covered by validate.py.
SLIPPED_THIS_ROUND: set[str] = {
    # the 6 lowest-priority r04-evidence suite_core rows (simple
    # scalar/set queries, least drift-prone) — round-7 window head
    "f02_string_functions",
    "f08_case_decode",
    "f_scalar_functions",
    "t01_top_k",
    "t02_top_k_per_group",
    "u01_set_ops",
    # displaced by the new never-green round-6 queries (x39-x48)
    "w03_surrogate_key",
    "w04_dedup_keep_first",
    "w05_running_total",
    "u04_union_by_name",
    "w01_sequence",
    "w02_multikey_sequence",
    "q18_large_orders",
    "u03_upsert_snapshot",
    "p10_trim_compound_filter",
    # displaced by x48-x51 + e09/e10 (round-6 additions)
    "p08_not_isin_filter",
    "p07_isin_filter",
    "p06_range_filter",
    "p03_derive_drop_rename",
    "p01_projection_scan",
    "j05_salted_join",
    "j04_range_join",
    # displaced by the sketch suite (x52-x54, round-6 additions)
    "j01b_anti_join",
    "j02_left_attach_preagg",
    "j03_broadcast_dim_decode",
    # displaced by the retrieval suite (x55-x56, round-6 additions)
    "a09_percentiles",
    "j01_semi_join",
    # displaced by u07_incremental_agg + x58 (round-6 additions)
    "a08_two_phase_agg",
    "a07_distinct_agg",
    # displaced by u08_snapshot_diff + x59 (round-6 additions)
    "a06_rollup",
    "a04_pivot",
}


def test_driver_window_composition():
    """Round-6 rotation plan (CLAUDE.md / VERDICT r5 item 1): the 6
    rows that slipped in round 5 (r03 evidence) head the window,
    followed by the r04-evidence families — suite_media (6),
    suite_events (8), suite_ingest (2), suite_core r04 rows (34, of
    which the 6 in SLIPPED_THIS_ROUND fall outside). Assert the
    composition by membership, not just the edge, so the test still
    constrains the window when the evidence sets are empty."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    slipped_r5 = {
        "w07_ntile_quartiles",
        "a10_grouping_sets",
        "u05_scd2_merge",
        "u02_intersect_cube",
        "w06_lag_lead_delta",
        "q06_revenue_forecast",
    }
    assert slipped_r5 <= set(names[:6]), sorted(slipped_r5 - set(names[:6]))
    media = {n for n in ("x12_media_features", "x26_image_decode",
                         "x27_audio_decode", "x28_sequence_pack",
                         "x29_quantize_embeddings", "x30_video_frames")}
    # e01-e08 are the r04-evidence family; e09/e10 are round-6 additions
    events = {n for n in names if n.startswith("e0") or n.startswith("e1")}
    ingest = {"x31_incremental_dedup", "x32_incremental_embedding_dedup"}
    assert len(events) == 10, sorted(events)
    assert media <= window, sorted(media - window)
    assert events <= window, sorted(events - window)
    assert ingest <= window, sorted(ingest - window)
    r04_core = {
        "a01_fold_sorted_array", "a02_document_fold",
        "a03_conditional_sum", "a04_pivot", "a06_rollup",
        "a07_distinct_agg", "a08_two_phase_agg", "a09_percentiles",
        "f02_string_functions", "f08_case_decode", "f_scalar_functions",
        "j01_semi_join", "j01b_anti_join", "j02_left_attach_preagg",
        "j03_broadcast_dim_decode", "j04_range_join", "j05_salted_join",
        "p01_projection_scan", "p03_derive_drop_rename",
        "p06_range_filter", "p07_isin_filter", "p08_not_isin_filter",
        "p10_trim_compound_filter", "q18_large_orders", "t01_top_k",
        "t02_top_k_per_group", "u01_set_ops", "u03_upsert_snapshot",
        "u04_union_by_name", "w01_sequence", "w02_multikey_sequence",
        "w03_surrogate_key", "w04_dedup_keep_first", "w05_running_total",
    }
    assert len(r04_core) == 34
    assert (r04_core - SLIPPED_THIS_ROUND) <= window, sorted(
        (r04_core - SLIPPED_THIS_ROUND) - window
    )
    new_round6 = {
        "x39_span_rewrite",
        "x40_deterministic_shard",
        "x41_vocab_oov",
        "x42_temperature_mixture",
        "x43_cluster_canonical",
        "x44_source_overlap",
        "x45_split_leakage",
        "x46_decontaminate_scored",
        "x47_dsir_weights",
        "x48_gopher_quality",
        "x49_c4_line_filter",
        "x50_source_quality_report",
        "x51_gopher_repetition",
        "e09_event_paths",
        "e10_daily_anomaly",
        "u06_cdc_apply",
        "x52_hll_vocab",
        "x53_cms_heavy_hitters",
        "x54_bloom_prefilter",
        "x55_inverted_index",
        "x56_bm25_topk",
        "u07_incremental_agg",
        "x58_histogram_quantiles",
        "u08_snapshot_diff",
        "x59_bottomk_sample",
    }
    assert new_round6 <= window, sorted(new_round6 - window)
    assert names[DRIVER_WINDOW - 1] == "a03_conditional_sum"


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
