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


def test_driver_window_composition():
    """Round-4 plan: suite_media (6) + suite_events (8) + suite_ingest
    (x31, new) register first — x28/x30/x31 need evidence, and every
    events-family green row predates the round-3 events.parquet NTZ
    regeneration — then suite_core fills the window. Pin the window
    EDGE identity so an innocent import reshuffle can't silently shift
    who gets checked."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    media = {n for n in names if n.startswith(("x12", "x26", "x27", "x28", "x29", "x30"))}
    events = {n for n in names if n.startswith("e0")}
    assert media <= window, sorted(media - window)
    assert events <= window, sorted(events - window)
    assert "x31_incremental_dedup" in window
    assert "x32_incremental_embedding_dedup" in window
    assert names[DRIVER_WINDOW - 1] == "q18_large_orders"


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
