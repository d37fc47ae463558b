"""Registration-order guard.

The driver's correctness gate records evidence for the FIRST 50
registered queries only, so `load_all()`'s import order is load-bearing
(see the comment there). Since round 7 the ordering is GENERATED:
`python scripts/window_plan.py --emit` derives plans/window_order.py
(window priority + slipped set) from the accumulated CORRECTNESS_r*.json
evidence, and the freshness test here fails whenever a new query or a
new evidence file lands without regenerating — the hand-edited 6-file
rotation ritual (and the red gate it caused at the start of rounds 6
and 7) is gone.
"""

from __future__ import annotations

from scripts.window_plan import (
    emit,
    latest_status,
    load_rounds,
    never_green,
    plan,
)

from ods_to_datalake_spark.plans import window_order
from ods_to_datalake_spark.plans.suite import load_all

DRIVER_WINDOW = 50

SLIPPED_THIS_ROUND = set(window_order.SLIPPED_THIS_ROUND)


def test_window_order_file_is_fresh():
    """Regenerating window_order.py from the evidence on disk must
    reproduce the committed file byte-for-byte — the single guard that
    replaces the old hand-pinned composition asserts."""
    names = list(load_all())
    expected = emit(names, load_rounds())
    import scripts.window_plan as wp

    with open(wp.EMITTED) as f:
        actual = f.read()
    assert actual == expected, (
        "plans/window_order.py is stale; run "
        "`python scripts/window_plan.py --emit`"
    )


def test_driver_window_covers_never_green():
    """Every registered query with no driver-green row ever must sit
    inside the evidence window, else it can never earn one."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    missing = never_green(names) - window
    assert not missing, sorted(missing)


def test_driver_window_covers_currently_red():
    """Queries whose LATEST driver row is red/error must be re-checked,
    so they belong in the window too."""
    names = list(load_all())
    window = set(names[:DRIVER_WINDOW])
    red = {
        n
        for n, (_, status) in latest_status(load_rounds()).items()
        if status in ("red", "error") and n in set(names)
    }
    assert red <= window, sorted(red - window)


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


def test_window_is_full_while_backlog_exists():
    """If queries slipped, all 50 slots must actually be spent on
    never-green/stale work (a part-empty window with a backlog would
    waste driver evidence)."""
    names = list(load_all())
    window_list, slipped = plan(names, load_rounds())
    if slipped:
        assert len(window_list) == DRIVER_WINDOW
    assert window_list == names[: len(window_list)]


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


def test_plan_rewindows_a_regressed_query():
    """A query green in an old round whose LATEST driver row is red
    must re-enter the window (the generator tier added after the r7
    review: without it, ever-green excluded it from never-green and
    its latest==newest round excluded it from stale — a deadlock with
    test_driver_window_covers_currently_red on the first regression)."""
    from scripts.window_plan import plan

    g = {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": None}
    r = {"rows_match": False, "schema_match": True, "hash_match": False,
         "err": None}
    registered = [f"q{i:02d}_x" for i in range(60)]
    rounds = {
        1: {n: dict(g) for n in registered},
        # newest round: q00 regressed, the rest of the window re-greened
        2: {n: (dict(r) if n == "q00_x" else dict(g))
            for n in registered[:50]},
    }
    window, slipped = plan(registered, rounds)
    assert "q00_x" in window
    # and it outranks the merely-stale tail (rows 50..59 from round 1)
    assert window.index("q00_x") < window.index(registered[50])
