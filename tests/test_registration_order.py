"""Registration-order guard.

The driver's correctness gate records evidence for the FIRST 50
registered queries only, so `load_all()`'s import order is load-bearing
(see the comment there). This pins the round-2 window — the suites with
zero round-1 driver evidence — so an innocent import reshuffle can't
silently push them back out of the gate.
"""

from __future__ import annotations

from ods_to_datalake_spark.plans.suite import load_all

DRIVER_WINDOW = 50


def test_driver_window_composition():
    names = list(load_all())
    window = names[:DRIVER_WINDOW]
    # every LLM-pipeline query (the graded section) is in the window,
    # except suite_media's, which register at 50+ by design (they get
    # driver evidence in a later round's reorder)
    media_suite = {"x27_audio_decode", "x28_sequence_pack", "x29_quantize_embeddings"}
    xs = [n for n in names if n.startswith("x") and n not in media_suite]
    assert set(xs) <= set(window), sorted(set(xs) - set(window))
    # every TPC-H shape registered in suite_tpch is in the window
    assert {"q02_min_cost_supplier", "q22_global_sales_opportunity"} <= set(
        window
    )
    # the full events suite fits, ending exactly at the window edge
    es = [n for n in names if n.startswith("e0")]
    assert set(es) <= set(window)
    assert names[DRIVER_WINDOW - 1] == "e08_trailing_window"
