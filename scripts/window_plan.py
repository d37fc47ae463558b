#!/usr/bin/env python
"""Driver-window planner: which queries still need driver evidence.

The driver's correctness gate records evidence for the FIRST
``DRIVER_WINDOW`` registered queries each round, so `load_all()`'s
import order decides who gets (re)checked. This script derives the
plan from the accumulated CORRECTNESS_r*.json files instead of anyone
hand-maintaining a list:

- never-green: no all-three-true (rows/schema/hash) row in any round —
  these MUST sit inside the window;
- stale: green at some point but their latest driver row predates the
  newest round (e.g. the whole events family after the round-3
  testdata regeneration) — re-confirmation candidates for free slots.

Run ``python scripts/window_plan.py`` for the report;
tests/test_registration_order.py imports `never_green` so the pinned
window can never drift from the evidence.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(root: str = REPO_ROOT) -> dict[int, dict]:
    """round number -> parsed CORRECTNESS payload, ascending."""
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return dict(sorted(rounds.items()))


def _is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def ever_green(rounds: dict[int, dict] | None = None) -> set[str]:
    rounds = load_rounds() if rounds is None else rounds
    return {
        name
        for data in rounds.values()
        for name, row in data.items()
        if _is_green(row)
    }


def never_green(
    registered: list[str] | set[str],
    rounds: dict[int, dict] | None = None,
) -> set[str]:
    """Registered queries with no green driver row in ANY round —
    includes queries the driver has never seen at all."""
    return set(registered) - ever_green(rounds)


def latest_status(rounds: dict[int, dict] | None = None) -> dict[str, tuple[int, str]]:
    """name -> (last round seen, 'green'|'red'|'error')."""
    rounds = load_rounds() if rounds is None else rounds
    out: dict[str, tuple[int, str]] = {}
    for rnum, data in rounds.items():
        for name, row in data.items():
            status = (
                "error"
                if row.get("err")
                else "green"
                if _is_green(row)
                else "red"
            )
            out[name] = (rnum, status)
    return out


def stale(rounds: dict[int, dict] | None = None) -> set[str]:
    """Green queries whose latest driver row is older than the newest
    round — their evidence predates possible testdata/engine drift."""
    rounds = load_rounds() if rounds is None else rounds
    if not rounds:
        return set()
    newest = max(rounds)
    green = ever_green(rounds)
    return {
        name
        for name, (rnum, _) in latest_status(rounds).items()
        if name in green and rnum < newest
    }


def main() -> int:
    rounds = load_rounds()
    print(f"rounds found: {sorted(rounds)}")
    try:
        import sys

        if REPO_ROOT not in sys.path:  # `python scripts/window_plan.py`
            sys.path.insert(0, REPO_ROOT)
        from ods_to_datalake_spark.plans.suite import load_all

        registered = list(load_all())
    except Exception as exc:  # pyspark not importable → evidence-only view
        print(f"(registry unavailable: {exc}; evidence-only view)")
        registered = sorted(
            {n for data in rounds.values() for n in data}
        )
    ng = sorted(never_green(registered, rounds))
    st = sorted(stale(rounds))
    red_now = sorted(
        n
        for n, (_, s) in latest_status(rounds).items()
        if s in ("red", "error")
    )
    print(f"\nregistered: {len(registered)}")
    print(f"never-green ({len(ng)}): {ng}")
    print(f"latest-row-red/error ({len(red_now)}): {red_now}")
    print(f"stale green ({len(st)}): {st}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
