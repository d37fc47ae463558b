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


_XNUM = re.compile(r"^x(\d+)_")


def family_rank(name: str) -> int:
    """Drift-sensitivity rank used to order SAME-round stale queries:
    lower = more likely to diverge when the driver regenerates testdata
    or the engine changes, so it re-earns evidence sooner.

    0 = events/media/ingest (timestamp-physicality and binary-payload
        sensitive — the round-3 regeneration broke exactly this family)
    1 = curation/sketch/retrieval/CDC x-queries (x33+; float/hash heavy)
    2 = relational core (a/f/j/p/t/u/w)
    3 = llm-era x-queries (x01–x25 text/ANN; stable since r05)
    4 = TPC-H (pure relational, least drift-prone — slips first)
    """
    if re.match(r"^e\d", name):
        return 0
    m = _XNUM.match(name)
    if m:
        n = int(m.group(1))
        if n == 12 or 26 <= n <= 32:
            return 0
        return 1 if n >= 33 else 3
    if re.match(r"^q\d", name):
        return 4
    return 2


DRIVER_WINDOW = 50


def plan(
    registered: list[str],
    rounds: dict[int, dict] | None = None,
    window: int = DRIVER_WINDOW,
) -> tuple[list[str], list[str]]:
    """Compute next round's (window_priority, slipped) from evidence.

    Policy (the one every round since r05 applied by hand):
    1. never-green queries MUST be in-window (registration order);
    2. queries whose LATEST driver row is red/error — even if green in
       some earlier round — come next: they are the active failures
       and must re-earn evidence immediately (without this tier the
       generator would never re-window a regression, deadlocking with
       test_driver_window_covers_currently_red);
    3. stale queries fill the rest, oldest evidence first, same-round
       ties broken by family_rank (drift-prone families refresh first),
       then name;
    4. stale queries that don't fit slip one round (still covered by
       validate.py) and head the NEXT rotation via rule 3.
    """
    rounds = load_rounds() if rounds is None else rounds
    greens: dict[str, int] = {}
    for rnum, data in rounds.items():
        for name, row in data.items():
            if _is_green(row):
                greens[name] = max(greens.get(name, 0), rnum)
    ng = [n for n in registered if n not in greens]
    red_now = sorted(
        n
        for n, (_, status) in latest_status(rounds).items()
        if status in ("red", "error")
        and n in set(registered)
        and n not in set(ng)
    )
    if len(ng) + len(red_now) > window:
        raise ValueError(
            f"{len(ng)} never-green + {len(red_now)} currently-red "
            f"queries exceed the {window}-slot window; they cannot "
            "all earn evidence this round"
        )
    stale_sorted = sorted(
        (stale(rounds) & set(registered)) - set(red_now),
        key=lambda n: (greens[n], family_rank(n), n),
    )
    window_list = (ng + red_now + stale_sorted)[:window]
    in_window = set(window_list)
    slipped = [n for n in stale_sorted if n not in in_window]
    return window_list, slipped


EMITTED = os.path.join(
    REPO_ROOT, "ods_to_datalake_spark", "plans", "window_order.py"
)


def emit(registered: list[str], rounds: dict[int, dict] | None = None) -> str:
    """Render plans/window_order.py (returns the file content)."""
    rounds = load_rounds() if rounds is None else rounds
    window_list, slipped = plan(registered, rounds)
    lines = [
        '"""Driver-evidence window ordering - GENERATED, do not hand-edit.',
        "",
        "Regenerate after adding queries or when a new CORRECTNESS_r*.json",
        "lands:  python scripts/window_plan.py --emit",
        "(tests/test_registration_order.py fails if this file is stale).",
        "",
        f"Basis: CORRECTNESS rounds {sorted(rounds)}.",
        '"""',
        "",
        "# first-50 registration order = the driver's evidence window",
        "_WINDOW_PRIORITY = [",
        *(f'    "{n}",' for n in window_list),
        "]",
        "",
        "# stale queries the window cannot fit this round; they head the",
        "# next rotation and stay covered by validate.py meanwhile",
        "SLIPPED_THIS_ROUND = [",
        *(f'    "{n}",' for n in slipped),
        "]",
        "",
    ]
    return "\n".join(lines)


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
    import sys

    if "--emit" in sys.argv:
        content = emit(registered, rounds)
        with open(EMITTED, "w") as f:
            f.write(content)
        window_list, slipped = plan(registered, rounds)
        print(
            f"\nwrote {EMITTED}: window {len(window_list)}, "
            f"slipped {len(slipped)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
