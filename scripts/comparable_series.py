#!/usr/bin/env python
"""Derive the cross-round comparable-subtotal series from BENCH_r*.json.

The frozen 12-query set (``bench.COMPARABLE_SET``) only fully exists
from BENCH_r08 on — r05/r06 predate five of its members and r07 two —
so rounds where any member is missing print the missing list and NO
subtotal (a partial sum would silently invalidate the ratio, the same
rule bench.py itself enforces via ``comparable_missing``).

Usage: python scripts/comparable_series.py   (run from the repo root)
Prints the README "Comparable-subtotal series" table body; paste it
there when a new BENCH_r*.json lands.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import COMPARABLE_SET  # noqa: E402


def main() -> int:
    for path in sorted(glob.glob("BENCH_r*.json")):
        rnd = re.search(r"BENCH_r(\d+)\.json", path).group(1)
        raw = json.load(open(path))
        parsed = raw.get("parsed", raw)
        queries = parsed.get("queries")
        # r01-r04 timed .count() (hollowed-out plans — see bench.py
        # docstring); those seconds are a different metric entirely.
        if not queries or int(rnd) < 5:
            continue
        missing = [n for n in COMPARABLE_SET if n not in queries]
        conditions = parsed.get("conditions") or {}
        probes = [
            c["probe_sec"]
            for c in (conditions.get("start"), conditions.get("end"))
            if c and c.get("probe_sec")
        ]
        probe = (
            round(statistics.mean(probes), 4)
            if probes
            else parsed.get("probe_sec_mean")
        )
        if missing:
            print(
                f"| r{int(rnd):02d} | — (set incomplete: "
                f"{len(missing)} missing) | — | — |"
            )
            continue
        sub = round(sum(queries[n] for n in COMPARABLE_SET), 2)
        per = f"{sub / probe:.1f}" if probe else "—"
        print(f"| r{int(rnd):02d} | {sub:.2f} | {probe or '—'} | {per} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
