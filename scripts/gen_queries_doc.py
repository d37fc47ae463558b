"""Regenerate QUERIES.md from the suite registry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ods_to_datalake_spark.plans.suite import load_all

Q = load_all()
lines = [
    "# QUERIES — the oracle-checked suite (auto-generated index)",
    "",
    "Generated from `ods_to_datalake_spark.plans.suite.REGISTRY` "
    "(`python scripts/gen_queries_doc.py` regenerates). "
    f"{len(Q)} queries; 'bench' marks headline queries timed by bench.py.",
    "",
    "| query | oracle | bench | what it checks |",
    "|---|---|---|---|",
]
for name in sorted(Q):
    q = Q[name]
    doc = " ".join(q.doc.split())
    lines.append(
        f"| `{name}` | {'yes' if q.oracle else 'rows-only'} | "
        f"{'yes' if q.headline else ''} | {doc} |"
    )
open("QUERIES.md", "w").write("\n".join(lines) + "\n")
print(f"wrote QUERIES.md with {len(Q)} queries")
