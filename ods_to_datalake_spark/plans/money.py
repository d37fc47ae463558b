"""Shared money/decimal helpers for the suite plan modules.

Lives outside suite_core so importing these does NOT trigger
suite_core's query registrations (registration order is the driver's
correctness-gate window — see suite.load_all).

Rule (CLAUDE.md): money goes through Decimal(18,2) BEFORE summing so
the result is exact and partition-order independent; outputs are cast
back to DOUBLE in the final projection (suite.finalize_output).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

D182 = T.DecimalType(18, 2)
D384 = T.DecimalType(38, 4)
D386 = T.DecimalType(38, 6)


def _dec(col: str) -> F.Column:
    return F.col(col).cast(D182)
