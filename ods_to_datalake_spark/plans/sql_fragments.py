"""Generated DuckDB SQL fragments + tuning constants shared by the
LLM-pipeline suites (suite_llm, suite_ingest).

Import-side-effect free ON PURPOSE: suite modules register queries at
import time and load_all()'s import order is the driver evidence
window, so shared helpers must live where importing them registers
nothing. The fragments are *generated* from the same constants the
Spark operators use (operators/dedup.py), keeping both engines in
lockstep — md5 is the one hash Spark and DuckDB compute identically.
"""

from __future__ import annotations

from ods_to_datalake_spark.functions import text as X

# shared tuning constants (Spark operators AND SQL oracles)
SHINGLE_N = 3
MINHASH_K = 8
LSH_BANDS = 4
LSH_ROWS = 2

SQL_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"

SQL_WORD_VALUE = "CAST(concat('0x', substring(md5({w}), 1, 6)) AS BIGINT)"

# embedding near-dup constants (suite_llm x13/x14, suite_ingest x32)
NEAR_DUP_TAU = 0.35
N_PLANES = 4
EMB_DIM = 64


def sql_planes(dim: int = EMB_DIM, n_planes: int = N_PLANES) -> list[str]:
    """Inline the deterministic md5-derived hyperplanes as SQL list
    literals — exactly the constants operators/similarity.py uses."""
    from ods_to_datalake_spark.operators.similarity import (
        hyperplane_weights,
    )

    return [
        "[" + ", ".join(str(w) for w in plane) + "]"
        for plane in hyperplane_weights(dim, n_planes)
    ]


def sql_hyperplane_bucket(dim: int = EMB_DIM) -> str:
    """Sign-bit bucket string over column ``v`` (list of DOUBLE)."""
    return (
        "concat("
        + ", ".join(
            f"CASE WHEN list_dot_product(v, {p}) > 0 THEN '1' ELSE '0' END"
            for p in sql_planes(dim)
        )
        + ")"
    )


def sql_shingles(toks: str, n: int = SHINGLE_N) -> str:
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"[array_to_string({toks}[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({toks}) - {n - 2})] "
        f"ELSE [] END"
    )


def sql_band_key(band: int, rows: int = LSH_ROWS) -> str:
    cols = ", ".join(f"mh_{band * rows + r}" for r in range(rows))
    return f"md5(concat_ws(',', {cols}))"


def sql_minhash_ctes(sh_source: str = "sh_t", suffix: str = "") -> str:
    """The exploded Carter-Wegman MinHash signature, mirroring
    operators/dedup.py minhash_table: one md5 per shingle, two 56-bit
    halves (a, b), mh_s = min((a + s*b) mod 2^61-1). ``suffix`` renames
    the CTEs (ex/hv/sig) so one query can instantiate the pipeline for
    two corpora (see suite_ingest x31)."""
    mins = ", ".join(
        f"MIN((a + {s} * b) % {X.MINHASH_PRIME}) AS mh_{s}"
        for s in range(MINHASH_K)
    )
    return f"""ex{suffix} AS (
      SELECT doc_id, unnest(sh) AS s FROM {sh_source} WHERE len(sh) > 0
    ), hv{suffix} AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(s), 1, 14)) AS BIGINT) AS a,
             CAST(concat('0x', substring(md5(s), 15, 14)) AS BIGINT) AS b
      FROM ex{suffix}
    ), sig{suffix} AS (
      SELECT doc_id, {mins} FROM hv{suffix} GROUP BY doc_id
    )"""
