"""Vector math over embedding array columns — pure Catalyst expressions.

Embeddings arrive as `array<float>` parquet columns; everything casts to
double before arithmetic (same as the SQL oracle) so both engines fold the
same 64-bit values in the same element order — bit-identical results.

For 100-TB corpora: these are per-row map expressions (no shuffle); the
ANN operators in `operators/similarity.py` add the partitioning strategy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold — same element order as the SQL
    oracle's list_dot_product, so doubles match exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm — without the guard ANSI
    mode (Spark 4 default) THROWS DIVIDE_BY_ZERO the moment a corpus
    contains one zero/empty embedding, and with ANSI off the 0/0 NaN
    compares GREATER than every threshold in Spark's NaN ordering
    (a zero vector would "near-dup" everything). Oracles mirror the
    guard with NULLIF on the denominator; NULL comparisons drop the
    row identically in both engines."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def cosine_rounded(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine-stable ranking/thresholding."""
    return F.round(cosine(a, b), digits)


def quantize_int8(vec: Column | str) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization: (scale, quantized array).

    scale = max |vᵢ|; qᵢ = floor(vᵢ/scale·127 + 0.5) ∈ [-127, 127]
    (floor(x+0.5) instead of round() — Spark rounds HALF_UP, DuckDB
    half-to-even, so round() would diverge exactly at midpoints; floor
    on identical IEEE doubles is engine-independent). Zero vectors
    quantize to zeros (scale 0 guarded — ANSI mode throws on x/0).

    The ANN memory lever: 4× smaller vectors for IVF/LSH candidate
    scans, full-precision re-rank on the shortlist. Pure map-side
    expression — no shuffle, no UDF.
    """
    v = to_double(vec)
    scale = F.array_max(F.transform(v, F.abs))
    q = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x / scale * 127.0 + F.lit(0.5)))
        .cast("int"),
    )
    return scale, q
