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


def cosine_rounded_prenorm(
    a: Column, b: Column, na: Column, nb: Column, digits: int = 6
) -> Column:
    """``cosine_rounded`` with the two norms pre-computed per ROW.

    Inlining ``cosine_rounded`` into a pairwise join re-evaluates
    ``norm()`` (a zip_with+aggregate fold, interpreted with no CSE —
    the nested-HOF trap, CLAUDE.md) once per PAIR per REFERENCE: the
    guard's ``denom != 0`` and the divisor each fold both arrays, so a
    corpus×query scan pays ~4 array folds per pair for values that
    only depend on one side. Projecting ``norm(v)`` next to each
    vector before the join drops that to the one unavoidable dot fold
    per pair. ``na``/``nb`` MUST be ``norm(a)``/``norm(b)``: the
    product, guard, division and rounding are then the exact same
    IEEE operations in the same order, so results are bit-identical
    to ``cosine_rounded`` (oracle hashes unchanged — x07 verified)."""
    denom = na * nb
    return F.round(F.when(denom != 0.0, dot(a, b) / denom), digits)


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


def signed_projection(
    vec: Column | str,
    signs: list[list[float]],
    cast_input: bool = True,
) -> Column:
    """Signed random projection (Achlioptas 2003 / SimHash's linear
    cousin): y_i = Σ_j x_j · s_ij with s_ij ∈ {+1.0, −1.0} baked into
    the plan as literals (the sign matrix is data-independent — derive
    it deterministically from a seed at build time, e.g.
    `projection_signs`). Each output component is the same
    zip_with + left-fold as `dot`, so it matches DuckDB's
    list_dot_product element order bit-for-bit; pure map-side codegen,
    no shuffle, no UDF.

    The k-dim output preserves pairwise distances within the usual
    Johnson-Lindenstrauss distortion, making it the cheap front-end
    for ANN/clustering over high-dim embeddings: project once, index
    the short vectors, re-rank survivors at full precision.

    ``cast_input=False`` skips the internal float→double cast for a
    caller that pre-projected ``to_double(vec)`` under an alias: the
    cast expression is otherwise INLINED into every one of the
    len(signs) interpreted dot folds and re-evaluated per output
    component (the u19 inlining trap — plan-verified 16 casts → 1 on
    x65)."""
    v = (
        (F.col(vec) if isinstance(vec, str) else vec)
        if not cast_input
        else to_double(vec)
    )
    return F.array(
        *[
            dot(v, F.array(*[F.lit(s) for s in row]))
            for row in signs
        ]
    )


def projection_signs(out_dim: int, in_dim: int, seed: str = "rp") -> list[list[float]]:
    """Deterministic ±1 sign matrix from md5(seed:i:j) parity —
    reproducible anywhere (Python, not engine hashing: the matrix is
    plan-side constant data, never computed over rows)."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(
                f"{seed}:{i}:{j}".encode()
            ).digest()[0] % 2 == 0
            else -1.0
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]
