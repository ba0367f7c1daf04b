"""Vector column helpers (array<float> embeddings).

All math runs JVM-side through higher-order array functions in double
precision: the sequential `aggregate` fold is bit-identical to DuckDB's
`list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])` (verified exhaustively on
the fixture embeddings), so no output rounding is required.
"""

from __future__ import annotations


def dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def norm_sq_expr(a: str) -> str:
    return f"aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))"


def cosine_expr(a: str, b: str) -> str:
    """cos(a, b) = dot / (||a|| * ||b||), double, deterministic."""
    return f"{dot_expr(a, b)} / (sqrt({norm_sq_expr(a)}) * sqrt({norm_sq_expr(b)}))"


def norm_expr(a: str) -> str:
    """||a|| — precompute this once per row before a pairwise join: the
    per-pair cosine then needs only one fold (the dot product) instead of
    three, which is ~3x less compute on the quadratic stage. Bit-identical
    to cosine_expr because the same sqrt values are multiplied."""
    return f"sqrt({norm_sq_expr(a)})"


def cosine_from_norms_expr(a: str, b: str, a_norm: str, b_norm: str) -> str:
    """cos(a, b) with both norms precomputed (see norm_expr)."""
    return f"{dot_expr(a, b)} / ({a_norm} * {b_norm})"
