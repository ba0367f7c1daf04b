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
