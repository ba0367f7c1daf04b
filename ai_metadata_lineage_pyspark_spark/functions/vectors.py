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


# The embeddings-table dimension contract (TESTDATA.md fixture: array<float>
# of 64; pinned by tests/test_fixture_contract.py::
# test_embedding_dimension_contract, which asserts size(embedding) == EMB_DIM
# over the WHOLE fixture — both directions matter: a SHORTER vector makes
# element_at throw under ANSI (loud), but a LONGER one would silently
# truncate the unrolled dot to its first EMB_DIM terms, diverging from the
# full fold without any error). At 100 TB the dimension is likewise
# model-known ahead of the job — which is what makes the unrolled variant
# below legal as the default pair-stage scorer.
EMB_DIM = 64


def dot_unrolled_expr(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Codegen-unrolled dot product for a KNOWN fixed dimension.

    Bit-identical to dot_expr: the same per-element double products summed
    with the same left-associated IEEE double adds (aggregate's 0D seed can
    only normalize a -0.0 first term, which cannot change any later sum or
    comparison). The difference is EXECUTION: Catalyst higher-order
    functions (ArrayAggregate/ZipWith) are CodegenFallback — interpreted,
    per-element boxed — and when a pair cosine lands in a JOIN CONDITION
    the whole predicate drops out of whole-stage codegen. The r13 sf10
    replica probe caught semdedup's 2.5B-pair within-cluster stage running
    exactly that shape at ~0.1M evals/s/core (hours of CPU, jstack showed
    HashJoin.boundCondition -> ArrayAggregate.eval); this straight-line
    arithmetic stays inside codegen at a ~40x higher eval rate. Catalyst
    splits oversized generated methods, so 1k+ dims still compile. ANSI
    note: element_at throws on a malformed (short) vector where the fold
    would silently sum fewer terms — loud beats wrong; the fixture dim is
    contract-tested."""
    terms = " + ".join(
        f"(cast(element_at({a}, {i}) as double)"
        f" * cast(element_at({b}, {i}) as double))"
        for i in range(1, dim + 1)
    )
    return f"({terms})"


def cosine_from_norms_unrolled_expr(
    a: str, b: str, a_norm: str, b_norm: str, dim: int = EMB_DIM
) -> str:
    """cos(a, b), norms precomputed, dot product codegen-unrolled.

    SHAPE RULE (r14 A/B, ARTIFACTS/r14_unroll_ab.md): use the unrolled
    variant ONLY where the cosine lands in a JOIN CONDITION or a filter
    that Catalyst fuses into one (pair joins filtered on the cosine value,
    e.g. embedding_cosine_neardup) — there the fold's CodegenFallback
    drops the entire predicate out of whole-stage codegen (~40x, the r13
    sf10 finding). In PROJECTION shape (broadcast cross-join scorers
    ranked by a window: kmeans, IVF, top-k panels) the measured result
    INVERTS: the interpreted fold beats the 64-term generated
    element_at chain by 1.2-5.3x (fold/unrolled 0.19-0.89 across
    kmeans_assign / kmeans_iterate / ivf_topk / cosine_topk_panel at
    sf0.1 and sf1), so projections use cosine_from_norms_expr."""
    return f"{dot_unrolled_expr(a, b, dim)} / ({a_norm} * {b_norm})"


def norm_sq_unrolled_expr(a: str, dim: int = EMB_DIM) -> str:
    """Unrolled ||a||^2 — bit-identical to norm_sq_expr by the same
    left-assoc argument as dot_unrolled_expr."""
    terms = " + ".join(
        f"(cast(element_at({a}, {i}) as double)"
        f" * cast(element_at({a}, {i}) as double))"
        for i in range(1, dim + 1)
    )
    return f"({terms})"


def cosine_unrolled_expr(a: str, b: str, dim: int = EMB_DIM) -> str:
    """cos(a, b) fully codegen-unrolled (dot + both norms) for cross-join
    contexts where norms are not precomputed per row."""
    return (
        f"{dot_unrolled_expr(a, b, dim)} / "
        f"(sqrt({norm_sq_unrolled_expr(a, dim)})"
        f" * sqrt({norm_sq_unrolled_expr(b, dim)}))"
    )
