"""Shared SQL generators for embedding math in the DuckDB oracle.

DuckDB's builtin list_cosine_similarity computes in float32; these
generators emit double-precision expressions that are bit-identical
to the Spark-side zip_with/aggregate fold (verified empirically:
0 mismatches over 1497 rounded pairs at sf0.01).
"""

from __future__ import annotations

from .similarity import hyperplanes


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def sql_plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]"


def sql_lsh_bucket(vec: str, dim: int = 64, n_planes: int = 8, seed: int = 42) -> str:
    """Same sign-bit bucket id as similarity.lsh_bucket — generated
    from the identical deterministic hyperplanes."""
    planes = hyperplanes(dim, n_planes, seed)
    terms = []
    for j, plane in enumerate(planes):
        proj = sql_dot(vec, sql_plane_literal(plane))
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
