"""Vector expression helpers for embedding similarity (Phase 5).

Pure higher-order-function expressions over ``array<double>`` — the
arithmetic stays JVM-side (no Python round trip). Arrays are cast from
``array<float>`` storage to double before any math so Spark and the
DuckDB oracle (which casts to DOUBLE[]) do identical IEEE arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (left-to-right summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance via zip_with + aggregate; (x-y)*(x-y)
    (not pow) so the per-element op is a single IEEE multiply on both
    engines, and the fold is left-to-right like DuckDB list_aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
