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


def vec_is_finite(col: Column | str) -> Column:
    """True iff every component is non-NULL and finite — the
    garbage-embedding gate (r12): failed encoders emit NaN/Inf
    vectors in real corpora, and letting them into a trainer or
    quantizer poisons centroids (one NaN component NaN-ifies a whole
    label's mean) or crashes ANSI int casts downstream. Vector-MATH
    consumers that aggregate across vectors (kmeans, residuals,
    quantizers) filter on this on BOTH engines; pure per-vector
    propagation paths (cosine/dot) deliberately do NOT — NaN in, NaN
    out is cross-engine-consistent and visible. Empty vectors are
    non-finite too (r13, ADVICE): ``forall`` over ``[]`` is vacuously
    True while the DuckDB mirror's ``list_aggregate([], 'min')`` is
    NULL, so without the size gate an empty embedding silently broke
    hash parity — and a zero-dim vector is encoder garbage for any
    trainer/quantizer anyway. DuckDB mirror:
    ``llm_ops._FINITE_EMB_SQL``."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.size(c) > 0) & F.forall(
        c,
        lambda x: x.isNotNull()
        & ~F.isnan(x.cast("double"))
        & (F.abs(x.cast("double")) < F.lit(float("inf"))),
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (left-to-right summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm (try_divide): Spark 4
    runs ANSI mode, where a plain ``/`` THROWS DIVIDE_BY_ZERO even for
    doubles — one all-zero embedding (a dead/padding row, routine in
    real corpora) would crash the whole job — while the DuckDB oracles
    yield NULL for x/0. NULL propagates through every downstream
    ``>= threshold`` / rank filter the same way in both engines: the
    degenerate row silently drops, which is the one semantic where a
    zero vector is "similar to nothing". Pinned cross-engine in
    tests/test_degenerate_embeddings.py."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance via zip_with + aggregate; (x-y)*(x-y)
    (not pow) so the per-element op is a single IEEE multiply on both
    engines, and the fold is left-to-right like DuckDB list_aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
