"""Vector math over ``array<float>`` embedding columns.

All JVM-side Catalyst higher-order functions — no Python UDFs in
the hot path.  Elements are cast to double first so arithmetic is
IEEE-double end-to-end and sequential (``aggregate`` folds left to
right), which keeps results bit-comparable with a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "l2_norm", "cosine", "fold_sq_dist"]


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold aggregate (whole-stage codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def fold_sq_dist(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as the same left-fold chain the clustering argmin
    uses — bit-identical to DuckDB's
    ``list_sum(list_transform(..., i -> (a[i]-b[i])*(a[i]-b[i])))``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
