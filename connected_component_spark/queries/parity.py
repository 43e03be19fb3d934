"""Cross-engine numeric parity helpers.

The correctness gate hash-compares Spark results against a DuckDB
oracle.  Doubles are bit-identical across engines as long as every
operation is applied in the same order — the one thing that is NOT
order-stable is a parallel double ``sum`` (partial aggregation order
changes the last ulps, and synthetic 2-decimal data makes half-way
rounding boundaries like 307.03/8 = 38.37875 common, where engines
then round differently).

Rules implemented here:

* ``dsum`` — sum money-like doubles EXACTLY by casting to
  DECIMAL(18,4) first; decimal addition is associative, so partial
  aggregation order cannot change the result.  Rounded and returned
  as double.
* ``davg`` — exact decimal sum, cast to double, divided by the
  count: both engines perform the identical double division, so the
  quotient is bit-identical; then snap-round.
* ``roundd`` — "snap rounding" for already-bit-identical doubles:
  cast to DECIMAL(38,9) (both engines round half-up on the cast),
  then decimal-round at n ≤ 6 — half-up in both engines, unlike
  double rounding which diverges at representation boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["roundd", "roundd_sql", "dsum", "dsum_sql", "davg", "davg_sql"]


def roundd(col: Column, n: int) -> Column:
    """Deterministic cross-engine rounding of a double (n ≤ 6)."""
    return F.round(col.cast("decimal(38,9)"), n).cast("double")


def roundd_sql(expr: str, n: int) -> str:
    return f"CAST(round(CAST({expr} AS DECIMAL(38,9)), {n}) AS DOUBLE)"


def dsum(col: Column | str, n: int = 2) -> Column:
    """Order-independent exact sum of money-like doubles, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,4)")), n).cast("double")


def dsum_sql(expr: str, n: int = 2) -> str:
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,4))), {n}) AS DOUBLE)"


def davg(col: Column | str, n: int = 4) -> Column:
    """Exact-sum average: identical double division in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast("decimal(18,4)")).cast("double")
    return roundd(total / F.count(c), n)


def davg_sql(expr: str, n: int = 4) -> str:
    total = f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
    return roundd_sql(f"{total} / count({expr})", n)
