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

__all__ = [
    "roundd",
    "roundd_sql",
    "dsum",
    "dsum_sql",
    "davg",
    "davg_sql",
    "dmul",
    "dmul_sql",
    "dsumx",
    "dsumx_sql",
]


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


def dmul(money: Column | str, *rates: Column | str) -> Column:
    """Exact decimal product of a money column and rate factors.

    Each factor is cast to decimal BEFORE the multiply, so the whole
    product is exact decimal arithmetic (DECIMAL(18,4) × DECIMAL(8,4)^k
    ≤ DECIMAL(36,12), no precision loss) and there is no
    double-product→decimal cast whose rounding boundary the two engines
    could disagree on.  A three-factor double product cast to decimal is
    exactly what made q01 sum_charge differ by 0.01 at sf0.01.
    """
    c = (F.col(money) if isinstance(money, str) else money).cast("decimal(18,4)")
    for r in rates:
        rc = (F.col(r) if isinstance(r, str) else r).cast("decimal(8,4)")
        c = c * rc
    return c


def dmul_sql(money: str, *rates: str) -> str:
    parts = [f"CAST({money} AS DECIMAL(18,4))"]
    parts += [f"CAST({r} AS DECIMAL(8,4))" for r in rates]
    return " * ".join(parts)


def dsumx(col: Column, n: int = 2) -> Column:
    """Sum an already-exact decimal column (e.g. ``dmul``), rounded."""
    return F.round(F.sum(col), n).cast("double")


def dsumx_sql(expr: str, n: int = 2) -> str:
    return f"CAST(round(sum({expr}), {n}) AS DOUBLE)"


def davg(col: Column | str, n: int = 4) -> Column:
    """Exact-sum average: identical double division in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast("decimal(18,4)")).cast("double")
    return roundd(total / F.count(c), n)


def davg_sql(expr: str, n: int = 4) -> str:
    total = f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
    return roundd_sql(f"{total} / count({expr})", n)
