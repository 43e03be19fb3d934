"""Z-order (multi-dimensional) file layout for scan pruning.

A sorted rewrite clusters parquet footer min/max stats on ONE column;
filters on any other column still read every file.  Z-ordering
interleaves the bits of several columns' quantile ranks into one
clustering key, so per-file value ranges stay narrow on EVERY
z-ordered dimension — the standard lakehouse data-skipping layout
(Delta/Iceberg OPTIMIZE ZORDER BY), built here from Spark primitives:

1. per column: approxQuantile cut points (driver holds 2^bits
   scalars — the same bounded sampling a RangePartitioner does),
2. per row: quantile-bucket rank via a Catalyst higher-order filter
   over the broadcast cut-point literal array (JVM-side, no UDF),
3. bit-interleave the ranks into the z-value with shift/or
   expressions,
4. ``repartitionByRange`` on the z-value + sort-within-partitions,
   one shuffle, then write.

At 100 TB the cost is one range shuffle of the rewritten data — the
same price as any sorted compaction — and the payoff is that a scan
filtered on any z-dimension prunes most files by footer stats alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "write_zordered"]


def _bucket_rank(col: Column, bounds: list[float]) -> Column:
    """0-based quantile-bucket index of ``col`` against sorted cut
    points: the number of bounds ≤ value (pure Catalyst; NULLs rank
    lowest)."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    c = col.cast("double")
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(arr, lambda b: b <= c))
    )


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    bounds: dict[str, list[float]] | None = None,
) -> tuple[DataFrame, Column]:
    """Return (df, z) where ``z`` is the interleaved-bit z-value over
    ``cols`` with ``bits`` bits of quantile rank per column.

    ``len(cols) * bits`` must be ≤ 63 (the z-value is a signed long).
    Cut points come from one ``approxQuantile`` pass (relative error
    1/2^(bits+2)) — a bounded driver-side sample, not a collect of
    data rows.  ``bounds`` optionally supplies EXPLICIT cut points
    per column (ascending); columns listed there skip the quantile
    job entirely, which makes the z-value fully deterministic — the
    contract an exact cross-engine oracle needs (approxQuantile's cut
    points are partition-order-sensitive).
    """
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(
            f"len(cols) * bits = {len(cols) * bits} exceeds 63 z-value bits"
        )
    bounds = bounds or {}
    unknown = set(bounds) - set(cols)
    if unknown:
        raise ValueError(f"bounds given for non-z-order columns {sorted(unknown)}")
    n_buckets = 1 << bits
    need_quantiles = [c for c in cols if c not in bounds]
    sampled: dict[str, list[float]] = {}
    if need_quantiles:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        # list form: ONE quantile job covers every column — per-column
        # calls would each rescan the full input
        qs = df.approxQuantile(need_quantiles, probs, 1.0 / (n_buckets * 4))
        sampled = dict(zip(need_quantiles, qs))
    all_bounds = [
        [float(b) for b in bounds[c]] if c in bounds else sampled[c]
        for c in cols
    ]
    ranks = []
    for c, col_bounds in zip(cols, all_bounds):
        col_cuts = sorted(set(col_bounds))  # not `bounds`: that's the param
        if not col_cuts:
            ranks.append(F.lit(0))
            continue
        # a low-cardinality column yields < n_buckets distinct cut
        # points; stretch its rank to the full bit range, otherwise
        # the wider column's high bits dominate every interleaved
        # slot and the narrow dimension declusters
        raw = _bucket_rank(F.col(c), col_cuts)
        ranks.append(
            F.floor(raw * F.lit((n_buckets - 1) / len(col_cuts))).cast("long")
        )
    z = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(bits):
        for j, r in enumerate(ranks):
            # bit `bit` of rank j lands at interleaved position
            # bit*k + (k-1-j): column 0 owns the most significant slot
            pos = bit * k + (k - 1 - j)
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r.cast("long"), bit).bitwiseAND(F.lit(1)),
                    pos,
                )
            )
    return df, z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    mode: str = "overwrite",
    bounds: dict[str, list[float]] | None = None,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files z-ordered on
    ``cols``: range-partition on the z-value (one shuffle), sort each
    file internally, drop the helper column on write.  ``bounds`` as
    in :func:`zorder_value` (explicit cut points, deterministic)."""
    df, z = zorder_value(df, cols, bits, bounds=bounds)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
