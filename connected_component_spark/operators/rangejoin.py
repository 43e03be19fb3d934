"""Distributed point-in-interval (range) join.

Spark executes a plain ``ON p >= start AND p < end`` join as a
broadcast-nested-loop (or worse, a cartesian product) — the classic
scale cliff for time-range attribution.  The standard fix, used by
every production range-join implementation, is bin bucketing: choose
a bin width, give each point its bin id, replicate each interval
into every bin it overlaps, equi-join on (keys..., bin), and refine
with the exact predicate.  Each (interval, point) pair meets in
exactly one bin — the point's — so no dedup is needed, and the plan
is one shuffled equi-join whose replication factor is
``interval_len / bin_width + 1``, a knob, not a cliff.

All expressions are Catalyst built-ins (sequence/explode/floor);
no Python in the path.

Reference scope note: the reference engine has no range operator;
this is training-data-pipeline surface (event-to-window attribution,
session containment, outage/incident joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["interval_join", "overlap_join"]

_BIN = "__rj_bin"


def _axis(df: DataFrame, col: str) -> Column:
    """Numeric join axis for a column: timestamps/dates become epoch
    seconds (session-tz cast chain handles NTZ), numerics pass
    through."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.col(col).cast("timestamp").cast("long")
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.DoubleType,
                       T.FloatType, T.DecimalType)):
        return F.col(col).cast("double") if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)) else F.col(col).cast("long")
    raise ValueError(f"interval_join: unsupported axis type {dt} for column {col!r}")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | list[str] | None = None,
    bin_width: int = 3600,
    end_closed: bool = False,
) -> DataFrame:
    """Inner join: every (point row, interval row) pair — matching on
    the optional equi-key(s) — where ``start <= point < end``
    (``<= end`` when ``end_closed``).  Result carries all point
    columns plus all interval columns (names must not collide;
    rename beforehand).

    ``bin_width`` is in axis units (seconds for time axes) and only
    affects the physical replication factor, never the result: size
    it near the typical interval length so most intervals land in
    1-2 bins.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    collisions = (set(points.columns) & set(intervals.columns)) - set(keys)
    if collisions:
        raise ValueError(
            f"interval_join column collision: {sorted(collisions)}; rename first"
        )
    if bin_width <= 0:
        raise ValueError("interval_join bin_width must be positive")

    p = points.withColumn(
        _BIN, F.floor(_axis(points, point_col) / F.lit(bin_width)).cast("long")
    )
    s, e = _axis(intervals, start_col), _axis(intervals, end_col)
    iv = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(s / F.lit(bin_width)).cast("long"),
                F.floor(e / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    refined = p.join(iv, [*keys, _BIN]).where(
        (F.col(point_col) >= F.col(start_col))
        & (
            F.col(point_col) <= F.col(end_col)
            if end_closed
            else F.col(point_col) < F.col(end_col)
        )
    )
    out_cols = [*keys,
                *[c for c in points.columns if c not in keys],
                *[c for c in intervals.columns if c not in keys]]
    return refined.select(*[F.col(c) for c in out_cols])


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bin_width: int = 3600,
    closed: bool = False,
) -> DataFrame:
    """Interval × interval overlap join: every (left row, right row)
    pair — matching on the optional equi-key(s) — whose intervals
    overlap: ``l_start < r_end AND r_start < l_end`` (``<=`` when
    ``closed``; then intervals touching at an endpoint also match).

    Same bin-bucketing physics as :func:`interval_join`, with one
    extra trick: both sides replicate into every bin they span, so an
    overlapping pair would meet in EVERY shared bin — the pair is
    kept only in the FIRST shared bin (``greatest`` of the two start
    bins), which each overlapping pair occupies exactly once.  That
    makes the join duplicate-free by construction, with no distinct
    pass over the (potentially huge) pair set.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    collisions = (set(left.columns) & set(right.columns)) - set(keys)
    if collisions:
        raise ValueError(
            f"overlap_join column collision: {sorted(collisions)}; rename first"
        )
    if bin_width <= 0:
        raise ValueError("overlap_join bin_width must be positive")

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        s, e = _axis(df, start), _axis(df, end)
        return df.withColumn(
            _BIN,
            F.explode(
                F.sequence(
                    F.floor(s / F.lit(bin_width)).cast("long"),
                    F.floor(e / F.lit(bin_width)).cast("long"),
                )
            ),
        )

    lb = binned(left, left_start, left_end)
    rb = binned(right, right_start, right_end)
    first_shared = F.greatest(
        F.floor(_axis(left, left_start) / F.lit(bin_width)).cast("long"),
        F.floor(_axis(right, right_start) / F.lit(bin_width)).cast("long"),
    )
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    ov = (
        (ls <= re_) & (rs <= le) if closed else (ls < re_) & (rs < le)
    )
    out_cols = [*keys,
                *[c for c in left.columns if c not in keys],
                *[c for c in right.columns if c not in keys]]
    return (
        lb.join(rb, [*keys, _BIN])
        .where(F.col(_BIN) == first_shared)
        .where(ov)
        .select(*[F.col(c) for c in out_cols])
    )
