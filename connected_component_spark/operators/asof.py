"""Distributed as-of (nearest-time) join.

The standard time-series / feature-attribution operator Spark has no
built-in for: every left row picks the single right row with the
latest ``right_time <= left_time`` (backward; forward mirrors).  A
single-node engine sorts both sides and merges; the distributed
formulation here is union + window — tag both sides, union them,
and run ``last(<right col>, ignorenulls=True)`` over a
(key-partitioned, time-ordered) running window.  That is ONE shuffle
on the join key with a per-key sort — exactly the exchange a
sort-merge join would pay, no range explosion, no per-row probe —
and it survives 100 TB the same way any keyed window does (AQE
handles skewed keys; no state beyond the sort).

All expressions are Catalyst built-ins (JVM-side, codegen); no
Python in the path.

Reference scope note: the reference engine (kwartile/
connected-component) has no as-of operator; this belongs to the
training-data-pipeline surface the engine adds on top (event ×
dimension-history attribution, point-in-time-correct feature joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_SIDE = "__asof_side"
_TIME = "__asof_t"
_TIE = "__asof_tie"
_PAY = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the matched columns of
    the single best ``right`` row (NULLs when no right row qualifies —
    left-outer semantics).

    backward: match = right row with the greatest ``right_time`` ≤
    ``left_time``.  forward: smallest ``right_time`` ≥ ``left_time``.
    nearest: the closer of the two (backward wins equal distances —
    pandas ``merge_asof`` semantics).  Equal times match in all
    directions.

    ``on`` key column(s) must share names across the two frames
    (rename beforehand).  ``right_cols`` are the right columns carried
    into the result (default: everything but keys and ``right_time``);
    names must not collide with left columns.  When several right rows
    share (key, time), the one with the greatest ``tie_break`` value
    wins — required for a deterministic result if such duplicates can
    exist, since engines disagree on which tied row an as-of join
    returns.  ``tolerance`` (a Column literal, e.g.
    ``F.expr("INTERVAL 7 DAYS")`` or a numeric for numeric time axes)
    discards matches farther than that from ``left_time``.

    Both time columns must be union-compatible (cast beforehand:
    mixing TIMESTAMP and TIMESTAMP_NTZ will not resolve).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join direction must be backward|forward|nearest, got {direction!r}"
        )
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*keys, right_time, tie_break)
        ]
    out_time = f"matched_{right_time}"
    collisions = (set(right_cols) | {out_time}) & set(left.columns)
    if collisions:
        raise ValueError(
            f"asof_join output columns collide with left columns: "
            f"{sorted(collisions)}; rename before joining"
        )
    matched_time = f"__asof_matched_{right_time}"

    # the whole right payload travels as ONE struct: a right row's
    # struct is non-null even when its FIELDS are null, so the
    # last(ignorenulls) fill picks the nearest right ROW atomically —
    # filling per column would skip a genuine NULL in one payload
    # column and leak the value of an older right row (row mixing)
    from pyspark.sql.types import StructField, StructType

    pay_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
        + [StructField(matched_time, right.schema[right_time].dataType)]
    )
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_TIE),
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    rt = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        (F.col(tie_break).cast("long") if tie_break else F.lit(0)).alias(_TIE),
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_time).alias(matched_time),
        ).alias(_PAY),
    ).select(*lt.columns)  # align union column order

    unioned = lt.unionByName(rt)

    # Sort so that (a) every eligible right row precedes the left row
    # it may match — on time ties the right side must come first, so
    # _SIDE ascends — and (b) among right rows tied on (key, time) the
    # greatest tie_break lands nearest the left row, making
    # ``last(ignorenulls)`` deterministic.
    def _fill(direction_: str) -> Column:
        if direction_ == "backward":
            order = [F.col(_TIME).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc()]
        else:
            order = [F.col(_TIME).desc(), F.col(_SIDE).asc(), F.col(_TIE).asc()]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col(_PAY), ignorenulls=True).over(w)

    def _gap(pay: Column, direction_: str) -> Column:
        m = pay[matched_time]
        return F.col(_TIME) - m if direction_ == "backward" else m - F.col(_TIME)

    def _tolerated(pay: Column, direction_: str) -> Column:
        if tolerance is None:
            return pay
        ok = pay[matched_time].isNotNull() & (_gap(pay, direction_) <= tolerance)
        return F.when(ok, pay)

    if direction == "nearest":
        # both directional candidates (same hash partitioning, a
        # second in-partition sort, no extra Exchange), tolerance-
        # filtered per direction, then the closer one wins — backward
        # on equal distance (pandas merge_asof semantics)
        pb = _tolerated(_fill("backward"), "backward")
        pf = _tolerated(_fill("forward"), "forward")
        pay = (
            F.when(pb.isNull(), pf)
            .when(pf.isNull(), pb)
            .when(_gap(pf, "forward") < _gap(pb, "backward"), pf)
            .otherwise(pb)
        )
    else:
        pay = _tolerated(_fill(direction), direction)

    filled = unioned.select(
        *[c for c in unioned.columns if c != _PAY],
        pay.alias(_PAY),
    ).where(F.col(_SIDE) == 1)

    return filled.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{_PAY}.{c}").alias(c) for c in right_cols],
        F.col(f"{_PAY}.{matched_time}").alias(out_time),
    )
