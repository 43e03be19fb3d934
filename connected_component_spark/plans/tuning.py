"""Runtime plan-tuning helpers shared by the iterative operators."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = ["shrunk_shuffle"]


@contextmanager
def shrunk_shuffle(
    spark: SparkSession,
    n_rows: int,
    rows_per_partition: int = 250_000,
    floor: int = 4,
):
    """Shrink-only right-sizing of ``spark.sql.shuffle.partitions``
    for a driver-side iteration loop over a dataset of known size.

    A fixpoint round is several exchanges, and on small inputs the
    session's full shuffle width costs more in per-task overhead than
    the data movement itself (measured in SURVEY.md §6.1).  The
    session value is restored on exit, and the width is never
    *raised* — at cluster scale the configured width wins, so the
    shrink simply never triggers.  Partition count cannot affect
    results, only task granularity.  Assumes single-threaded use of
    the session while the loop runs (same contract as the CC kernel
    and streamq._scaled_shuffle).
    """
    key = "spark.sql.shuffle.partitions"
    prev: str | None = None
    try:
        cur = spark.conf.get(key)
        target = max(floor, -(-n_rows // rows_per_partition))
        if cur is not None and cur.isdigit() and target < int(cur):
            prev = cur
            spark.conf.set(key, str(target))
    except Exception:
        prev = None
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
