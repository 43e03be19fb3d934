"""Bucketed storage: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle.
Writing both sides bucketed (and sorted) by the join key puts
co-joined rows in matching files, so Spark plans a sort-merge join
with NO Exchange on either side — the on-disk twin of the
pre-partitioning the reference approximated with RangePartitioner
(reference CCDriver.scala:66).  Tests assert the Exchange-free plan
(tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "bucketed_join_ready"]


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    Bucket metadata lives in the session catalog — bucketing only
    takes effect through ``saveAsTable`` (plain ``parquet(path)``
    writes no bucket spec).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str,
    prefer_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with equal
    bucket counts the planner elides both shuffle Exchanges.
    ``prefer_merge`` adds a merge-join hint so the bucketed SMJ path
    is exercised even when one side is small enough to broadcast
    (small fixtures) — at the fact-fact scale bucketing targets, the
    planner picks SMJ unhinted."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    if prefer_merge:
        left = left.hint("merge")
    (key,) = set(left.columns) & set(right.columns)
    return left.join(right, key)
