"""Salted skew rewrites are semantics-preserving (SURVEY §2.3
partitioning row; the explicit fallback behind AQE skew handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from connected_component_spark.operators.skew import (
    salted_collect_set,
    salted_join,
)


def _skewed_df(spark):
    # one pathological hot key (90%) + a long tail
    hot = spark.range(900).select(
        F.lit(1).alias("k"), (F.col("id") % 37).alias("v")
    )
    tail = spark.range(100).select(
        (F.col("id") % 17 + 2).alias("k"), F.col("id").alias("v")
    )
    return hot.union(tail)


def test_salted_join_matches_plain_join(spark):
    left = _skewed_df(spark)
    right = spark.range(20).select(
        (F.col("id") + 1).alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = left.join(right, "k").select("k", "v", "w")
    salted = salted_join(left, right, "k", salts=4).select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    assert salted.count() == plain.count() > 0


def test_salted_collect_set_matches_plain(spark):
    df = _skewed_df(spark)
    plain = (
        df.groupBy("k")
        .agg(F.array_sort(F.collect_set("v")).alias("values"))
    )
    salted = salted_collect_set(df, "k", "v", salts=4)
    assert {
        (r.k, tuple(r["values"])) for r in plain.collect()
    } == {(r.k, tuple(r["values"])) for r in salted.collect()}
