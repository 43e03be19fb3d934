"""interval_join: differential vs the naive inequality join + plan
shape (equi-join on bins, no nested-loop/cartesian)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.rangejoin import interval_join


def _fixture(spark, seed=7, n_points=200, n_iv=40):
    rng = random.Random(seed)
    pts = [(i, rng.randint(0, 10_000), rng.randint(0, 3)) for i in range(n_points)]
    ivs = []
    for j in range(n_iv):
        s = rng.randint(0, 9_500)
        ivs.append((j, s, s + rng.randint(1, 900), rng.randint(0, 3)))
    points = spark.createDataFrame(pts, "pid long, t long, k long")
    intervals = spark.createDataFrame(ivs, "iid long, s long, e long, k long")
    return points, intervals


def _naive(points, intervals, keyed, end_closed):
    cond = (F.col("t") >= F.col("s")) & (
        (F.col("t") <= F.col("e")) if end_closed else (F.col("t") < F.col("e"))
    )
    if keyed:
        cond = cond & (points["k"] == intervals["k"])
    j = points.join(intervals.withColumnRenamed("k", "k2"), F.expr("true"), "inner")
    cond2 = (F.col("t") >= F.col("s")) & (
        (F.col("t") <= F.col("e")) if end_closed else (F.col("t") < F.col("e"))
    )
    if keyed:
        cond2 = cond2 & (F.col("k") == F.col("k2"))
    return {(r.pid, r.iid) for r in j.where(cond2).collect()}


@pytest.mark.parametrize("keyed", [False, True])
@pytest.mark.parametrize("end_closed", [False, True])
@pytest.mark.parametrize("bin_width", [64, 1000, 20_000])
def test_interval_join_matches_naive(spark, keyed, end_closed, bin_width):
    points, intervals = _fixture(spark)
    got = interval_join(
        points,
        intervals if keyed else intervals.drop("k"),
        point_col="t", start_col="s", end_col="e",
        on="k" if keyed else None,
        bin_width=bin_width, end_closed=end_closed,
    )
    pairs = [(r.pid, r.iid) for r in got.collect()]
    assert len(pairs) == len(set(pairs)), "duplicate (point, interval) pairs"
    assert set(pairs) == _naive(points, intervals, keyed, end_closed)


def test_interval_join_timestamp_axis(spark):
    points = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "pid long, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
         (11, "2024-01-01 11:00:00", "2024-01-01 12:00:00")],
        "iid long, s string, e string",
    ).select("iid", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"))
    got = interval_join(points, intervals, "ts", "s", "e", bin_width=3600)
    assert [r.iid for r in got.collect()] == [10]


def test_interval_join_validation(spark):
    points, intervals = _fixture(spark)
    with pytest.raises(ValueError, match="collision"):
        interval_join(points, intervals.withColumnRenamed("iid", "pid"),
                      "t", "s", "e", on="k")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(points, intervals.drop("k"), "t", "s", "e", bin_width=0)


def test_interval_join_is_equi_join(spark):
    """The scale contract: a shuffled equi-join on the bin key — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    points, intervals = _fixture(spark)
    plan = interval_join(
        points, intervals.drop("k"), "t", "s", "e", bin_width=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan
