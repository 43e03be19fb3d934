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


# ---------------------------------------------------------------------------
# overlap_join
# ---------------------------------------------------------------------------

def test_overlap_join_pairs_once_across_many_shared_bins(spark):
    """Two long intervals sharing MANY bins must pair exactly once
    (the first-shared-bin rule replaces a distinct)."""
    from connected_component_spark.operators.rangejoin import overlap_join

    a = spark.createDataFrame([(1, 0, 10_000)], "k long, a_s long, a_e long")
    b = spark.createDataFrame([(1, 500, 9_000)], "k long, b_s long, b_e long")
    out = overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", on="k", bin_width=100)
    assert out.count() == 1


def test_overlap_join_open_vs_closed_endpoints(spark):
    from connected_component_spark.operators.rangejoin import overlap_join

    a = spark.createDataFrame([(1, 0, 100)], "k long, a_s long, a_e long")
    b = spark.createDataFrame([(1, 100, 200)], "k long, b_s long, b_e long")
    args = dict(on="k", bin_width=50)
    assert overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", **args).count() == 0
    assert (
        overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", closed=True, **args).count()
        == 1
    )


def test_overlap_join_differential_naive(spark):
    """Seeded random intervals: bin-bucketed result equals the naive
    inequality cross join for several bin widths."""
    import random

    from pyspark.sql import functions as F

    from connected_component_spark.operators.rangejoin import overlap_join

    rng = random.Random(77)
    rows_a = [(rng.randrange(3), rng.randrange(1000), 0) for _ in range(60)]
    rows_a = [(k, s, s + rng.randrange(1, 300)) for k, s, _ in rows_a]
    rows_b = [(rng.randrange(3), rng.randrange(1000), 0) for _ in range(60)]
    rows_b = [(k, s, s + rng.randrange(1, 300)) for k, s, _ in rows_b]
    a = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(rows_a)],
        "k long, a_s long, a_e long, aid long",
    )
    b = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(rows_b)],
        "k long, b_s long, b_e long, bid long",
    )
    naive = sorted(
        (ra[3], rb[3])
        for ra in [(k, s, e, i) for i, (k, s, e) in enumerate(rows_a)]
        for rb in [(k, s, e, i) for i, (k, s, e) in enumerate(rows_b)]
        if ra[0] == rb[0] and ra[1] < rb[2] and rb[1] < ra[2]
    )
    for bw in (7, 100, 5000):
        got = sorted(
            (r.aid, r.bid)
            for r in overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", on="k", bin_width=bw
            ).collect()
        )
        assert got == naive, f"bin_width={bw}"
