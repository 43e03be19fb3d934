"""as-of join: differential vs pandas.merge_asof + determinism edges.

pandas is the de-facto semantics reference for as-of joins
(merge_asof); the distributed union+window formulation must agree on
every (direction, tolerance) combination.  Ties need our own oracle:
merge_asof takes the last row in input order, which is not a
distributed-friendly contract — asof_join pins ties to max(tie_break)
instead, and the tie tests assert that pin directly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from connected_component_spark.operators.asof import asof_join


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 31, "c"), (2, 5, "d"), (3, 7, "e")],
        "sym long, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 8, 1.0), (1, 25, 2.0), (1, 30, 3.0), (2, 6, 4.0), (4, 1, 9.0)],
        "sym long, t long, px double",
    )
    return trades, quotes


def _pandas_asof(trades, quotes, direction, tolerance=None):
    lp = trades.toPandas().sort_values("t").reset_index(drop=True)
    rp = quotes.toPandas().sort_values("t").reset_index(drop=True)
    out = pd.merge_asof(
        lp, rp, on="t", by="sym", direction=direction, tolerance=tolerance
    )
    return {
        (r.sym, r.t): (None if pd.isna(r.px) else r.px)
        for r in out.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 5])
def test_asof_matches_pandas(spark, direction, tolerance):
    trades, quotes = _trades_quotes(spark)
    got = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t",
        right_cols=["px"], direction=direction,
        tolerance=F.lit(tolerance) if tolerance is not None else None,
    )
    want = _pandas_asof(trades, quotes, direction, tolerance)
    rows = {(r.sym, r.t): r.px for r in got.collect()}
    assert rows == want
    assert got.count() == trades.count()  # left-outer: every left row kept


def test_asof_tie_break_is_max(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 100, "lo"), (1, 10, 200, "hi"), (1, 3, 300, "old")],
        "k long, t long, rid long, tag string",
    )
    got = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["tag"], tie_break="rid",
    ).collect()
    assert len(got) == 1 and got[0].tag == "hi"


def test_asof_forward_tie_break_is_max(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 1, "lo"), (1, 10, 2, "hi"), (1, 40, 3, "later")],
        "k long, t long, rid long, tag string",
    )
    got = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["tag"], direction="forward", tie_break="rid",
    ).collect()
    assert len(got) == 1 and got[0].tag == "hi"


def test_asof_timestamp_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (1, "2024-03-01 00:00:00")],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-08 00:00:00", 7.0)], "k long, ts string, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = asof_join(
        left, right, on="k", left_time="ts", right_time="ts",
        right_cols=["v"], tolerance=F.expr("INTERVAL 7 DAYS"),
    )
    rows = {str(r.ts): r.v for r in got.collect()}
    assert rows["2024-01-10 00:00:00"] == 7.0
    assert rows["2024-03-01 00:00:00"] is None  # match exists but out of tolerance


def test_asof_collision_and_direction_validation(spark):
    trades, quotes = _trades_quotes(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "trade"),
                  on="sym", left_time="t", right_time="t")
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="sym", left_time="t", right_time="t",
                  direction="sideways")


def test_asof_randomized_vs_pandas(spark):
    """Randomized differential: many key/time collisions, unmatched
    keys, and boundary-equal times, both directions."""
    import random

    rng = random.Random(1234)
    for trial in range(3):
        lp = [
            (rng.randint(0, 4), rng.randint(0, 50), i)
            for i in range(rng.randint(1, 60))
        ]
        rp = [
            (rng.randint(0, 5), rng.randint(0, 50), float(j))
            for j in range(rng.randint(1, 60))
        ]
        # unique (key, time) on the right so pandas tie behavior
        # (input order) can't diverge from our max-tie_break pin
        seen, rp_u = set(), []
        for k, t, v in rp:
            if (k, t) not in seen:
                seen.add((k, t))
                rp_u.append((k, t, v))
        left = spark.createDataFrame(lp, "sym long, t long, lid long")
        right = spark.createDataFrame(rp_u, "sym long, t long, px double")
        for direction in ("backward", "forward", "nearest"):
            got = {
                (r.sym, r.t, r.lid): r.px
                for r in asof_join(
                    left, right, on="sym", left_time="t", right_time="t",
                    right_cols=["px"], direction=direction,
                ).collect()
            }
            lpd = left.toPandas().sort_values(["t", "lid"]).reset_index(drop=True)
            rpd = right.toPandas().sort_values("t").reset_index(drop=True)
            out = pd.merge_asof(lpd, rpd, on="t", by="sym", direction=direction)
            want = {
                (r.sym, r.t, r.lid): (None if pd.isna(r.px) else r.px)
                for r in out.itertuples()
            }
            assert got == want, f"trial {trial} {direction}"


def test_asof_single_shuffle(spark):
    """The 100 TB contract: one Exchange (on the join key), no join
    node, no Python eval anywhere in the plan."""
    trades, quotes = _trades_quotes(spark)
    plan = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t", right_cols=["px"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_asof_null_payload_field_not_leaked(spark):
    """A genuine NULL in a matched right row's payload must surface as
    NULL — not be skipped over to an older right row's value (the
    per-column ignorenulls row-mixing hazard)."""
    from connected_component_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 6)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 1, 10.0), (1, 5, None)], "k long, rt long, price double"
    )
    row = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["price"],
    ).collect()[0]
    # backward match is the t=5 row whose price IS NULL
    assert row.matched_rt == 5
    assert row.price is None
